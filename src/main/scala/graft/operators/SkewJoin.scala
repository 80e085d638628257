package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual remedy when one key carries a
  * disproportionate share of rows and a plain shuffle join stalls on a
  * single straggler task. AQE's skew-join split handles moderate skew
  * automatically; salting is the explicit tool for pathological keys
  * (e.g. a null-ish default id owning 30% of a 100 TB fact table).
  *
  * Shape: the big (skewed) side gets a random-but-deterministic salt in
  * [0, saltFactor); the small side is exploded saltFactor times so every
  * (key, salt) bucket finds its match. Join key becomes (key, salt) —
  * the hot key's rows spread over saltFactor tasks.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would emit each unmatched small-side row saltFactor
    // times (one per exploded salt copy) — silently wrong; only join types
    // where the small side never surfaces unmatched rows are sound here.
    require(Set("inner", "left", "leftouter").contains(
        joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    // deterministic salt: stable hash of the whole row spread over buckets
    // (xxhash64 over all columns — not the key, which would put the hot
    // key's rows all in one bucket again)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(exploded,
        salted(key) === exploded(key) && salted("__salt") === exploded("__salt"),
        joinType)
      .drop(exploded(key))
      .drop("__salt")
  }
}
