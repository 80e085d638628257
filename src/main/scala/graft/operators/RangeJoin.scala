package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (epsilon) joins: pairs within a time/value distance `w` of each
  * other on the same key. A naive non-equi join is a broadcast nested loop
  * — O(n*m) comparisons and a broadcast that stops fitting at scale. The
  * classic fix is bucketization: quantize the band column to width-w cells,
  * explode ONE side to its cell and both neighbors, equi-join on
  * (key, cell) — hash shuffle, no NLJ — then verify the exact band
  * predicate. Every qualifying pair shares a cell after the +-1 expansion,
  * so the result is exact; cost is O(n + m + candidates).
  *
  * Extension surface: the reference has no joins at all
  * (/root/reference/src/planner/logicalplan.rs:207-273).
  */
object RangeJoin {

  /** Pairs (a, b) with `a.key = b.key` and `|a.ts - b.ts| <= w` (micros).
    * Pass distinct id columns to identify rows; output carries both ids and
    * both timestamps. Self-join safe: pass the same DataFrame twice and
    * filter `id_a < id_b` afterwards.
    */
  def bandJoinMicros(left: DataFrame, right: DataFrame, keyCol: String,
      leftId: String, rightId: String, tsCol: String,
      wMicros: Long): DataFrame = {
    require(wMicros > 0, "band width must be positive")
    val l = left.select(col(keyCol).as("k"), col(leftId).as("id_a"),
      unix_micros(col(tsCol)).as("ts_a"))
      .withColumn("cell",
        explode(array((floor(col("ts_a") / wMicros) - 1).cast("long"),
          floor(col("ts_a") / wMicros).cast("long"),
          (floor(col("ts_a") / wMicros) + 1).cast("long"))))
    val r = right.select(col(keyCol).as("rk"), col(rightId).as("id_b"),
      unix_micros(col(tsCol)).as("ts_b"))
      .withColumn("rcell", floor(col("ts_b") / wMicros).cast("long"))
    l.join(r, col("k") === col("rk") && col("cell") === col("rcell"))
      .filter(abs(col("ts_a") - col("ts_b")) <= wMicros)
      .select(col("k"), col("id_a"), col("id_b"), col("ts_a"), col("ts_b"))
  }
}
