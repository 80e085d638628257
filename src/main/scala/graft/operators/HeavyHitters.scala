package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters by sketch-then-verify: a single Misra-Gries pass
  * produces a bounded candidate superset, then an exact counting pass over
  * only the candidates filters to the true answer.
  *
  * Threshold is the SHARE form `count * share >= N` (i.e. frequency >=
  * N/share) so the comparison stays in exact integer arithmetic at any
  * scale. Completeness needs the MG bound N/(capacity+1) < N/share, i.e.
  * `capacity >= share` — enforced.
  *
  * 100 TB shape: pass 1 shuffles only constant-size MG buffers (map-side
  * partials, one merge); pass 2 re-scans with a broadcast candidate list
  * and aggregates only matching keys — two scans, zero wide shuffles of
  * raw keys. Contrast with the naive `groupBy(key).count().filter(...)`,
  * which shuffles every distinct key; for token-like key spaces that is
  * the difference between a sketch and a full inverted index.
  */
object HeavyHitters {

  /** Keys of `keyCol` (string) occurring with frequency >= N/share, with
    * their exact counts: (key, cnt), ordered by key. `capacity` bounds
    * the sketch (default = 4*share for slack well past the MG bound).
    *
    * NOT LAZY: pass 1 (the MG sketch + total count) executes EAGERLY via
    * `.first()` during this call — inherent to a two-pass algorithm whose
    * second plan depends on pass-1 results. Building the returned
    * DataFrame (or just explaining it) therefore runs a full Spark job
    * over `items`; callers timing plan construction separately from
    * execution (ExplainDump, plan audits) are timing pass 1 too. The
    * same applies to `BloomJoin.bloomOf` (count + bloomFilter actions).
    */
  def exactByShare(items: DataFrame, keyCol: Column, share: Long,
      capacity: Int = -1): DataFrame = {
    val cap = if (capacity > 0) capacity
      else math.min(4L * share, Int.MaxValue.toLong).toInt
    require(cap >= share,
      s"capacity $cap cannot guarantee threshold N/$share (needs >= $share)")
    val spark = items.sparkSession
    import spark.implicits._

    val keyed = items.select(keyCol.cast("string").as("key"))
    // pass 1: candidates + total count in ONE aggregate (constant-size
    // buffers either way)
    val mg = udaf(new graft.functions.Aggregators.MisraGries(cap))
    val first = keyed.agg(
      mg(col("key")).as("candidates"), count(lit(1)).as("n")).first()
    val candidates = first.getSeq[String](0)
    val n = first.getLong(1)

    // pass 2: exact counts for candidates only — broadcast semi join on a
    // driver-bounded list (<= capacity entries), then the integer-share
    // threshold
    val candDf = candidates.toDF("key")
    keyed.join(broadcast(candDf), "key")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(share) >= lit(n))
      .orderBy("key")
  }
}
