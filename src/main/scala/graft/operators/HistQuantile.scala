package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable histogram-quantile sketch — the DETERMINISTIC member of the
  * quantile-summary family, next to Spark's engine-internal
  * Greenwald-Khanna `percentile_approx` (whose sketch boundaries no
  * other engine reproduces — q_approx_quantile is rows-only for exactly
  * that reason). A fixed equi-width bucket table over a declared value
  * range is the classic storeable summary: exact integer counts, merge
  * by cellwise sum (the CMS lifecycle — build per shard/day, roll up,
  * query later without rescanning), and a quantile estimate that is a
  * pure integer function of (data, lo, hi, buckets) — any partitioning,
  * any engine, any merge order, bit-for-bit (DuckDB re-derives it,
  * q_hist_quantile).
  *
  * Accuracy contract: the estimate is the UPPER EDGE of the first
  * bucket whose cumulative count reaches ceil(φ·N), so it is within one
  * bucket width ABOVE the exact φ-quantile (and never below it) —
  * spec-pinned. Rank-error sketches (GK/KLL) bound rank instead of
  * value; the histogram bounds value, needs a declared [lo, hi), and
  * clamps outliers into the edge buckets — the standard trade for
  * determinism + mergeability at fixed size.
  *
  * Shape at 100 TB: the sketch build is ONE map-side-combinable
  * aggregate (groups × buckets rows out, regardless of input size); the
  * quantile pass runs windows over the SKETCH table, never the corpus.
  */
object HistQuantile {

  /** Equi-width bucket of an integer-scaled value (micros/cents — the
    * caller's exact-integer canonicalization), clamped into
    * [0, buckets): values below lo land in bucket 0, at/above hi in the
    * last bucket. The value is clamped into [lo, hi) FIRST, so the
    * division sees only nonnegative operands and truncation equals
    * floor; checkRange bounds (hi − lo)·buckets under 2^53 so the
    * double-typed division is still exact to the integer.
    */
  def bucketOf(v: Column, lo: Long, hi: Long, buckets: Int): Column = {
    val vc = least(lit(hi - 1), greatest(lit(lo), v.cast("long")))
    (((vc - lit(lo)) * lit(buckets.toLong)) / lit(hi - lo)).cast("long")
  }

  private[graft] def checkRange(lo: Long, hi: Long, buckets: Int): Unit = {
    require(buckets >= 2 && buckets <= (1 << 16), s"buckets in [2,65536]: $buckets")
    require(hi > lo, s"hi must exceed lo: [$lo, $hi)")
    require((hi - lo) % buckets == 0,
      s"(hi - lo) = ${hi - lo} must divide evenly by buckets = $buckets " +
        "(bucket edges must be exact integers)")
    require(hi - lo <= (1L << 53) / buckets,
      s"(hi - lo) * buckets must stay under 2^53 for exact division")
  }

  /** Per-group sketch table: (groupCols..., hq_bucket, cnt), only
    * non-zero cells. ONE partial-aggregable pass; at most
    * groups × buckets rows out. NULL values are dropped (a NULL has no
    * bucket): without the filter a NULL hq_bucket cell would count
    * toward N in [[quantiles]] and — under Spark's nulls-first window
    * order — inflate every cumulative count, skewing every estimate
    * and diverging from engines that sort nulls last.
    */
  def sketchBy(df: DataFrame, groupCols: Seq[String], value: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    checkRange(lo, hi, buckets)
    val g = groupCols.map(col)
    df.filter(value.isNotNull)
      .select(g :+ bucketOf(value, lo, hi, buckets).as("hq_bucket"): _*)
      .groupBy(g :+ col("hq_bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketch tables by cellwise sum — the merge of per-shard
    * sketches equals the sketch of the union, bit-for-bit (histogram
    * linearity, same law as [[CountMin.merge]]).
    */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols :+ "hq_bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** φ-quantile estimates (φ in parts-per-million) from a sketch table:
    * one row per (group, φ) with `est` = lo + (b + 1)·width for the
    * smallest bucket b whose cumulative count reaches ceil(φ·N/10⁶) —
    * integer-exact, upper-edge convention (never below the true
    * quantile, at most one bucket width above). Windows run over the
    * sketch (≤ groups × buckets rows), not the data.
    */
  def quantiles(sketch: DataFrame, groupCols: Seq[String],
      lo: Long, hi: Long, buckets: Int, phisPpm: Seq[Long]): DataFrame = {
    checkRange(lo, hi, buckets)
    require(phisPpm.nonEmpty && phisPpm.forall(p => p > 0 && p <= 1000000L),
      s"phis must be in (0, 1000000] ppm: $phisPpm")
    val width = (hi - lo) / buckets
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy("hq_bucket")
    val wAll = Window.partitionBy(g: _*)
    val cum = sketch
      .withColumn("__cum", sum("cnt").over(w))
      .withColumn("__n", sum("cnt").over(wAll))
    val phiLits = explode(array(phisPpm.map(lit): _*)).as("phi_ppm")
    // cum >= ceil(n·φ/10⁶)  ⇔  cum·10⁶ >= n·φ  (all-long; n·φ stays in
    // range up to ~9·10¹² rows at φ = 10⁶)
    cum.select(col("*"), phiLits)
      .filter(col("__cum") * lit(1000000L) >= col("__n") * col("phi_ppm"))
      .groupBy(g :+ col("phi_ppm"): _*)
      .agg(min("hq_bucket").as("__b"))
      .select(g ++ Seq(col("phi_ppm"),
        (lit(lo) + (col("__b") + 1) * lit(width)).as("est")): _*)
  }
}
