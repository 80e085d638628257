package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) outlier detection — the data-quality gate
  * that survives the outliers it is hunting, unlike mean/stddev z-scores
  * which the outliers themselves inflate (Hampel '74; the standard
  * robust-statistics identifier).
  *
  * Scale shape: two grouped EXACT-percentile aggregates (group
  * cardinality is small — the group medians/MADs table is a broadcast
  * side), each a single keyed shuffle of the value column; the flagging
  * pass is a map-side broadcast join + filter. No global sort, no window.
  * For groups too large for exact percentile state, swap in
  * `percentile_approx` — same plan shape, sketch-bounded memory.
  */
object Robust {

  /** Rows of `df` whose `valCol` deviates from its group median by more
    * than `k` times the group MAD (median absolute deviation). Appends
    * `med`, `mad`, `absdev` columns. Comparisons run on unrounded doubles
    * computed with the same operation order in any engine.
    *
    * MAD = 0 (a majority-constant group) degenerates the test — any
    * nonzero deviation, however tiny, would exceed k*0 — so such groups
    * flag NOTHING here; callers wanting a floor can clamp the mad column
    * themselves (the standard Hampel fallback).
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    val withDev = df.join(broadcast(med), groupCol)
      .withColumn("absdev", abs(col(valCol) - col("med")))
    val mad = withDev.groupBy(groupCol)
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    withDev.join(broadcast(mad), groupCol)
      .filter(col("mad") > 0 && col("absdev") > lit(k) * col("mad"))
  }
}
