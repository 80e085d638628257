package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend — "is this metric drifting,
  * per key?" — as ONE partial-aggregable pass: each group folds to five
  * exact integer sums (n, Σx, Σy, Σxy, Σx²) and the closed-form
  * slope/intercept are derived from those. A north-star extension (the
  * reference has no aggregates, /root/reference/src/planner/
  * logicalplan.rs:207-273).
  *
  * Scale shape: the only shuffle is the per-group sum of five numbers —
  * map-side combine does the heavy lifting, identical to any
  * sum-aggregate at 100 TB. No window, no sort, no per-group iteration.
  *
  * Cross-engine determinism (the [[VectorStats]] recipe): x and y enter
  * as INTEGERS (caller quantizes — epoch seconds, cents), sums
  * accumulate as decimal(38,0) so they are exact and order-independent
  * at any parallelism, and the closed forms
  * slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²·… ) are evaluated in doubles
  * from those exact sums — the same IEEE expression in every engine.
  * Degenerate groups (n < 2 or zero x-variance) yield NULL slope and
  * intercept rather than a division by zero.
  */
object Trend {

  /** Per-group OLS fit of integer `y` on integer `x`. Returns one row
    * per group: (groupCols..., n, slope, intercept) with slope/intercept
    * as doubles derived from exact integer sums. `x`/`y` MUST be
    * integer-valued columns (cast/quantized by the caller) — that is
    * what makes the result independent of partitioning and engine.
    */
  def olsPerGroup(df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    val d = df.select(groupCols.map(col) ++ Seq(
      x.cast("decimal(38,0)").as("__x"), y.cast("decimal(38,0)").as("__y")): _*)
    val sums = d.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val den = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / den
    sums.select(groupCols.map(col) ++ Seq(
      col("n"),
      when(col("n") < 2 || den === 0.0, lit(null).cast("double"))
        .otherwise(slope).as("slope"),
      when(col("n") < 2 || den === 0.0, lit(null).cast("double"))
        .otherwise((sy - slope * sx) / n).as("intercept")): _*)
  }
}
