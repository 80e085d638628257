package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling onto a fixed grid with gap filling — the shape
  * behind dashboards and feature pipelines over event streams. Extension
  * surface: the reference has no time operations at all (SURVEY.md
  * §2.4-2.10).
  *
  * Scale shape: the raw stream collapses to per-(series, bucket) partial
  * aggregates first (map-side combine), the dense grid is generated
  * per-series from its own min/max (sequence + explode — no driver
  * materialization), and the carry-forward window runs over grid-sized
  * data (series-span buckets, orders of magnitude smaller than the raw
  * events), partitioned by series.
  */
object Resample {

  /** Aggregate `valueAgg` per (series, `unit` bucket), densify each series
    * onto its full bucket range, and fill gaps with
    * last-observation-carried-forward. Output: series, bucket, n (0 on
    * gaps), v_filled (LOCF of the aggregate; null until first observation).
    */
  def locf(df: DataFrame, seriesCol: String, tsCol: String,
      valueAgg: Column, unit: String): DataFrame = {
    val agg = df
      .groupBy(col(seriesCol).as("series"),
        date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"), valueAgg.as("v"))
    val grid = agg.groupBy("series")
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col("series"),
        explode(sequence(col("lo"), col("hi"), expr(s"interval 1 $unit")))
          .as("bucket"))
    val w = Window.partitionBy("series").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("series", "bucket"), "left")
      .select(col("series"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
  }
}
