package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust aggregation patterns. Spark's built-in
  * `count(DISTINCT x)` alongside other aggregates plans an Expand
  * (row multiplication) and lands every (key, value) pair of a hot key
  * on ONE reducer for the distinct phase; the two-stage form below
  * spreads the dedup shuffle over (key, value) — the value component
  * distributes the hot key — and reduces tiny per-key counts second.
  * The standard hand-rolled shape for exact distinct counting over
  * skewed keys at 100 TB.
  */
object SkewAgg {

  /** Exact per-key distinct count of `value`, two-stage: dedup on
    * (keys, value), then count per key. Both shuffles are map-side
    * combined; no Expand, no single hot reducer. Output: keys + `as`.
    */
  def exactDistinct(df: DataFrame, keys: Seq[String], value: Column,
      as: String = "n_distinct"): DataFrame = {
    val kn = keys.map(col)
    df.select(kn :+ value.as("__v"): _*)
      .groupBy(kn :+ col("__v"): _*).agg(count(lit(1)).as("__ones"))
      .groupBy(kn: _*).agg(count(lit(1)).as(as))
  }
}
