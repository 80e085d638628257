package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust aggregation patterns — the EXPLICIT spelling of the
  * two-stage exact-distinct plan: dedup on (keys, value) first (the
  * value component distributes a hot key), then count tiny per-key
  * results.
  *
  * Honesty note (verified against the actual physical plan, round 11):
  * modern Spark plans a SINGLE `count(DISTINCT x)` — even alongside
  * other aggregates — the same way (first exchange on (key, x); after
  * that dedup, per-partition distinct counts are disjoint and merge as
  * integers), with no Expand and no hot reducer; the round-11 skew soak
  * measured the built-in at parity with this form under a 92%-hot key.
  * What this operator buys: (a) the plan is GUARANTEED, independent of
  * planner version/rewrites; (b) it composes into engine-portable SQL a
  * DuckDB oracle can mirror; (c) MULTIPLE distinct aggregates over
  * different columns — where Spark does plan an Expand (row ×
  * aggregates multiplication) — can be spelled as several of these
  * joined on the keys, paying one dedup shuffle each instead of an
  * Expand over the full fact table.
  */
object SkewAgg {

  /** Exact per-key distinct count of `value`, two-stage: dedup on
    * (keys, value), then count per key. Both shuffles are map-side
    * combined. Output: keys + `as`.
    */
  def exactDistinct(df: DataFrame, keys: Seq[String], value: Column,
      as: String = "n_distinct"): DataFrame = {
    val kn = keys.map(col)
    df.select(kn :+ value.as("__v"): _*)
      .groupBy(kn :+ col("__v"): _*).agg(count(lit(1)).as("__ones"))
      .groupBy(kn: _*).agg(count(lit(1)).as(as))
  }
}
