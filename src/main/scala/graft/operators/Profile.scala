package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality report card a 100 TB ingest runs
  * before anything else: per-column null counts, distinct cardinality,
  * min/max, and rendered-length mass, all from ONE scan. A north-star
  * extension (the reference's algebra has no aggregates at all,
  * /root/reference/src/planner/logicalplan.rs:207-273).
  *
  * Shape: a single global aggregate computes every measure for every
  * profiled column (partial-aggregable — each executor contributes one
  * constant-size buffer), then the one result row is exploded into the
  * per-column long format. No shuffle of data rows, no per-column passes.
  *
  * Exact vs approximate cardinality: `exact = true` uses
  * `count(DISTINCT c)`, which Spark plans as one Expand (input replicated
  * once per distinct-aggregate) — fine up to a handful of columns, and
  * required for the cross-engine oracle. At a 100 TB scan profile with
  * many columns, pass `exact = false`: `approx_count_distinct` (HLL++)
  * keeps the aggregate a plain single-pass partial agg with NO Expand.
  *
  * Min/max are taken on the NATIVE type and cast to string afterwards
  * (casting first would compare "10" < "9"). Engine-stable rendering is
  * the caller's contract, as in [[Checksum]]: profile integers, strings,
  * dates — never raw floats.
  */
object Profile {

  /** Profile `cols` of `df` in one scan. Returns one row per column:
    * (col_name, n_rows, n_nulls, n_distinct, min_str, max_str, len_sum)
    * where len_sum = total rendered length of non-null values.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val measures: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { n =>
      val c = col(n)
      Seq(
        count(c).as(s"__nn_$n"),
        (if (exact) count_distinct(c) else approx_count_distinct(c))
          .as(s"__nd_$n"),
        min(c).cast("string").as(s"__min_$n"),
        max(c).cast("string").as(s"__max_$n"),
        sum(length(c.cast("string"))).cast("long").as(s"__len_$n"))
    }
    val one = df.agg(measures.head, measures.tail: _*)
    val perCol = array(cols.map(n => struct(
      lit(n).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$n")).as("n_nulls"),
      col(s"__nd_$n").as("n_distinct"),
      col(s"__min_$n").as("min_str"),
      col(s"__max_$n").as("max_str"),
      coalesce(col(s"__len_$n"), lit(0L)).as("len_sum"))): _*)
    one.select(explode(perCol).as("p")).select(col("p.*"))
  }
}
