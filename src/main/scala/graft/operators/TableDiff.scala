package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — "what changed between two versions of a 100 TB
  * table?" — answered WITHOUT moving rows: each side collapses to one
  * (group, n_rows, checksum) row per group via [[Checksum.grouped]]
  * (partial-aggregable scan, order/partitioning-independent), then the
  * two tiny group summaries full-outer-join on the group key. A north-star
  * extension: the reference's algebra (scan/filter/project/sort/limit,
  * /root/reference/src/planner/logicalplan.rs:207-273) has no notion of
  * table versions.
  *
  * Output: one row per DIFFERING group — status `added` (group only in
  * `after`), `removed` (only in `before`), `changed` (both sides, content
  * checksum differs) — with per-side row counts. Unchanged groups are
  * filtered out, so the result is proportional to the CHANGE, not the
  * table: diffing two 100 TB snapshots that differ in 3 partitions
  * returns 3 rows, and the only shuffle is the per-side group aggregate.
  *
  * Choose `groupCols` like a partition key (date month, source, tenant):
  * granularity of the answer, not of the scan. The same cross-engine
  * accumulation contract as [[Checksum]] applies — `canonicalCols` must
  * render identically in every engine (integers, strings, exact cents;
  * never raw floats).
  */
object TableDiff {

  /** Per-group diff of two snapshots. `groupCols` name the grouping
    * columns (present in both frames); `canonicalCols` the engine-stable
    * string renderings fed to the checksum (see [[Checksum.canonical]]).
    * Returns (groupCols..., status, rows_before, rows_after) for
    * differing groups only; counts are 0 on the absent side.
    */
  def diff(before: DataFrame, after: DataFrame, groupCols: Seq[String],
      canonicalCols: Seq[Column]): DataFrame = {
    // Each side's summary is renamed apart BEFORE the join: `before` and
    // `after` commonly derive from the same base frame, and joining two
    // lineage-sharing plans on same-named attributes trips Spark's
    // ambiguous-self-join detection.
    def summarize(df: DataFrame, tag: String): DataFrame =
      Checksum.grouped(df, groupCols.map(col), canonicalCols)
        .select(groupCols.map(c => col(c).as(s"__${tag}_$c")) ++ Seq(
          col("n_rows").as(s"__${tag}_n"), col("checksum").as(s"__${tag}_ck")): _*)
    val b = summarize(before, "b")
    val a = summarize(after, "a")
    // Join on the group key null-safely (a null group value is a real
    // group, not a non-match) and keep the key from whichever side has it.
    val cond = groupCols.map(c => col(s"__b_$c") <=> col(s"__a_$c")).reduce(_ && _)
    val keyCols = groupCols.map(c => coalesce(col(s"__b_$c"), col(s"__a_$c")).as(c))
    b.join(a, cond, "full_outer")
      .select(keyCols ++ Seq(
        when(col("__b_ck").isNull, lit("added"))
          .when(col("__a_ck").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("__b_n"), lit(0L)).as("rows_before"),
        coalesce(col("__a_n"), lit(0L)).as("rows_after"),
        (col("__b_ck") <=> col("__a_ck")).as("__same")): _*)
      .filter(!col("__same"))
      .drop("__same")
  }
}
