package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture / warehouse-maintenance operators: keyed upsert
  * (MERGE) and SCD type-2 history construction — the table-maintenance
  * surface engines with transactional formats get from MERGE INTO,
  * expressed as plain relational algebra over immutable parquet.
  *
  * No trace in the reference (its algebra has no DML at all,
  * /root/reference/src/planner/logicalplan.rs:207-273).
  */
object Cdc {

  /** Keyed upsert: rows of `updates` replace same-key rows of `base`;
    * unmatched update rows are inserts. Exactly MERGE INTO ... WHEN
    * MATCHED UPDATE / WHEN NOT MATCHED INSERT for whole-row updates.
    *
    * DUPLICATE-KEY CONTRACT: if `updates` holds several rows for one key,
    * ALL of them land in the output (the base row is removed once; every
    * update row is kept) — unlike SQL MERGE, which raises on multiple
    * matches. That is deliberate for append-flavored CDC feeds, but when
    * MERGE semantics are wanted, pass `strict = true`: duplicate update
    * keys then fail fast with a count, instead of silently multiplying
    * rows. (Strictness costs one extra aggregate over `updates` — tiny
    * next to the anti-join, but not free, hence opt-in.)
    *
    * Scale shape: ONE anti-join shuffle keyed on `keyCols` (ids+payload
    * on the base side) plus a shuffle-free union — no window, no global
    * sort. At 100 TB: bucket base and updates by the key to make the
    * anti-join exchange-free, or partition-overwrite only the partitions
    * the updates touch (updates are usually a tiny fraction of base).
    * Schemas must match (unionByName enforces).
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    if (strict) {
      val dups = updates.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
      require(dups == 0,
        s"upsert(strict): $dups update key(s) appear more than once " +
          "(SQL MERGE would raise); dedup the feed or drop strict")
    }
    base.join(updates.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_anti")
      .unionByName(updates)
  }

  /** SCD type-2 history: collapse an event stream to attribute-CHANGE
    * points and give each a validity interval [valid_from, valid_to),
    * open (null / is_current) for the latest. Consecutive equal values
    * merge into one interval — the classic dimension-history build.
    *
    * Scale shape: two stacked windows over the SAME (key, ts, tie)
    * partitioning-and-order — one shuffle total, both windows pipeline in
    * one WindowExec group; no self-join. Ties on ts are broken by
    * `tieCol` (must be unique within key) so history is deterministic.
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    // null-SAFE change detection: a plain =!= evaluates NULL against a
    // value as NULL and the filter would drop transitions into (or out
    // of) a null attribute, silently erasing those history periods. With
    // <=>, the first row (prev = null marker via lag over no row) is a
    // change unless the attribute itself is null-equal, and null periods
    // become intervals of their own.
    val changes = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col(attrCol) <=> col("__prev")))
      .drop("__prev", "__first")
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
