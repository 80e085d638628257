package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Descending, SortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Two-phase global row numbering — the scale-safe replacement for an
  * unpartitioned `Window.orderBy(...)`, which serializes the entire dataset
  * through one task (Spark's "No Partition Defined for Window operation"
  * warning; fine at test SF, fatal at 100 TB).
  *
  * Phase 1 range-chunks the data on approximate quantile cutpoints of the
  * leading sort column (cut accuracy affects only load balance, never
  * correctness: any monotone bucketing preserves the global order between
  * chunks, and rows equal on the cutpoint land in the same chunk). Phase 2
  * ranks within each chunk in parallel, then adds broadcast per-chunk
  * offsets — cumulated over the tiny (≤ chunks rows) count frame with a
  * triangular self-join, not another unpartitioned window.
  *
  * Cost note: the chunked input is consumed twice (per-chunk weights +
  * the ranking window), i.e. two passes over the source — the inherent
  * price of a two-phase global rank. Callers ranking an expensive
  * upstream subtree should persist it first; the scan-twice form is the
  * right default for columnar sources.
  *
  * The reference has no window operator at all (its whole plan algebra is
  * /root/reference/src/planner/logicalplan.rs:207-273); this is the
  * north-star analytic surface done the way a 1000-executor cluster
  * needs it.
  */
object GlobalRank {

  /** Internal temp columns the rank builders add to (and drop from) the
    * INPUT frame. `withColumn` silently REPLACES an existing column, so an
    * input already carrying one of these names would be overwritten and
    * then dropped from the output instead of failing loudly — every public
    * entry point here rejects such inputs, and wrappers embedding
    * GlobalRank behind their own reserved-name check (e.g.
    * `Mixture.shuffleShard`) fold this set into theirs.
    */
  val ReservedInternalColumns: Set[String] =
    Set("__cuts", "__chunk", "__lrn", "__lcum", "__c2", "__off",
      "__base", "__rem", "__big", "__cutoff")

  private def requireNoReserved(df: DataFrame): Unit = {
    val clash = df.columns.toSet.intersect(ReservedInternalColumns)
    require(clash.isEmpty, "GlobalRank reserves internal column names; " +
      s"input already has: ${clash.toSeq.sorted.mkString(", ")}")
  }

  /** The same silent-overwrite hazard applies to the OUTPUT columns each
    * public entry point adds (`rn`/`n_total`, the caller's bucket/cum
    * name): `withColumn` would replace an existing column of that name
    * and the caller's data would vanish without an error. Every public
    * entry point rejects such inputs up front (r14 advice — the
    * __-prefixed guard alone left this half of the failure mode open).
    */
  private def requireNoOutputClash(df: DataFrame, out: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(out.toSet)
    require(clash.isEmpty, "GlobalRank would silently overwrite existing " +
      s"column(s): ${clash.toSeq.sorted.mkString(", ")} — rename them or " +
      "pick a different output column name")
  }

  /** Adds `__chunk`, a monotone range-bucket of `rangeCol`: rows in chunk
    * i sort entirely before chunk i+1, and equal values share a chunk.
    * Cutpoints are approximate quantiles — accuracy is a load-balance
    * knob only.
    */
  private def chunkByRange(df: DataFrame, rangeCol: Column,
      chunks: Int): DataFrame = {
    requireNoReserved(df) // single choke point: all three builders chunk first
    require(chunks > 1, s"need at least 2 chunks, got $chunks")
    val probs = array((1 until chunks).map(i => lit(i.toDouble / chunks)): _*)
    val cuts = df.agg(
      percentile_approx(rangeCol, probs, lit(10000)).as("__cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn("__chunk", aggregate(col("__cuts"), lit(0),
        (acc, c) => acc + when(rangeCol > c, 1).otherwise(0)))
      .drop("__cuts")
  }

  /** Exclusive prefix sums of a per-chunk weight frame (__c, __cnt) →
    * (__c2, __off), via a bounded triangular self-join — O(chunks²) rows
    * of two longs, no unpartitioned window, no driver round-trip. For a
    * descending global order the accumulation runs from the TOP chunk
    * down (chunk i+1 sorts before chunk i), mirrored by flipping the
    * triangular condition.
    */
  private def exclusiveOffsets(perChunk: DataFrame,
      descending: Boolean): DataFrame = {
    val tri = if (descending) col("b.__c") >= col("a.__c")
              else col("b.__c") <= col("a.__c")
    perChunk.as("a")
      .join(perChunk.as("b"), tri)
      .groupBy(col("a.__c").as("__c2"), col("a.__cnt").as("__acnt"))
      .agg(sum(col("b.__cnt")).as("__cum"))
      .select(col("__c2"), (col("__cum") - col("__acnt")).as("__off"))
  }

  /** The caller's global order direction, taken from the LEADING sort
    * expression: chunk offsets must accumulate in the same direction the
    * per-chunk window ranks, or every chunk boundary silently shifts the
    * global numbers. A plain Column means ascending (Spark's own
    * `Window.orderBy` convention).
    */
  private def leadingDescending(order: Seq[Column]): Boolean = {
    require(order.nonEmpty, "order must name at least one sort column")
    // two construction paths for a descending Column: the public
    // `col.desc` (a ColumnNode SortOrder, read via the shim) and a raw
    // Catalyst SortOrder surfaced through ColumnBridge.column
    org.apache.spark.sql.graft.SortOrderBridge.isDescending(order.head) ||
      (ColumnBridge.expression(order.head) match {
        case so: SortOrder => so.direction == Descending
        case _             => false
      })
  }

  /** Adds `rn` (1-based global row number under `order`) and `n_total`
    * (total row count) to `df`.
    *
    * @param rangeCol leading sort column (a plain value Column, no
    *                 .asc/.desc), used for range chunking
    * @param order    full sort order; must be a total order (include a
    *                 unique tie-break) for `rn` to be deterministic, and
    *                 its LEADING element must sort `rangeCol` — ascending
    *                 (plain Column / .asc) or descending (.desc) both
    *                 work: the chunk-offset accumulation follows the
    *                 leading direction
    * @param chunks   parallelism of the ranking phase
    */
  def withRowNumber(df: DataFrame, rangeCol: Column, order: Seq[Column],
      chunks: Int = 64): DataFrame = {
    requireNoOutputClash(df, Seq("rn", "n_total"))
    val chunked = chunkByRange(df, rangeCol, chunks)
    val counts = chunked.groupBy(col("__chunk").as("__c"))
      .agg(count(lit(1)).as("__cnt"))
    val offs = exclusiveOffsets(counts, leadingDescending(order))
    val total = counts.agg(sum(col("__cnt")).cast("long").as("n_total"))
    val w = Window.partitionBy(col("__chunk")).orderBy(order: _*)
    chunked
      .withColumn("__lrn", row_number().over(w))
      .join(broadcast(offs), col("__chunk") === col("__c2"))
      .crossJoin(broadcast(total))
      .withColumn("rn", (col("__off") + col("__lrn")).cast("long"))
      .drop("__chunk", "__lrn", "__c2", "__off")
  }

  /** Adds `bucketCol` — exact global NTILE(k) under `order` (larger
    * buckets first, the SQL standard's distribution) — plus the `rn` /
    * `n_total` columns, all through [[withRowNumber]]'s two-phase rank:
    * no single-partition window anywhere. Closed form: the first
    * n_total%k buckets hold (n_total div k)+1 rows; the `div 0` in the
    * dead branch is SQL-null, never hit (base == 0 implies cutoff == n
    * so the first branch always matches).
    */
  def withNtile(df: DataFrame, rangeCol: Column, order: Seq[Column], k: Int,
      bucketCol: String = "bucket", chunks: Int = 64): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    require(!Set("rn", "n_total").contains(bucketCol) &&
      !ReservedInternalColumns.contains(bucketCol),
      s"bucket column name '$bucketCol' collides with a GlobalRank output/internal column")
    requireNoOutputClash(df, Seq(bucketCol)) // rn/n_total checked below
    withRowNumber(df, rangeCol, order, chunks)
      .withColumn("__base", expr(s"n_total div $k"))
      .withColumn("__rem", col("n_total") % k)
      .withColumn("__big", col("__base") + 1)
      .withColumn("__cutoff", col("__rem") * col("__big"))
      .withColumn(bucketCol,
        when(col("rn") <= col("__cutoff"), expr("(rn + __big - 1) div __big"))
          .otherwise(col("__rem") + expr("(rn - __cutoff + __base - 1) div __base")))
      .withColumn(bucketCol, col(bucketCol).cast("long"))
      .drop("__base", "__rem", "__big", "__cutoff")
  }

  /** Adds `cumCol` — the INCLUSIVE global running sum of `size` under
    * `order` — without an unpartitioned window: local per-chunk cumsum
    * plus broadcast per-chunk totals. Same contract as [[withRowNumber]]
    * (`order` must be total, its leading element sorting `rangeCol` in
    * either direction; offsets follow the leading direction).
    */
  def withRunningSum(df: DataFrame, rangeCol: Column, order: Seq[Column],
      size: Column, cumCol: String = "cum", chunks: Int = 64): DataFrame = {
    // mirror withNtile's bucketCol guard: a cumCol named like an internal
    // temp would be written and then silently dropped by the trailing drop
    require(!ReservedInternalColumns.contains(cumCol),
      s"cum column name '$cumCol' collides with a GlobalRank internal column")
    requireNoOutputClash(df, Seq(cumCol))
    val chunked = chunkByRange(df, rangeCol, chunks)
    val sums = chunked.groupBy(col("__chunk").as("__c"))
      .agg(sum(size).cast("long").as("__cnt"))
    val offs = exclusiveOffsets(sums, leadingDescending(order))
    val w = Window.partitionBy(col("__chunk")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked
      .withColumn("__lcum", sum(size).over(w))
      .join(broadcast(offs), col("__chunk") === col("__c2"))
      .withColumn(cumCol, (col("__off") + col("__lcum")).cast("long"))
      .drop("__chunk", "__lcum", "__c2", "__off")
  }
}
