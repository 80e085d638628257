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

  private def measureCols(cols: Seq[String], exact: Boolean): Seq[Column] =
    count(lit(1)).as("__n") +: cols.flatMap { n =>
      val c = col(n)
      Seq(
        count(c).as(s"__nn_$n"),
        (if (exact) count_distinct(c) else approx_count_distinct(c))
          .as(s"__nd_$n"),
        min(c).cast("string").as(s"__min_$n"),
        max(c).cast("string").as(s"__max_$n"),
        sum(length(c.cast("string"))).cast("long").as(s"__len_$n"))
    }

  private def perColStructs(cols: Seq[String]): Column = array(cols.map(n =>
    struct(
      lit(n).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$n")).as("n_nulls"),
      col(s"__nd_$n").as("n_distinct"),
      col(s"__min_$n").as("min_str"),
      col(s"__max_$n").as("max_str"),
      coalesce(col(s"__len_$n"), lit(0L)).as("len_sum"))): _*)

  /** Profile `cols` of `df` in one scan. Returns one row per column:
    * (col_name, n_rows, n_nulls, n_distinct, min_str, max_str, len_sum)
    * where len_sum = total rendered length of non-null values.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val measures = measureCols(cols, exact)
    val one = df.agg(measures.head, measures.tail: _*)
    one.select(explode(perColStructs(cols)).as("p")).select(col("p.*"))
  }

  /** Per-GROUP profile — the per-partition report card ("how does
    * yesterday's web shard compare to books?"): same single-scan
    * measures as [[profile]], grouped by `groupCols`; output is one row
    * per (group, column). The per-group explode multiplies only the
    * GROUP-count rows, never the data. The same exact/approx trade as
    * [[profile]] applies: the default `exact = true` plans an Expand
    * (input replicated once per count-distinct column) — at a 100 TB
    * per-shard profile pass `exact = false` for the single-pass HLL++
    * aggregate with no Expand.
    */
  def profileBy(df: DataFrame, groupCols: Seq[String], cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    val measures = measureCols(cols, exact)
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(measures.head, measures.tail: _*)
    g.select(groupCols.map(col) :+ explode(perColStructs(cols)).as("p"): _*)
      .select(groupCols.map(col) :+ col("p.*"): _*)
  }

  /** Pairwise Pearson correlation matrix over integer-quantized columns,
    * from ONE scan: a single partial-aggregable aggregate folds every
    * row into n + 2k per-column sums + k(k−1)/2 cross sums (all exact
    * decimal(38,0) — order-independent at any parallelism), and the
    * closed form is evaluated in doubles from those exact sums — the
    * [[Trend]] determinism recipe, so the correlations themselves are
    * engine-stable. Zero-variance columns yield NULL (never ±inf/NaN).
    *
    * `cols` = (name, integer-valued column) — the caller quantizes
    * (cents, micros), which is what makes the sums exact. Output: one
    * row per unordered pair (col_a < col_b): (col_a, col_b, n, corr).
    */
  def correlations(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "correlations needs at least 2 columns")
    val names = cols.map(_._1)
    val quant = df.select(cols.map { case (n, c) =>
      c.cast("decimal(38,0)").as(s"__q_$n") }: _*)
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    val measures: Seq[Column] =
      count(lit(1)).as("__n") +:
      (names.flatMap(n => Seq(
        sum(col(s"__q_$n")).as(s"__s_$n"),
        sum(col(s"__q_$n") * col(s"__q_$n")).as(s"__ss_$n"))) ++
       pairs.map { case (a, b) =>
         sum(col(s"__q_$a") * col(s"__q_$b")).as(s"__sp_${a}__$b") })
    val one = quant.agg(measures.head, measures.tail: _*)
    val n = col("__n").cast("double")
    def varTerm(c: String): Column =
      n * col(s"__ss_$c").cast("double") -
        col(s"__s_$c").cast("double") * col(s"__s_$c").cast("double")
    val perPair = array(pairs.map { case (a, b) =>
      val cov = n * col(s"__sp_${a}__$b").cast("double") -
        col(s"__s_$a").cast("double") * col(s"__s_$b").cast("double")
      val den = sqrt(varTerm(a)) * sqrt(varTerm(b))
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("__n").as("n"),
        when(den > 0.0, cov / den).as("corr"))
    }: _*)
    one.select(explode(perPair).as("p")).select(col("p.*"))
  }
}
