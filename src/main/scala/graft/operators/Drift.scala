package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two slices of one corpus — the
  * check every long-lived ingest pipeline runs before a new crawl batch
  * is allowed to shift the training mixture. Population Stability Index
  * (the standard credit-scoring drift metric; PSI < 0.1 stable, > 0.25
  * action): PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over histogram buckets,
  * with Laplace(+1) smoothing so empty buckets stay defined.
  *
  * Scale shape: ONE pass — values land in [[HistQuantile.bucketOf]]'s
  * exact integer equi-width buckets and both slices' counts come from a
  * single partial-aggregable conditional-sum groupBy (B buckets total,
  * never the corpus); totals are one broadcast scalar row; the only
  * floating step is one ln per BUCKET from rational inputs,
  * micro-quantized per bucket before any cross-bucket sum (the
  * q_kmeans_step discipline), so the per-bucket table is cross-engine
  * exact and PSI = Σ term_micro / 1e6.
  */
object Drift {

  /** Per-bucket PSI table of `value` between the `isRef` slice and the
    * rest: (bucket, cnt_ref, cnt_cur, term_micro), one row per bucket
    * (the full spine — missing buckets appear with zero counts). NULL
    * values are excluded from both slices, like [[HistQuantile.sketchBy]].
    */
  def psi(df: DataFrame, value: Column, isRef: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame =
    psiTerms(spineCounts(df, value, isRef, lo, hi, buckets), Nil, buckets)

  /** The PSI arithmetic alone, over a PRE-COUNTED complete-spine table
    * `(groupCols..., bucket, cnt_ref, cnt_cur)` — for callers whose
    * counts come from elsewhere (a drained streaming sketch vs a batch
    * reference, per-source panels). Totals are one bounded aggregate per
    * group, broadcast back; output appends `term_micro` per row.
    */
  def psiTerms(full: DataFrame, groupCols: Seq[String], buckets: Int): DataFrame =
    terms(full, groupCols, buckets) { (p, q) => (p - q) * log(p / q) }

  /** Jensen-Shannon per-bucket terms over the SAME Laplace-smoothed
    * bucket table as [[psiTerms]]: term_b = (p·ln(p/m) + q·ln(q/m)) / 2
    * with m = (p + q) / 2. JSD = Σ term_micro / 1e6 — symmetric in the
    * two slices, bounded [0, ln 2] (so thresholds transfer across
    * corpora, unlike PSI's unbounded tail), 0 iff the smoothed
    * distributions coincide. Laplace(+1) keeps every p, q > 0, so the
    * logs are total; same one-ln-per-BUCKET micro-quantization.
    */
  def jsTerms(full: DataFrame, groupCols: Seq[String], buckets: Int): DataFrame =
    terms(full, groupCols, buckets) { (p, q) =>
      val m = (p + q) / lit(2.0)
      (p * log(p / m) + q * log(q / m)) * lit(0.5)
    }

  /** [[psi]]'s one-pass bucket/spine plumbing with the JS term. */
  def js(df: DataFrame, value: Column, isRef: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame =
    jsTerms(spineCounts(df, value, isRef, lo, hi, buckets), Nil, buckets)

  /** PSI and JS terms side by side over ONE pre-counted spine table —
    * the multi-metric drift PANEL row shape (`q_drift_panel`): the
    * counts (the only corpus-proportional input) are computed once and
    * both metrics are per-row arithmetic on them, so a second metric
    * costs zero extra scans. Output appends `psi_term_micro` and
    * `js_term_micro`; each column equals its single-metric twin's
    * ([[psiTerms]]/[[jsTerms]]) exactly (DriftSpec pins it).
    */
  def psiJsTerms(full: DataFrame, groupCols: Seq[String], buckets: Int): DataFrame =
    termsMulti(full, groupCols, buckets)(Seq(
      "psi_term_micro" -> ((p, q) => (p - q) * log(p / q)),
      "js_term_micro" -> { (p, q) =>
        val m = (p + q) / lit(2.0)
        (p * log(p / m) + q * log(q / m)) * lit(0.5)
      }))

  /** Shared term machinery: smoothed slice probabilities per bucket,
    * metric-specific `term(p, q)` micro-quantized per row.
    */
  private def terms(full: DataFrame, groupCols: Seq[String], buckets: Int)(
      term: (Column, Column) => Column): DataFrame =
    termsMulti(full, groupCols, buckets)(Seq("term_micro" -> term))

  private def termsMulti(full: DataFrame, groupCols: Seq[String], buckets: Int)(
      ts: Seq[(String, (Column, Column) => Column)]): DataFrame = {
    val gcols = groupCols.map(col)
    val tot = full.groupBy(gcols: _*)
      .agg(sum("cnt_ref").as("nr"), sum("cnt_cur").as("nc"))
    val joined =
      if (groupCols.isEmpty) full.crossJoin(broadcast(tot))
      else full.join(broadcast(tot), groupCols)
    val p = (col("cnt_ref") + lit(1L)).cast("double") /
      (col("nr") + lit(buckets.toLong)).cast("double")
    val q = (col("cnt_cur") + lit(1L)).cast("double") /
      (col("nc") + lit(buckets.toLong)).cast("double")
    joined.select(gcols ++ Seq(col("bucket"), col("cnt_ref"), col("cnt_cur")) ++
      ts.map { case (name, term) =>
        round(term(p, q) * lit(1e6), 0).cast("long").as(name)
      }: _*)
  }

  private def spineCounts(df: DataFrame, value: Column, isRef: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    HistQuantile.checkRange(lo, hi, buckets)
    val counts = df.filter(value.isNotNull)
      .select(HistQuantile.bucketOf(value, lo, hi, buckets).as("bucket"),
        isRef.cast("boolean").as("r"))
      .groupBy("bucket")
      .agg(sum(when(col("r"), 1L).otherwise(0L)).as("cnt_ref"),
        sum(when(col("r"), 0L).otherwise(1L)).as("cnt_cur"))
    val spine = df.sparkSession.range(buckets).select(col("id").as("bucket"))
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
        coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
  }
}
