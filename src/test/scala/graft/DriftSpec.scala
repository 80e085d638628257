package graft

import org.apache.spark.sql.functions._
import graft.operators.Drift

/** PSI drift-detector laws: per-bucket terms are non-negative (each is
  * (p−q)·ln(p/q), same sign both factors), identical slices score ~0,
  * and a planted shift scores far above a same-distribution split.
  */
class DriftSpec extends SparkTestBase {

  import spark.implicits._

  private def psiTotal(rows: Seq[(Long, Long, Long, Long)]): Double =
    rows.map(_._4).sum / 1e6

  private def run(df: org.apache.spark.sql.DataFrame,
      ref: org.apache.spark.sql.Column): Seq[(Long, Long, Long, Long)] =
    Drift.psi(df, col("v"), ref, lo = 0L, hi = 1024L, buckets = 16)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("every PSI term is non-negative; full spine emitted") {
    val df = (1L to 400L).map(i => (i, i % 1024)).toDF("id", "v")
    val rows = run(df, col("id") % 2 === 0)
    assert(rows.length == 16, "full bucket spine expected")
    rows.foreach { case (b, _, _, tm) =>
      assert(tm >= 0L, s"bucket $b term $tm negative — (p-q)ln(p/q) law broken")
    }
  }

  test("identical-distribution split scores ~0; a planted shift scores large") {
    // same distribution both slices: interleaved ids over the same values
    val same = (1L to 800L).map(i => (i, (i / 2) % 1024)).toDF("id", "v")
    val psiSame = psiTotal(run(same, col("id") % 2 === 0))
    // planted shift: ref concentrated low, current concentrated high
    val shifted = ((1L to 400L).map(i => (i, i % 200)) ++
      (401L to 800L).map(i => (i, 700 + i % 200))).toDF("id", "v")
    val psiShift = psiTotal(run(shifted, col("id") <= 400L))
    assert(psiSame < 0.05, s"same-distribution PSI should be ~0, got $psiSame")
    assert(psiShift > 0.25, s"planted shift should trip the action threshold, got $psiShift")
    assert(psiShift > psiSame * 10)
  }

  test("NULL values are excluded; counts conserve the non-null corpus") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(900L)), (4L, Some(20L)))
      .toDF("id", "v")
    val rows = run(df, col("id") % 2 === 1)
    assert(rows.map(_._2).sum == 2L && rows.map(_._3).sum == 1L,
      "non-null rows must land in exactly one slice each")
  }

  test("JS divergence: symmetric, bounded by ln 2, ~0 on identical split, shift detected") {
    def runJs(df: org.apache.spark.sql.DataFrame,
        ref: org.apache.spark.sql.Column): Seq[(Long, Long)] =
      Drift.js(df, col("v"), ref, lo = 0L, hi = 1024L, buckets = 16)
        .orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSeq
    val same = (1L to 800L).map(i => (i, (i / 2) % 1024)).toDF("id", "v")
    val jsSame = runJs(same, col("id") % 2 === 0).map(_._2).sum / 1e6
    assert(jsSame < 0.01, s"same-distribution JSD should be ~0, got $jsSame")
    val shifted = ((1L to 400L).map(i => (i, i % 200)) ++
      (401L to 800L).map(i => (i, 700 + i % 200))).toDF("id", "v")
    val fwd = runJs(shifted, col("id") <= 400L)
    val rev = runJs(shifted, col("id") > 400L)
    // symmetry holds PER BUCKET: term(p, q) == term(q, p)
    assert(fwd == rev, "JSD must be symmetric in the two slices")
    val jsShift = fwd.map(_._2).sum / 1e6
    assert(jsShift <= math.log(2.0) + 1e-6,
      s"JSD exceeded its ln 2 bound: $jsShift")
    assert(jsShift > 0.3 && jsShift > jsSame * 10,
      s"planted shift under-detected: $jsShift vs $jsSame")
    // every term non-negative (each KL summand is p·ln(p/m) with m a
    // mixture — Gibbs' inequality per bucket pair)
    fwd.foreach { case (b, tm) => assert(tm >= 0L, s"bucket $b term $tm < 0") }
  }

  test("frozen PSI reference artifact == a live recompute of the src0 sketch") {
    // the streaming drift panel reads its reference from the stored
    // artifact; freezing must not change a single bucket count. Clear
    // ALL psiref caches first so the one inspected is unambiguously this
    // sf's (other sfDirs' caches share the prefix) — also exercises the
    // cold rebuild.
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    def refCaches() = tmp.listFiles()
      .filter(_.getName.startsWith("graft_psiref_cache_"))
    refCaches().foreach { c =>
      val p = new org.apache.hadoop.fs.Path(c.getAbsolutePath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true): Unit
    }
    SparkEntry.queries("q_stream_drift")(spark, sf).collect(): Unit
    val caches = refCaches()
    assert(caches.length == 1,
      s"expected exactly the cold-rebuilt reference, found ${caches.length}")
    val stored = spark.read.parquet(caches.head.getAbsolutePath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val live = graft.operators.HistQuantile.sketchBy(
        Tables.t(spark, sf, "documents").filter(col("source") === "src0"),
        Nil, col("n_chars"), lo = 0L, hi = 1024L, buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == live, "frozen reference drifted from the live sketch")
  }

  test("q_psi_drift_from_ref (stored reference) == q_psi_drift (live recompute)") {
    // registry parity for the batch drift check: reading the frozen
    // reference must reproduce the live-recompute query bucket-for-bucket
    val live = SparkEntry.queries("q_psi_drift")(spark, sf)
      .collect().map(_.toString).toSeq
    val fromRef = SparkEntry.queries("q_psi_drift_from_ref")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(fromRef == live, "from-ref drift diverged from the live recompute")
  }

  test("q_drift_panel: every (source, feature) slice == the single-feature operator run on that slice alone") {
    val docs = Tables.t(spark, sf, "documents")
    val panel = SparkEntry.queries("q_drift_panel")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val sources = docs.filter(col("source") =!= "src0")
      .select("source").distinct().collect().map(_.getString(0))
    assert(panel.size == sources.length * 3 * 16, "panel spine incomplete")
    // per (source, feature): restrict the corpus to src0 + that source
    // and run the single-metric operators — the panel row must match
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val featVals = Seq(
      ("n_chars", col("n_chars"), 1024L),
      ("quality", floor(graft.operators.TextAnalysis
        .qualityScoreRaw(col("text"), toks) * lit(1e6)).cast("long"), 1000000L),
      ("tok_est", graft.operators.TextAnalysis.tokenEstimate(col("text"))
        .cast("long"), 256L))
    for (src <- sources; (fname, fval, hi) <- featVals) {
      val slice = docs.filter(col("source") === "src0" || col("source") === src)
      val psi = graft.operators.Drift.psi(slice, fval,
          col("source") === "src0", lo = 0L, hi = hi, buckets = 16)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val js = graft.operators.Drift.js(slice, fval,
          col("source") === "src0", lo = 0L, hi = hi, buckets = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      (0L until 16L).foreach { b =>
        val (cr, cc, pm, jm) = panel((src, fname, b))
        val (ecr, ecc, epm) = psi(b)
        assert((cr, cc, pm) == ((ecr, ecc, epm)),
          s"panel PSI row ($src, $fname, $b) drifted from the single-feature run")
        assert(jm == js(b),
          s"panel JS row ($src, $fname, $b) drifted from the single-feature run")
      }
    }
  }
}
