package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming._

/** Degenerate-DATA fuzz over the streaming monitors — the drain-side
  * counterpart of [[DataFuzzSpec]] (which covers the batch operators):
  * NULL content through the digest path, all-duplicate batches, a single
  * hot key, zero-surviving-row micro-batches, ties, and k beyond the
  * population, asserting each monitor's documented contract (batch
  * parity, no throw, bounded output). Deterministic inputs throughout —
  * a failure reproduces exactly.
  *
  * Not re-covered here: replay/crash/retry chaos
  * ([[StreamingHardeningSpec]], StreamingDedupSpec's chaos case),
  * map-side-combine cap edge cases ([[StreamingCombineSpec]]), and the
  * watermark-expiry semantics of the session/join monitors
  * ([[StreamingSpec]] pins in-window vs expired behavior, which IS their
  * degenerate axis).
  */
class StreamingFuzzSpec extends SparkTestBase {

  private def toDocs(mem: MemoryStream[(Long, String)]) =
    mem.toDF().withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text")

  /** Start `df`, run `feed` (add data), process everything available,
    * stop; returns every emitted row.
    */
  private def drainRows(df: DataFrame)(feed: => Unit): Seq[org.apache.spark.sql.Row] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = df.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect()
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    try { feed; q.processAllAvailable() } finally q.stop()
    buf.synchronized { buf.toSeq }
  }

  test("dedup: NULL content flows the digest path as one null-digest group, matching batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[(Long, String)]
      val rows = Seq((9L, null: String), (5L, null: String), (3L, "y"))
      val got = drainRows(StreamingDedup.track(toDocs(mem), "doc_id", "text")) {
        mem.addData(rows: _*)
      }
      // sha2(NULL) is NULL: both null-text rows form ONE group keyed by
      // the null digest — the same single group a batch
      // GROUP BY sha2(text) produces — keeper min id 5, 2 copies.
      val view = got.map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(view(None) == ((5L, 2L)), s"null-digest group wrong: $view")
      assert(view.collect { case (Some(_), v) => v }.toSet == Set((3L, 1L)))
      // batch parity, bit for bit
      val batch = rows.toDF("doc_id", "text")
        .groupBy(sha2(col("text").cast("string"), 256).as("digest"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .collect().map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(view == batch, s"stream diverged from batch on NULLs: $view vs $batch")
    }
  }

  test("dedup: an all-duplicate batch collapses to one entry; keepFirst emits exactly one id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val dup = (1 to 200).map(i => (i.toLong, "same content"))
      val mem = MemoryStream[(Long, String)]
      val got = drainRows(StreamingDedup.track(toDocs(mem), "doc_id", "text")) {
        mem.addData(dup: _*)
      }
      assert(got.map(r => (r.getLong(1), r.getLong(2))) == Seq((1L, 200L)),
        s"all-dup batch must yield one (min id, 200) entry: $got")
      val mem2 = MemoryStream[(Long, String)]
      val gate = drainRows(StreamingDedup.keepFirst(toDocs(mem2), "doc_id", "text")) {
        mem2.addData(dup: _*)
      }
      assert(gate.map(_.getLong(1)) == Seq(1L),
        s"gate must pass exactly the one keeper: $gate")
    }
  }

  test("cms: a single hot key lands depth cells with the exact count; empty-surviving batch emits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[String]
      val stream = mem.toDF().withColumnRenamed("value", "k")
      val got = drainRows(StreamingCms.track(stream, "k", depth = 4, width = 64)) {
        mem.addData(Seq.fill(500)("hot"): _*)
      }
      // one hot key touches exactly `depth` cells, each carrying the
      // full count (CMS rows are independent hash rows). Output shape is
      // CmsCellOut(cms_row, cms_bucket, cnt) — the count is field 2.
      assert(got.size == 4, s"hot key must touch depth=4 cells: ${got.size}")
      assert(got.forall(_.getLong(2) == 500L), s"cell counts wrong: $got")
    }
  }

  test("heavy hitters: hot key + m smaller than distinct items stays bounded and keeps the hot item") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[(String, String)]
      val stream = mem.toDF()
        .withColumnRenamed("_1", "src").withColumnRenamed("_2", "item")
      // 300 occurrences of one item + 50 singletons, m=8 slots
      val rows = Seq.fill(300)(("s", "hot")) ++
        (1 to 50).map(i => ("s", s"cold$i"))
      val got = drainRows(StreamingHeavyHitters.track(
          stream, "src", "item", m = 8, minGuaranteed = 100L)) {
        mem.addData(rows: _*)
      }
      // SpaceSaving guarantee: est - err >= true_count - (n/m); the hot
      // item (300 of 350, n/m ≈ 44) must clear minGuaranteed=100
      val hot = got.filter(_.getString(1) == "hot")
      assert(hot.size == 1, s"hot item missing from summary: $got")
      val est = hot.head.getLong(2); val err = hot.head.getLong(3)
      assert(est >= 300L && est - err >= 100L, s"hot item bound broken: est=$est err=$err")
      // emission is bounded by the m-slot summary, never the item domain
      assert(got.size <= 8, s"emitted more than m entries: ${got.size}")
    }
  }

  test("hist-quantile: an all-NULL-value batch reaches the stateful op empty — no emission, no throw") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[(String, java.lang.Long)]
      val stream = mem.toDF()
        .withColumnRenamed("_1", "g").withColumnRenamed("_2", "v")
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      val q = StreamingHistQuantile.track(stream, "g", col("v"),
          lo = 0L, hi = 100L, buckets = 10)
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          buf.synchronized { buf ++= rows }
          ()
        }
        .start()
      try {
        // the NULL filter rides the micro-batch scan: the source batch is
        // non-empty but zero rows reach transformWithState
        mem.addData(("a", null: java.lang.Long), ("b", null: java.lang.Long))
        q.processAllAvailable()
        assert(buf.synchronized(buf.isEmpty), s"all-NULL batch emitted: $buf")
        // and the sketch still works afterwards: values clamp into range
        mem.addData(("a", java.lang.Long.valueOf(-5L)),   // clamps to bucket 0
          ("a", java.lang.Long.valueOf(1000L)))           // clamps to top bucket
        q.processAllAvailable()
      } finally q.stop()
      val out = buf.synchronized(buf.toSeq)
      assert(out.map(_._3).sum == 2L && out.forall(_._1 == "a"),
        s"clamped out-of-range values lost: $out")
    }
  }

  test("priority sample: zero/over-range weights drop, full ties are deterministic, k beyond population keeps all") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[(String, Long, Long)]
      val stream = mem.toDF().withColumnRenamed("_1", "src")
        .withColumnRenamed("_2", "id").withColumnRenamed("_3", "wt")
      val prio = graft.operators.Mixture.prioritized(stream, "id", col("wt"))
      val got = drainRows(StreamingSample.track(prio, "src", "id", k = 8)) {
        // 5 rows with IDENTICAL weights (priority ties broken by md5(id) —
        // pure data function), plus zero and over-int-range weights that
        // the prioritizer's documented [1, 2^31-1] gate must drop
        mem.addData(("s", 1L, 7L), ("s", 2L, 7L), ("s", 3L, 7L),
          ("s", 4L, 7L), ("s", 5L, 7L), ("s", 6L, 0L),
          ("s", 7L, Long.MaxValue))
      }
      val ids = got.map(_.getLong(1)).toSet
      assert(ids == Set(1L, 2L, 3L, 4L, 5L),
        s"k>n must keep all valid rows, weight gate must drop 6 and 7: $ids")
    }
  }

  test("anomaly: one hot key with constant values — unscored (NULL z), n_prev ramps to the ring size") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[(String, java.sql.Timestamp, Long, Long)]
      val stream = mem.toDF().withColumnRenamed("_1", "key0")
        .withColumnRenamed("_2", "ts").withColumnRenamed("_3", "tie")
        .withColumnRenamed("_4", "v")
      val pts = (1 to 10).map(i =>
        ("k", new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong, 42L))
      val got = drainRows(StreamingAnomaly.score(
          stream, "key0", "ts", "tie", col("v"), k = 4)) {
        mem.addData(pts: _*)
      }
      assert(got.size == 10, s"every point scores once: ${got.size}")
      val byTie = got.sortBy(_.getLong(2))
      // n_prev ramps 0,1,2,3 then saturates at the ring size k=4
      assert(byTie.map(_.getAs[Number]("n_prev").longValue()).toSeq ==
        Seq(0L, 1L, 2L, 3L, 4L, 4L, 4L, 4L, 4L, 4L), s"ring ramp wrong: $byTie")
      // a CONSTANT series never scores: std = 0 makes z undefined, and
      // the scorer emits NULL rather than 0/0 garbage (same contract as
      // the batch twin's rollingZScore — std > 0 guards the division).
      // The degenerate case must neither crash nor fabricate a score.
      byTie.foreach(r =>
        assert(r.isNullAt(r.fieldIndex("z")),
          s"zero-std history must leave the point unscored (NULL z): $r"))
    }
  }

  test("near-dedup: an all-identical batch pairs arrivals against earlier members only — no throw on empty text") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[(Long, String)]
      val text = "the quick brown fox jumps over the lazy dog again and again"
      val got = drainRows(StreamingNearDedup.candidatePairs(
          toDocs(mem), "doc_id", "text")) {
        // 4 identical docs + 2 empty-text docs in one batch
        mem.addData((1L, text), (2L, text), (3L, text), (4L, text),
          (10L, ""), (11L, ""))
      }
      val pairs = got.map(r => (r.getLong(0), r.getLong(1))).distinct
      // every pair is (arrival, earlier member): new_id > old_id under
      // within-batch id order, never self-paired
      pairs.foreach { case (n, o) =>
        assert(n != o, s"self pair: ($n,$o)")
      }
      // the 4 identical docs must candidate-pair as a clique (distinct
      // set semantics — the monitor's documented downstream dedup)
      val clique = pairs.filter { case (n, o) => n <= 4 && o <= 4 }
        .map { case (n, o) => (math.min(n, o), math.max(n, o)) }.toSet
      assert(clique == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
        (2L, 4L), (3L, 4L)), s"identical docs must form the clique: $clique")
      // empty-text docs shingle to nothing: they may pair with each other
      // (identical empty signatures) but never with real text
      assert(!pairs.exists { case (n, o) =>
        (n >= 10) != (o >= 10) }, s"empty text paired with text: $pairs")
    }
  }
}
