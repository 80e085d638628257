package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.{StateScope, StreamingDedup}

/** Streaming exact-dedup monitor: the maintained (digest → keep_id,
  * n_copies) table equals the batch `Dedup.exact` of everything seen
  * REGARDLESS of batching and arrival order — min and sum are
  * associative+commutative, the CMS-style linearity argument. Later
  * batches emit only TOUCHED digests (per-batch work bounded by the
  * batch, not the corpus).
  */
class StreamingDedupSpec extends SparkTestBase {

  /** (id, text) rows with planted duplicate content across the id range. */
  private def corpus(n: Int): Seq[(Long, String)] =
    (1 to n).map(i => (i.toLong, s"doc content ${i % 7}"))

  private def toDocs(mem: MemoryStream[(Long, String)]) =
    mem.toDF().withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text")

  test("multi-batch adversarial-order drain equals the batch dedup table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      // descending ids across three slices: every batch sees ids out of
      // order and each digest's true keeper (its min id) arrives LAST
      val rows = corpus(60).sortBy(-_._1)
      val Seq(s1, s2, s3) = rows.grouped(20).toSeq
      val mem = MemoryStream[(Long, String)]
      @volatile var view = Map.empty[String, (Long, Long)]
      val q = StreamingDedup.track(toDocs(mem), "doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          // each batch re-emits only its TOUCHED digests — overlay them
          bdf.collect().foreach(r =>
            view += r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        }
        .start()
      try {
        mem.addData(s1: _*); q.processAllAvailable()
        mem.addData(s2: _*); q.processAllAvailable()
        mem.addData(s3: _*); q.processAllAvailable()
      } finally q.stop()
      val batchDf = corpus(60).toDF("doc_id", "text")
      val batch = batchDf
        .groupBy(sha2(col("text"), 256).as("digest"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(view == batch,
        s"stream view diverged from batch dedup:\n  stream=$view\n  batch=$batch")
      // and the (keep_id, n_copies) projection matches Dedup.exact's shape
      val exact = Dedup.exact(batchDf, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(view.values.map(v => (v._1, v._2)).toSet == exact)
    }
  }

  test("dedup state survives a checkpointed stop/restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sdedup-ckpt").toString
      val mem = MemoryStream[(Long, String)]
      // memory sink cannot resume from a checkpoint; collect emissions
      // per batch via foreachBatch (batch ids continue across restarts)
      val emitted = new scala.collection.concurrent.TrieMap[
        (Long, String), (Long, Long)]()
      def start() = StreamingDedup.track(toDocs(mem), "doc_id", "text")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.collect().foreach(r =>
            emitted((id, r.getString(0))) = (r.getLong(1), r.getLong(2)))
        }
        .start()
      val q1 = start()
      try {
        mem.addData((5L, "x"), (9L, "x"), (3L, "y"))
        q1.processAllAvailable()
      } finally q1.stop()
      // second generation resumes from the RocksDB checkpoint: x's entry
      // must CONTINUE from (keep 5, copies 2) — the late smaller id takes
      // over as keeper and the count reaches 3, not restart at 1
      val q2 = start()
      try {
        mem.addData((1L, "x"), (7L, "z"))
        q2.processAllAvailable()
        val lastBatch = emitted.keys.map(_._1).max
        val last = emitted.collect {
          case ((b, dig), v) if b == lastBatch => dig -> v
        }
        assert(last.values.toSet == Set((1L, 3L), (7L, 1L)),
          s"state lost across restart: $last")
      } finally q2.stop()
    }
  }

  test("keepFirst: the ingest gate passes exactly the incremental keep set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[(Long, String)]
      val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = graft.streaming.StreamingDedup.keepFirst(
          toDocs(mem), "doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = bdf.collect().map(_.getLong(1)).toSet
          perBatch.synchronized { perBatch += ids }
          ()
        }
        .start()
      try {
        // batch 1: three contents; min id wins within the batch
        mem.addData((9L, "x"), (5L, "x"), (3L, "y"), (4L, "z"))
        q.processAllAvailable()
        // batch 2: dup of x (even with a SMALLER id — the decision is
        // final), dup of z, and one genuinely new content
        mem.addData((1L, "x"), (8L, "z"), (7L, "w"))
        q.processAllAvailable()
        // batch 3: nothing new at all → zero emissions
        mem.addData((20L, "x"), (21L, "y"))
        q.processAllAvailable()
      } finally q.stop()
      val got = perBatch.synchronized { perBatch.filter(_.nonEmpty).toSeq }
      assert(got == Seq(Set(5L, 3L, 4L), Set(7L)),
        s"gate decisions diverged: $got")
      // batch 2's keep set equals the batch exactIncremental anti-join of
      // the same slice against the already-ingested corpus
      val incr = Dedup.exactIncremental(
          Seq((1L, "x"), (8L, "z"), (7L, "w")).toDF("doc_id", "text"),
          Seq((9L, "x"), (5L, "x"), (3L, "y"), (4L, "z")).toDF("doc_id", "text"),
          "text", "doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(incr == Set(7L))
    }
  }

  test("chaos: first-attempt failures through the pre-combine stage leave the table exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val rows = corpus(40)
      val mem = MemoryStream[(Long, String)]
      @volatile var view = Map.empty[String, (Long, Long)]
      // inject the failure UPSTREAM of track's mapPartitions pre-combine:
      // the ops fuse into one stage, so the retry re-runs the combine —
      // deltas must come only from the surviving attempt (no double
      // count). SparkTestBase runs local[4,2] (task maxFailures 2).
      val flakyDocs = toDocs(mem).as[(Long, String)].mapPartitions { it =>
        if (org.apache.spark.TaskContext.get().attemptNumber() == 0)
          throw new RuntimeException("injected first-attempt failure")
        it
      }.toDF("doc_id", "text")
      val q = graft.streaming.StreamingDedup.track(flakyDocs, "doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          bdf.collect().foreach(r =>
            view += r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        }
        .start()
      try {
        mem.addData(rows: _*)
        q.processAllAvailable()
      } finally q.stop()
      val batch = rows.toDF("doc_id", "text")
        .groupBy(sha2(col("text"), 256).as("digest"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(view == batch,
        s"retry corrupted the table:\n  stream=$view\n  batch=$batch")
    }
  }

  test("TTL horizon: an expired digest reads as never-seen; a live one still dedups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val ttl = org.apache.spark.sql.streaming.TTLConfig(
        java.time.Duration.ofSeconds(8))
      // TTL forces TimeMode.ProcessingTime, where the engine keeps
      // cycling micro-batches so TTL/timers can fire — neither
      // processAllAvailable nor Trigger.AvailableNow ever settles
      // (measured: ~800 self-triggered batches on a 1-row stream before
      // this test was restructured). So: ONE long-lived query on an
      // interval ProcessingTime trigger (the production shape for a
      // TTL'd monitor), observations by POLLING the collected emissions.
      // TTL expiry is evaluated against each batch's processing
      // timestamp; the wall-clock sleep is what expires the entry.
      val mem = MemoryStream[(Long, String)]
      val emitted =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val q = StreamingDedup.track(toDocs(mem), "doc_id", "text", ttl)
        .writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("500 milliseconds"))
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          bdf.collect().foreach(r => emitted.add((r.getLong(1), r.getLong(2))))
        }
        .start()
      def awaitEmit(want: (Long, Long)): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (!emitted.contains(want)) {
          if (System.nanoTime() > deadline)
            fail(s"timed out waiting for emission $want; saw: " +
              s"${emitted.toArray.toSeq}")
          Thread.sleep(100)
        }
      }
      try {
        // first sight: the table starts the entry at (keeper 5, 1 copy)
        mem.addData((5L, "x")); awaitEmit((5L, 1L))
        // inside the TTL: a live duplicate — same keeper, count grows
        // (and the update RESETS the entry's TTL clock). The TTL must
        // comfortably exceed per-batch latency (~1-2 s of RocksDB commit
        // on a loaded box) or this arrival lands after expiry — the
        // first cut used 1.5 s and flaked exactly that way.
        mem.addData((6L, "x")); awaitEmit((5L, 2L))
        // past the horizon: the entry expired, so the next arrival reads
        // as never-seen and RESTARTS the entry — dedup-within-horizon,
        // exactly the production control StreamingDedup's doc promises.
        // (Without TTL this would emit (5, 3).) Generous sleep vs the
        // 8 s TTL keeps the wall-clock dependence deterministic.
        Thread.sleep(20000)
        mem.addData((7L, "x")); awaitEmit((7L, 1L))
        assert(!emitted.contains((5L, 3L)),
          "expired entry continued instead of restarting")
      } finally q.stop()
    }
  }

  test("compaction handoff: drained state → static digest table → batch exactIncremental, bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      // ---- phase 1: the monitor ingests slice 1 and we COMPACT its
      // state — the drained (digest → keeper) table is all the monitor
      // remembers, and all the handoff needs (no document content).
      val slice1 = Seq((9L, "x"), (5L, "x"), (3L, "y"), (4L, "z"))
      val slice2 = Seq((1L, "x"), (8L, "z"), (7L, "w"), (11L, "w"), (12L, "y"))
      val mem1 = MemoryStream[(Long, String)]
      @volatile var state = Map.empty[String, Long] // digest → keep_id
      val q1 = StreamingDedup.keepFirst(toDocs(mem1), "doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          bdf.collect().foreach(r => state += r.getString(0) -> r.getLong(1))
        }
        .start()
      try { mem1.addData(slice1: _*); q1.processAllAvailable() }
      finally q1.stop()
      val compacted = state.keys.toSeq.toDF("digest")

      // ---- phase 2a: the STREAM continues over slice 2 (same monitor,
      // fresh state seeded implicitly by... nothing: a second monitor
      // generation would normally resume the checkpoint. Here the point
      // is the BATCH path, so the reference behavior is the live stream
      // from phase 1 continuing:
      val mem2 = MemoryStream[(Long, String)]
      val streamed = scala.collection.mutable.Set.empty[Long]
      val q2 = StreamingDedup.keepFirst(toDocs(mem2), "doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = bdf.collect().map(_.getLong(1))
          streamed.synchronized { streamed ++= ids }
          ()
        }
        .start()
      try {
        mem2.addData(slice1: _*); q2.processAllAvailable()
        mem2.addData(slice2: _*); q2.processAllAvailable()
      } finally q2.stop()
      val streamKeeps = streamed.synchronized {
        streamed.toSet -- Set(5L, 3L, 4L) } // slice-2 decisions only

      // ---- phase 2b: the batch anti-join against the COMPACTED digests
      // must reproduce those decisions bit-for-bit: x/y/z are in the
      // table (suppressed), w is new (min id within the batch wins).
      val batchKeeps = Dedup.exactIncrementalDigests(
          slice2.toDF("doc_id", "text"), compacted, "digest", "text", "doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(batchKeeps == streamKeeps,
        s"handoff diverged: batch=$batchKeeps stream=$streamKeeps")
      assert(batchKeeps == Set(7L), s"keep set wrong: $batchKeeps")
    }
  }

  test("compaction handoff: a NULL-content doc in compacted state suppresses later NULL docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      // The monitor records NULL content under a NULL digest (sentinel
      // restored on emission); the batch continuation must treat that
      // row as SEEN — plain equality in the anti-join would never match
      // NULL and re-admit every later NULL-content doc (r14 advice).
      val mem = MemoryStream[(Long, String)]
      @volatile var state = Map.empty[Option[String], Long]
      val q = StreamingDedup.keepFirst(toDocs(mem), "doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          bdf.collect().foreach(r =>
            state += Option(r.getString(0)) -> r.getLong(1))
        }
        .start()
      try { mem.addData((5L, null), (9L, "x")); q.processAllAvailable() }
      finally q.stop()
      assert(state.get(None).contains(5L),
        s"monitor must record the NULL-content group under a NULL digest: $state")
      val compacted = state.keys.map(_.orNull).toSeq.toDF("digest")
      // another NULL doc and another "x" are duplicates of compacted
      // state; only the genuinely new content passes the gate
      val keeps = Dedup.exactIncrementalDigests(
          Seq((2L, null: String), (3L, "x"), (4L, "y")).toDF("doc_id", "text"),
          compacted, "digest", "text", "doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(keeps == Set(4L),
        s"NULL digest not suppressed by the null-safe anti-join: $keeps")
    }
  }

  test("later batches touch only their digests; duplicates grow n_copies with stable keep_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val mem = MemoryStream[(Long, String)]
      @volatile var lastEmit = Seq.empty[(Long, Long)]
      val q = StreamingDedup.track(toDocs(mem), "doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = bdf.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
          if (rows.nonEmpty) lastEmit = rows
        }
        .start()
      try {
        mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
        q.processAllAvailable()
        assert(lastEmit.toSet == Set((1L, 2L), (2L, 1L)),
          s"first batch: $lastEmit")
        // a batch of pure duplicates of "alpha": only alpha's digest
        // re-emits — keep_id stays 1, count grows by 2; beta untouched
        mem.addData((10L, "alpha"), (11L, "alpha"))
        q.processAllAvailable()
        assert(lastEmit.toSet == Set((1L, 4L)), s"dup batch: $lastEmit")
        // a smaller id arriving late takes over as beta's keeper
        mem.addData((0L, "beta"))
        q.processAllAvailable()
        assert(lastEmit.toSet == Set((0L, 2L)), s"late-keeper batch: $lastEmit")
      } finally q.stop()
    }
  }
}
