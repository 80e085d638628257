package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IdempotentSink

/** Streaming/batch failure-mode hardening: exactly-once foreachBatch sink
  * under replay, and task-retry resilience (the session runs local[4,2] so
  * a first-attempt task failure is retried instead of failing the job).
  */
class StreamingHardeningSpec extends SparkTestBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("foreachBatch idempotent sink: replayed batchIds are skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-fbsink")
      .toFile.getAbsolutePath
    val mem = MemoryStream[Ev]
    val sink = IdempotentSink.parquet(outDir)
    val q = mem.toDF().writeStream.foreachBatch(sink).start()
    try {
      mem.addData(Ev(ts(0), 1, "a", 1.0), Ev(ts(1), 2, "b", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(ts(2), 3, "c", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val n1 = spark.read.parquet(s"$outDir/batch=*").count()
    assert(n1 == 3, s"expected 3 rows across batches, got $n1")
    // simulate the post-failure replay contract: same batchId redelivered
    // (possibly with regenerated content) must not duplicate output
    val replay = Seq(Ev(ts(0), 1, "a", 1.0), Ev(ts(1), 2, "b", 2.0)).toDF()
    sink(replay, 0L)
    assert(spark.read.parquet(s"$outDir/batch=*").count() == n1,
      "replayed batch was written twice")
    assert(IdempotentSink.committed(outDir, 0L) && IdempotentSink.committed(outDir, 1L))
  }

  test("foreachBatch sink overwrites a partial batch left by a crash") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft-fbcrash")
      .toFile.getAbsolutePath
    // crash simulation: batch dir exists with WRONG partial content but no
    // commit marker -> the replay must overwrite it
    Seq(Ev(ts(0), 99, "stale", -1.0)).toDF()
      .write.parquet(s"$outDir/batch=0")
    val sink = IdempotentSink.parquet(outDir)
    sink(Seq(Ev(ts(0), 1, "a", 1.0), Ev(ts(1), 2, "b", 2.0)).toDF(), 0L)
    val got = spark.read.parquet(s"$outDir/batch=0")
    assert(got.count() == 2)
    assert(got.filter(col("user_id") === 99).isEmpty, "stale partial data survived replay")
  }

  test("task retry: first-attempt task failures are retried and the job completes") {
    import spark.implicits._
    val out = spark.range(0, 1000, 1, 4).as[Long]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        // every task fails on its first attempt; local[4,2] retries once
        if (tc.attemptNumber() == 0)
          throw new RuntimeException("injected first-attempt failure")
        it
      }
      .reduce(_ + _)
    assert(out == (0L until 1000L).sum)
  }

  test("streaming batch with injected task failure still commits exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-fbretry")
      .toFile.getAbsolutePath
    val mem = MemoryStream[Ev]
    val sink = IdempotentSink.parquet(outDir)
    val flaky = (df: org.apache.spark.sql.DataFrame, id: Long) => {
      val replayed = df.as[Ev].mapPartitions { it =>
        if (org.apache.spark.TaskContext.get().attemptNumber() == 0)
          throw new RuntimeException("injected sink-side failure")
        it
      }.toDF()
      sink(replayed, id)
    }
    val q = mem.toDF().writeStream.foreachBatch(flaky).start()
    try {
      mem.addData(Ev(ts(0), 1, "a", 1.0), Ev(ts(1), 2, "b", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(s"$outDir/batch=0").count() == 2)
  }

  test("chaos: query dies mid-batch (after write, before commit), restart is exactly-once over RocksDB state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = java.nio.file.Files.createTempDirectory("graft-chaos")
      .toFile.getAbsolutePath
    val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
    val mem = MemoryStream[Ev]
    // The sink crashes the whole QUERY on the chosen batch at the worst
    // moment: after the data write, before the commit marker — exactly a
    // process kill mid-sink. The stateful agg keeps running counts in
    // RocksDB, so the restart must ALSO recover state at the right version
    // (a re-aggregation from zero or a double-count both change the
    // numbers and fail the assertion).
    @volatile var killOnBatch: Long = -1L
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      if (!IdempotentSink.committed(outDir, id)) {
        df.write.mode("overwrite").parquet(s"$outDir/batch=$id")
        if (id == killOnBatch) {
          killOnBatch = -1L
          throw new RuntimeException(s"chaos: killed mid-batch $id")
        }
        val marker = new java.io.File(s"$outDir/_graft_commits/$id")
        marker.getParentFile.mkdirs()
        marker.createNewFile(): Unit
      }
    def start() = mem.toDF()
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch(sink _)
      .start()
    try {
      val q1 = start()
      mem.addData(Ev(ts(0), 1, "a", 1.0), Ev(ts(1), 2, "b", 2.0))
      q1.processAllAvailable() // batch 0 commits clean
      assert(IdempotentSink.committed(outDir, 0L))
      killOnBatch = 1L
      mem.addData(Ev(ts(2), 1, "a", 10.0), Ev(ts(3), 3, "c", 30.0))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      assert(!q1.isActive, "query should be dead after the mid-batch kill")
      assert(!IdempotentSink.committed(outDir, 1L),
        "crash landed after the marker — the chaos point moved")
      // restart from the same checkpoint: batch 1 replays, the overwrite
      // erases the orphaned data files, and the marker finally commits
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      assert(IdempotentSink.committed(outDir, 1L))
      val batch1 = spark.read.parquet(s"$outDir/batch=1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // cumulative counts prove state version recovery: user 1 carries its
      // batch-0 row (n=2, sv=11.0); user 3 is new (n=1, sv=30.0); user 2
      // unchanged in batch 1 -> not re-emitted under update mode
      assert(batch1 == Set((1L, 2L, 11.0), (3L, 1L, 30.0)),
        s"batch-1 replay diverged: $batch1")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("two-generation CMS drain equals the single-drain sketch (linearity across a checkpoint resume)") {
    // q_stream_cms_2b splits the corpus into two checkpoint-resumed
    // generations; CMS linearity + persisted state means last-write-wins
    // over the two drains must equal one drain of everything.
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    assert(rows("q_stream_cms_2b") == rows("q_stream_cms"),
      "cross-generation CMS accumulation drifted from the single-drain sketch")
  }
}
