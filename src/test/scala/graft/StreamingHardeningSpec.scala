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
}
