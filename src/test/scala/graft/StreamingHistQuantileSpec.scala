package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.HistQuantile
import graft.streaming.{StateScope, StreamingHistQuantile}

/** Streaming histogram-quantile monitor: the maintained bucket table
  * equals the batch `HistQuantile.sketchBy` of everything seen at any
  * batching/arrival order (histogram linearity — cellwise sum), and
  * NULL values are dropped on both paths.
  */
class StreamingHistQuantileSpec extends SparkTestBase {

  test("track rejects an invalid range up front, before any state exists") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDF().withColumnRenamed("_1", "grp").withColumnRenamed("_2", "v")
    // (hi - lo) not divisible by buckets: the same contract the batch
    // sketchBy enforces — frozen into a checkpoint it would be unfixable
    val boom = intercept[IllegalArgumentException] {
      StreamingHistQuantile.track(df, "grp", col("v"),
        lo = 0L, hi = 1000L, buckets = 7)
    }
    assert(boom.getMessage.contains("divide evenly"),
      s"unexpected failure: ${boom.getMessage}")
  }

  test("multi-batch drain equals the batch sketch, nulls dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      // values straddle the clamp edges (negative → bucket 0, ≥ hi →
      // last); one NULL per group must not count anywhere
      val rows: Seq[(String, java.lang.Long)] =
        (1 to 90).map(i => (s"g${i % 3}", java.lang.Long.valueOf(((i * 193) % 1200 - 100).toLong))) ++
          Seq(("g0", null: java.lang.Long), ("g1", null: java.lang.Long))
      val slices = scala.util.Random.javaRandomToRandom(
        new java.util.Random(11)).shuffle(rows).grouped(31).toSeq
      val mem = MemoryStream[(String, java.lang.Long)]
      @volatile var view = Map.empty[(String, Long), Long]
      val q = StreamingHistQuantile.track(
          mem.toDF().withColumnRenamed("_1", "grp").withColumnRenamed("_2", "v"),
          "grp", col("v"), lo = 0L, hi = 1000L, buckets = 10)
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          bdf.collect().foreach(r =>
            view += (r.getString(0), r.getLong(1)) -> r.getLong(2))
        }
        .start()
      try {
        slices.foreach { sl => mem.addData(sl: _*); q.processAllAvailable() }
      } finally q.stop()
      val batch = HistQuantile.sketchBy(
          rows.toDF("grp", "v"), Seq("grp"), col("v"),
          lo = 0L, hi = 1000L, buckets = 10)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(view == batch,
        s"stream sketch diverged from batch:\n  stream=$view\n  batch=$batch")
    }
  }

  test("sketch state survives a checkpointed stop/restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateScope.withStateConf(spark) {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-shq-ckpt").toString
      val mem = MemoryStream[(String, Long)]
      val emitted = new scala.collection.concurrent.TrieMap[
        (Long, String, Long), Long]()
      def start() = StreamingHistQuantile.track(
          mem.toDF().withColumnRenamed("_1", "grp").withColumnRenamed("_2", "v"),
          "grp", col("v"), lo = 0L, hi = 100L, buckets = 10)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.collect().foreach(r =>
            emitted((id, r.getString(0), r.getLong(1))) = r.getLong(2))
        }
        .start()
      val q1 = start()
      try {
        // bucket width 10: values 5, 7 → bucket 0; 15 → bucket 1
        mem.addData(("g", 5L), ("g", 7L), ("g", 15L))
        q1.processAllAvailable()
      } finally q1.stop()
      // resume from the RocksDB checkpoint: bucket 0's count must
      // CONTINUE from 2, not restart at zero
      val q2 = start()
      try {
        mem.addData(("g", 3L), ("g", 42L))
        q2.processAllAvailable()
        val lastBatch = emitted.keys.map(_._1).max
        val last = emitted.collect {
          case ((b, g, bk), n) if b == lastBatch => (g, bk) -> n
        }.toMap
        assert(last == Map(("g", 0L) -> 3L, ("g", 4L) -> 1L),
          s"state lost across restart: $last")
      } finally q2.stop()
    }
  }
}
