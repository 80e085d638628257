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
}
