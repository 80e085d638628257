package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSessions

class StreamingSpec extends SparkTestBase {

  case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("session windows over a memory stream merge within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingSessions.sessionCounts(
      mem.toDF(), "ts", "1 hour", "10 minutes")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out").start()
    try {
      mem.addData(
        Ev(ts(0), 1, "a", 1.0), Ev(ts(5), 1, "a", 1.0),   // merge
        Ev(ts(30), 1, "a", 1.0),                           // new session
        Ev(ts(0), 2, "b", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_out")
        .orderBy("user_id", "w_start").collect()
        .map(r => (r.getLong(0), r.getLong(3)))
      assert(rows.toSeq == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("windowed counts with watermark aggregate by tumbling window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingSessions.windowedCounts(mem.toDF(), "ts", "1 hour", "10 minutes")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("windows_out").start()
    try {
      mem.addData(
        Ev(ts(1), 1, "click", 2.5), Ev(ts(2), 2, "click", 1.5),
        Ev(ts(11), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("windows_out").orderBy("w_start", "event_type")
        .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4)))
      assert(rows.toSeq == Seq(("click", 2L, 400L), ("view", 1L, 100L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups retried events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingSessions.dedupWithinWatermark(
      mem.toDF().withColumn("event_key", concat(col("user_id"), lit("-"), col("event_type"))),
      "ts", "1 hour", Seq("event_key"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(
        Ev(ts(0), 1, "click", 1.0), Ev(ts(1), 1, "click", 1.0), // dup key
        Ev(ts(2), 2, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }
}
