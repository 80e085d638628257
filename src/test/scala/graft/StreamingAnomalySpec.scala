package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Robust
import graft.streaming.StreamingAnomaly

/** Top-level for Catalyst codegen deserializers. */
case class Pt(key: String, ts: Timestamp, tie: Long, v: Long)
case class PtN(key: String, ts: Timestamp, tie: Long, v: Option[Long])

class StreamingAnomalySpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming rolling z-score matches the batch operator bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val b1 = Seq(Pt("a", ts(0), 1, 10), Pt("a", ts(1), 2, 14), Pt("b", ts(0), 3, 5),
      Pt("a", ts(2), 4, 11), Pt("b", ts(1), 5, 5))
    val b2 = Seq(Pt("a", ts(3), 6, 13), Pt("a", ts(4), 7, 99), Pt("b", ts(2), 8, 7),
      Pt("b", ts(3), 9, 41))
    val mem = MemoryStream[Pt]
    val out = StreamingAnomaly.score(mem.toDF(), "key", "ts", "tie", col("v"), k = 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("anom_out").collect()
        .map(r => (r.getString(0), r.getLong(2)) ->
          (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
      val batch = Robust.rollingZScore((b1 ++ b2).toDF("key", "ts", "tie", "v"),
          "key", "ts", "tie", col("v"), k = 3)
        .collect().map(r => (r.getString(0), r.getLong(2)) ->
          (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
      assert(streamed.size == 9 && batch.size == 9)
      // exact equality, including the doubles: same exact-long frame sums,
      // same IEEE ops => identical bits
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      // key b: first two points have no scoreable frame (n_prev < 2); the
      // constant-free frame [5,5,7] then scores the 41 as a clear anomaly
      assert(streamed(("b", 3L))._2.isEmpty && streamed(("b", 5L))._2.isEmpty)
      assert(streamed(("b", 9L))._2.exists(_ > 3.0))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("null values occupy frame slots but score nothing — exactly like batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the null at tie=3 sits INSIDE later frames (positional ROWS frame)
    val pts = Seq(PtN("a", ts(0), 1, Some(10L)), PtN("a", ts(1), 2, Some(14L)),
      PtN("a", ts(2), 3, None), PtN("a", ts(3), 4, Some(12L)),
      PtN("a", ts(4), 5, Some(50L)))
    val mem = MemoryStream[PtN]
    val out = graft.streaming.StreamingAnomaly.score(
      mem.toDF(), "key", "ts", "tie", col("v"), k = 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anomn_out").start()
    try {
      mem.addData(pts: _*); q.processAllAvailable()
      val streamed = spark.table("anomn_out").collect()
        .map(r => r.getLong(2) ->
          (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
      val batch = graft.operators.Robust.rollingZScore(
          pts.toDF("key", "ts", "tie", "v"), "key", "ts", "tie", col("v"), k = 3)
        .collect().map(r => r.getLong(2) ->
          (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed(3L)._2.isEmpty)           // the null row scores nothing
      // tie=5's frame is [14, null, 12]: n_prev counts only the 2 values
      assert(streamed(5L)._1 == 2 && streamed(5L)._2.isDefined)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
