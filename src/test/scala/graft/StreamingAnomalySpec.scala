package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Robust
import graft.streaming.StreamingAnomaly

/** Top-level for Catalyst codegen deserializers. */
case class Pt(key: String, ts: Timestamp, tie: Long, v: Long)

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
}
