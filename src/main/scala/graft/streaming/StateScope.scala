package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Session-conf scope for the streaming scoreboard drains.
  *
  * Two decisions every stateful drain shares, applied for the duration of
  * the drain and restored after (batch queries keep the session default):
  *
  * 1. RocksDB state store provider — the production store (spill-to-disk,
  *    changelog checkpointing), not the in-memory HDFS-backed default.
  *
  * 2. State partition count pinned EXPLICITLY, decoupled from
  *    `spark.sql.shuffle.partitions`' CPU-count default. Streaming state
  *    partitioning is a STATE-VOLUME sizing decision frozen into the
  *    checkpoint at first start — it cannot be changed on restart without
  *    state rebuild — whereas the session shuffle default is a CPU-count
  *    decision that changes per deployment. Letting the drain inherit the
  *    session value both over-pays store initialization (measured ~30 ms
  *    per store per partition; a stream-stream join materializes FOUR
  *    stores per partition — the entire 7.45 s q_stream_join bench line
  *    was 128 store inits, vs a 0.7 s batch twin) and accidentally pins
  *    checkpoint layout to whatever machine first ran the query. At the
  *    scoreboard's state volumes 8 partitions is ample; at production
  *    volumes the same knob goes UP, sized by state bytes per partition
  *    (RocksDB memtable + block cache per store), never by core count.
  */
object StateScope {
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Scoreboard drains' state-partition sizing (see class doc, point 2). */
  val StatePartitions = 8

  /** The scoreboard drain harness every monitor query shares: drain `df`
    * into a named memory sink with Trigger.AvailableNow and assert the
    * drain was exactly ONE data micro-batch. Oracle parity depends on it
    * two ways: monitors re-emit touched keys per batch (a multi-batch
    * drain appends stale generations into the append-mode memory sink),
    * and order-sensitive monitors (the anomaly scorer) order rows only
    * WITHIN a batch. Fail loudly instead of silently diverging.
    */
  def drainSingleBatch(df: DataFrame, sinkName: String): Unit = {
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches == 1,
      s"$sinkName oracle requires a single-batch drain; saw $dataBatches data micro-batches")
  }

  def withStateConf[A](spark: SparkSession,
      statePartitions: Int = StatePartitions)(body: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevProvider = spark.conf.getOption(providerKey)
    val prevShuffle = spark.conf.get(shuffleKey)
    spark.conf.set(providerKey, RocksDb)
    spark.conf.set(shuffleKey, statePartitions.toString)
    try body
    finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
      spark.conf.set(shuffleKey, prevShuffle)
    }
  }
}
