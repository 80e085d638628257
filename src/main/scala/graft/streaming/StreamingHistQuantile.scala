package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.operators.HistQuantile

/** Input/state/output rows for [[HqCellProcessor]]. Top-level so Catalyst
  * codegen can instantiate them from generated deserializers.
  */
case class HqDelta(g: String, b: Long, n: Long)
case class HqCount(n: Long)
case class HqOut(g: String, hq_bucket: Long, cnt: Long)

/** Per-(group, bucket) cell counter — the histogram-quantile sketch
  * TABLE as stream state, one long per non-empty cell. Receives
  * per-partition pre-combined deltas (see
  * [[StreamingHistQuantile.track]]) and adds their sum; histogram
  * linearity (cellwise sum, the same law as [[HistQuantile.merge]])
  * makes the maintained table exactly the batch sketch of everything
  * seen at any batching, arrival order, and pre-combine partitioning.
  */
class HqCellProcessor
    extends StatefulProcessor[(String, Long), HqDelta, HqOut] {

  @transient private var count: ValueState[HqCount] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState("n",
      Encoders.product[HqCount], TTLConfig.NONE)

  override def handleInputRows(key: (String, Long), rows: Iterator[HqDelta],
      timers: TimerValues): Iterator[HqOut] = {
    val prev = if (count.exists()) count.get().n else 0L
    var add = 0L
    rows.foreach(add += _.n)
    val n = prev + add
    count.update(HqCount(n))
    Iterator.single(HqOut(key._1, key._2, n))
  }
}

/** Streaming histogram-quantile sketch — [[HistQuantile]]'s equi-width
  * bucket table maintained as stream state (the continuously-current
  * latency/value distribution an SLO monitor reads): every value lands
  * in its clamped bucket batch-side (the SAME integer bucket arithmetic
  * as the batch sketch), and each (group, bucket) cell's counter lives
  * in the state store keyed by cell — at most groups × buckets keys
  * total, one long each, regardless of stream length. A full drain
  * equals the batch `sketchBy` table bit-for-bit, so quantile estimates
  * over the drained table oracle against the whole-corpus derivation
  * (q_stream_quantile); mid-stream, the state is always a valid sketch
  * for [[HistQuantile.quantiles]].
  */
object StreamingHistQuantile {

  /** Maintain the per-group bucket table over a stream: emits each
    * touched cell's current count per batch as (g, hq_bucket, cnt).
    * NULL values are dropped — the batch `sketchBy` contract.
    *
    * Shuffle shape: occurrences are pre-counted per partition
    * ([[MapSideCombine.counts]] over (group, bucket) pairs, size-capped)
    * before the stateful shuffle, so the state exchange carries
    * O(partitions × touched cells) delta rows per batch instead of one
    * row per value — and a cell count can never exceed groups × buckets
    * distinct keys per flush anyway.
    */
  def track(stream: DataFrame, groupCol: String, value: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    // Same up-front contract as the batch sketchBy: an invalid range must
    // fail HERE, not after it has been frozen into checkpointed state and
    // the reader's own checkRange rejects the sketch it can no longer fix.
    HistQuantile.checkRange(lo, hi, buckets)
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .filter(value.isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        HistQuantile.bucketOf(value, lo, hi, buckets).as("b"))
      .as[(String, Long)]
      .mapPartitions(cells => MapSideCombine.counts(cells)
        .map { case ((g, b), n) => HqDelta(g, b, n) })
      .groupByKey(d => (d.g, d.b))
      .transformWithState(new HqCellProcessor,
        TimeMode.None, OutputMode.Append)
      .toDF()
  }
}
