package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/state/output rows for [[PrioritySampleProcessor]]. Top-level so
  * Catalyst codegen can instantiate them from generated deserializers.
  */
case class WsItem(key: String, id: Long, w: Long, priority: Long)
case class WsEntry(id: Long, w: Long, priority: Long)
case class WsTop(entries: Seq[WsEntry])
case class WsOut(key: String, id: Long, w: Long, priority: Long,
    est_w_scaled: Long)

/** Streaming priority sampling — the MONITOR form of
  * [[graft.operators.Mixture.samplePriorityByGroup]]: maintain, per
  * stream key, the k+1 highest-priority rows seen so far (priorities
  * are the derandomized ⌊w·2³²/md5-u⌋ longs computed batch-side by
  * `Mixture.prioritized`). Because the priority is a pure function of
  * (id, w), the top-(k+1) SET after any prefix of the stream is
  * arrival-order-INDEPENDENT — so a full drain emits exactly the batch
  * sampler's draw, estimator and all, at any batching whatsoever
  * (stronger than the SpaceSaving monitor, whose eviction depends on
  * order). This is the continuously-maintained corpus sample a
  * production ingest keeps: always-current k docs per source, weighted
  * by length/quality, with the DLT subset-sum estimator attached.
  *
  * State per key is ONE list of ≤ k+1 (id, w, priority) triples in the
  * state store (RocksDB), partitioned by key. Each batch emits the
  * key's current top-k with est_w_scaled = max(w·2³², τ), τ = the
  * (k+1)-th priority (0 while fewer than k+1 rows have been seen).
  */
class PrioritySampleProcessor(k: Int)
    extends StatefulProcessor[String, WsItem, WsOut] {

  @transient private var top: ValueState[WsTop] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    top = getHandle.getValueState("top",
      Encoders.product[WsTop], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[WsItem],
      timers: TimerValues): Iterator[WsOut] = {
    val prev = if (top.exists()) top.get().entries else Nil
    val merged = (prev.iterator ++ rows.map(r => WsEntry(r.id, r.w, r.priority)))
      .toSeq
      .sortBy(e => (-e.priority, e.id))
      .take(k + 1)
    top.update(WsTop(merged))
    val tau = if (merged.size == k + 1) merged.last.priority else 0L
    merged.take(k).iterator.map(e =>
      WsOut(key, e.id, e.w, e.priority,
        math.max(e.w * 4294967296L, tau)))
  }
}

object StreamingSample {

  /** Track the k highest-priority rows per key over a stream whose rows
    * already carry `w` and `priority` columns (from
    * `Mixture.prioritized`). Emits each key's current top-k per batch.
    *
    * Shuffle shape: each task pre-reduces its rows to the per-key
    * top-(k+1) before the stateful shuffle — the global top-(k+1) is
    * always contained in the union of per-partition top-(k+1) sets, so
    * the drained sample is unchanged (and priorities are pure data
    * functions, so this holds at any partitioning). The state exchange
    * then carries ≤ (k+1) rows per (task, key) per batch instead of
    * every occurrence — a hot source that would otherwise funnel its
    * whole batch through one state partition arrives as k+1 rows per
    * task. Task memory for the reduction is ≤ (k+1) entries per
    * distinct key present in the partition, never more than the rows
    * themselves.
    */
  def track(stream: DataFrame, keyCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("long").as("id"), col("w"), col("priority"))
      .as[WsItem]
      .mapPartitions(partitionTopK(_, k))
      .groupByKey(_.key)
      .transformWithState(new PrioritySampleProcessor(k),
        TimeMode.None, OutputMode.Append)
      .toDF()
  }

  /** Reduce one partition's rows to the top-(k+1) per key under the
    * sampler's order (highest priority first, ties by id) — the same
    * order [[PrioritySampleProcessor]] sorts by, so dropping rows here
    * can never change the processor's merged top-(k+1).
    */
  private[graft] def partitionTopK(rows: Iterator[WsItem],
      k: Int): Iterator[WsItem] = {
    val ord = Ordering.by[WsItem, (Long, Long)](r => (-r.priority, r.id))
    val top = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[WsItem]]
    rows.foreach { r =>
      val buf = top.getOrElseUpdate(r.key,
        new scala.collection.mutable.ArrayBuffer[WsItem](k + 2))
      if (buf.size < k + 1 || ord.lt(r, buf.last)) {
        // insert in sorted position; evict the current worst if full
        var i = buf.size
        while (i > 0 && ord.lt(r, buf(i - 1))) i -= 1
        buf.insert(i, r)
        if (buf.size > k + 1) buf.remove(buf.size - 1)
      }
    }
    top.valuesIterator.flatten
  }
}
