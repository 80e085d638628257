package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/state/output rows for [[SpaceSavingProcessor]]. Top-level so
  * Catalyst codegen can instantiate them from generated deserializers.
  */
case class HhItem(key: String, item: String)
case class HhDelta(key: String, item: String, n: Long)
case class HhEntry(item: String, est: Long, err: Long)
case class HhTable(entries: Seq[HhEntry], n: Long)
case class HhOut(key: String, item: String, est: Long, err: Long, n_key: Long)

/** Streaming heavy hitters by SpaceSaving (Metwally, Agrawal & El
  * Abbadi, ICDT '05): per stream key, at most `m` counters
  * (item, est, err). A tracked item increments `est`; an untracked item
  * replaces the MINIMUM counter, inheriting its count as `err` (the
  * classic over-estimate bookkeeping). Invariants, per key with n
  * processed rows: true ≤ est ≤ true + err; err ≤ n/m; every item with
  * true count > n/m is tracked — the monitor never misses a genuine
  * heavy hitter.
  *
  * The processor consumes per-partition PRE-COMBINED (key, item, count)
  * deltas — see [[StreamingHeavyHitters.track]] — via the WEIGHTED
  * SpaceSaving update: a tracked item adds its delta to est; an
  * untracked delta of weight c evicts the minimum counter and enters at
  * est = minEst + c, err = minEst. Every invariant above survives the
  * generalization: Σ est grows by exactly the processed weight (so
  * Σ est = n and min est ≤ n/m always), the minimum counter value is
  * still monotone non-decreasing (eviction replaces min with min + c),
  * and the over/under-estimate bounds follow as in the unit-weight
  * proof with occurrences replaced by weights. When m ≥ the key's
  * distinct-item cardinality nothing is ever evicted and est is the
  * EXACT count at any batching and any delta partitioning (sums are
  * associative/commutative) — the scoreboard oracle regime
  * (q_stream_heavy). Under eviction pressure the table depends on
  * delta arrival order, as for every one-pass counter sketch — the
  * spec pins the Metwally invariants instead.
  *
  * This is the MONITOR form of [[graft.operators.HeavyHitters]]'
  * Misra-Gries batch pass: state per key is ONE table of ≤ m entries in
  * the state store (RocksDB), partitioned by key — a 1000-executor
  * cluster shards it horizontally, and memory is m·entry bytes per key
  * FOREVER, independent of stream length. Each batch emits the key's
  * entries whose GUARANTEED count (est − err) reaches `minGuaranteed`
  * — the alert stream stays bounded by the heavy-hitter rate.
  */
class SpaceSavingProcessor(m: Int, minGuaranteed: Long)
    extends StatefulProcessor[String, HhDelta, HhOut] {

  @transient private var table: ValueState[HhTable] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    table = getHandle.getValueState("ss",
      Encoders.product[HhTable], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[HhDelta],
      timers: TimerValues): Iterator[HhOut] = {
    val prev = if (table.exists()) table.get() else HhTable(Nil, 0L)
    val counters = scala.collection.mutable.LinkedHashMap(
      prev.entries.map(e => e.item -> (e.est, e.err)): _*)
    var n = prev.n
    rows.foreach { r =>
      n += r.n
      counters.get(r.item) match {
        case Some((est, err)) => counters(r.item) = (est + r.n, err)
        case None if counters.size < m => counters(r.item) = (r.n, 0L)
        case None =>
          // evict the minimum counter (ties: first-inserted — a fixed,
          // order-stable rule); the newcomer inherits its count as err
          val (minItem, (minEst, _)) = counters.minBy { case (_, (est, _)) => est }
          counters.remove(minItem)
          counters(r.item) = (minEst + r.n, minEst)
      }
    }
    table.update(HhTable(
      counters.map { case (i, (est, err)) => HhEntry(i, est, err) }.toSeq, n))
    counters.iterator
      .collect { case (i, (est, err)) if est - err >= minGuaranteed =>
        HhOut(key, i, est, err, n) }
      .toSeq.sortBy(o => (o.item)).iterator
  }
}

object StreamingHeavyHitters {

  /** Track per-key heavy items of `itemCol` over a stream: each batch
    * emits the (key, item, est, err, n_key) entries whose guaranteed
    * count est − err ≥ `minGuaranteed`. `m` bounds state per key.
    *
    * Shuffle shape: occurrences are pre-counted per PARTITION into
    * (key, item, count) deltas before the stateful shuffle (size-capped
    * — [[MapSideCombine]]), so the state exchange carries at most one
    * row per distinct (key, item) per task per flush instead of one row
    * per occurrence. A 92%-hot item that would otherwise funnel the
    * corpus through one state partition arrives as one delta per task.
    */
  def track(stream: DataFrame, keyCol: String, itemCol: String,
      m: Int, minGuaranteed: Long): DataFrame = {
    require(m >= 2, s"m >= 2: $m")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("key"),
        col(itemCol).cast("string").as("item"))
      .as[HhItem]
      .mapPartitions(items => MapSideCombine.counts(items.map(i => (i.key, i.item)))
        .map { case ((k, i), n) => HhDelta(k, i, n) })
      .groupByKey(_.key)
      .transformWithState(new SpaceSavingProcessor(m, minGuaranteed),
        TimeMode.None, OutputMode.Append)
      .toDF()
  }
}
