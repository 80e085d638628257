package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/state/output rows for [[DedupDigestProcessor]]. Top-level so
  * Catalyst codegen can instantiate them from generated deserializers.
  */
case class DedupArrival(digest: String, min_id: Long, n: Long)
case class DedupAgg(keep_id: Long, n_copies: Long)
case class DedupOut(digest: String, keep_id: Long, n_copies: Long)
case class DedupFirst(digest: String, keep_id: Long)

/** Streaming exact-dedup monitor — the dedup TABLE maintained as stream
  * state: one (keep_id, n_copies) entry per distinct content digest,
  * sharded across the cluster by digest. Both components are
  * associative+commutative folds (min over ids, sum over occurrences),
  * so the maintained entry is EXACTLY the batch `Dedup.exact` row for
  * everything seen so far, at ANY batching, arrival order, and
  * pre-combine partitioning — the same linearity argument as the CMS
  * monitor. Mid-stream, the state answers the ingest question directly:
  * an arriving doc whose digest exists is a duplicate of keep_id; a full
  * drain equals the whole-corpus dedup table (q_stream_dedup's oracle).
  *
  * Each batch emits the updated row for every digest TOUCHED in that
  * batch (untouched digests re-emit nothing — per-batch work is bounded
  * by the batch, not the corpus).
  *
  * State bound: 8-byte keep_id + 8-byte count per DISTINCT content
  * digest — linear in distinct corpus content, the honest floor for
  * exact dedup (any exact scheme must remember every distinct content
  * seen). At production lifetimes, bound the window with a TTL on the
  * state (dedup-within-horizon — pass a real [[TTLConfig]]; an expired
  * digest reads as never-seen, so its next arrival restarts the entry)
  * or periodically compact the state into a static corpus-digest table
  * consumed by the batch `Dedup.exactIncrementalDigests` anti-join.
  * Both horizon controls are spec-exercised (StreamingDedupSpec).
  */
class DedupDigestProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, DedupArrival, DedupOut] {

  @transient private var agg: ValueState[DedupAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState("a",
      Encoders.product[DedupAgg], ttl)

  override def handleInputRows(key: String, rows: Iterator[DedupArrival],
      timers: TimerValues): Iterator[DedupOut] = {
    var minId = Long.MaxValue
    var add = 0L
    rows.foreach { r =>
      if (r.min_id < minId) minId = r.min_id
      add += r.n
    }
    val prev = if (agg.exists()) agg.get() else DedupAgg(Long.MaxValue, 0L)
    val next = DedupAgg(math.min(prev.keep_id, minId), prev.n_copies + add)
    agg.update(next)
    Iterator.single(DedupOut(key, next.keep_id, next.n_copies))
  }
}

/** The DECISION form of the monitor: emits (digest, keep_id) only for
  * digests seen for the FIRST time in this batch — the id to let
  * through the ingest gate. Later arrivals of a seen digest emit
  * nothing at all. Within a batch the min id wins (deterministic);
  * ACROSS batches the first batch's winner keeps the slot even if a
  * smaller id arrives later — the arrival-order contract of every
  * one-pass incremental dedup, identical to the batch
  * `Dedup.exactIncremental` anti-join against an already-ingested
  * corpus.
  */
class DedupFirstSeenProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, DedupArrival, DedupFirst] {

  @transient private var agg: ValueState[DedupAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState("a",
      Encoders.product[DedupAgg], ttl)

  override def handleInputRows(key: String, rows: Iterator[DedupArrival],
      timers: TimerValues): Iterator[DedupFirst] = {
    var minId = Long.MaxValue
    var add = 0L
    rows.foreach { r =>
      if (r.min_id < minId) minId = r.min_id
      add += r.n
    }
    val first = !agg.exists()
    val prev = if (first) DedupAgg(Long.MaxValue, 0L) else agg.get()
    // keep_id is pinned at first sight — the ingest decision is final
    val keeper = if (first) minId else prev.keep_id
    agg.update(DedupAgg(keeper, prev.n_copies + add))
    if (first) Iterator.single(DedupFirst(key, keeper)) else Iterator.empty
  }
}

object StreamingDedup {

  /** Maintain the exact-dedup table over a stream of (id, content) rows:
    * per batch, emits each touched digest's current (keep_id, n_copies).
    * Digests are sha2-256 of the content — the same digest as the batch
    * `Dedup.exact`, so a drained single-batch table equals the batch
    * result row-for-row.
    *
    * Shuffle shape: arrivals are pre-reduced per PARTITION to one
    * (digest, min id, count) row before the stateful shuffle — the
    * streaming analogue of the partial aggregation the batch groupBy
    * gets from Catalyst — so the state exchange carries one delta per
    * (task, distinct digest) instead of one row per document, and
    * documents themselves never shuffle (only 64-hex-char digests + two
    * longs). Task memory for the combine map is capped by
    * [[MapSideCombine.DefaultCap]]; flush-duplicated digests recombine
    * exactly because min and sum are associative+commutative.
    *
    * `ttl` bounds the horizon at production lifetimes: each digest's
    * entry expires `ttl` after its LAST update, so the table answers
    * "duplicate within the horizon" with state linear in the horizon's
    * distinct content, not the corpus lifetime's. TTL requires
    * processing-time semantics (the TimeMode switches accordingly), so
    * a TTL'd monitor is no longer batch-replayable bit-for-bit — use
    * the default (no TTL) + periodic compaction
    * ([[graft.operators.Dedup.exactIncrementalDigests]]) when exact
    * whole-history dedup is the contract. Run a TTL'd monitor with an
    * interval `Trigger.ProcessingTime` or `Trigger.AvailableNow`
    * generations: in processing-time mode the DEFAULT trigger
    * self-triggers empty micro-batches back-to-back (the engine keeps
    * cycling so TTL/timers can fire), which both burns the cluster and
    * makes `processAllAvailable` never settle (spec-pinned).
    */
  def track(stream: DataFrame, idCol: String, contentCol: String,
      ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    arrivals(stream, idCol, contentCol)
      .groupByKey(_.digest)
      .transformWithState(new DedupDigestProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append)
      .toDF()
      .transform(restoreNullDigest)
  }

  /** The ingest GATE: emits (digest, keep_id) only for first-seen
    * digests — the ids to let through; duplicates of anything already
    * seen emit nothing. Same shuffle shape as [[track]] (documents never
    * move); join the emitted ids back to the batch's payloads inside
    * `foreachBatch` to forward the surviving documents. Cross-batch
    * winner pinning is arrival-order-dependent by construction — the
    * `Dedup.exactIncremental` contract, spec-pinned.
    */
  def keepFirst(stream: DataFrame, idCol: String, contentCol: String,
      ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    arrivals(stream, idCol, contentCol)
      .groupByKey(_.digest)
      .transformWithState(new DedupFirstSeenProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append)
      .toDF()
      .transform(restoreNullDigest)
  }

  /** TTL'd value state requires processing-time mode; without a TTL the
    * monitors stay in TimeMode.None (pure data-driven, batch-replayable).
    */
  private def timeModeFor(ttl: TTLConfig): TimeMode =
    if (ttl == TTLConfig.NONE) TimeMode.None else TimeMode.ProcessingTime

  /** NULL-content sentinel. Batch `Dedup.exact` groups NULL-content rows
    * under the NULL sha2 digest (SQL GROUP BY null semantics), but
    * transformWithState REJECTS a null grouping key outright
    * (INTERNAL_ERROR_TWS "Implicit key not found in state store" — found
    * by StreamingFuzzSpec's NULL-content sweep, r14). So null digests
    * ride the empty string through the stateful shuffle — impossible as
    * a real digest (sha2 always emits 64 hex chars) — and emissions
    * translate it back to NULL, preserving batch parity bit-for-bit.
    */
  private val NullDigestSentinel = ""

  private def restoreNullDigest(df: DataFrame): DataFrame =
    df.withColumn("digest",
      when(col("digest") === NullDigestSentinel, lit(null: String))
        .otherwise(col("digest")))

  /** Shared digest + per-partition (digest, min id, count) pre-reduction. */
  private def arrivals(stream: DataFrame, idCol: String,
      contentCol: String) = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(coalesce(sha2(col(contentCol).cast("string"), 256),
          lit(NullDigestSentinel)).as("digest"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .mapPartitions(rows => MapSideCombine.minCounts(rows)
        .map { case (d, (m, n)) => DedupArrival(d, m, n) })
  }
}
