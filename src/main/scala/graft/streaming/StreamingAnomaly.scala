package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/state/output rows for [[RollingZProcessor]]. Top-level so Catalyst
  * codegen can instantiate them from generated deserializers.
  */
case class AnomalyPoint(key: String, ts: Timestamp, tie: Option[Long],
    v: Option[Long])
case class RollingWindow(values: Seq[Option[Long]])
case class ScoredPoint(key: String, ts: Timestamp, tie: Option[Long],
    v: Option[Long], n_prev: Long, z: Option[Double])

/** Streaming rolling z-score — the monitor form of
  * `Robust.rollingZScore`, with BIT-IDENTICAL scores: each point is
  * scored against its key's previous `k` points (never itself), using
  * the same exact-long frame sums and the same IEEE mean/std/z
  * expression as the batch operator, so a streaming monitor and a batch
  * backfill agree on every score (parity is pinned by
  * `StreamingAnomalySpec`).
  *
  * State per key is ONE ring of ≤ k longs in the state store (RocksDB),
  * keyed and partitioned by `key` — a 1000-executor cluster shards it
  * horizontally; nothing is ever rescanned. Within a micro-batch, rows
  * are processed in (ts, tie) order; across batches the stream's
  * arrival order per key is the scoring order, which is the streaming
  * contract (a monitor scores what it has seen so far).
  *
  * KEY-SKEW LIMIT (measured, round-11 adversarial soak): per-key
  * ORDERED state cannot be split — a key owning 92% of the stream
  * serializes one state partition (7.5× straggler at sf1; every
  * stateful engine shares this bound, the rows of one key must be
  * scored in order somewhere). Remedies are upstream of the operator:
  * monitor a finer key (type × region, type × shard-of-entity), or run
  * the batch twin `Robust.rollingZScoreChunked` as a parallel backfill
  * and keep the stream for alerting freshness only.
  */
class RollingZProcessor(k: Int)
    extends StatefulProcessor[String, AnomalyPoint, ScoredPoint] {

  @transient private var ring: ValueState[RollingWindow] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getValueState("ring",
      Encoders.product[RollingWindow], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[AnomalyPoint],
      timers: TimerValues): Iterator[ScoredPoint] = {
    var buf: Vector[Option[Long]] =
      if (ring.exists()) ring.get().values.toVector else Vector.empty
    // Null-tolerance mirrors the batch operator exactly: a null-valued
    // row still OCCUPIES a frame slot (the batch frame is positional,
    // ROWS BETWEEN -k AND -1) but contributes nothing to the sums
    // (sum/count skip nulls), and is itself emitted unscored. Null tie
    // sorts first (Spark's default asc_nulls_first).
    // Sort key is exact epoch-MICROS (not getTime's milliseconds): events.ts
    // is µs-precision, so two same-key events can share a millisecond while
    // differing in micros; the batch twin and the DuckDB oracle both order by
    // the full µs timestamp then tie, and the frame order must match exactly.
    val out = rows.toArray
      .sortBy(p => (Micros.of(p.ts), p.tie.getOrElse(Long.MinValue))).map { p =>
      val present = buf.flatten
      val n = present.length.toLong
      // Same IEEE expression as Robust.rollingZScore: exact long sums,
      // then double mean/var/std in the identical operation order.
      val z: Option[Double] = p.v.filter(_ => n >= 2).flatMap { v =>
        var s = 0L; var ss = 0L
        present.foreach { x => s += x; ss += x * x }
        val nd = n.toDouble
        val mean = s.toDouble / nd
        val variance = ss.toDouble / nd - mean * mean
        val std = math.sqrt(math.max(variance, 0.0))
        if (std > 0.0) Some((v.toDouble - mean) / std) else None
      }
      buf = (buf :+ p.v).takeRight(k)
      ScoredPoint(key, p.ts, p.tie, p.v, n, z)
    }
    ring.update(RollingWindow(buf))
    out.iterator
  }
}

object StreamingAnomaly {

  /** Score a stream (or a batch frame in streaming tests) of
    * (keyCol, tsCol, tieCol, valueInt) points: appends each point's
    * n_prev and z against its key's previous-k ring. `valueInt` must be
    * integer-quantized, exactly as in `Robust.rollingZScore` — that is
    * what makes stream and backfill agree bit-for-bit.
    */
  def score(points: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueInt: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"),
        valueInt.cast("long").as("v"))
      .as[AnomalyPoint]
      .groupByKey(_.key)
      .transformWithState(new RollingZProcessor(k),
        TimeMode.None, OutputMode.Append)
      .toDF()
  }
}
