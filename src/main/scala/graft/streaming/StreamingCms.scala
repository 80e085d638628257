package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.operators.CountMin

/** Input/state/output rows for [[CmsCellProcessor]]. Top-level so
  * Catalyst codegen can instantiate them from generated deserializers.
  */
case class CmsHit(cell: String)
case class CmsDelta(cell: String, n: Long)
case class CmsCount(n: Long)
case class CmsCellOut(cms_row: Int, cms_bucket: Long, cnt: Long)

/** Streaming count-min sketch — the sketch TABLE maintained as stream
  * state: every token occurrence explodes to its depth (row, bucket)
  * cells batch-side (the same md5 buckets as [[CountMin]]), and each
  * cell's counter lives in the state store keyed BY CELL — depth×width
  * keys total, sharded across the cluster, one long each. CMS linearity
  * makes the maintained table EXACTLY the batch sketch of everything
  * seen so far, at any batching and any arrival order — so a full
  * drain oracles against the whole-corpus derivation (q_stream_cms),
  * and at any moment mid-stream the state IS a valid sketch for point
  * queries (the continuously-current frequency table a rate limiter or
  * hot-key monitor reads).
  *
  * The processor receives per-partition PRE-COMBINED deltas (cell,
  * count) — see [[StreamingCms.track]] — and adds their sum, so the
  * maintained count is identical to counting raw occurrences (sum is
  * associative/commutative: linearity holds at any batching AND any
  * pre-combine partitioning).
  */
class CmsCellProcessor
    extends StatefulProcessor[String, CmsDelta, CmsCellOut] {

  @transient private var count: ValueState[CmsCount] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState("n",
      Encoders.product[CmsCount], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[CmsDelta],
      timers: TimerValues): Iterator[CmsCellOut] = {
    val prev = if (count.exists()) count.get().n else 0L
    var add = 0L
    rows.foreach(add += _.n)
    val n = prev + add
    count.update(CmsCount(n))
    val Array(r, b) = key.split('|')
    Iterator.single(CmsCellOut(r.toInt, b.toLong, n))
  }
}

object StreamingCms {

  /** Maintain a depth×width CMS over a stream of keys: emits each
    * touched cell's current count per batch. The cell ids are the SAME
    * md5 buckets as the batch [[CountMin.sketch]], so the drained table
    * equals the batch sketch bit-for-bit.
    *
    * Shuffle shape: occurrences are pre-counted per PARTITION before the
    * stateful shuffle (the streaming analogue of map-side combine, which
    * transformWithState's groupByKey does not do on its own), so the
    * state exchange carries O(partitions × touched cells) delta rows
    * per batch instead of O(occurrences × depth) — at 100 TB the
    * difference between re-shuffling the corpus and shuffling a few
    * thousand (cell, count) rows per task. Task memory for the combine
    * map is capped by [[MapSideCombine.DefaultCap]] (the map flushes
    * its deltas and clears when full), NOT by depth×width — a sketch
    * sized at the allowed maximum 16·2^20 cells would otherwise admit a
    * multi-GB per-task map. CMS linearity makes flushed duplicates
    * harmless: deltas for the same cell simply sum.
    */
  def track(stream: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16]: $depth")
    require(width >= 2 && width <= (1 << 20), s"width in [2,2^20]: $width")
    val spark = stream.sparkSession
    import spark.implicits._
    val k = col(keyCol).cast("string")
    // Count-then-hash (r21 — the streaming twin of the batch
    // CountMin.sketchFromCounts rewrite, guide §2.3 "aggregate before
    // you shuffle" applied to the hash work itself): keys are
    // pre-counted per partition FIRST, so the depth md5 cells are
    // computed once per DISTINCT key per partition with the count as
    // the delta weight, not once per occurrence — on a Zipf corpus
    // orders of magnitude less hashing inside the micro-batch's (often
    // single-split) scan stage. A second capped combine then merges the
    // per-key deltas into per-cell deltas, so the stateful exchange
    // still carries O(partitions × touched cells) rows. Cellwise totals
    // are identical by CMS linearity (Σ over distinct keys of
    // count·indicator == Σ over occurrences).
    stream
      .select(k.as("cell"))
      .as[CmsHit] // field reuse: `cell` carries the RAW key pre-hash
      .mapPartitions(keys => MapSideCombine.counts(keys.map(_.cell))
        .map { case (key, n) => CmsDelta(key, n) })
      .select(explode(array((0 until depth).map(j =>
        concat(lit(j + "|"), CountMin.bucketOf(j, col("cell"), width))): _*))
        .as("cell"), col("n"))
      .as[CmsDelta]
      .mapPartitions(deltas => MapSideCombine.sums(deltas.map(d => (d.cell, d.n)))
        .map { case (cell, n) => CmsDelta(cell, n) })
      .groupByKey(_.cell)
      .transformWithState(new CmsCellProcessor,
        TimeMode.None, OutputMode.Append)
      .toDF()
  }
}
