package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal payload plumbing: opaque binary content + typed metadata,
  * with per-partition batched "decode" — the Spark-side shape of an
  * image/audio feature-extraction stage. North-star surface.
  *
  * The decode itself is a STUB: this container has no codec libraries, so
  * [[decodeFeatures]] computes deterministic byte-level statistics standing
  * in for a real JPEG/PNG/audio decode. Everything around it — the binary
  * column, metadata struct, partition-batched iteration, feature schema —
  * is the real production plumbing: swap `fakeDecode` for a JNI/codec call
  * and nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte], fmt: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
      mean_byte: Double, n_segments: Int)

  /** Pack a text column as a binary payload with a metadata struct —
    * the storage shape for multimodal columns (content stays opaque bytes;
    * metadata is queryable without touching the blob).
    */
  def packBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("txt").as("fmt"),
        octet_length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Long, checksum: Long)

  /** Frame sampling: split each blob into fixed-size frames and keep every
    * `stride`-th one — the video/audio frame-sample shape (seek + decode
    * per kept frame in production; deterministic byte stats here). One
    * input row fans out to ~n_bytes/(frameSize*stride) small rows, which
    * is why this runs as a flatMap *after* partitioning, never on the
    * driver.
    */
  def sampleFrames(packed: DataFrame, frameSize: Int = 64, stride: Int = 2): Dataset[Frame] = {
    val spark = packed.sparkSession
    import spark.implicits._
    val rows = packed.select(col("doc_id"), col("content"),
      col("meta.fmt").as("fmt"), col("meta.n_bytes").as("n_bytes")).as[MediaRow]
    rows.flatMap { m =>
      val bytes = m.content
      val nFrames = math.max(1, (bytes.length + frameSize - 1) / frameSize)
      (0 until nFrames by stride).map { f =>
        val start = f * frameSize
        val end = math.min(start + frameSize, bytes.length)
        var checksum = 1469598103934665603L
        var i = start
        while (i < end) { checksum = (checksum ^ (bytes(i) & 0xff)) * 1099511628211L; i += 1 }
        Frame(m.doc_id, f, (end - start).toLong, checksum)
      }
    }
  }

  /** STUB resize: deterministic byte-level downsample (every `factor`-th
    * byte of the payload) standing in for an image-resize / audio-resample
    * kernel. Output keeps the multimodal shape: smaller binary payload +
    * metadata that follows it (n_bytes updated, fmt tagged) — swap the
    * byte loop for a codec call and nothing else changes.
    */
  def resizeStub(packed: DataFrame, factor: Int = 4): DataFrame = {
    require(factor > 0, "factor must be positive")
    val spark = packed.sparkSession
    import spark.implicits._
    val rows = packed.select(col("doc_id"), col("content"),
      col("meta.fmt").as("fmt"), col("meta.n_bytes").as("n_bytes")).as[MediaRow]
    rows.map { m =>
      val out = Array.range(0, m.content.length, factor).map(m.content(_))
      MediaRow(m.doc_id, out, s"${m.fmt}/resized", out.length.toLong)
    }.toDF()
      .select(col("doc_id"), col("content"),
        struct(col("fmt"), col("n_bytes")).as("meta"))
  }

  case class PHash(doc_id: Long, phash: Long)

  /** Perceptual average-hash (aHash) over the payload bytes: 64 contiguous
    * blocks, bit j set iff block j's mean byte exceeds the global mean —
    * compared by exact integer cross-multiplication (`sum_j·n > total·len_j`),
    * never by float division, so the 64-bit fingerprint is identical in any
    * engine. On a real image pipeline the input is the decoded+resized
    * luma plane ([[resizeStub]] stands in for that kernel here); the hash,
    * banding, and verify stages are the production plumbing unchanged.
    *
    * Cross-multiply bound: exact while `255·n²` fits a long — payloads
    * up to ~190 MB, far above any sane image/frame blob; larger media go
    * through [[sampleFrames]] first by design.
    */
  def aHash64(packed: DataFrame): Dataset[PHash] = {
    val spark = packed.sparkSession
    import spark.implicits._
    val rows = packed.select(col("doc_id"), col("content"),
      col("meta.fmt").as("fmt"), col("meta.n_bytes").as("n_bytes")).as[MediaRow]
    rows.map { m =>
      val bytes = m.content
      val n = bytes.length.toLong
      var tot = 0L
      var i = 0
      while (i < bytes.length) { tot += bytes(i) & 0xff; i += 1 }
      var h = 0L
      var j = 0
      while (j < 64) {
        val lo = (j * n / 64).toInt
        val hi = ((j + 1) * n / 64).toInt
        var s = 0L
        var k = lo
        while (k < hi) { s += bytes(k) & 0xff; k += 1 }
        h = (h << 1) | (if (s * n > tot * (hi - lo)) 1L else 0L)
        j += 1
      }
      PHash(m.doc_id, h)
    }
  }

  /** Banded Hamming near-dup over 64-bit perceptual hashes: 16 bands of
    * 4 bits bucket the candidates (band-value equi-join — never all
    * pairs), then `bit_count(xor)` verifies the exact distance. By
    * pigeonhole, any pair within Hamming ≤ 15 shares at least one intact
    * band, so for `maxHamming ≤ 15` recall is EXACT — the oracle can be
    * the all-pairs definition with no approximation gap. Same
    * bucket-join scale shape as MinHash-LSH (`Dedup.nearDupPairs`).
    */
  def phashNearDup(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      "maxHamming must be in 0..15: 16x4-bit banding is only recall-exact below 16")
    val bandVals = array((0 until 16).map(k =>
      shiftright(col("h"), 4 * k).bitwiseAND(lit(15L))): _*)
    val bp = hashes.select(col(idCol).as("id"), col(hashCol).as("h"))
      .select(col("id"), col("h"),
        posexplode(bandVals).as(Seq("band", "bv")))
    // The probe side inherits the corpus scan's partitioning (often ONE
    // split for a compact store), but the band join fans each probe row
    // out against every same-band candidate — the dominant work. A hash
    // repartition of the tiny (id, h, band, bv) rows spreads that fan-out
    // across the cluster; deterministic key, no sort-before-repartition.
    // The partition count is EXPLICIT: the probe rows are byte-light but
    // compute-heavy, and AQE coalesces a count-less REPARTITION_BY_COL
    // back to one partition on byte size alone (observed), re-serializing
    // the join.
    val x = bp
      .repartition(bp.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id").as("id_a"), col("h").as("h_a"),
        col("band"), col("bv"))
    val y = bp.select(col("id").as("id_b"), col("h").as("h_b"),
      col("band").as("band_b"), col("bv").as("bv_b"))
    // Order + distance predicates ride the JOIN itself and the verify
    // column is computed BEFORE the dedup: with 4-bit bands, skewed real
    // hashes put O(corpus²/16)-ish candidate rows through this join, and
    // almost all of them fail the Hamming threshold — filtering first
    // shrinks the distinct's exchange from every candidate pair (with
    // both 8-byte hashes aboard) to just the surviving near-dup pairs,
    // three narrow columns wide. hamming is a pure function of the two
    // per-id hashes, so distinct-on-(ids, hamming) after the filter
    // keeps exactly one row per qualifying pair — identical output.
    // The survivor repartition before the distinct is a MATERIALIZATION
    // BOUNDARY, not a tuning knob: without it the distinct satisfies its
    // clustering from the probe-side id partitioning and fuses into the
    // join's stage — then any downstream range-partitioned sort (every
    // oracled consumer orders its output) runs its bounds-SAMPLING pass
    // against the fused stage and RE-EXECUTES the whole quadratic
    // candidate join (measured at 10x data: two equal ~26 s jobs, 51 s
    // total; with the boundary the join runs once). The exchanged rows
    // are only the Hamming survivors, three narrow longs — tiny at every
    // scale, unlike the pre-filter candidate exchange this replaced.
    x.join(y, col("band") === col("band_b") && col("bv") === col("bv_b") &&
        col("id_a") < col("id_b") &&
        expr("bit_count(h_a ^ h_b)") <= maxHamming)
      .select(col("id_a"), col("id_b"),
        expr("bit_count(h_a ^ h_b)").cast("long").as("hamming"))
      .repartition(col("id_a"), col("id_b"))
      .distinct()
  }

  /** STUB decode: deterministic byte statistics per blob. Stands in for the
    * real codec (not available in this container); batch shape (iterator of
    * rows per partition, amortized setup at iterator head) is exactly where
    * a real decoder handle would be opened once per partition.
    */
  def decodeFeatures(packed: DataFrame): Dataset[MediaFeatures] = {
    val spark = packed.sparkSession
    import spark.implicits._
    val rows = packed.select(col("doc_id"), col("content"),
      col("meta.fmt").as("fmt"), col("meta.n_bytes").as("n_bytes")).as[MediaRow]
    rows.mapPartitions { it =>
      // per-partition setup would go here (decoder handle, model weights...)
      it.map { m =>
        val bytes = m.content
        var sum = 0L
        var checksum = 1469598103934665603L // FNV-1a 64 offset basis
        var segments = 1
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          sum += b
          checksum = (checksum ^ b) * 1099511628211L
          if (b == ' '.toInt) segments += 1
          i += 1
        }
        MediaFeatures(m.doc_id, m.n_bytes, checksum,
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, segments)
      }
    }
  }
}
