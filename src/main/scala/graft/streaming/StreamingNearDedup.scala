package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.functions._
import graft.operators.Dedup

/** Row shapes for the streaming near-dedup exchange — top-level so
  * Catalyst codegen can instantiate them from generated deserializers.
  */
case class BandedDoc(bkey: String, doc_id: Long)
case class CandPair(new_id: Long, old_id: Long)

/** Per-(band, bucket-hash) membership state: a list of the doc_ids whose
  * MinHash signature landed in this bucket. Each arriving doc emits a
  * candidate pair against every EARLIER doc in the bucket (prior batches
  * via state, prior rows of the same batch in doc_id order), then joins
  * the bucket. State per doc per band is 8 BYTES — the verification
  * payload (shingle sets) never enters the state store.
  */
class BandBucketProcessor
    extends StatefulProcessor[String, BandedDoc, CandPair] {

  @transient private var members: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[Long]("members",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[BandedDoc],
      timers: TimerValues): Iterator[CandPair] = {
    val batch = rows.toArray.sortBy(_.doc_id)
    val prior = scala.collection.mutable.ArrayBuffer.empty[Long]
    val it = members.get()
    while (it.hasNext) prior += it.next()
    val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
    batch.foreach { d =>
      prior.foreach { o =>
        if (o != d.doc_id) out += CandPair(d.doc_id, o)
      }
      prior += d.doc_id
      members.appendValue(d.doc_id)
    }
    out.iterator
  }
}

/** Streaming incremental MinHash-LSH near-dedup — the ingestion loop's
  * monitor form of [[Dedup.minHashIncremental]]: every arriving document
  * is checked against EVERYTHING that arrived before it (prior
  * micro-batches via RocksDB band-bucket state, prior rows of the same
  * batch in doc_id order), so over a whole stream the emitted pair set
  * equals the batch all-pairs LSH result ([[Dedup.minHashPairsHashed]]) —
  * the parity StreamingNearDedupSpec pins, bit-identical `jac` included.
  *
  * Architecture at 100 TB:
  *  - Banding is the SAME expressions as the batch path (minhash_sig +
  *    per-band xxhash64 slice), so candidate generation is identical by
  *    construction.
  *  - State is doc_ids only (8 bytes per doc per band), keyed by
  *    (band, bucket-hash) and sharded horizontally by the state store —
  *    a billion-doc corpus is ~`bands`·8 GB of state across the cluster.
  *  - Exact Jaccard verification happens OUTSIDE the state store, as a
  *    stream-static join against the document store, reusing the batch
  *    `bounded_jaccard` expression — scores match a batch backfill
  *    bit-for-bit.
  *  - Candidates are at-least-once across bands (a pair sharing several
  *    buckets is emitted from each); downstream exact-once is a
  *    `dropDuplicates("new_id","old_id")` (or set-semantics sink), the
  *    streaming analog of the batch path's `.distinct()`.
  */
object StreamingNearDedup {

  /** Candidate pairs (new_id, old_id): arriving doc × earlier bucket
    * members, per (band, bucket) — works on a stream (transformWithState)
    * or a batch frame in tests.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 126, bands: Int = 21, shingle: Int = 5): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        minhash_sig(Dedup.shinglesHashed(col(textCol), shingle), k).as("sig"))
      .select(col("doc_id"), explode(
        expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> concat(cast(b as string), ':', " +
          s"cast(xxhash64(slice(sig, b * $r + 1, $r), b) as string)))"))
        .as("bkey"))
      .select(col("bkey"), col("doc_id"))
      .as[BandedDoc]
      .groupByKey(_.bkey)
      .transformWithState(new BandBucketProcessor,
        TimeMode.None, OutputMode.Append)
      .toDF()
  }

  /** Exact verification of candidate pairs against a document store:
    * two (broadcast-able) joins attach both shingle sets, then the SAME
    * bounded_jaccard expression as the batch path scores and filters.
    * Usable stream-static (candidates streaming, store static) or fully
    * batch. Returns (new_id, old_id, jac), jac >= threshold.
    */
  def verified(candidates: DataFrame, docStore: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingle: Int = 5): DataFrame = {
    val toks = Dedup.shinglesHashed(col(textCol), shingle)
    val a = docStore.select(col(idCol).cast("long").as("new_id"), toks.as("toks_a"))
    val b = docStore.select(col(idCol).cast("long").as("old_id"), toks.as("toks_b"))
    candidates.join(a, "new_id").join(b, "old_id")
      .withColumn("jac", bounded_jaccard(col("toks_a"), col("toks_b"), threshold))
      .filter(col("jac") >= threshold)
      .select(col("new_id"), col("old_id"), col("jac"))
  }
}
