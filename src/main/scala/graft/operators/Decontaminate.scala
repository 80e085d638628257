package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — drop training documents that share any word
  * n-gram with an evaluation/benchmark set (the standard 13-gram rule from
  * the GPT-3/PaLM data papers). North-star surface; the reference has no
  * functions or joins at all (/root/reference/src/planner/
  * logicalplan.rs:207-273).
  *
  * Scale shape: both sides explode to (id, hash(n-gram)) rows — the
  * shuffle carries 8-byte hashes, never text. Gram hashing is O(tokens)
  * per document: one xxhash64 per word (allocation-free, HashedWords)
  * then a Rabin-Karp polynomial roll over the word hashes
  * (NgramPolyHashes; CACM '87) — not the O(tokens·n) per-window string
  * rebuild. The benchmark side reduces to distinct hashes (at 100 TB the
  * benchmark is tiny relative to the corpus and its distinct-gram set
  * broadcasts); contaminated ids come from one equi-join, and the corpus
  * anti-joins on id, so documents move zero times. Collisions: 64-bit
  * hashes over <1e9 distinct grams give ~1e-2 expected false-contaminated
  * docs corpus-wide — the conservative direction for decontamination
  * (never leaks a true overlap).
  */
object Decontaminate {

  /** O(tokens) hashes of every n-word window of `text` (empty below n
    * tokens): per-word xxhash64, combined by a rolling polynomial —
    * codegen'd end to end, no per-gram string allocation.
    */
  def ngramHashes(text: Column, n: Int): Column =
    graft.functions.ngram_poly_hashes(graft.functions.hashed_words(text), n)

  /** Semantic decontamination: corpus rows whose embedding is NOT within
    * `threshold` cosine of any benchmark embedding — the embedding-space
    * complement of the n-gram rule (catches paraphrased benchmark
    * leakage that exact grams miss).
    *
    * Scale shape: the benchmark is tiny relative to a 100 TB corpus, so
    * it broadcasts and the corpus is scanned once against it (broadcast
    * semi-join on the cosine predicate — the corpus never shuffles);
    * contaminated ids then anti-join back by id. For benchmark sets too
    * large to nest-loop, pre-bucket both sides with sign-LSH
    * ([[graft.functions.sign_lsh_buckets]]) and verify only bucket
    * collisions — the [[Dedup.cosinePairsLsh]] path.
    */
  def semantic(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val bench = broadcast(benchmark.select(col(vecCol).as("__bv")))
    val bad = corpus.select(col(idCol), col(vecCol))
      .join(bench,
        graft.functions.cosine_sim(col(vecCol), col("__bv")) >= threshold,
        "left_semi")
      .select(idCol)
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Corpus rows whose text shares no word n-gram with `benchmark`. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame = {
    val corpusGrams = corpus.select(col(idCol).as("__cid"),
      explode(ngramHashes(col(textCol), n)).as("g"))
    val benchGrams = benchmark
      .select(explode(ngramHashes(col(textCol), n)).as("g"))
      .distinct()
    val contaminated = corpusGrams.join(benchGrams, "g")
      .select(col("__cid").as(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
