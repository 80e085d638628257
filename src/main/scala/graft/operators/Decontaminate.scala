package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — drop training documents that share any word
  * n-gram with an evaluation/benchmark set (the standard 13-gram rule from
  * the GPT-3/PaLM data papers). North-star surface; the reference has no
  * functions or joins at all (/root/reference/src/planner/
  * logicalplan.rs:207-273).
  *
  * Scale shape: both sides explode to (id, xxhash64(n-gram)) rows — the
  * shuffle carries 8-byte hashes, never text. The benchmark side reduces to
  * distinct hashes (at 100 TB the benchmark is tiny relative to the corpus
  * and its distinct-gram set broadcasts); contaminated ids come from one
  * equi-join, and the corpus anti-joins on id, so documents move zero
  * times. Collisions: xxhash64 over <1e9 distinct grams gives ~1e-2
  * expected false-contaminated docs corpus-wide — the conservative
  * direction for decontamination (never leaks a true overlap).
  */
object Decontaminate {

  /** Hashes of every n-token window of `toks` (empty below n tokens). */
  def ngramHashes(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(n))))))

  /** Corpus rows whose text shares no word n-gram with `benchmark`. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame = {
    def toks(c: Column) = split(lower(c), "\\s+")
    val corpusGrams = corpus.select(col(idCol).as("__cid"),
      explode(ngramHashes(toks(col(textCol)), n)).as("g"))
    val benchGrams = benchmark
      .select(explode(ngramHashes(toks(col(textCol)), n)).as("g"))
      .distinct()
    val contaminated = corpusGrams.join(benchGrams, "g")
      .select(col("__cid").as(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
