package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer on a learned merge table — makes token
  * budgets (packing, mixture sampling, context-length gates) SUBWORD-real
  * instead of whitespace estimates. No reference trace (the reference
  * executes nothing); the algorithm is standard BPE (Sennrich et al.
  * 2016), restated over engine-portable string primitives.
  *
  * Design for scale AND for the cross-engine oracle:
  *  - A document's working form is a SPACED representation: lowercase,
  *    non-alphanumeric runs become a ` | ` word boundary, every alnum
  *    char becomes a space-delimited token (`"ab, cd"` →
  *    `" a b | c d "`). One leading/trailing space makes every token
  *    match-safe as `" x "`.
  *  - Applying merge (x, y) is ONE leftmost-non-overlapping replace of
  *    `" x y "` with `" xy "` — the exact shared semantics of Java's
  *    `String.replace` (Spark `replace`) and DuckDB `replace`, so the
  *    encode is bit-identical across engines and the whole chain stays
  *    inside whole-stage codegen: no UDF, no custom expression.
  *    (Consequence, documented: of k overlapping occurrences `a b a b`,
  *    alternate ones merge per pass — same in both engines.)
  *  - Training is `rounds` corpus scans: each round counts adjacent
  *    token pairs (ONE partial-aggregable groupBy over an exploded
  *    zip — never a self-join) and appends the `perRound` most frequent
  *    (count desc, pair asc — total order, deterministic at any
  *    parallelism) to the merge table. Multi-round is what lets merges
  *    compose into multi-char tokens; the merge table itself is KBs
  *    (the bounded driver round-trip contract, Similarity.scala).
  */
object Bpe {

  /** The spaced working form: `" t o k e n s | n e x t "` with single
    * spaces and a guard space at both ends.
    */
  def spacedRepr(text: Column): Column =
    concat(lit(" "), trim(regexp_replace(regexp_replace(regexp_replace(
      lower(text), "[^a-z0-9]+", " | "), "([a-z0-9])", "$1 "), " +", " ")),
      lit(" "))

  /** Chain of leftmost-non-overlapping single-pass merges over the
    * spaced form, in table order. Each merge is a codegen'd
    * `StringReplace` — `m` merges cost `m` passes over the (shrinking)
    * string per row, no shuffle.
    */
  def applied(text: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(spacedRepr(text)) { case (acc, (x, y)) =>
      replaceLit(acc, s" $x $y ", s" $x$y ")
    }

  /** BPE token array of `text` under `merges` (boundary markers and
    * empties dropped).
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    filter(split(trim(applied(text, merges)), " "),
      t => t =!= "|" && t =!= "")

  /** Subword token count — the drop-in `size` column for [[Pack]]. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))

  private def replaceLit(src: Column, search: String, repl: String): Column =
    org.apache.spark.sql.functions.replace(src, lit(search), lit(repl))

  /** Adjacent-pair counts of the current working form — the training
    * signal. One groupBy over an exploded zip of the token array with
    * its own tail; pairs straddling a word boundary are excluded.
    * Returns (x, y, c).
    */
  def pairCounts(corpus: DataFrame, text: Column,
      merges: Seq[(String, String)] = Nil): DataFrame = {
    val toks = split(trim(applied(text, merges)), " ")
    corpus.select(explode(zip_with(toks,
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
      .filter(col("p.y").isNotNull &&
        col("p.x") =!= "|" && col("p.y") =!= "|" &&
        col("p.x") =!= "" && col("p.y") =!= "")
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("c"))
  }

  /** Learn a merge table: `rounds` scans, `perRound` merges appended per
    * scan by (count desc, x asc, y asc). Deterministic at any
    * partitioning (the tie-break is a total order on exact counts).
    *
    * Cost shape: one CORPUS scan per round, replace chains growing with
    * cumulative merges — fine for few rounds / train-on-sample; the
    * scale-path trainer is [[trainMergesHist]], which removes the corpus
    * from the merge loop entirely.
    */
  def trainMerges(corpus: DataFrame, text: Column, perRound: Int,
      rounds: Int): Seq[(String, String)] = {
    var merges = Vector.empty[(String, String)]
    var r = 0
    while (r < rounds) {
      val top = pairCounts(corpus, text, merges)
        .orderBy(col("c").desc, col("x").asc, col("y").asc)
        .limit(perRound)
        .collect() // perRound rows — bounded merge-table contract
        .map(row => (row.getString(0), row.getString(1)))
      merges ++= top
      r += 1
    }
    merges
  }

  // ---- histogram-based training (the 100 TB shape) ----------------------
  //
  // Standard BPE training (Sennrich '16's own implementation, and
  // SentencePiece / HF tokenizers) never rescans the corpus per merge: ONE
  // scan builds the word-frequency histogram, and every merge round runs
  // over the histogram alone. Pair counts over words weighted by word
  // frequency equal pair counts over the corpus exactly, because merges
  // and pairs never cross the ` | ` word boundary (the search string
  // `" x y "` cannot contain `|`, and pairs straddling a boundary are
  // excluded on both paths) — so the learned trajectory is IDENTICAL to
  // [[trainMerges]] (pinned by BpeSpec), at merges x O(distinct words)
  // instead of merges x O(corpus).

  /** One-scan word histogram of the corpus: the `|`-separated words of
    * the spaced form, each stored guard-spaced (`" a b "`, match-safe for
    * the same `" x y "` replaces) with its corpus frequency.
    * Columns: (word, cnt).
    */
  def wordHistogram(corpus: DataFrame, text: Column): DataFrame =
    corpus.select(explode(split(spacedRepr(text), "\\|")).as("w"))
      .select(trim(col("w")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(concat(lit(" "), col("w"), lit(" ")).as("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** Adjacent-pair counts derived from the word histogram under `merges`
    * — the frequency-weighted twin of [[pairCounts]] (bit-equal counts:
    * sum(cnt) over words == count(*) over the corpus, no `|` tokens to
    * exclude). Returns (x, y, c).
    */
  def pairCountsHist(hist: DataFrame,
      merges: Seq[(String, String)] = Nil): DataFrame = {
    val ap = merges.foldLeft(col("word")) { case (acc, (x, y)) =>
      replaceLit(acc, s" $x $y ", s" $x$y ")
    }
    val toks = split(trim(ap), " ")
    hist.select(col("cnt"), explode(zip_with(toks,
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
      .filter(col("p.y").isNotNull &&
        col("p.x") =!= "" && col("p.y") =!= "")
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** Learn the same merge table as [[trainMerges]] from the histogram:
    * one corpus scan total (the persisted histogram), then every round is
    * a vocab-bounded groupBy + perRound-row TakeOrdered. Corpus-scan
    * count is independent of `rounds`.
    */
  def trainMergesHist(corpus: DataFrame, text: Column, perRound: Int,
      rounds: Int): Seq[(String, String)] = {
    val hist = wordHistogram(corpus, text).persist()
    try {
      var merges = Vector.empty[(String, String)]
      var r = 0
      while (r < rounds) {
        val top = pairCountsHist(hist, merges)
          .orderBy(col("c").desc, col("x").asc, col("y").asc)
          .limit(perRound)
          .collect() // perRound rows — bounded merge-table contract
          .map(row => (row.getString(0), row.getString(1)))
        merges ++= top
        r += 1
      }
      merges
    } finally hist.unpersist()
  }
}
