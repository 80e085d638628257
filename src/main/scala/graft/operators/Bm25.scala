package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a document corpus against a fixed term set
  * (Robertson & Walker, SIGIR '94; the Okapi weighting used by Lucene and
  * every retrieval-filtered training-data pipeline).
  *
  *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
  *
  * Shape at 100 TB: the query-term set is small by construction, so term
  * frequencies are computed as per-document COLUMNS (one codegen'd
  * `filter` lambda per term over the token array) — documents are never
  * exploded and never shuffled. The corpus statistics — (N, avgdl) and
  * the per-term document frequencies — come from ONE tiny aggregate,
  * broadcast back into a map-side scoring projection. Total shuffle
  * volume: |terms|+2 numbers, independent of corpus size. (Scoring
  * against an unbounded vocabulary would want the explode + (doc, term)
  * aggregate shape instead; that is inverted-index construction, not
  * fixed-query scoring.)
  *
  * Scores are emitted as exact integer micros (round(score·1e6)) so the
  * per-document sum over terms is order-independent — the determinism rule
  * all float aggregates in this repo follow (FIXTURES.md §5).
  */
object Bm25 {

  /** Shared fixed-term scoring scaffold: per-term tf columns + document
    * length, ONE bounded stats aggregate (n_docs, avgdl, per-term df)
    * broadcast back, map-side per-term scoring in integer micros, summed.
    * `termScore(tf, df)` builds one term's UNROUNDED score and may
    * reference the broadcast `n_docs`/`avgdl`/`dl` columns; rounding to
    * micros happens here so every weighting keeps the order-independent
    * sum property.
    */
  private def scoredByTerm(docs: DataFrame, idCol: String, textCol: Column,
      rawTerms: Seq[String])(termScore: (Column, Column) => Column): DataFrame = {
    // a duplicated query term must contribute once, not once per mention
    // (the per-term column layout would otherwise double-count it)
    val terms = rawTerms.distinct
    require(terms.nonEmpty, "term scoring needs at least one query term")
    // __toks binds the tokenization ONCE per row in its own projection
    // (split is expensive, so CollapseProject keeps the boundary): the
    // dl/tf columns each read the bound array instead of re-splitting the
    // text — higher-order filter() gets no codegen subexpression
    // elimination, so the inlined form paid |terms|+1 splits per row.
    val withTf = docs
      .withColumn("__toks", split(lower(textCol), " "))
      .select(
        col(idCol) +: size(col("__toks")).cast("double").as("dl") +:
          terms.zipWithIndex.map { case (term, i) =>
            size(filter(col("__toks"), tk => tk === lit(term)))
              .cast("double").as(s"tf_$i")
          }: _*)
      // NOT persisted: a measured persist variant (caching the narrow tf
      // table so stats + scoring share one tokenize) ran ~30% SLOWER at
      // bench scale — the cache materialization cost more than the second
      // pipelined scan it saved (r20 calibrated A/B). At a true 100 TB
      // the two-scans-of-text tradeoff flips; revisit with real I/O cost.

    // ONE bounded aggregate: corpus scalars + per-term document counts
    val aggs = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)

    val termScores = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      when(tf > 0, round(termScore(tf, col(s"df_$i")) * lit(1e6), 0).cast("long"))
        .otherwise(lit(0L))
    }
    withTf.crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .withColumn("score_micro", termScores.reduce(_ + _))
      .select(col(idCol), col("score_micro"))
  }

  /** Per-document BM25 score in integer micros over `terms`, for documents
    * matching at least one term. Output: (idCol, score_micro).
    */
  def scoreMicros(docs: DataFrame, idCol: String, textCol: Column,
      rawTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoredByTerm(docs, idCol, textCol, rawTerms) { (tf, df) =>
      val idf = log(lit(1.0) + (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
      val norm = tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
      idf * (tf * lit(k1 + 1.0) / norm)
    }

  /** Top-k documents by BM25 score — the retrieval-filtered curation query
    * (score the corpus, keep the k best). The sort+limit lowers to
    * TakeOrderedAndProject: per-partition k-row heaps merged on the driver,
    * never a global sort — the only shape that survives a 100 TB corpus.
    */
  def topK(docs: DataFrame, idCol: String, textCol: Column,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreMicros(docs, idCol, textCol, terms, k1, b)
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)

  /** Classic TF-IDF scoring against the same fixed term set:
    *
    *   score(d) = Σ_t tf(t, d) · ln(N / df(t))
    *
    * (Sparck Jones '72 idf; the pre-BM25 weighting.) Same 100 TB shape as
    * [[scoreMicros]]: per-term tf columns (documents never exploded),
    * ONE bounded stats aggregate broadcast back, map-side scoring. Scores
    * in integer micros, per-term rounding, so the cross-term sum is
    * order-independent. Only documents matching ≥1 term are returned
    * (their df is then ≥1, keeping ln defined).
    */
  def tfIdfMicros(docs: DataFrame, idCol: String, textCol: Column,
      rawTerms: Seq[String]): DataFrame =
    scoredByTerm(docs, idCol, textCol, rawTerms) { (tf, df) =>
      tf * log(col("n_docs") / df)
    }
}
