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
  * Shape at 100 TB: one tokenize+filter pass over the corpus (the term
  * filter prunes the exploded stream before any shuffle), one tf aggregate
  * on (doc, term), and the corpus statistics — df per query term and the
  * (N, avgdl) scalars — are tiny aggregates BROADCAST into the scoring
  * projection. No join shuffles anything wider than (doc_id, term, tf).
  *
  * Scores are emitted as exact integer micros (round(score·1e6)) so the
  * per-document sum over terms is order-independent — the determinism rule
  * all float aggregates in this repo follow (FIXTURES.md §5).
  */
object Bm25 {

  /** Per-document BM25 score in integer micros over `terms`, for documents
    * matching at least one term. Output: (idCol, score_micro).
    */
  def scoreMicros(docs: DataFrame, idCol: String, textCol: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = split(lower(textCol), " ")
    val base = docs.select(col(idCol), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))

    // corpus scalars: N docs, average doc length — one tiny aggregate
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))

    // (doc, term, tf): explode then filter — the filter prunes the token
    // stream before the aggregate shuffle ships anything
    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

    // df per query term: bounded by |terms| rows — broadcast
    val df = tf.groupBy(col("term").as("df_term"))
      .agg(count(lit(1)).cast("double").as("df"))

    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val termScore = idf * (col("tf") * lit(k1 + 1.0) / norm)

    tf.join(broadcast(df), col("term") === col("df_term"))
      .crossJoin(broadcast(stats))
      .withColumn("score_micro", round(termScore * lit(1e6), 0).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("score_micro")).as("score_micro"))
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
}
