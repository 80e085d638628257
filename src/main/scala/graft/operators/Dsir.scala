package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. NeurIPS
  * '23): score every raw document by how much more likely its hashed
  * n-gram bag is under a TARGET distribution (e.g. curated wiki/books
  * text) than under the RAW crawl distribution. The per-doc importance
  * log-weight
  *
  *   log w(x) = Σ_{g ∈ grams(x)} [ log p̂_target(h(g)) − log p̂_raw(h(g)) ]
  *
  * ranks the crawl by target-likeness; resampling the top mass yields
  * the pretraining subset. This is the standard cheap alternative to a
  * learned quality classifier — two bag-of-hashed-ngram models, no
  * training loop.
  *
  * Engine-portable by construction, the [[Mixture.hashSplit]] /
  * [[graft.operators.TextAnalysis.hashedLinearScore]] idiom:
  *   - features = word unigrams + bigrams hashed into `buckets` slots
  *     via the first 8 md5 hex chars (any engine reproduces the bucket);
  *   - both distributions are Laplace-smoothed bucket histograms,
  *     p̂(b) = (c_b + 1) / (N + buckets), estimated with ONE bounded
  *     aggregate each (`buckets` rows out, however large the corpus);
  *   - per-bucket log-ratios are quantized to integer micros BEFORE the
  *     per-doc sum, so document scores are exact longs — sum order,
  *     partitioning and engine cannot change them (ln of a ratio of
  *     exact integers is the same IEEE double everywhere, the q_zipf /
  *     q_lm_score argument).
  *
  * Shape at 100 TB: the target corpus is scanned once and the raw
  * corpus twice (histogram + scoring), all map-side; the only shuffle
  * is the two buckets-bounded count aggregates, and the log-ratio
  * table broadcast to the scorer is `buckets` rows (KBs). The score is
  * ONE per-row HOF fold over the gram array — no explode, no join, no
  * UDF — so the gate rides the scan exactly like the other per-row
  * quality signals.
  */
object Dsir {

  /** Hashed feature buckets of a text: word unigrams ++ word bigrams
    * (space-split, lowercased, empties dropped). Each TOKEN is md5'd
    * exactly once (hex-8 → 32-bit value h); the unigram bucket is
    * h mod `buckets` and the bigram bucket is the hashing-trick combine
    * (h₁·1000003 + h₂) mod `buckets` — the Python-tuple-hash multiplier
    * over already-uniform 32-bit values, so no second string hash is
    * needed (hashing the joined bigram STRING doubled the md5 work for
    * zero statistical gain; h·1000003 + h' < 2⁵² never overflows).
    * Pure per-row expression, identical in any engine.
    */
  def gramBuckets(textCol: Column, buckets: Int): Column = {
    val toks = filter(split(lower(textCol), " "), t => t =!= "")
    val h = transform(toks, t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    // BIND h ONCE: HOFs are interpreted (no codegen subexpression
    // elimination), so naming h in several sub-expressions would re-run
    // the md5 transform per reference. A lambda variable is a
    // materialized VALUE — transform over the 1-element array(h)
    // evaluates h exactly once and hh references are free.
    element_at(transform(array(h), hh => concat(
      transform(hh, x => pmod(x, lit(buckets.toLong))),
      zip_with(
        slice(hh, lit(1), greatest(size(hh) - 1, lit(0))),
        slice(hh, lit(2), greatest(size(hh) - 1, lit(0))),
        (a, b) => pmod(a * lit(1000003L) + b, lit(buckets.toLong))))), 1)
  }

  /** The per-bucket importance table: (`bucket` long, `llr_micro` long)
    * over the FULL bucket domain (absent buckets carry their smoothed
    * prior, so scoring never misses a key). One bounded aggregate per
    * corpus; `llr_micro = round((ln p̂_target − ln p̂_raw)·1e6)` with the
    * division-then-ln op order fixed as the cross-engine contract.
    */
  def logRatioTable(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    def hist(df: DataFrame, cnt: String, tot: String): DataFrame = {
      val c = df.select(explode(gramBuckets(col(textCol), buckets)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(cnt))
      c.crossJoin(broadcast(c.agg(coalesce(sum(col(cnt)), lit(0L)).as(tot))))
    }
    val spine = raw.sparkSession.range(buckets).select(col("id").as("bucket"))
    val t = hist(target, "__ct", "__nt")
    val r = hist(raw, "__cr", "__nr")
    // the totals live on every row of their hist; re-broadcast one row
    // of each onto the spine so zero-count buckets still get smoothing
    val nt = broadcast(t.select(col("__nt")).limit(1))
    val nr = broadcast(r.select(col("__nr")).limit(1))
    spine
      .join(t.select("bucket", "__ct"), Seq("bucket"), "left")
      .join(r.select("bucket", "__cr"), Seq("bucket"), "left")
      .crossJoin(nt).crossJoin(nr)
      .select(col("bucket"), llrMicro(buckets))
  }

  /** One-scan sibling of [[logRatioTable]] for the common case where the
    * target corpus is a FILTER of the raw corpus: a single gram explode
    * serves both histograms (count(*) for raw, a conditional count for
    * target), so the expensive md5-per-token pass runs once instead of
    * once per corpus. Counts — and therefore every llr_micro — are
    * bit-identical to the two-pass table: a gram instance is in the
    * target histogram iff its row satisfies `targetCond` (NULL == false,
    * exactly what `filter` keeps).
    */
  def logRatioTableFiltered(raw: DataFrame, targetCond: Column,
      textCol: String, buckets: Int): DataFrame = {
    val c = raw
      .select(targetCond.as("__t"),
        explode(gramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("__ct"),
        count(lit(1)).as("__cr"))
    val tots = broadcast(c.agg(
      coalesce(sum(col("__ct")), lit(0L)).as("__nt"),
      coalesce(sum(col("__cr")), lit(0L)).as("__nr")))
    val spine = raw.sparkSession.range(buckets).select(col("id").as("bucket"))
    spine.join(c, Seq("bucket"), "left").crossJoin(tots)
      .select(col("bucket"), llrMicro(buckets))
  }

  /** `round((ln p̂_target − ln p̂_raw)·1e6)` over (__ct,__nt,__cr,__nr)
    * with the division-then-ln op order fixed as the cross-engine
    * contract; absent buckets carry the smoothed prior.
    */
  private def llrMicro(buckets: Int): Column = {
    def logP(cnt: Column, tot: Column): Column =
      log((cnt + lit(1L)).cast("double") /
        (tot + lit(buckets.toLong)).cast("double"))
    round((logP(coalesce(col("__ct"), lit(0L)), col("__nt")) -
      logP(coalesce(col("__cr"), lit(0L)), col("__nr"))) * lit(1e6), 0)
      .cast("long").as("llr_micro")
  }

  /** Score every `raw` row: (idCol, n_grams, logw_micro). The log-ratio
    * table collapses to ONE broadcast ARRAY indexed by bucket — the
    * domain is the complete 0..buckets−1 range, so position b+1 IS the
    * bucket's entry and `element_at` is an O(1) index (a MAP here would
    * linear-scan its entries per gram lookup: measured 6.4 s vs ~1 s at
    * sf0.1 — the `scoreByCostTable` map-path pathology). Score is a
    * per-row fold; every input row is emitted (gram-less docs score 0).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 256): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"bucket count must be in (0, 2^20]: $buckets")
    scoreUnder(logRatioTable(raw, target, textCol, buckets),
      raw, idCol, textCol, buckets)
  }

  /** [[importanceWeights]] for a target that is a FILTER of `raw`: the
    * two histograms come from one gram pass ([[logRatioTableFiltered]]),
    * cutting the corpus md5 work from three passes (target + raw +
    * scoring) to two. Same rows, same exact-long scores.
    */
  def importanceWeights(raw: DataFrame, targetCond: Column, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"bucket count must be in (0, 2^20]: $buckets")
    scoreUnder(logRatioTableFiltered(raw, targetCond, textCol, buckets),
      raw, idCol, textCol, buckets)
  }

  private def scoreUnder(llrTable: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    val llrArr = llrTable
      .agg(transform(
        array_sort(collect_list(struct(col("bucket"), col("llr_micro")))),
        s => s.getField("llr_micro")).as("__a"))
    // materialize the gram array ONCE per row: the alias is referenced
    // twice below (size + fold) and is expensive, so CollapseProject
    // keeps the projection boundary instead of inlining it twice
    raw.crossJoin(broadcast(llrArr))
      .withColumn("__g", gramBuckets(col(textCol), buckets))
      .select(col(idCol),
        coalesce(size(col("__g")), lit(0)).cast("long").as("n_grams"),
        coalesce(aggregate(col("__g"), lit(0L),
          (acc, b) => acc + element_at(col("__a"), (b + 1L).cast("int"))),
          lit(0L)).as("logw_micro"))
  }
}
