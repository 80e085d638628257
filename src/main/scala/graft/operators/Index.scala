package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed inverted-index construction — the retrieval primitive
  * behind BM25/TF-IDF serving. North-star surface (the reference's
  * algebra has no functions or aggregation at all:
  * /root/reference/src/planner/logicalplan.rs:207-273).
  *
  * Scale design: posting lists are NOT materialized per term — a hot
  * term's postings at 100 TB ("the": ~every doc) would concentrate on
  * one reducer and one row. Instead the doc-id space is split into
  * fixed blocks and each (term, block) emits one shard row, so per-group
  * work is bounded by `blockSpan` regardless of term frequency — the
  * doc-partitioned index layout of distributed search engines. The whole
  * build is two partial-aggregable groupBys + one term-keyed join; no
  * windows, no driver state.
  */
object Index {

  /** Whitespace tokens, lowercased (the corpus tokenizer — FIXTURES.md
    * tokenizer-parity rule).
    */
  private def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** Doc-range-sharded inverted index: one row per (term, shard) with the
    * sorted posting list of the shard's doc-id block (as a CSV string —
    * engine-portable dump shape), the shard's posting count, and the
    * term's corpus-wide document frequency.
    *
    * `blockSpan` fixes the doc-id width of a shard: shard_idx =
    * doc_id / blockSpan, so a shard never holds more than blockSpan
    * postings and a 100 TB hot term spreads over id-space blocks instead
    * of a single reducer.
    */
  def postingShards(docs: DataFrame, idCol: String, textCol: String,
      blockSpan: Long = 100L): DataFrame = {
    // (doc, term) duplicates only ever come from repeated terms INSIDE one
    // document (idCol is the corpus key), so dedup is per-row
    // array_distinct work riding the scan — the old corpus-wide
    // .distinct() paid a full extra exchange + aggregate pair for the
    // same set. One corpus-scale shuffle remains: the (term, shard)
    // grouping itself.
    val pairs = docs
      .select(col(idCol).as("__id"),
        explode(array_distinct(toks(col(textCol)))).as("term"))
    val shards = pairs
      .groupBy(col("term"),
        floor(col("__id") / blockSpan).cast("long").as("shard_idx"))
      .agg(
        array_join(sort_array(collect_list(col("__id"))), ",").as("postings"),
        count(lit(1)).as("n_in_shard"))
    // Corpus-wide df = Σ n_in_shard per term (each doc lives in exactly
    // one shard): an aggregate + join over the SHARD table — vocab-scale
    // input, vs the old second corpus explode + distinct + aggregate.
    // A partial-aggregable groupBy, not a per-term window: the join
    // reuses the shard grouping's exchange, while a window would add a
    // full sort of the shard table (measured slower, r20 probe).
    val df = shards.groupBy("term").agg(sum("n_in_shard").as("df"))
    shards.join(df, "term")
      .select(col("term"), col("shard_idx"), col("postings"),
        col("n_in_shard"), col("df"))
  }
}
