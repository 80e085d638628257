package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction: shed probe-side rows BEFORE the
  * shuffle with a compact sketch of the build side's keys, then let the
  * exact join remove the sketch's false positives.
  *
  * This is the manual form of the runtime-filter rewrite engines inject
  * automatically (Spark's own InjectRuntimeFilter does the same under
  * AQE): at 100 TB the probe scan is the dominant cost, and a ~1.2 MB/M
  * keys (1% fpp) sketch shipped to every task turns a full-scan-then-
  * shuffle into a scan-filter-then-shuffle of only candidate rows. The
  * build pass over the dimension side is distributed (per-partition
  * sketches OR-merged at the driver — `DataFrameStatFunctions
  * .bloomFilter`); only the finished sketch, never the keys, crosses the
  * cluster.
  *
  * Semantics note: the bloom predicate ALONE computes a superset of the
  * semi join (false-positive rate = fpp). [[reduceThenJoin]] always
  * follows it with the exact join, so results are exact; the sketch only
  * changes how much data reaches that join.
  *
  * No trace in the reference (joins are absent from its algebra,
  * /root/reference/src/planner/logicalplan.rs:188-205 — Scan/Projection/
  * Selection/Sort/Limit/EmptyRelation/CreateTable only).
  */
object BloomJoin {

  /** Distributed Bloom filter over `dim`'s `keyCol` (bigint). Sizing uses
    * one cheap count over the (small) build side — at scale, pass
    * `expectedItems` explicitly to skip it.
    *
    * NOT LAZY: the count and `stat.bloomFilter` are ACTIONS — this call
    * (and any plan built on it) executes real jobs over `dim` before the
    * caller's own action runs; see the same note on
    * `HeavyHitters.exactByShare`.
    */
  def bloomOf(dim: DataFrame, keyCol: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): BloomFilter = {
    val n = if (expectedItems > 0) expectedItems
            else math.max(dim.select(keyCol).count(), 1L)
    dim.stat.bloomFilter(keyCol, n, fpp)
  }

  /** `fact` rows whose `factKey` might appear in `dim`'s `dimKey` —
    * superset semantics (fpp false positives), scan-side codegen'd.
    * `expectedItems` skips the sizing count when the caller knows the
    * build-side cardinality (the 100 TB default — dim passes are not
    * free); the dim side is still scanned once for the sketch aggregate.
    */
  def prefilter(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame =
    fact.filter(graft.functions.bloom_might_contain(
      col(factKey), bloomOf(dim, dimKey, fpp, expectedItems)))

  /** Exact inner join of `fact` to `dim`, with the fact side bloom-reduced
    * before the shuffle. Result is identical to the plain join; the
    * sketch only cuts the shuffled volume. The dim side is broadcast when
    * small (Catalyst decides); the bloom still pays for itself at scale
    * where the fact-side SCAN output, not the join, is the bottleneck.
    * Sides are aliased so fact and dim may use the SAME key name.
    */
  def reduceThenJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    val reduced = prefilter(fact, factKey, dim, dimKey, fpp, expectedItems)
    reduced.alias("__bloom_fact")
      .join(dim.alias("__bloom_dim"),
        col(s"__bloom_fact.$factKey") === col(s"__bloom_dim.$dimKey"))
  }
}
