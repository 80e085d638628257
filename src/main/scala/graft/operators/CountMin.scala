package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J.Alg '05) — the fixed-size
  * frequency summary for unbounded key domains: a depth×width table of
  * counters where each occurrence of key k increments cell
  * (j, h_j(k)) for every row j, and the estimate for k is the MIN over
  * its depth cells (always an over-estimate; error ≤ N/width with
  * probability 1 − (1/2)^depth for the canonical parameterization).
  * Where Misra-Gries ([[HeavyHitters]]) keeps the heavy keys themselves,
  * CMS answers point queries about ANY key after the fact — the
  * complementary sketch in the mergeable-summaries family (Agarwal et
  * al., PODS '12).
  *
  * Everything is exact integer arithmetic on md5-derived buckets, so
  * the whole sketch — not just its answers — is a pure function of the
  * multiset of keys: any partitioning, any engine, any merge order
  * produces the identical table (a DuckDB oracle re-derives it
  * bit-for-bit, q_cms_topk).
  *
  * Shape at 100 TB: the sketch build is ONE map-side-combinable
  * aggregate over the exploded keys — partial tables of depth×width
  * cells merge by cellwise SUM (the linearity that makes CMS the
  * standard distributed/streaming counter), and depth×width is a few KB
  * regardless of corpus size. Nothing about the build grows with data
  * volume except the scan itself.
  */
object CountMin {

  /** Row-j bucket of a key: first 8 md5 hex chars of "j|key" as a
    * 32-bit unsigned value, mod width — the [[graft.operators.Mixture]]
    * md5-bucket idiom, salted per row so the depth rows are independent
    * hash functions.
    */
  def bucketOf(row: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(row + "|"), key)), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the sketch table from one occurrence-per-row input:
    * (cms_row, cms_bucket, cnt), rows 0..depth−1 — only NON-ZERO cells
    * (the table is sparse at small N; absent = 0). One explode(depth)
    * + one groupBy: the aggregate is map-side combined, and the result
    * is at most depth·width rows regardless of input size.
    */
  def sketch(keys: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    sketchFromCounts(
      keys.groupBy(col(keyCol).cast("string").as("__k"))
        .agg(count(lit(1)).as("__n")),
      "__k", "__n", depth, width)

  /** [[sketch]] from an already-counted (key, count) table — and the core
    * the occurrence-form delegates to: cell (j, h_j(k)) accumulates
    * Σ counts of the keys hashing there, which equals the
    * count-per-occurrence build exactly (CMS linearity again, within one
    * sketch). Counting BEFORE hashing moves the depth md5 evaluations
    * from per-OCCURRENCE to per-DISTINCT-KEY — on a Zipf-shaped corpus
    * that is orders of magnitude less hash work for the identical table
    * (the key count rides a map-side-combinable count aggregate instead).
    */
  def sketchFromCounts(counts: DataFrame, keyCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16]: $depth")
    require(width >= 2 && width <= (1 << 20), s"width in [2,2^20]: $width")
    val k = col(keyCol).cast("string")
    counts
      .select(col(cntCol).as("__n"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("cms_row"), bucketOf(j, k, width).as("cms_bucket"))): _*))
        .as("__cell"))
      .groupBy(col("__cell.cms_row").as("cms_row"),
        col("__cell.cms_bucket").as("cms_bucket"))
      .agg(sum(col("__n")).as("cnt"))
  }

  /** Per-group sketch tables: (groupCol, cms_row, cms_bucket, cnt) — the
    * pre-aggregated form a 100 TB corpus STORES (one tiny table per
    * shard/day/source), so later questions are answered from sketches
    * without rescanning. Merge any subset with [[merge]].
    */
  def sketchBy(keys: DataFrame, groupCol: String, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16]: $depth")
    require(width >= 2 && width <= (1 << 20), s"width in [2,2^20]: $width")
    // count-then-hash, as in [[sketchFromCounts]]: the depth md5s run per
    // distinct (group, key) instead of per occurrence; cellwise Σ of the
    // counts reproduces the per-occurrence table bit-for-bit.
    val k = col(keyCol).cast("string")
    keys
      .groupBy(col(groupCol), k.as("__k"))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol), col("__n"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("cms_row"),
          bucketOf(j, col("__k"), width).as("cms_bucket"))): _*))
        .as("__cell"))
      .groupBy(col(groupCol), col("__cell.cms_row").as("cms_row"),
        col("__cell.cms_bucket").as("cms_bucket"))
      .agg(sum(col("__n")).as("cnt"))
  }

  /** Merge sketch tables by cellwise sum — CMS linearity: the merge of
    * per-group sketches equals the sketch of the union, bit-for-bit
    * (spec-pinned and oracled by q_cms_merge). The merge input is
    * groups·depth·width rows at most — KBs — however big the corpora
    * behind them were.
    */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy("cms_row", "cms_bucket").agg(sum("cnt").as("cnt"))

  /** Point-estimate a set of query keys against the sketch: for each key,
    * est = min over rows of its cell's count, appended as `cms_est`.
    * Estimates are computed once per DISTINCT key and joined back, so
    * duplicate query rows each keep their row (no silent collapse) and
    * the query frame's own columns never collide with the sketch's
    * (cnt / cms_row / cms_bucket stay internal to the lookup). The
    * SKETCH side is ≤ depth·width rows and is broadcast; the
    * per-distinct-key estimate table is left to the planner — it is
    * bounded by the number of distinct query keys, which for CMS (point
    * queries over unbounded key domains) can itself be huge, so forcing
    * a broadcast would put an 8 GB/driver-memory ceiling where a
    * shuffle join scales (AQE broadcasts it anyway when it is small).
    */
  def estimate(queries: DataFrame, keyCol: String, cms: DataFrame,
      depth: Int, width: Int): DataFrame = {
    require(!queries.columns.contains("cms_est"),
      "queries already has a cms_est column")
    require(!queries.columns.contains("__cms_key"),
      "queries already has a __cms_key column")
    val k = col(keyCol).cast("string")
    val cells = queries.select(k.as("__cms_key")).distinct()
      .select(col("__cms_key"),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("__r"),
            bucketOf(j, col("__cms_key"), width).as("__b"))): _*)).as("__q"))
    val ests = cells
      .join(broadcast(cms),
        cells("__q.__r") === cms("cms_row") && cells("__q.__b") === cms("cms_bucket"),
        "left")
      // an absent cell means count 0, so the min over rows is 0 too
      .groupBy("__cms_key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    queries
      .join(ests, k <=> ests("__cms_key"), "left")
      .drop("__cms_key")
  }
}
