package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Join-based PageRank power iteration (Page, Brin, Motwani, Winograd,
  * Stanford tech report 1999) — the canonical iterative-fixpoint shape on
  * a relational engine, and the quality signal a web-scale training-data
  * pipeline derives from its link graph (rank-weighted sampling of crawl
  * text is a standard curation input).
  *
  * All arithmetic is EXACT integer fixed-point: ranks live in micros
  * (1.0 ≡ 1_000_000) and every division is integer `div` (truncating,
  * identical in Spark and DuckDB's `//`), so after any number of
  * iterations the ranks are a pure data function — independent of
  * partitioning, join order, and float summation order — and a DuckDB
  * oracle can re-derive the whole trajectory as an unrolled CTE chain
  * (the same Lloyd-unroll trick as q_kmeans_step / q_coreset).
  *
  * Scale shape, per iteration: one shuffle of the (src-partitioned) edge
  * list joined to the current rank vector, then a partial-aggregated
  * groupBy(dst) — map-side combine bounds the shuffled volume by the
  * edge count; no driver-side state, no collect anywhere. The edge list
  * is reused across iterations, so at cluster scale you'd persist it
  * pre-partitioned on `src` (here 3 iterations over a scan-cheap input —
  * caching is the caller's call, not baked in).
  *
  * North-star extension; the reference has no joins at all
  * (queryplanner.rs:66 rejects them).
  */
object PageRank {

  private val Scale = 1000000L

  /** `iterations` rounds of damped PageRank over a directed edge list
    * (`srcCol` → `dstCol`, any type castable to string). Vertices are the
    * distinct endpoints; every vertex starts at 1.0 (micros). Damping is
    * d = 0.85 applied as exact integer ops:
    *
    *   r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div outdeg(u))) div 100
    *
    * (85/100 rather than 850000/1000000 — same floor exactly, but the
    * multiplier keeps `85 · inflow` inside a long up to ~10^17 µ of
    * inflow ≈ 10^11 vertices of mass, where the larger constant would
    * overflow at ~10^7.)
    *
    * Dangling vertices (no out-edges) simply leak their mass — the
    * classic simplification; callers who need mass conservation add a
    * sink vertex. Returns (vertex, rank_micros).
    *
    * `checkpointLevel` is the storage level of the lineage-truncation
    * checkpoints (the loop-invariant graph tables + every 4th rank
    * generation). Default DISK_ONLY: the checkpoints are barriers, not
    * caches — memory-resident blocks sit in PROTECTED storage memory
    * (`spark.memory.storageFraction`) and at tight heaps squeeze the
    * per-round hash aggregate below its first page grant (the round-13
    * 512 MB probe's only OOM, AGGREGATE_OUT_OF_MEMORY, was exactly
    * this). On local disk the blocks cost zero execution memory and the
    * OS page cache serves the per-iteration re-reads; callers with
    * memory headroom who want the last few percent can pass
    * MEMORY_AND_DISK.
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int,
      checkpointLevel: StorageLevel = StorageLevel.DISK_ONLY,
      edgesDistinct: Boolean = false): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // The edge list, vertex set, and out-degrees are loop-invariant:
    // localCheckpoint them ONCE so each iteration joins materialized
    // blocks instead of re-deriving the graph from the source scan — at
    // cluster scale this is the persisted, src-partitioned edge RDD every
    // Pregel-style engine keeps. (r21 NOTE, measured and rejected: a
    // lazy `repartition(src).persist(DISK_ONLY)` in place of the eager
    // checkpoint — to let rounds reuse HashPartitioning(src) and skip
    // the per-round edge exchange — blew the composite plan up with 24
    // InMemoryRelation instantiations and tripled the probe min
    // (4.0 → 11.7 s): the ExistingRDD barrier is what keeps the
    // 3-iteration plan small, and that dominates the exchange it costs.)
    // checkpoint the EDGE LIST FIRST: vertices and outdeg both
    // derive from it, and without this barrier each derivation re-runs
    // the caller's whole edge-building pipeline (joins, unions,
    // distinct) from the source scan — measured ~8 upstream evaluations
    // before the first iteration on the q_pagerank shape.
    // `edgesDistinct = true` callers guarantee (src, dst) is already
    // duplicate-free — q_pagerank dedups narrow int pairs BEFORE the
    // string build (guide §2.3 "narrower types"), so the corpus-scale
    // string distinct here would be pure re-work.
    val eRaw = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
    val e = (if (edgesDistinct) eRaw else eRaw.distinct())
      .localCheckpoint(true, checkpointLevel)
    // ONE vertex-degree table instead of separate vertices + out-degree
    // checkpoints: endpoints union into a single grouped count of
    // out-occurrences (dst rows weigh 0), so the vertex set and the
    // degrees share one exchange and one materialization. Out-degrees
    // stay a VERTEX-scale side table instead of being joined onto the
    // edge list (the old `withDeg` materialization): the per-round
    // `rank div outdeg` is computed on the small rank table first and
    // only (src, dst) ever rides the edge-scale join — the guide-§8
    // shape (decide on the light proxy, keep the heavy rows narrow).
    val vdeg = e.select(col("src").as("vertex"), lit(1L).as("__o"))
      .union(e.select(col("dst").as("vertex"), lit(0L).as("__o")))
      .groupBy("vertex").agg(sum("__o").as("outdeg"))
      .localCheckpoint(true, checkpointLevel)
    val vertices = vdeg.select("vertex")
    val outdeg = vdeg.filter(col("outdeg") > 0L)
      .select(col("vertex").as("src"), col("outdeg"))

    // The loop carries the INFLOW table, not the rank table (r21):
    // rank_i(v) = 150000 + (85·coalesce(inflow_i(v), 0)) div 100 is a
    // pure per-row function of inflow_i, so intermediate rounds never
    // need the vertex-complete rank frame — round i+1's per-src
    // contributions come from ONE vertex-scale left join
    // (outdeg ⟕ contrib_i, rank expression inlined) instead of two
    // (vertices ⟕ contrib, then outdeg ⋈ r). Identical trajectory:
    // the old inner join outdeg ⋈ r hit every outdeg vertex (vertices ⊇
    // srcs), and missing-inflow srcs carried rank 150000 — exactly what
    // the coalesce reproduces. The vertex-complete frame is assembled
    // once, after the last round. One vertex-scale join (and its
    // exchanges) removed per intermediate round — the §2.4 shuffle-count
    // lever on what is otherwise a stage-count-bound query.
    var contrib: DataFrame = null
    for (i <- 1 to iterations) {
      // Round 1's rank vector is the constant Scale on every vertex and
      // every src IS a vertex, so `rank div outdeg` needs no join at
      // all; later rounds fold the rank expression into the one
      // outdeg ⟕ contrib join.
      val perSrc =
        if (i == 1) outdeg.select(col("src"),
          expr(s"$Scale div outdeg").as("c"))
        else outdeg.join(contrib, outdeg("src") === contrib("dst"), "left")
          .select(col("src"),
            expr("(150000L + (85 * coalesce(inflow, 0L)) div 100) div outdeg")
              .as("c"))
      contrib = e.join(perSrc, "src")
        .groupBy("dst").agg(sum("c").as("inflow"))
      // checkpoint every 4th round, not every round: a few rounds of
      // join+agg lineage are cheap to carry, while each localCheckpoint
      // is a full materialization — per-round checkpointing DOMINATED
      // the 3-iteration query's cost. Unbounded iteration counts still
      // get periodic lineage truncation.
      if (i % 4 == 0 && i < iterations)
        contrib = contrib.localCheckpoint(true, checkpointLevel)
    }
    vertices
      .join(contrib, vertices("vertex") === contrib("dst"), "left")
      .select(col("vertex"),
        (lit(150000L) + expr("(85 * coalesce(inflow, 0L)) div 100"))
          .as("rank_micros"))
  }

  /** The DuckDB mirror of one iteration, for oracle builders: given the
    * previous ranks CTE name, emits the SELECT computing the next one
    * over CTEs `v(vertex)` and `e(src, dst, outdeg)`.
    */
  def stepSql(prev: String): String =
    s"""SELECT v.vertex,
       |  150000 + (85 * COALESCE(c.inflow, 0)) // 100 AS rank
       |FROM v LEFT JOIN (
       |  SELECT e.dst, SUM(p.rank // e.outdeg) AS inflow
       |  FROM e JOIN $prev p ON e.src = p.vertex
       |  GROUP BY e.dst) c ON v.vertex = c.dst""".stripMargin
}
