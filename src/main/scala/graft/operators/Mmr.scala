package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR '98) — the
  * diversity-aware top-k: greedily pick the candidate maximizing
  * λ·rel(q,x) − (1−λ)·max_{s∈S} sim(x,s), trading query relevance
  * against redundancy with what is already selected. The retrieval-side
  * complement of [[Coreset]]: k-center greedy spreads over the corpus
  * with no query; MMR spreads WITHIN a query's relevant set —
  * dedup-aware RAG context assembly, diverse few-shot pools per prompt.
  *
  * Fixed λ = 1/2, so (scaling by 2) the objective is the INTEGER
  * rel − max-sim with both sides exact micro² dot products
  * (floor(x·1e6) per coordinate) — the same derandomization as
  * [[Coreset.kCenterGreedy]]: the greedy trajectory is a pure function
  * of the data, re-derived bit-for-bit by an unrolled DuckDB CTE
  * (q_mmr_select). Ties break (score DESC, id ASC).
  *
  * Shape at 100 TB: k passes, each ONE map-side scan — rel is
  * precomputed once against the broadcast-literal query vector, max-sim
  * is an in-expression fold over ≤ k broadcast-literal selected vectors
  * (k·dim longs in the plan), reduction is TakeOrdered(1). No shuffle
  * of the corpus, ever; the k picks round-trip the driver (the bounded
  * centroid-table exception). O(n·k²·dim) worst case, like all exact
  * greedy MMR; past k ≈ 64 pre-filter to a top-N relevance pool first.
  */
object Mmr {

  /** Select k rows by MMR against the query vector of the MIN-id row
    * (excluded from the candidate pool). Returns (pick_order, <idCol>,
    * score) where score = rel − max-sim in micro² units (pick 0: score
    * = rel — nothing selected yet to be redundant with).
    */
  def select(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64,
      s"k must be in [1, 64] (greedy is O(n·k²); pre-filter past that): $k")
    val spark = df.sparkSession
    val withV = df.select(col(idCol).cast("long").as("__id"),
      VectorStats.microUnits(col(vecCol), 1000000L).as("__v"))
    val qHead = withV.orderBy("__id").limit(1).collect()
    require(qHead.nonEmpty, "Mmr.select: input is empty (no query row)")
    val qRow = qHead(0)
    val (qId, qVec) = (qRow.getLong(0), qRow.getSeq[Long](1).toIndexedSeq)
    val qLit = array(qVec.map(lit): _*)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, s) => acc + s)
    val base = withV.filter(col("__id") =!= qId)
      .select(col("__id"), col("__v"), dot(col("__v"), qLit).as("__rel"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // materializes the cache it would pay for anyway on pick 0; a pool
      // smaller than k would otherwise surface as an opaque
      // ArrayIndexOutOfBounds on the k-th greedy collect. DISTINCT ids,
      // not rows: the greedy loop excludes picked ids, so duplicate-id
      // rows all leave the pool together after one pick
      val pool = base.agg(count(lit(1)).as("n"),
        countDistinct(col("__id")).as("d")).collect()(0)
      val (poolN, poolD) = (pool.getLong(0), pool.getLong(1))
      require(poolD >= k,
        s"Mmr.select: candidate pool has $poolD distinct ids " +
          s"($poolN rows, input minus the query row) but k=$k")
      var picks = Vector.empty[(Long, IndexedSeq[Long], Long)]
      while (picks.size < k) {
        val scored =
          if (picks.isEmpty) base.select(col("__id"), col("__v"),
            col("__rel").as("__score"))
          else {
            val sel = array(picks.map { case (_, v, _) =>
              array(v.map(lit): _*) }: _*)
            base.filter(!col("__id").isin(picks.map(_._1): _*))
              .select(col("__id"), col("__v"),
                (col("__rel") - aggregate(sel, lit(Long.MinValue), (acc, s) =>
                  greatest(acc, dot(col("__v"), s)))).as("__score"))
          }
        val next = scored.orderBy(col("__score").desc, col("__id").asc)
          .limit(1).collect()(0)
        picks :+= ((next.getLong(0), next.getSeq[Long](1).toIndexedSeq,
          next.getLong(2)))
      }
      import spark.implicits._
      picks.zipWithIndex.map { case ((id, _, s), i) => (i.toLong, id, s) }
        .toDF("pick_order", idCol, "score")
    } finally { base.unpersist(); () }
  }
}
