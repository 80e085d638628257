package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Coreset selection by k-center greedy (Sener & Savarese, ICLR '18):
  * pick k maximally-spread points — seed with the smallest id, then
  * repeatedly add the point FARTHEST from everything selected so far
  * (the classic 2-approximation to the k-center cover). In a curation
  * pipeline this is the diversity-first sampler: where SemDeDup removes
  * redundancy, k-center greedy *selects* coverage — eval-set seeding,
  * prototype picking, diverse few-shot pools.
  *
  * Determinism is the whole design: vectors are quantized to integer
  * micros (floor(x·1e6)) and distances are exact integer squared-L2, so
  * argmax-with-(dist DESC, id ASC)-tie is a pure function of the data —
  * any partitioning, any engine. That is what lets an unrolled DuckDB
  * CTE re-derive the full greedy trajectory bit-for-bit (q_coreset).
  *
  * Shape at 100 TB: k passes over the corpus, each ONE map-side scan
  * computing min-distance to ≤ k broadcast-literal centers (k·dim longs
  * inlined in the plan) + a TakeOrdered(1) reduction — no shuffle of
  * the data, ever. The k selected rows round-trip the driver (the
  * documented bounded-table exception, same as the IVF centroids).
  * Work is O(n·k²·dim) worst case — the known cost of exact greedy;
  * past k ≈ 64 use IVF cells as a pre-partition and run greedy per
  * cell.
  */
object Coreset {

  /** The selected trajectory: (pick_order, <idCol>, far_dist) with
    * far_dist = the squared-L2 micro distance of pick i to the previous
    * i−1 centers — a non-increasing sequence (the coverage radius as it
    * shrinks). Stops early if the corpus is fully covered (radius 0)
    * before k picks.
    */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 64,
      s"k must be in [1, 64] (greedy is O(n·k²); pre-partition past that): $k")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("__id"),
        VectorStats.microUnits(col(vecCol), 1000000L).as("__v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = base.orderBy("__id").limit(1).collect()(0)
      var picks = Vector((seed.getLong(0), seed.getSeq[Long](1).toIndexedSeq, 0L))
      var covered = false
      while (picks.size < k && !covered) {
        val centers = array(picks.map { case (_, v, _) =>
          array(v.map(lit): _*) }: _*)
        val dist = aggregate(centers, lit(Long.MaxValue), (acc, c) =>
          least(acc, aggregate(zip_with(col("__v"), c,
            (x, y) => (x - y) * (x - y)), lit(0L), (a, s) => a + s)))
        val next = base.select(col("__id"), col("__v"), dist.as("__d"))
          .orderBy(col("__d").desc, col("__id").asc).limit(1).collect()(0)
        if (next.getLong(2) == 0L) covered = true
        else picks :+= ((next.getLong(0), next.getSeq[Long](1).toIndexedSeq,
          next.getLong(2)))
      }
      import spark.implicits._
      picks.zipWithIndex.map { case ((id, _, d), i) => (i.toLong, id, d) }
        .toDF("pick_order", idCol, "far_dist")
    } finally { base.unpersist(); () }
  }
}
