package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the third leg of the ANN stack next to
  * hyperplane LSH and IVF ([[Similarity]]): vectors compress to `m`
  * small codes (one per subspace), and queries rank candidates with
  * asymmetric distance (ADC) — a per-subspace table lookup instead of a
  * `dim`-wide float loop. The memory story is the point at 100 TB: a
  * 64-dim float vector is 256 bytes; its PQ code (m=8, ks=16) is 8 —
  * the corpus index fits in a fraction of the footprint and the scan
  * never touches raw vectors.
  *
  * Scale shape: codebooks are m·ks·(dim/m) doubles — KBs — trained by a
  * Lloyd step whose recompute is ONE aggregate keyed by (subspace,
  * cell) carrying exact integer micros (order-invariant at any
  * parallelism, the [[Similarity.kmeansStep]] recipe), then collected
  * under the bounded centroid-table contract (Similarity.scala).
  * Encoding and ADC are pure per-row expressions (array lookups are
  * O(1)); top-k lowers to TakeOrderedAndProject. Nothing about the
  * corpus ever shuffles.
  */
object Pq {

  /** Train per-subspace codebooks: seed with the `ks` subvectors of the
    * lowest-id corpus rows (deterministic, no RNG), then run one Lloyd
    * step with exact integer-micro accumulation so the result is
    * identical at any partitioning. Returns books[m][ks][dim/m]; empty
    * cells keep their seed.
    */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ks: Int, scale: Long = 1000000L): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val d0 = dim / m
    val seeds: Array[Array[Array[Double]]] = {
      val rows = corpus.orderBy(col(idCol)).limit(ks)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      require(rows.length == ks, s"need $ks seed vectors, corpus has ${rows.length}")
      Array.tabulate(m)(s => rows.map(_.slice(s * d0, (s + 1) * d0)))
    }
    def subvec(s: Int): Column =
      slice(col(vecCol), lit(s * d0 + 1), lit(d0))
    def cellOf(s: Int): Column = nearestCell(subvec(s), seeds(s))
    // ONE corpus scan: each row emits its m (subspace, cell,
    // micro-subvector) assignments via a per-row explode (small structs),
    // then one grouped aggregate with a constant-size mergeable buffer
    // per (s, cell). (A union of m per-subspace selects would scan the
    // corpus m times — measured 3x slower at sf1.)
    val assigned = corpus.select(explode(array((0 until m).map { s =>
        struct(lit(s).as("s"), cellOf(s).as("cell"),
          VectorStats.microUnits(subvec(s), scale).as("mv"))
      }: _*)).as("e"))
      .select(col("e.s"), col("e.cell"), col("e.mv"))
    val agg = udaf(new VectorStats.VecMoments(d0))
    val sums = assigned.groupBy("s", "cell").agg(agg(col("mv")).as("mo"))
      .select(col("s"), col("cell"), col("mo._1").as("n"), col("mo._2").as("sums"))
      .collect() // m*ks rows — bounded centroid-table contract
    val books = seeds.map(_.map(_.clone()))
    sums.foreach { r =>
      val (s, cell, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
      val sm = r.getSeq[Long](3)
      if (n > 0) books(s)(cell) =
        sm.map(x => x.toDouble / n / scale).toArray
    }
    books
  }

  /** Nearest-centroid argmin by (distance, index) — ONE definition
    * shared by training assignment and encoding: if the metric or
    * tie-break ever changed in one but not the other, training cells
    * and codes would silently disagree and recall would degrade with
    * nothing pointing at the cause.
    */
  private def nearestCell(sub: Column, centroids: Array[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        graft.functions.euclidean_dist(sub, typedLit(c.toSeq)).as("d"),
        lit(i).as("i"))
    }: _*)).getField("i")

  /** PQ encode: array of `m` per-subspace nearest-centroid ids — a pure
    * per-row expression (no shuffle, rides the scan).
    */
  def encodeExpr(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    val m = books.length
    val d0 = books(0)(0).length
    array((0 until m).map { s =>
      nearestCell(slice(vec, lit(s * d0 + 1), lit(d0)), books(s))
    }: _*)
  }

  /** ADC top-k for one query vector over a PQ-encoded corpus: the
    * query's per-subspace distance table (m·ks doubles, computed on the
    * driver) becomes a literal 2-D array; each candidate's approximate
    * distance is an O(m) fold of O(1) lookups. Returns (idCol, adc_dist),
    * the k smallest by (distance, id) — lowers to TakeOrderedAndProject.
    */
  def adcTopK(encoded: DataFrame, idCol: String, codeCol: String,
      query: Array[Double], books: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = books.length
    val d0 = books(0)(0).length
    val table: Seq[Seq[Double]] = (0 until m).map { s =>
      val q = query.slice(s * d0, (s + 1) * d0)
      books(s).toSeq.map { c =>
        var acc = 0.0; var i = 0
        while (i < d0) { val dx = q(i) - c(i); acc += dx * dx; i += 1 }
        acc
      }
    }
    val tbl = typedLit(table)
    val dist = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc +
        element_at(element_at(tbl, s + 1), element_at(col(codeCol), s + 1) + 1))
    encoded.select(col(idCol), dist.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }
}
