package graft

import org.apache.spark.sql.functions._

/** MMR selection: exact agreement with a brute-force reference greedy
  * (same micro quantization, same tie rules), a duplicate-penalty
  * sanity case, and partitioning-invariance of the trajectory.
  */
class MmrSpec extends SparkTestBase {

  import graft.operators.Mmr

  private val planted: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(0.5f, 0.0f),   // query (min id)
    2L -> Array(1.0f, 1.0f),   // high rel, big norm
    3L -> Array(1.0f, 1.0f),   // exact duplicate of 2
    4L -> Array(0.25f, -0.5f), // low rel, anti-correlated with 2
    5L -> Array(0.0f, 0.75f))  // zero rel, orthogonal to query

  private def df = {
    import spark.implicits._
    planted.toDF("id", "vec")
  }

  /** Same arithmetic as the operator: floor(float→double · 1e6) micros,
    * long dot products, greedy argmax of rel − max-sim with (score DESC,
    * id ASC) ties, query = min-id vector excluded from the pool.
    */
  private def reference(data: Seq[(Long, Array[Float])],
      k: Int): Seq[(Long, Long, Long)] = {
    def micro(a: Array[Float]): Array[Long] =
      a.map(x => math.floor(x.toDouble * 1e6).toLong)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val q = micro(data.minBy(_._1)._2)
    val pool = data.filterNot(_._1 == data.map(_._1).min)
      .map { case (id, v) => (id, micro(v), dot(micro(v), q)) }
    var picks = Vector.empty[(Long, Array[Long], Long)]
    (0 until k).foreach { _ =>
      val cand = pool.filterNot(c => picks.exists(_._1 == c._1)).map {
        case (id, v, rel) =>
          val score = if (picks.isEmpty) rel
          else rel - picks.map(p => dot(v, p._2)).max
          (id, v, score)
      }
      val best = cand.minBy { case (id, _, s) => (-s, id) }
      picks :+= best
    }
    picks.zipWithIndex.map { case ((id, _, s), i) => (i.toLong, id, s) }
  }

  test("trajectory matches the brute-force reference exactly") {
    val got = Mmr.select(df, "id", "vec", k = 4)
      .orderBy("pick_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == reference(planted, 4))
  }

  test("an exact duplicate is penalized by its full self-similarity") {
    val got = Mmr.select(df, "id", "vec", k = 4)
      .orderBy("pick_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pick 0 is id 2 (max rel, tie with its duplicate broken by id)
    assert(got(0)._2 == 2L && got(0)._3 == 500000L * 1000000L)
    // the duplicate's marginal score once 2 is taken: rel − ‖x‖² < 0,
    // so both diverse candidates (4, 5) must precede id 3
    val order = got.map(_._2).toSeq
    assert(order.indexOf(3L) > order.indexOf(4L))
    assert(order.indexOf(3L) > order.indexOf(5L))
  }

  test("k beyond the candidate pool fails fast with a clear message") {
    import spark.implicits._
    val tiny = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    // pool = 2 (three rows minus the query row) — k=3 must not reach the
    // greedy loop's collect
    val e = intercept[IllegalArgumentException] {
      Mmr.select(tiny, "vec_id", "embedding", 3)
    }
    assert(e.getMessage.contains("candidate pool"))
  }

  test("trajectory is partitioning-invariant and never repeats an id") {
    val emb = Tables.t(spark, sf, "embeddings")
    val a = Mmr.select(emb, "vec_id", "embedding", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Mmr.select(emb.repartition(7), "vec_id", "embedding", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    assert(a.map(_._2).distinct.size == a.size, "an id was selected twice")
    val minId = emb.agg(min(col("vec_id"))).collect()(0).getLong(0)
    assert(!a.map(_._2).contains(minId), "query vector must not select itself")
  }
}
