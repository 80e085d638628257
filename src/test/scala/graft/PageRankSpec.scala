package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkTestBase {

  /** Independent model of the integer recurrence over in-memory maps. */
  private def model(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val vs = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = vs.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = vs.map(v => v -> (150000L + 85L * inflow.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("matches the integer model on a hand-built graph with a dangling sink") {
    import spark.implicits._
    // d is dangling (no out-edges): its mass leaks, per the contract.
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "d"))
    val got = PageRank.ranks(edges.toDF("s", "t"), "s", "t", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == model(edges, 3))
  }

  test("partitioning-invariant: 1-partition and 13-partition runs agree") {
    import spark.implicits._
    val edges = (1 to 200).map(i => (s"v${i % 17}", s"v${(i * 7) % 23}"))
      .filter { case (a, b) => a != b }
    val df1 = edges.toDF("s", "t").repartition(1)
    val df13 = edges.toDF("s", "t").repartition(13)
    val r1 = PageRank.ranks(df1, "s", "t", 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val r13 = PageRank.ranks(df13, "s", "t", 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == r13)
    assert(r1 == model(edges, 4))
  }

  test("a vertex every other vertex links to outranks the periphery") {
    import spark.implicits._
    val star = (1 to 30).flatMap(i => Seq((s"p$i", "hub"), ("hub", s"p$i")))
    val got = PageRank.ranks(star.toDF("s", "t"), "s", "t", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hub") > got("p1") * 5,
      s"hub=${got("hub")} should dominate p1=${got("p1")}")
  }

  test("duplicate edge rows do not change the result (edge set semantics)") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val dup = edges ++ edges ++ edges
    val g1 = PageRank.ranks(edges.toDF("s", "t"), "s", "t", 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val g2 = PageRank.ranks(dup.toDF("s", "t"), "s", "t", 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g1 == g2)
  }
}
