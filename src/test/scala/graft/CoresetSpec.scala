package graft

/** k-center greedy: hand-checkable trajectory on planted geometry, the
  * non-increasing coverage radius, early stop on full coverage, and
  * partitioning-invariance of the whole trajectory.
  */
class CoresetSpec extends SparkTestBase {

  import graft.operators.Coreset

  // four tight clusters at the corners of a square, one point each far
  // apart, plus near-duplicates around corner A — greedy must visit all
  // four corners before any near-duplicate
  private def corners = {
    import spark.implicits._
    Seq(
      (1L, Array(0.0f, 0.0f)),    // corner A (seed: min id)
      (2L, Array(0.01f, 0.0f)),   // near-dup of A
      (3L, Array(0.0f, 0.01f)),   // near-dup of A
      (10L, Array(1.0f, 1.0f)),   // corner C (farthest from A)
      (11L, Array(1.0f, 0.0f)),   // corner B
      (12L, Array(0.0f, 1.0f))    // corner D
    ).toDF("id", "vec")
  }

  test("greedy visits the four corners first, radius non-increasing") {
    val got = Coreset.kCenterGreedy(corners, "id", "vec", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got(0)._2 == 1L, "seed must be the min id")
    assert(got(1)._2 == 10L, "second pick must be the opposite corner")
    // picks 3 and 4 are the remaining corners (dist 1.0 = 1e12 micro²,
    // tie broken by id asc)
    assert(got.drop(2).map(_._2).toSeq == Seq(11L, 12L), s"got: ${got.toSeq}")
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"coverage radius must not increase: ${radii.toSeq}")
  }

  test("trajectory is partitioning-invariant") {
    val a = Coreset.kCenterGreedy(corners, "id", "vec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Coreset.kCenterGreedy(corners.repartition(5), "id", "vec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("early stop when the corpus is covered exactly before k picks") {
    import spark.implicits._
    val dups = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(1.0f, 1.0f))).toDF("id", "vec")
    val got = Coreset.kCenterGreedy(dups, "id", "vec", k = 4).collect()
    assert(got.length == 2, s"two distinct vectors -> two picks: ${got.toSeq}")
    intercept[IllegalArgumentException](
      Coreset.kCenterGreedy(dups, "id", "vec", 0))
  }
}
