package graft

import org.apache.spark.sql.functions._
import graft.operators.RandomProjection

class RandomProjectionSpec extends SparkTestBase {

  test("weight is deterministic, ternary, and ~1/3 dense (Achlioptas)") {
    val ws = for (i <- 0 until 64; j <- 0 until 16)
      yield RandomProjection.weight("jl", i, j)
    assert(ws.toSet.subsetOf(Set(-1, 0, 1)))
    // P(nonzero) = 1/3: 1024 draws → expect ~341, allow a wide band
    val nz = ws.count(_ != 0)
    assert(nz > 230 && nz < 460, s"nonzero count $nz outside [230,460]")
    // stable across calls (pure function of the seed string)
    assert(RandomProjection.weight("jl", 3, 7) ==
      RandomProjection.weight("jl", 3, 7))
    // different seeds give a different matrix
    val other = for (i <- 0 until 64; j <- 0 until 16)
      yield RandomProjection.weight("other", i, j)
    assert(other != ws)
  }

  test("project computes the exact signed micro fold") {
    import spark.implicits._
    val dimIn = 4
    val vec = Seq(1.5f, -2.0f, 0.25f, 3.0f)
    val df = Seq((1L, vec)).toDF("id", "v")
    val out = RandomProjection.project(df, "id", "v", dimIn, 3, "t").collect()(0)
    val micros = vec.map(x => math.floor(x.toDouble * 1e6).toLong)
    for (j <- 0 until 3) {
      val want = (0 until dimIn)
        .map(i => micros(i) * RandomProjection.weight("t", i, j)).sum
      assert(out.getLong(1 + j) == want, s"dim $j")
    }
  }

  test("projection of the embeddings table is shuffle-free and named p00..") {
    val df = RandomProjection.project(
      graft.Tables.t(spark, sf, "embeddings"), "vec_id", "embedding", 64, 16, "jl")
    assert(df.columns.toSeq ==
      "vec_id" +: (0 until 16).map(j => f"p$j%02d"))
    // one scan, no exchange: the plan must not contain a shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(df.count() == 500)
  }

  test("near pairs stay near, far pairs stay far (deterministic separation)") {
    // The projection is linear up to the micro floor, so the projected
    // distance of (x, x+Δ) scales with Δ wherever the weight rows are
    // nonzero. A 1000× input gap must survive 64→16 by a wide margin —
    // deterministic given the fixed seed, unlike a rank-correlation test
    // at d'=16 where the JL distortion (ε ~ √(ln n / d')) is too loose
    // to assert on.
    import spark.implicits._
    val base = Array.fill(64)(0.5f)
    val near = base.clone(); near(0) += 0.001f
    val far = base.map(_ + 2.0f)
    val df = Seq((0L, base.toSeq), (1L, near.toSeq), (2L, far.toSeq))
      .toDF("id", "v")
    val rows = RandomProjection.project(df, "id", "v", 64, 16, "jl")
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val dNear = d2(rows(0L), rows(1L))
    val dFar = d2(rows(0L), rows(2L))
    assert(dFar > dNear * 1000,
      s"far pair ($dFar) should dwarf near pair ($dNear)")
  }
}
