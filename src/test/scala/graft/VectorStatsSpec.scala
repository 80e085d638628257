package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorStats

class VectorStatsSpec extends SparkTestBase {

  test("moments are exact integer micro-sums, stable across partitionings") {
    import spark.implicits._
    // micro = floor(x * 10): (-0.25 -> -3, not -2 — floor, not truncate)
    val df = Seq(
      Seq(0.1f, -0.25f),
      Seq(0.2f, 0.55f),
      Seq(0.3f, 0.0f)
    ).toDF("vec")
    def run(d: org.apache.spark.sql.DataFrame) =
      VectorStats.moments(d, col("vec"), dim = 2, scale = 10L)
        .orderBy("dim")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getDecimal(3).longValueExact())).toSeq
    val expected = Seq(
      (0, 3L, 1L + 2L + 3L, 1L + 4L + 9L),
      // 0.55f*10 = 5.5000000... -> floor 5 (float 0.55 is slightly above)
      (1, 3L, -3L + 5L + 0L, 9L + 25L + 0L))
    assert(run(df) == expected)
    assert(run(df.repartition(3)) == expected)
  }

  test("sumsq survives past Long.MaxValue (the ~9M-row production wrap)") {
    import spark.implicits._
    // micro = 2e9 per element (inside the |3e9| per-term guard), so each
    // m^2 term is 4e18 — three rows already exceed Long.MaxValue
    // (9.22e18). The old all-long accumulator wrapped silently here.
    val df = Seq.fill(10)(Seq(2.0f)).toDF("vec").repartition(3)
    val r = VectorStats.moments(df, col("vec"), dim = 1, scale = 1000000000L)
      .collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getLong(2) == 10L * 2000000000L)
    assert(BigInt(r.getDecimal(3).toBigInteger) ==
      BigInt(10) * BigInt("4000000000000000000"))
  }

  test("moments rejects ragged vectors loudly") {
    import spark.implicits._
    val df = Seq(Seq(0.1f, 0.2f), Seq(0.3f)).toDF("vec")
    val e = intercept[Exception] {
      VectorStats.moments(df, col("vec"), dim = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("standardize z-scores each dimension; zero-variance dims map to 0") {
    import spark.implicits._
    // dim 0: values 0 and 2 -> mean 1, population std 1 -> z = -1, +1
    // dim 1: constant 5 -> zero variance -> 0.0
    val df = Seq(Seq(0.0f, 5.0f), Seq(2.0f, 5.0f)).toDF("vec")
    val got = VectorStats.standardize(df, col("vec"), dim = 2)
      .select("std_vec").as[Seq[Double]].collect().map(_.toList).sortBy(_.head)
    assert(got.length == 2)
    assert(math.abs(got(0)(0) + 1.0) < 1e-9 && math.abs(got(1)(0) - 1.0) < 1e-9)
    assert(got(0)(1) == 0.0 && got(1)(1) == 0.0)
  }
}
