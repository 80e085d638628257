package graft

import org.apache.spark.sql.functions._
import graft.operators.Trend

class TrendSpec extends SparkTestBase {

  test("olsPerGroup recovers exact slope/intercept, stable across partitionings") {
    import spark.implicits._
    // A: y = 2x + 1 exactly; B: single point; C: zero x-variance
    val df = Seq(
      ("A", 0L, 1L), ("A", 1L, 3L), ("A", 2L, 5L),
      ("B", 7L, 7L),
      ("C", 4L, 1L), ("C", 4L, 9L)
    ).toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Trend.olsPerGroup(d, Seq("g"), col("x"), col("y"))
        .orderBy("g")
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    val got = run(df)
    assert(got.map(_._1) == Seq("A", "B", "C"))
    assert(got(0)._3.contains(2.0) && got(0)._4.contains(1.0))
    assert(got(1)._3.isEmpty && got(1)._4.isEmpty)
    assert(got(2)._3.isEmpty && got(2)._4.isEmpty)
    assert(run(df.repartition(4)) == got)
  }

  test("olsPerGroup on a noisy exact-integer line finds the least-squares fit") {
    import spark.implicits._
    // residuals +1,-1 symmetric around y = 3x + 2
    val pts = Seq((0L, 3L), (1L, 4L), (2L, 9L), (3L, 10L))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = Trend.olsPerGroup(df, Seq("g"), col("x"), col("y")).collect()(0)
    // closed form: n=4, sx=6, sy=26, sxy=52, sxx=14 -> slope=(208-156)/(56-36)=2.6
    assert(math.abs(r.getDouble(2) - 2.6) < 1e-12)
    assert(math.abs(r.getDouble(3) - (26.0 - 2.6 * 6.0) / 4.0) < 1e-12)
  }
}
