package graft

import org.apache.spark.sql.functions._
import graft.operators.HistQuantile

/** Histogram-quantile laws: the value-error contract (estimate is the
  * upper edge of the true quantile's bucket — never below the exact
  * order statistic, at most one bucket width above), merge linearity
  * (sketch of the union == cellwise sum of shard sketches, bit-exact),
  * partitioning invariance, and the clamp edges.
  */
class HistQuantileSpec extends SparkTestBase {

  private val Lo = 0L
  private val Hi = 12800000L
  private val Buckets = 64
  private val Width = (Hi - Lo) / Buckets
  private lazy val li = Tables.t(spark, sf, "lineitem")
    .select(col("l_returnflag").as("g"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
    .cache()

  test("estimate brackets the exact ceil-rank order statistic within one bucket") {
    val sk = HistQuantile.sketchBy(li, Seq("g"), col("c"), Lo, Hi, Buckets)
    val phis = Seq(250000L, 500000L, 900000L, 990000L, 1000000L)
    val est = HistQuantile.quantiles(sk, Seq("g"), Lo, Hi, Buckets, phis)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byGroup = li.collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for ((grp, vals) <- byGroup; phi <- phis) {
      val rank = ((vals.size.toLong * phi + 999999L) / 1000000L).toInt.max(1)
      val exact = vals(rank - 1)
      val e = est((grp, phi))
      assert(exact < e && exact >= e - Width,
        s"group $grp phi=$phi: exact=$exact not in [${e - Width}, $e)")
    }
  }

  test("merge of shard sketches equals the whole-corpus sketch bit-for-bit") {
    val Array(a, b) = li.randomSplit(Array(0.5, 0.5), seed = 11L)
    val merged = HistQuantile.merge(
      HistQuantile.sketchBy(a, Seq("g"), col("c"), Lo, Hi, Buckets)
        .union(HistQuantile.sketchBy(b, Seq("g"), col("c"), Lo, Hi, Buckets)),
      Seq("g"))
    val whole = HistQuantile.sketchBy(li, Seq("g"), col("c"), Lo, Hi, Buckets)
    assert(merged.except(whole).count() === 0L)
    assert(whole.except(merged).count() === 0L)
  }

  test("sketch and estimates are partitioning-invariant") {
    def est(parts: Int) = HistQuantile.quantiles(
        HistQuantile.sketchBy(li.repartition(parts), Seq("g"), col("c"),
          Lo, Hi, Buckets),
        Seq("g"), Lo, Hi, Buckets, Seq(500000L, 990000L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(est(1) == est(13))
  }

  test("bucketOf clamps below-range to 0 and at/above-range to the last bucket") {
    import spark.implicits._
    val vals = Seq(-5L, Lo, Lo + Width - 1, Lo + Width, Hi - 1, Hi, Hi + 999L)
      .toDF("v")
    val got = vals.select(
      HistQuantile.bucketOf(col("v"), Lo, Hi, Buckets).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 0L, 1L, Buckets - 1L, Buckets - 1L, Buckets - 1L))
  }

  test("NULL values are dropped: neither a phantom bucket nor a count toward N") {
    import spark.implicits._
    // Spark's nulls-first window order would fold a NULL-bucket cell
    // into every cumulative count, skewing every estimate — sketchBy
    // must drop nulls so the sketch (and N) covers only real values.
    val base = Seq[(String, java.lang.Long)](
      ("g", 100L), ("g", 300L), ("g", 500L), ("g", 700L))
    val withNulls = base ++ Seq[(String, java.lang.Long)](
      ("g", null), ("g", null), ("g", null))
    def sk(rows: Seq[(String, java.lang.Long)]) =
      HistQuantile.sketchBy(rows.toDF("g", "v"), Seq("g"), col("v"),
        0L, 800L, 8)
    val clean = sk(base).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val dirty = sk(withNulls).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(dirty == clean, s"nulls leaked into the sketch: $dirty vs $clean")
    // and the quantile estimates are therefore identical too
    def est(rows: Seq[(String, java.lang.Long)]) =
      HistQuantile.quantiles(sk(rows), Seq("g"), 0L, 800L, 8,
        Seq(500000L, 1000000L))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(est(withNulls) == est(base))
  }

  test("range misconfiguration fails fast") {
    intercept[IllegalArgumentException](
      HistQuantile.sketchBy(li, Seq("g"), col("c"), 0L, 1000L, 64)) // 1000 % 64 != 0
    intercept[IllegalArgumentException](
      HistQuantile.quantiles(li, Seq("g"), 0L, 1280L, 64, Seq(0L))) // phi out of range
  }
}
