package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** Count-min sketch laws: the overestimate guarantee (est ≥ exact for
  * every key, with equality when no collision), cellwise-sum
  * mergeability (sketch(A ⊎ B) = sketch(A) + sketch(B) — the linearity
  * that makes CMS partial-aggregable at scale), and
  * partitioning-invariance of the table itself.
  */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val toks = Tables.t(spark, sf, "documents")
    .select(explode(split(lower(col("text")), " ")).as("token"))
    .cache()

  test("CMS estimate is >= the exact count for every token") {
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
    val est = CountMin.estimate(exact, "token",
      CountMin.sketch(toks, "token", depth = 4, width = 256),
      depth = 4, width = 256)
    val bad = est.filter(col("cms_est") < col("exact_cnt")).count()
    assert(bad === 0L)
    // and the sketch is not vacuous: at width 256 most of the vocab-sized
    // key set should estimate exactly (few collisions)
    val total = est.count()
    val exactHits = est.filter(col("cms_est") === col("exact_cnt")).count()
    assert(exactHits * 2 > total,
      s"only $exactHits/$total keys estimate exactly — hashing broken?")
  }

  test("narrow sketch still bounds error by N/width per row pair") {
    // depth 2, width 8 forces collisions: estimates inflate but never
    // beyond exact + N (trivial bound) and never below exact.
    val n = toks.count()
    val est = CountMin.estimate(
      toks.groupBy("token").agg(count(lit(1)).as("exact_cnt")), "token",
      CountMin.sketch(toks, "token", depth = 2, width = 8),
      depth = 2, width = 8)
    assert(est.filter(col("cms_est") < col("exact_cnt")).count() === 0L)
    assert(est.filter(col("cms_est") > col("exact_cnt") + lit(n)).count() === 0L)
    assert(est.filter(col("cms_est") > col("exact_cnt")).count() > 0L,
      "width 8 over a full vocab should collide somewhere")
  }

  test("sketches merge by cellwise sum (linearity)") {
    val Array(a, b) = toks.randomSplit(Array(0.5, 0.5), seed = 7L)
    val whole = CountMin.sketch(a.union(b), "token", depth = 3, width = 64)
    val merged = CountMin.sketch(a, "token", depth = 3, width = 64)
      .union(CountMin.sketch(b, "token", depth = 3, width = 64))
      .groupBy("cms_row", "cms_bucket").agg(sum("cnt").as("cnt"))
    assert(whole.except(merged).count() === 0L)
    assert(merged.except(whole).count() === 0L)
  }

  test("per-group sketches merge to exactly the whole-corpus sketch") {
    val keyed = Tables.t(spark, sf, "documents")
      .select(col("source"), explode(split(lower(col("text")), " ")).as("token"))
    val merged = CountMin.merge(
      CountMin.sketchBy(keyed, "source", "token", depth = 3, width = 64))
    val whole = CountMin.sketch(keyed.select("token"), "token",
      depth = 3, width = 64)
    assert(merged.except(whole).count() === 0L)
    assert(whole.except(merged).count() === 0L)
  }

  test("estimate keeps duplicate query rows and tolerates a cnt column") {
    import spark.implicits._
    val cms = CountMin.sketch(toks, "token", depth = 4, width = 256)
    // duplicate rows + a column named like the sketch's internals (cnt):
    // the old all-columns groupBy collapsed the former and clashed on the
    // latter
    val tok = toks.limit(1).collect()(0).getString(0)
    val queries = Seq((tok, 1L), (tok, 1L), (tok, 2L)).toDF("token", "cnt")
    val est = CountMin.estimate(queries, "token", cms, depth = 4, width = 256)
    assert(est.count() === 3L, "duplicate query rows must be preserved")
    assert(est.columns.toSeq === Seq("token", "cnt", "cms_est"))
    val exact = toks.filter(col("token") === tok).count()
    assert(est.select("cms_est").collect().forall(_.getLong(0) >= exact))
  }

  test("sketch table is identical at any partitioning") {
    val p1 = CountMin.sketch(toks.repartition(1), "token", depth = 4, width = 256)
    val p13 = CountMin.sketch(toks.repartition(13), "token", depth = 4, width = 256)
    assert(p1.except(p13).count() === 0L)
    assert(p13.except(p1).count() === 0L)
  }
}
