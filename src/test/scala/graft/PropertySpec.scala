package graft

import org.apache.spark.sql.functions._

/** Property-style laws over the engine's operators (SURVEY.md §5.3),
  * exercised over a deterministic sweep of inputs (each case is a full
  * Spark job, so the sweep is kept small; scalacheck's shrinking adds
  * nothing over fixed seeds here).
  */
class PropertySpec extends SparkTestBase {

  private lazy val li = Tables.t(spark, sf, "lineitem").cache()

  private def forAllSeeds[A](cases: Seq[A])(body: A => Unit): Unit =
    cases.foreach(body)

  test("filter partitions rows: count(p) + count(!p) == count(*) (no nulls)") {
    forAllSeeds(Seq(-5, 0, 7, 25, 60)) { t0 =>
      val t = t0.toDouble
      val all = li.count()
      val yes = li.filter(col("l_quantity") > t).count()
      val no  = li.filter(!(col("l_quantity") > t)).count()
      assert(yes + no == all)
    }
  }

  test("sort is a permutation: sorted multiset equals input multiset") {
    val before = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = li.orderBy("l_extendedprice", "l_orderkey")
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before == after)
  }

  test("limit(n) returns min(n, count) rows") {
    forAllSeeds(Seq(0, 1, 24, 999, 100000)) { n =>
      val k = n + 1
      assert(li.limit(k).count() == math.min(k.toLong, li.count()))
    }
  }

  test("cast round-trip: int -> string -> int is identity for integral doubles") {
    val bad = li.select(col("l_quantity").cast("int").as("i"))
      .withColumn("rt", col("i").cast("string").cast("int"))
      .filter(col("i") =!= col("rt")).count()
    assert(bad == 0)
  }

  test("union with itself doubles counts; distinct restores them") {
    val keys = li.select("l_orderkey", "l_linenumber", "l_quantity")
    assert(keys.union(keys).count() == 2 * keys.count())
    assert(keys.union(keys).distinct().count() == keys.distinct().count())
  }

  test("BottomK aggregator matches sort+limit (merge-able top-k sketch)") {
    import org.apache.spark.sql.functions.udaf
    val bottom5 = udaf(new graft.functions.Aggregators.BottomK(5))
    val got = li.agg(bottom5(col("l_extendedprice")).as("b5"))
      .collect()(0).getSeq[Double](0).toSeq
    val want = li.orderBy("l_extendedprice").limit(5)
      .collect().map(_.getAs[Double]("l_extendedprice")).toSeq
    assert(got == want)
  }

  test("GeoMean aggregator is invariant to partitioning (merge correctness)") {
    import org.apache.spark.sql.functions.udaf
    val geo = udaf(graft.functions.Aggregators.GeoMean)
    val one = li.coalesce(1).agg(geo(col("l_quantity"))).collect()(0).getDouble(0)
    val many = li.repartition(13).agg(geo(col("l_quantity"))).collect()(0).getDouble(0)
    assert(math.abs(one - many) < 1e-9, s"$one vs $many")
  }

  test("minhash estimator is unbiased-ish across generated token sets") {
    import spark.implicits._
    forAllSeeds(Seq(0, 3, 9, 14, 19)) { sv =>
      val n = 30 + sv
      val a = (0 until n).map(i => s"tok$i")
      val b = (n / 2 until n + n / 2).map(i => s"tok$i") // ~1/3 jaccard
      val trueJ = (a.toSet intersect b.toSet).size.toDouble / (a.toSet union b.toSet).size
      val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
      val sigs = df.select(graft.functions.minhash_sig(col("toks"), 256).as("s"))
        .collect().map(_.getSeq[Long](0))
      val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }.toDouble / 256
      assert(math.abs(est - trueJ) < 0.12, s"est $est vs true $trueJ")
    }
  }
}
