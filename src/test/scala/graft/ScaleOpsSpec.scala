package graft

import org.apache.spark.sql.functions._

/** Round-5 scale-surface operators: bloom semi-join reduction, Misra-Gries
  * heavy hitters, TF-IDF, SemDeDup-style semantic dedup, Z-order, time
  * windows, OFFSET — each checked against an independent reimplementation
  * or a structural guarantee, not against itself.
  */
class ScaleOpsSpec extends SparkTestBase {

  import graft.operators.{BloomJoin, HeavyHitters, Bm25, Dedup}

  // ---- bloom semi-join reduction ---------------------------------------

  test("bloom prefilter never drops a true match (no false negatives)") {
    val orders = Tables.t(spark, sf, "orders")
    val dim = Tables.t(spark, sf, "customer")
      .filter(col("c_acctbal") > 5000.0).select("c_custkey")
    val dimKeys = dim.collect().map(_.getLong(0)).toSet
    val kept = BloomJoin.prefilter(orders, "o_custkey", dim, "c_custkey")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val trueMatches = orders.select("o_custkey").collect()
      .map(_.getLong(0)).toSet.intersect(dimKeys)
    assert(trueMatches.subsetOf(kept),
      s"bloom dropped true matches: ${trueMatches -- kept}")
  }

  test("reduceThenJoin equals the plain join exactly") {
    val orders = Tables.t(spark, sf, "orders")
    val dim = Tables.t(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val got = BloomJoin.reduceThenJoin(orders, "o_custkey", dim, "c_custkey")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val want = orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("bloom prefilter keeps close to the exact-match cardinality (fpp bound)") {
    val orders = Tables.t(spark, sf, "orders")
    // tiny dim: 10 keys out of ~150 customers => most orders filtered out
    val dim = Tables.t(spark, sf, "customer")
      .filter(col("c_custkey") < 10).select("c_custkey")
    val exact = orders.join(dim, col("o_custkey") === col("c_custkey")).count()
    val kept = BloomJoin.prefilter(orders, "o_custkey", dim, "c_custkey", fpp = 0.01).count()
    val total = orders.count()
    // kept = exact + fpp-share of non-matches (few percent slack)
    assert(kept >= exact && kept <= exact + math.max(10L, (0.05 * (total - exact)).toLong),
      s"kept=$kept exact=$exact total=$total")
  }

  // ---- Misra-Gries heavy hitters ---------------------------------------

  test("MisraGries candidates are a superset of true heavy hitters under eviction") {
    val mg = new graft.functions.Aggregators.MisraGries(5)
    // adversarial stream: 2 true heavy keys among 50 noise keys, capacity 5
    val stream = new scala.util.Random(7).shuffle(
      (Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2") ++
        (1 to 50).flatMap(i => Seq.fill(6)(s"noise$i"))).toList)
    val n = stream.size.toLong
    // simulate distributed partials: 8 partitions reduced then merged
    val buf = stream.grouped(math.max(1, stream.size / 8)).toSeq
      .map(part => part.foldLeft(mg.zero)(mg.reduce))
      .foldLeft(mg.zero)(mg.merge)
    val candidates = mg.finish(buf).toSet
    // guarantee: count > n/(cap+1) => present
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > n / 6).keys.toSet
    assert(truth.subsetOf(candidates), s"missing: ${truth -- candidates}")
    assert(candidates.size <= 5)
  }

  test("MisraGries superset guarantee holds across random streams and partitionings") {
    // randomized property: for arbitrary Zipf-ish streams, any key with
    // count > N/(cap+1) must survive arbitrary partition/merge orders
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val cap = 4 + rnd.nextInt(12)
      val stream = List.fill(2000)(s"k${math.min(rnd.nextInt(rnd.nextInt(200) + 1), 60)}")
      val mg = new graft.functions.Aggregators.MisraGries(cap)
      val parts = stream.grouped(1 + rnd.nextInt(300)).toSeq
      val buf = rnd.shuffle(parts.map(p => p.foldLeft(mg.zero)(mg.reduce)))
        .foldLeft(mg.zero)(mg.merge)
      val candidates = mg.finish(buf).toSet
      assert(candidates.size <= cap)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 > stream.size.toLong / (cap + 1)).keys.toSet
      assert(truth.subsetOf(candidates),
        s"seed=$seed cap=$cap missing=${truth -- candidates}")
    }
  }

  test("exactByShare equals the naive groupBy-count-filter") {
    import spark.implicits._
    val items = Tables.t(spark, sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("key"))
    val got = HeavyHitters.exactByShare(items, col("key"), share = 200L,
        capacity = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val n = items.count()
    val want = items.groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 200 >= n).orderBy("key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  // ---- TF-IDF -----------------------------------------------------------

  test("TF-IDF matches a hand-rolled scorer on an inline corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare word here"),
      (2L, "common common common word"),
      (3L, "rare rare word word word common"),
      (4L, "nothing relevant at all")).toDF("id", "text")
    val terms = Seq("rare", "common")
    val got = Bm25.tfIdfMicros(docs, "id", col("text"), terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val corpus = Map(
      1L -> "rare word here", 2L -> "common common common word",
      3L -> "rare rare word word word common", 4L -> "nothing relevant at all")
    val toks = corpus.view.mapValues(_.toLowerCase.split(" ").toSeq).toMap
    val nDocs = corpus.size.toDouble
    val expected = toks.flatMap { case (id, tk) =>
      val scores = terms.flatMap { term =>
        val tf = tk.count(_ == term).toDouble
        if (tf == 0) None
        else {
          val df = toks.values.count(_.contains(term)).toDouble
          Some(math.round(tf * math.log(nDocs / df) * 1e6))
        }
      }
      if (scores.isEmpty) None else Some(id -> scores.sum)
    }
    assert(got == expected)
  }

  // ---- semantic dedup ---------------------------------------------------

  test("semanticDedup keeps one representative per similar set, cross-cell pairs untouched") {
    import spark.implicits._
    // two well-separated cells; near-identical vectors 10/11 in cell A,
    // 20/21/22 in cell B, 30 alone in cell B but dissimilar
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val centroids = Seq((0L, v(1, 0, 0, 0)), (1L, v(0, 1, 0, 0)))
      .toDF("cid", "cvec")
    val embs = Seq(
      (10L, v(1, 0.01, 0, 0)), (11L, v(1, 0.011, 0, 0)),
      (20L, v(0, 1, 0.01, 0)), (21L, v(0, 1, 0.012, 0)), (22L, v(0, 1, 0.013, 0)),
      (30L, v(0.1, 1, -0.9, 0))).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(embs, "vec_id", "embedding",
        centroids, "cid", "cvec", tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // survivors: 10 (rep of {10,11}), 20 (rep of {20,21,22}), 30 (alone)
    assert(out.keySet == Set(10L, 20L, 30L), s"got $out")
    assert(out(10L) == 0L && out(20L) == 1L && out(30L) == 1L)
  }

  // ---- Z-order ----------------------------------------------------------

  test("zorder2 matches a bit-by-bit reference interleave") {
    import spark.implicits._
    def refInterleave(x: Int, y: Int): Long =
      (0 until 16).map { i =>
        ((((x >> i) & 1).toLong) << (2 * i)) | ((((y >> i) & 1).toLong) << (2 * i + 1))
      }.reduce(_ | _)
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (65536 + 7, 3)) // low-16-bit masking on overflow
    val df = cases.toDF("x", "y")
    val got = df.select(graft.functions.zorder2(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (x, y) => refInterleave(x & 0xffff, y & 0xffff) }
    assert(got == want)
  }

  test("z-ordered sort keeps both dimensions locally clustered") {
    // structural property: sorting by z, the average per-step jump in x
    // and y is small relative to the domain (locality on both axes)
    import spark.implicits._
    val pts = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    val sorted = pts
      .select(col("x"), col("y"), graft.functions.zorder2(col("x"), col("y")).as("z"))
      .orderBy("z").collect().map(r => (r.getInt(0), r.getInt(1)))
    val jumps = sorted.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      math.abs(x2 - x1) + math.abs(y2 - y1) }.toSeq
    val avgJump = jumps.sum.toDouble / jumps.size
    assert(avgJump < 3.0, s"avg Manhattan jump $avgJump — z-curve should stay local")
  }

  // ---- time windows ------------------------------------------------------

  test("hopping windows assign every event to exactly window/slide windows") {
    val events = Tables.t(spark, sf, "events")
    val n = events.count()
    val windowed = events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val total = windowed.agg(sum("n")).first().getLong(0)
    assert(total == 2 * n, s"each event must land in exactly 2 hopping windows")
  }

  test("tumbling windows partition events exactly once and align to the hour") {
    val events = Tables.t(spark, sf, "events")
    val n = events.count()
    val w = events.groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    assert(w.agg(sum("n")).first().getLong(0) == n)
    val misaligned = w.select(col("window.start").cast("long").as("s"))
      .filter(col("s") % 3600 =!= 0).count()
    assert(misaligned == 0)
  }

  // ---- table checksum ----------------------------------------------------

  test("table checksum is invariant to row order and partitioning") {
    import graft.operators.Checksum
    val li = Tables.t(spark, sf, "lineitem")
    val cols = Seq(col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string"), col("l_returnflag"))
    def sum(df: org.apache.spark.sql.DataFrame) =
      Checksum.grouped(df, Nil, cols).first()
    val base = sum(li)
    val shuffled = sum(li.repartition(17, col("l_suppkey")))
    val sorted = sum(li.orderBy(col("l_extendedprice").desc))
    assert(base.getLong(1) == shuffled.getLong(1))
    assert(base.getLong(1) == sorted.getLong(1))
    assert(base.getLong(0) == shuffled.getLong(0))
  }

  test("reduceThenJoin works when both sides share the key column name") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload")
    val dim = Seq((1L, "x"), (3L, "y")).toDF("k", "attr")
    val got = graft.operators.BloomJoin.reduceThenJoin(fact, "k", dim, "k")
      .select("payload", "attr").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "x"), ("c", "y")))
  }

  test("canonical rendering distinguishes null-shift and separator-injection rows") {
    import graft.operators.Checksum
    import spark.implicits._
    // concat_ws would render both rows of each pair identically
    val nullShiftA = Seq(("a", null.asInstanceOf[String], "b")).toDF("x", "y", "z")
    val nullShiftB = Seq(("a", "b", null.asInstanceOf[String])).toDF("x", "y", "z")
    val sepInjectA = Seq(("a|b", "c")).toDF("x", "y").withColumn("z", lit("p"))
    val sepInjectB = Seq(("a", "b|c")).toDF("x", "y").withColumn("z", lit("p"))
    def ck(df: org.apache.spark.sql.DataFrame) =
      Checksum.grouped(df, Nil, Seq(col("x"), col("y"), col("z"))).first().getLong(1)
    assert(ck(nullShiftA) != ck(nullShiftB))
    assert(ck(sepInjectA) != ck(sepInjectB))
  }

  test("table checksum detects a single changed row") {
    import graft.operators.Checksum
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    val b = Seq((1L, "x"), (2L, "y"), (3L, "Z")).toDF("id", "s")
    val cols = Seq(col("id").cast("string"), col("s"))
    val ca = Checksum.grouped(a, Nil, cols).first().getLong(1)
    val cb = Checksum.grouped(b, Nil, cols).first().getLong(1)
    assert(ca != cb)
  }

  // ---- offset ------------------------------------------------------------

  test("offset+limit returns exactly the requested page in order") {
    val orders = Tables.t(spark, sf, "orders")
    val all = orders.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    val page = orders.select("o_orderkey").orderBy("o_orderkey")
      .offset(117).limit(42).collect().map(_.getLong(0)).toSeq
    assert(page == all.slice(117, 159))
  }

  // ---- skew diagnostics --------------------------------------------------

  test("SkewStats: hot_salt sizes the hottest key in even-partition units") {
    import spark.implicits._
    import graft.operators.SkewStats
    // 100 rows of key 1 (half the table) + 100 spread keys: with 8 even
    // partitions the hot key fills ceil(0.5 * 8) = 4 of them
    val df = (Seq.fill(100)(1L) ++ (2L to 101L)).toDF("k")
    val row = SkewStats.summary(df, "k", partitions = 8).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((200L, 101L, 100L, 4L)))
    // a uniform table needs no salt
    val uni = (1L to 64L).toDF("k")
    assert(SkewStats.summary(uni, "k", 8).collect()(0).getLong(3) == 1L)
    // profile head: hottest first, exact integer ppm share
    val head = SkewStats.keyProfile(df, "k", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(head.head == ((1L, 100L, 500000L)), s"got $head")
    assert(head.tail.forall(_._2 == 1L) &&
      head.tail.map(_._1) == head.tail.map(_._1).sorted,
      s"ties must break by key: $head")
  }

  test("skew profile plans as partial count + TakeOrderedAndProject") {
    spark.catalog.clearCache()
    val p = SparkEntry.queries("q_skew_profile")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"head not lowered:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
  }
}
