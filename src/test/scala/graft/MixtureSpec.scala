package graft

import org.apache.spark.sql.functions._

/** Domain-mixture reweighting: weight arithmetic against hand-computed
  * values, and the sampled corpus against its plan.
  */
class MixtureSpec extends SparkTestBase {

  import graft.operators.Mixture

  private def corpus = {
    import spark.implicits._
    ((1 to 10).map(i => (i.toLong, "web")) ++
      (11 to 15).map(i => (i.toLong, "code")) ++
      (16 to 18).map(i => (i.toLong, "books")))
      .toDF("id", "src")
  }

  test("weights: scarcest source caps the mixture; fractions are exact") {
    // targets 50/50 over web(10)/code(5): M = min(10/.5, 5/.5) = 10
    val got = Mixture.weights(corpus, "src", Map("web" -> 0.5, "code" -> 0.5))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got("web") == ((10L, 0.5, 0.5, 5L)), s"web: ${got("web")}")
    assert(got("code") == ((5L, 0.5, 1.0, 5L)), s"code: ${got("code")}")
    assert(!got.contains("books"), "untargeted source must be excluded")
  }

  test("weights: a targeted source with no rows caps the mixture at zero") {
    // 'video' is targeted but absent: M = min(..., 0/0.5) = 0 -> nothing
    // is achievable, and the absent source is REPORTED, not dropped
    val got = Mixture.weights(corpus, "src", Map("web" -> 0.5, "video" -> 0.5))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getLong(4)))).toMap
    assert(got.keySet == Set("web", "video"), s"absent source vanished: $got")
    assert(got("video") == ((0L, 0.0, 0L)))
    assert(got("web") == ((10L, 0.0, 0L)), "unachievable mixture must zero all sources")
  }

  test("weights: rejects empty and out-of-range targets") {
    intercept[IllegalArgumentException](Mixture.weights(corpus, "src", Map.empty))
    intercept[IllegalArgumentException](
      Mixture.weights(corpus, "src", Map("web" -> 1.5)))
  }

  test("sample: only targeted sources survive, and it is a subset") {
    val ids = corpus.select("id").collect().map(_.getLong(0)).toSet
    val out = Mixture.sample(corpus, "src", Map("web" -> 0.6, "code" -> 0.4), seed = 7L)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("web", "code")(r.getString(1))),
      "books rows leaked through the mixture")
    assert(out.forall(r => ids(r.getLong(0))), "sample invented rows")
    // seeded determinism
    val again = Mixture.sample(corpus, "src", Map("web" -> 0.6, "code" -> 0.4), seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
  }

  test("hashSplit: total partition, near-target proportions, repartition-stable") {
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, sf, "documents")
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val out = Mixture.hashSplit(docs, "doc_id", splits)
    val n = docs.count()
    // every row lands in exactly one split
    assert(out.count() == n)
    val byName = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet.subsetOf(Set("train", "valid", "test")))
    // proportions within a loose md5-uniformity band
    assert(math.abs(byName.getOrElse("train", 0L).toDouble / n - 0.8) < 0.1,
      s"train share drifted: $byName")
    // assignment is a pure function of the id: any repartitioning/order
    // yields the identical membership
    val a = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Mixture.hashSplit(docs.repartition(13), "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    intercept[IllegalArgumentException](
      Mixture.hashSplit(docs, "doc_id", Seq("a" -> 0.5)))
  }

  test("shuffleShard: exact permutation + exact shard sizes, repartition-stable, seed-sensitive") {
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, sf, "documents").select("doc_id")
    val n = docs.count()
    val k = 7
    val out = Mixture.shuffleShard(docs, "doc_id", seed = 42L, shards = k,
      chunks = 8)
    val rows = out.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    // pos is the exact 1..n permutation of the md5(seed:id) order
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq)
    val expectOrder = rows.map(_._1).sortBy(id =>
      (java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"42:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16), id))
    assert(rows.sortBy(_._3).map(_._1).toSeq == expectOrder.toSeq,
      "permutation diverged from the md5 reference order")
    // shard sizes are exact NTILE: every shard within one row of n/k,
    // big shards first
    val sizes = rows.groupBy(_._2).map { case (s2, rs) => s2 -> rs.size.toLong }
    assert(sizes.keySet == (1L to k).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(sizes.toSeq.sortBy(_._1).map(_._2).sorted.reverse ==
      sizes.toSeq.sortBy(_._1).map(_._2), "bigger shards must come first")
    // pure function of (seed, id): repartitioning changes nothing
    val b = Mixture.shuffleShard(docs.repartition(13), "doc_id", 42L, k,
        chunks = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(rows.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // a different seed is a genuinely different permutation
    val c = Mixture.shuffleShard(docs, "doc_id", 43L, k, chunks = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))
    assert(c.toMap != rows.map(r => r._1 -> r._3).toMap)
    intercept[IllegalArgumentException](
      Mixture.shuffleShard(docs, "doc_id", 42L, shards = 0))
  }

  test("shuffleShard: NULL ids and reserved-name clashes fail loudly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // NULL id: the permutation's tie-break is gone — must raise, not
    // silently hash all NULL rows onto md5(seed) in arbitrary order
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("doc_id")
    val boom = intercept[Exception] {
      Mixture.shuffleShard(withNull, "doc_id", 42L, 2, chunks = 2).collect()
    }
    assert(boom.getMessage.contains("non-null ids")
        || Option(boom.getCause).exists(_.getMessage.contains("non-null ids")),
      s"unexpected failure: $boom")
    // an input already carrying an output/internal column name must be
    // rejected up front (withColumnRenamed would DUPLICATE a pos column)
    val clash = Seq((1L, 9L)).toDF("doc_id", "pos")
    val boom2 = intercept[IllegalArgumentException](
      Mixture.shuffleShard(clash, "doc_id", 42L, 2))
    assert(boom2.getMessage.contains("already has"))
  }

  test("ppsSample: strides sum to k, heavy rows absorb several, repartition-stable") {
    import spark.implicits._
    // one row carries half the total weight -> it must absorb ~k/2 strides
    val df = (Seq((1L, 100L), (2L, 700L)) ++
      (3L to 9L).map(i => (i, 100L))).toDF("id", "w")
    val out = Mixture.ppsSample(df, "id", "w", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.values.sum == 8L, s"strides must sum to k: $out")
    assert(out(2L) == 4L, s"the half-weight row must absorb k/2 strides: $out")
    // brute-force check of every selected row and multiplicity
    val rows = (Seq((1L, 100L), (2L, 700L)) ++ (3L to 9L).map(i => (i, 100L)))
      .sortBy(_._1)
    val W = rows.map(_._2).sum
    var cum = 0L
    val want = rows.flatMap { case (id, w) =>
      val lo = cum * 8 / W; cum += w; val hi = cum * 8 / W
      if (hi > lo) Some(id -> (hi - lo)) else None
    }.toMap
    assert(out == want, s"got $out want $want")
    // purely arithmetic selection: partitioning cannot change it
    val re = Mixture.ppsSample(df.repartition(7), "id", "w", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(re == out)
    intercept[IllegalArgumentException](Mixture.ppsSample(df, "id", "w", 0))
  }

  test("kfold: total partition into k folds, repartition-stable, pure id function") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val folds = Mixture.kfold(df, "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(folds.length == 500) // every row assigned exactly once
    assert(folds.forall { case (_, f) => f >= 0 && f < 5 })
    assert(folds.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val re = Mixture.kfold(df.repartition(7), "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(re == folds.toMap) // pure function of the id
    intercept[IllegalArgumentException](Mixture.kfold(df, "id", 1))
  }

  test("repeatFactors: exact integer micro factors; untargeted excluded") {
    // corpus: web 10, code 5, books 3 -> N = 18
    val got = Mixture.repeatFactors(corpus, "src",
        Map("web" -> 500000L, "code" -> 500000L))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("web") == ((10L, 900000L)))   // (5e5*18) div 10
    assert(got("code") == ((5L, 1800000L)))  // (5e5*18) div 5
    assert(!got.contains("books"), "untargeted source must be excluded")
    intercept[IllegalArgumentException](
      Mixture.repeatFactors(corpus, "src", Map("web" -> 2000000L)))
  }

  test("upsampleByFactor: whole epochs + md5-deterministic extras, repartition-stable") {
    import spark.implicits._
    val df = ((1L to 400L).map(i => (i, "a")) ++
      (401L to 500L).map(i => (i, "b"))).toDF("id", "src")
    val factors = Map("a" -> 1500000L, "b" -> 3000000L) // 1.5 and 3.0 epochs
    val out = Mixture.upsampleByFactor(df, "src", "id", factors)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // b rows appear exactly 3x with copies 1..3
    val bCopies = out.filter(_._2 == "b").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(bCopies.values.forall(_ == Seq(1, 2, 3)), "whole factor 3.0 must triple every row")
    // a rows appear 1x or 2x; the 2x set is exactly the md5-bucket rule
    val aCounts = out.filter(_._2 == "a").groupBy(_._1).view.mapValues(_.size).toMap
    val expectedExtra = df.filter(col("src") === "a").select(col("id"),
        (pmod(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(1000000L)) < lit(500000L)).as("x"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(aCounts.keySet == expectedExtra.keySet)
    assert(aCounts.forall { case (id, n) => n == (if (expectedExtra(id)) 2 else 1) })
    // fractional-epoch share lands near 1.5x on a 400-row stratum
    val nA = aCounts.values.sum
    assert(nA >= 550 && nA <= 650, s"~600 expected for 1.5 epochs of 400: $nA")
    // repartitioning changes nothing (pure id function)
    val re = Mixture.upsampleByFactor(df.repartition(7), "src", "id", factors)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(re.sorted.toSeq == out.sorted.toSeq)
    // factor 0 drops the source entirely
    val dropped = Mixture.upsampleByFactor(df, "src", "id",
      Map("a" -> 0L, "b" -> 1000000L)).filter(col("src") === "a").count()
    assert(dropped == 0L)
    intercept[IllegalArgumentException](
      Mixture.upsampleByFactor(df, "src", "id", Map.empty))
  }

  test("temperatureRates: scarcest source whole, rates follow sqrt(n_min/n_s)") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, "small")) ++
      (101L to 500L).map(i => (i, "mid")) ++
      (501L to 1400L).map(i => (i, "big"))
    val rates = Mixture.temperatureRates(df.toDF("id", "src"), "src")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def w(n: Long) = math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    val wmin = w(100)
    assert(rates("small") == ((100L, w(100), 10000L)))
    assert(rates("mid") == ((400L, w(400), wmin * 10000 / w(400))))
    assert(rates("big") == ((900L, w(900), wmin * 10000 / w(900))))
    // α=1/2 flattening: exact perfect squares → rates 10000/5000/3333,
    // so expected kept counts ~100/200/300 — ratios 1:2:3 where the raw
    // data was 1:4:9.
    assert(rates("mid")._3 == 5000L && rates("big")._3 == 3333L)
  }

  test("temperatureSampleReport: report consistent, deterministic, md5-membership") {
    import spark.implicits._
    val df = ((1L to 80L).map(i => (i, "a")) ++ (81L to 400L).map(i => (i, "b")))
      .toDF("id", "src")
    val rep = Mixture.temperatureSampleReport(df, "src", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    val a = rep(0); val b = rep(1)
    assert(a._2 == 80L && a._3 == 10000L && a._4 == 80L,
      s"scarcest source must keep everything: $a")
    assert(a._5 == (1L to 80L).sum)
    // b kept ≈ 400·√(80/400) = 179 expected; md5 selection is close
    assert(b._4 > 120 && b._4 < 240, s"flattened keep count off: $b")
    // re-run with different partitioning → identical report
    val rep2 = Mixture.temperatureSampleReport(df.repartition(7), "src", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rep2.toSeq == rep.toSeq)
  }

  test("samplePriority: matches the brute-force DLT draw exactly") {
    import spark.implicits._
    import java.security.MessageDigest
    val rows = (1L to 500L).map(i => (i, 1L + (i * 37) % 200))
    val df = rows.toDF("id", "wt")
    val got = Mixture.samplePriority(df, "id", col("wt"), k = 16)
      .orderBy(col("priority").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute-force reference: same md5-u, same floor division
    def u(id: Long): Long = {
      val h = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) + 1L
    }
    val prios = rows.map { case (id, w) => (id, w, (w * 4294967296L) / u(id)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val tau = prios(16)._3
    val want = prios.take(16).map { case (id, w, p) =>
      (id, w, p, math.max(w * 4294967296L, tau)) }
    assert(got.toSeq == want.toSeq)
  }

  test("samplePriority: deterministic at any partitioning, k bounds output") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, 1L + i % 50)).toDF("id", "wt")
    val a = Mixture.samplePriority(df.repartition(1), "id", col("wt"), 10)
      .orderBy(col("priority").desc, col("id")).collect().toSeq
    val b = Mixture.samplePriority(df.repartition(11), "id", col("wt"), 10)
      .orderBy(col("priority").desc, col("id")).collect().toSeq
    assert(a == b && a.size == 10)
    // population smaller than k: everything selected, tau = 0, est = w*2^32
    val tiny = (1L to 5L).map(i => (i, i)).toDF("id", "wt")
    val all = Mixture.samplePriority(tiny, "id", col("wt"), 10).collect()
    assert(all.length == 5)
    assert(all.forall(r => r.getLong(3) == r.getLong(1) * 4294967296L))
  }

  test("samplePriority: weight 2^31 is excluded (w*2^32 would overflow long)") {
    import spark.implicits._
    val df = Seq((1L, (1L << 31) - 1), (2L, 1L << 31), (3L, 10L))
      .toDF("id", "wt")
    val got = Mixture.samplePriority(df, "id", col("wt"), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(_._1) == Set(1L, 3L), s"boundary row leaked: ${got.toSeq}")
    // the max admissible weight computes without wrap: priority > 0
    val maxRow = Mixture.samplePriority(df, "id", col("wt"), 3)
      .filter(col("id") === 1L).collect()(0)
    assert(maxRow.getLong(2) > 0L && maxRow.getLong(3) > 0L)
  }

  test("samplePriorityByGroup: per-group draw equals per-group global draw") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (s"g${i % 4}", i, 1L + (i * 53) % 97))
    val df = rows.toDF("grp", "id", "wt")
    val grouped = Mixture.samplePriorityByGroup(df, "grp", "id", col("wt"), 7)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, -t._4, t._2)).toSeq
    // reference: run the GLOBAL sampler on each group's slice
    val want = rows.map(_._1).distinct.sorted.flatMap { g =>
      Mixture.samplePriority(df.filter(col("grp") === g), "id", col("wt"), 7)
        .collect()
        .map(r => (g, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (-t._4, t._2))
    }
    assert(grouped == want)
    assert(grouped.groupBy(_._1).forall(_._2.size == 7))
    // partitioning invariance
    val again = Mixture.samplePriorityByGroup(df.repartition(13), "grp", "id",
        col("wt"), 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, -t._4, t._2)).toSeq
    assert(again == grouped)
  }

  test("cluster-balanced curation: per-cell cap holds, membership is the md5 top-k per cell") {
    val rows = SparkEntry.queries("q_cluster_balanced")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val perCell = rows.groupBy(_._2).view.mapValues(_.size)
    perCell.foreach { case (cell, n) =>
      assert(n <= 8, s"cell $cell kept $n docs, cap is 8")
    }
    assert(rows.map(_._1).distinct.size == rows.size, "a doc kept twice")
    assert(perCell.keys.size > 1, "balanced curation needs multiple cells")
  }
}
