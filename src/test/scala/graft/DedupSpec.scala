package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkTestBase {

  private lazy val docs = Tables.t(spark, sf, "documents")
  private val shingles =
    expr("array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), i -> substring(text, i, 5)))")

  test("exact dedup keeps min id and counts copies") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("id", "text")
    val out = Dedup.exact(df, "text", "id").orderBy("keep_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L), (2L, 1L)))
  }

  test("exact dedup is idempotent") {
    val once = Dedup.exact(docs, "text", "doc_id")
    val twice = Dedup.exact(
      once.withColumnRenamed("keep_id", "doc_id").withColumn("text", col("doc_id").cast("string")),
      "text", "doc_id")
    assert(once.count() == twice.count())
  }

  test("minhash-LSH pairs == exact all-pairs at threshold 0.7") {
    val lsh = Dedup.minHashPairs(docs, "doc_id", shingles, 0.7, k = 126, bands = 21)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.exactJaccardPairs(docs, "doc_id", shingles, 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty) // corpus does contain near-dups
  }

  test("maxBucket cap drops only oversized-bucket pairs, leaves the rest intact") {
    import spark.implicits._
    // 6 identical boilerplate docs (every band collides -> one bucket of
    // 6 per band) + one genuine near-dup pair with distinct text: capping
    // at 4 must eliminate the boilerplate clique entirely (its EVERY band
    // overflows) and keep the small-bucket pair untouched.
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val pairText = "completely different sentence about spark shuffles at scale x"
    val rows = (1L to 6L).map(i => (i, boiler)) ++
      Seq((10L, pairText), (11L, pairText + "y"))
    val df = rows.toDF("doc_id", "text")
    def pairs(cap: Long) = Dedup.minHashPairsHashed(df, "doc_id",
        Dedup.shinglesHashed(col("text"), 5), threshold = 0.7, k = 126,
        bands = 21, maxBucket = cap)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Long.MaxValue)
    assert(uncapped.contains((10L, 11L)))
    assert(uncapped.count { case (a, b) => a <= 6 && b <= 6 } == 15,
      s"expected the full 6-clique uncapped, got $uncapped")
    val capped = pairs(4L)
    assert(capped == Set((10L, 11L)),
      s"cap=4 must drop exactly the boilerplate clique: $capped")
  }

  test("incremental maxBucket cap drops only corpus-side hot-bucket matches") {
    import spark.implicits._
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = ((1L to 6L).map(i => (i, boiler)) :+
      ((10L, "completely different sentence about spark shuffles at scale x")))
      .toDF("doc_id", "text")
    val fresh = Seq((100L, boiler),
      (101L, "completely different sentence about spark shuffles at scale y"))
      .toDF("doc_id", "text")
    def pairs(cap: Long) = Dedup.minHashIncrementalHashed(fresh, corpus,
        "doc_id", Dedup.shinglesHashed(col("text"), 5), threshold = 0.7,
        k = 126, bands = 21, maxBucket = cap)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Long.MaxValue)
    assert(uncapped == ((1L to 6L).map(i => (100L, i)).toSet + ((101L, 10L))),
      s"uncapped: $uncapped")
    assert(pairs(4L) == Set((101L, 10L)), s"capped: ${pairs(4L)}")
  }

  test("prefix filter is lossless: filtered all-pairs == naive jaccard pairs") {
    // naive: array_intersect/union jaccard with no prefilters at a loose
    // threshold (0.3, same as q_dedup_jaccard) where the prefix is shortest
    // and a filtering bug would show first
    val subset = docs.filter(col("doc_id") < 300)
    val filtered = Dedup.exactJaccardPairsHashed(subset, "doc_id",
        Dedup.shinglesHashed(col("text"), 5), 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = subset.select(col("doc_id"), shingles.as("s"))
    val naive = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("jac", Dedup.jaccard(col("a.s"), col("b.s")))
      .filter(col("jac") >= 0.3)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered == naive,
      s"extra=${filtered -- naive} missing=${naive -- filtered}")
    assert(naive.nonEmpty)
  }

  test("prefix_overlap boundary: exact-threshold pairs kept, bad threshold rejected") {
    import graft.functions.prefix_overlap
    // jac(A,B) == 0.9 exactly with the smallest common element at B's
    // SECOND position: a naive ceil(0.9*10) = ceil(9.000000000000002) = 10
    // shortens B's prefix to 1 and drops the pair. The epsilon-guarded
    // ceil must keep it.
    val a = typedLit((2L to 10L).toSeq)
    val b = typedLit(Seq(0L) ++ (2L to 10L))
    val row = spark.range(1)
      .select(prefix_overlap(a, b, 0.9).as("po"),
        prefix_overlap(a, b, 1.0).as("po1"))
      .head()
    assert(row.getBoolean(0), "exact-threshold 0.9 pair dropped by prefix filter")
    assert(!row.getBoolean(1), "threshold 1.0 must reject jac=0.9 pair via prefix")
    // threshold <= 0 would read past the array (no bounds check in
    // UnsafeArrayData) — constructor must refuse it
    intercept[IllegalArgumentException] { prefix_overlap(a, b, 0.0) }
    intercept[IllegalArgumentException] { prefix_overlap(a, b, -0.5) }
  }

  test("hashed words == xxhash64 of split tokens; simhash values unchanged") {
    val viaStrings = docs.select(col("doc_id"),
        transform(split(lower(col("text")), "\\s+"), t => xxhash64(t)).as("h"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val viaBytes = docs.select(col("doc_id"),
        graft.functions.hashed_words(col("text")).as("h"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    viaStrings.zip(viaBytes).foreach { case (a, b) =>
      assert(a == b, "byte-path word hashes differ from string-path")
    }
    val simStr = docs.select(
        graft.functions.simhash64(graft.operators.TextAnalysis.tokens(col("text"))))
      .collect().map(_.getLong(0)).toSeq
    val simHashed = docs.select(
        graft.functions.simhash64(graft.functions.hashed_words(col("text"))))
      .collect().map(_.getLong(0)).toSeq
    assert(simStr == simHashed, "simhash differs between token paths")
  }

  test("hashed shingles == xxhash64 of substring shingles (ASCII)") {
    val viaStrings = docs.select(col("doc_id"),
        sort_array(array_distinct(transform(
          expr("transform(sequence(1, greatest(length(text) - 4, 1)), i -> substring(text, i, 5))"),
          t => xxhash64(t)))).as("h"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val viaBytes = docs.select(col("doc_id"),
        graft.operators.Dedup.shinglesHashed(col("text"), 5).as("h"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    viaStrings.zip(viaBytes).foreach { case (a, b) =>
      assert(a == b, "byte-window hashes differ from substring hashes")
    }
  }

  test("incremental exact dedup: only unseen content survives, min id kept") {
    import spark.implicits._
    val corpus = Seq((10L, "seen-one"), (11L, "seen-two")).toDF("id", "text")
    val batch = Seq((20L, "seen-one"), (21L, "fresh"), (22L, "fresh"), (23L, "newer"))
      .toDF("id", "text")
    val out = Dedup.exactIncremental(batch, corpus, "text", "id")
      .orderBy("keep_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((21L, 2L), (23L, 1L)))
  }

  test("incremental near-dedup finds exactly the cross-source near pairs") {
    val newDocs = docs.filter(col("source") =!= "src0")
    val corpus = docs.filter(col("source") === "src0")
    val got = Dedup.minHashIncremental(newDocs, corpus, "doc_id", shingles, 0.9)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact reference: all near pairs with one side in each source split
    val allPairs = Dedup.exactJaccardPairs(docs, "doc_id", shingles, 0.9)
      .join(docs.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
      .filter((col("src_a") === "src0") =!= (col("src_b") === "src0"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // compare as unordered id pairs (incremental orients them new->corpus)
    def unordered(s: Set[(Long, Long)]) = s.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(unordered(got) == unordered(allPairs), s"got=$got want=$allPairs")
  }

  test("stored-bands incremental LSH == the recompute path (and the hot-bucket guard holds)") {
    // the production append shape: the corpus's banded signatures come
    // from a STORE (bandedSignatures) instead of being re-hashed — the
    // pair set must be identical to minHashIncrementalHashed's at every
    // maxBucket setting
    val sh = Dedup.shinglesHashed(col("text"), 5)
    val base = docs.filter(col("doc_id") % 4 =!= 3)
    val incr = docs.filter(col("doc_id") % 4 === 3)
    val stored = Dedup.bandedSignatures(base, "doc_id", sh, k = 126, bands = 21)
    for (cap <- Seq(Long.MaxValue, 8L)) {
      val want = Dedup.minHashIncrementalHashed(incr, base, "doc_id", sh,
          threshold = 0.7, k = 126, bands = 21, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = Dedup.minHashIncrementalFromBands(incr, base, "doc_id", sh,
          stored, threshold = 0.7, k = 126, bands = 21, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"stored-bands path drifted at maxBucket=$cap")
    }
  }

  test("minhash signature estimates jaccard (statistical, fixed seed)") {
    import spark.implicits._
    // two token sets with known jaccard 1/3 (2 shared of 6 union)
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("c", "d", "e", "f"))).toDF("id", "toks")
    val sigs = df.select(graft.functions.minhash_sig(col("toks"), 512).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val agree = sigs(0).zip(sigs(1)).count { case (a, b) => a == b }
    val est = agree.toDouble / 512
    assert(math.abs(est - 1.0 / 3.0) < 0.08, s"estimate $est too far from 1/3")
  }

  test("simhash: identical docs collide, near docs within small hamming") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("id", "text")
    val pairs = Dedup.simHashPairs(df, "id", TextAnalysis.tokens(col("text")), maxHamming = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) == 0)          // identical => distance 0
    assert(pairs.get((1L, 3L)).exists(_ <= 10)) // one-word edit => near
    assert(!pairs.contains((1L, 4L)) || pairs((1L, 4L)) > 10)
  }

  test("simHashPairs == brute-force all-pairs Hamming (banding recall, ADVICE r20)") {
    import spark.implicits._
    // Mixed fixture: clusters of near-identical docs (1-2 word edits),
    // plus unrelated docs — enough rows that banding actually prunes.
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "pack my box with five dozen liquor jugs for the long trip home",
      "sphinx of black quartz judge my vow said the old professor",
      "how vexingly quick daft zebras jump over the fence at dawn")
    val docs = (0 until 40).map { i =>
      val b = base(i % 4)
      val text =
        if (i < 16) b // exact copies => distance 0 pairs
        else if (i < 28) b.replace("the", s"a$i") // small edits => near
        else s"unique content number $i with totally different words here"
      (i.toLong, text)
    }.toDF("id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    // Brute force: exact popcount over all id_a < id_b signature pairs.
    val sigs = docs.select(col("id"), graft.functions.simhash64(toks).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 7
    } yield ((ia, ib), h)).toMap
    // Banded path (default maxHamming = 7 < chunks = 8: pigeonhole
    // guarantees full recall, so the sets must be EQUAL, not a subset).
    val got = Dedup.simHashPairs(docs, "id", toks)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got == want,
      s"banded pairs drifted from brute force: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
  }

  test("semanticDedup hot-cell guard: bounded work, sound drops, idle-guard identity") {
    val emb = Tables.t(spark, sf, "embeddings")
    // Degenerate codebook: ONE centroid puts every embedding in one cell —
    // the pathological case the guard exists for.
    val one = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val unguarded = Dedup.semanticDedup(emb, "vec_id", "embedding",
      one, "cid", "cvec", tau = 0.4, maxCellSize = Int.MaxValue)
      .collect().map(_.getLong(0)).toSet
    val guarded = Dedup.semanticDedup(emb, "vec_id", "embedding",
      one, "cid", "cvec", tau = 0.4, maxCellSize = 16)
      .collect().map(_.getLong(0)).toSet
    val n = emb.count()
    // Idle guard (cap >= cell size) must equal the cap-free run exactly.
    val idle = Dedup.semanticDedup(emb, "vec_id", "embedding",
      one, "cid", "cvec", tau = 0.4, maxCellSize = n.toInt)
      .collect().map(_.getLong(0)).toSet
    assert(idle == unguarded)
    // The guard only SKIPS comparisons, so every guarded drop is a real
    // >= tau pair: guarded survivors are a superset of unguarded survivors.
    assert(unguarded.subsetOf(guarded),
      s"guard dropped ids the exact path kept: ${guarded.diff(unguarded).take(5)}")
    // And the guard engaged: with n rows in one cell and cap 16, sub-cells
    // partition the ids (sanity: survivors never exceed n, drops still occur
    // when same-sub-cell near-dups exist — checked via the planted dup below).
    assert(guarded.size <= n)
    // Planted exact duplicate of id 0 with an id landing anywhere: its
    // cosine sim is 1.0 >= tau, but it is only caught if both copies share
    // a sub-cell — so assert only the unguarded path catches it, and the
    // guarded path still returns one row per surviving id (no dup output).
    assert(guarded.size == Dedup.semanticDedup(emb, "vec_id", "embedding",
      one, "cid", "cvec", tau = 0.4, maxCellSize = 16).count())
  }

  test("LSH cosine pairs are a high-recall subset of exact pairs") {
    val emb = Tables.t(spark, sf, "embeddings").cache()
    val exact = Dedup.cosinePairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.cosinePairsLsh(emb, "vec_id", "embedding", 0.4, nPlanes = 6, nTables = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH produced a pair the exact path rejects")
    assert(exact.isEmpty || (lsh.size.toDouble / exact.size) > 0.3,
      s"recall ${lsh.size}/${exact.size} too low")
  }

  test("cosine LSH recall >= 0.95 on planted near-duplicates") {
    // This corpus is uniform random (max pairwise cos ~0.51), so recall at
    // a 0.45 threshold measures the corpus, not the operator. The
    // operator's contract is *near-dup* recall: plant perturbed copies
    // (cos >= 0.99) and require the LSH path to find >= 95% of them —
    // the analytic recall at cos 0.99 with 6 planes x 16 tables is
    // 1-(1-p^6)^16 with p = 1-acos(0.99)/pi ~ 0.955, i.e. ~1 - 3e-9.
    val emb = Tables.t(spark, sf, "embeddings").cache()
    val planted = emb.filter(col("vec_id") < 40)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.005f)).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionAll(planted)
    val found = Dedup.cosinePairsLsh(corpus, "vec_id", "embedding", 0.9,
        nPlanes = 6, nTables = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 40L).map(i => (i, i + 100000)).toSet
    // sanity: the perturbation keeps planted pairs above the threshold
    val exactHits = Dedup.cosinePairs(corpus, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(exactHits), "perturbation pushed pairs below 0.9")
    val recall = (found intersect expected).size.toDouble / expected.size
    assert(recall >= 0.95, s"planted near-dup recall $recall < 0.95")
  }

  test("cosine pairs threshold filters correctly vs naive") {
    val emb = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 50).cache()
    val got = Dedup.cosinePairs(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive driver-side check
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    // note: iterate Seq, not Map — yielding (ia, ib) from a Map generator
    // would collapse pairs sharing id_a into one Map entry
    val want = (for {
      (ia, va) <- vecs.toSeq; (ib, vb) <- vecs.toSeq
      if ia < ib && cos(va, vb) >= 0.3
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("cluster resolution: chains collapse to the component minimum") {
    import spark.implicits._
    // components: {1,2,3,4} (a chain through 2-3), {10,11}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup.resolveClusters(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("native recursive CTE closure == resolveClusters (incl. a chain)") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, exercises multi-level recursion) + pair
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .createOrReplaceTempView("graft_rcte_edges")
    val got = spark.sql("""WITH RECURSIVE reach(v, r, d) AS (
        |  SELECT DISTINCT a AS v, a AS r, 0 AS d FROM graft_rcte_edges
        |  UNION ALL
        |  SELECT DISTINCT e.a, reach.r, reach.d + 1
        |  FROM graft_rcte_edges e JOIN reach ON e.b = reach.v
        |  WHERE reach.r < e.a AND reach.d < 12)
        |SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS cluster_rep
        |FROM reach GROUP BY v""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.operators.Dedup.resolveClusters(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"rcte $got != resolveClusters $want")
  }

  test("dropNearDuplicates keeps exactly one representative per cluster") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = graft.operators.Dedup.dropNearDuplicates(docs, pairs, "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L), s"kept $kept")
  }

  test("materialized-cluster apply == inline-chain apply, and the table is reused") {
    // Same result both ways (the from-table query must not drift from the
    // self-contained chain), and the second invocation reads the cached
    // cluster table instead of rewriting it.
    val inline = SparkEntry.queries("q_dedup_apply")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val fromTable = SparkEntry.queries("q_dedup_apply_from_table")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(fromTable == inline, "from-table apply drifted from the inline chain")
    // locate the cache dir the first run produced and pin its marker mtime
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val caches = tmp.listFiles().filter(_.getName.startsWith("graft_cluster_cache_"))
    assert(caches.nonEmpty, "no materialized cluster table found")
    val markers = caches.map(c => new java.io.File(c, "_SUCCESS")).filter(_.exists())
    assert(markers.nonEmpty, "materialized cluster table has no _SUCCESS marker")
    val before = markers.map(m => m.getAbsolutePath -> m.lastModified()).toMap
    val again = SparkEntry.queries("q_dedup_apply_from_table")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(again == inline)
    markers.foreach { m =>
      assert(m.lastModified() == before(m.getAbsolutePath),
        s"cluster table ${m.getParent} was rewritten on a cache hit")
    }
  }

  test("updateClusters == full recompute on a planted append (all merge shapes)") {
    import spark.implicits._
    // stored clusters: {1,2,3}, {10,11}, {20,21} (untouched), {30,31}
    val basePairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (30L, 31L))
      .toDF("id_a", "id_b")
    val existing = graft.operators.Dedup.resolveClusters(basePairs, "id_a", "id_b")
    // the append exercises every merge shape at once:
    //  (40,41): brand-new cluster from two appended docs
    //  (42,10): appended doc joins a stored cluster
    //  (3,30):  a new edge MERGES two stored clusters
    //  (0,11):  appended doc with an id SMALLER than the stored rep —
    //           the touched component's label must change to 0
    val newPairs = Seq((40L, 41L), (42L, 10L), (3L, 30L), (0L, 11L))
      .toDF("id_a", "id_b")
    val got = graft.operators.Dedup.updateClusters(existing, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.operators.Dedup
      .resolveClusters(basePairs.unionAll(newPairs), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"incremental $got != full recompute $want")
    // the untouched cluster passed through with its stored label
    assert(got(20L) == 20L && got(21L) == 20L)
    // and the small-id append relabeled its whole component
    assert(got(10L) == 0L && got(42L) == 0L)
  }

  test("updateClusters == full recompute on a seeded random append") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 200
    def draw(k: Int, lo: Int, hi: Int) = Seq.fill(k)(
      (lo + rnd.nextInt(hi - lo), lo + rnd.nextInt(hi - lo)))
      .collect { case (a, b) if a != b => (a.toLong, b.toLong) }
    val basePairs = draw(150, 0, n).toDF("id_a", "id_b")
    // append edges span old x old, old x new, new x new vertex ranges
    val newPairs = (draw(30, 0, n + 80) ++ draw(30, n, n + 80))
      .toDF("id_a", "id_b")
    val existing = graft.operators.Dedup
      .resolveClusters(basePairs, "id_a", "id_b", maxIter = 40)
    val got = graft.operators.Dedup
      .updateClusters(existing, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.operators.Dedup
      .resolveClusters(basePairs.unionAll(newPairs), "id_a", "id_b", maxIter = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, {
      val bad = (got.keySet ++ want.keySet)
        .filter(k => got.get(k) != want.get(k)).take(5)
      s"diverging: ${bad.map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; ")}"
    })
  }

  test("updateClusters COMPOSES: two successive appends == one full recompute") {
    // the table a nightly job maintains is updated every night — the
    // operator must be closed under iteration, not just correct for one
    // append over a freshly-built base
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def draw(k: Int, lo: Int, hi: Int) = Seq.fill(k)(
      (lo + rnd.nextInt(hi - lo), lo + rnd.nextInt(hi - lo)))
      .collect { case (a, b) if a != b => (a.toLong, b.toLong) }
    val basePairs = draw(120, 0, 150).toDF("id_a", "id_b")
    val night1 = (draw(25, 0, 200) ++ draw(25, 150, 200)).toDF("id_a", "id_b")
    val night2 = (draw(25, 0, 260) ++ draw(25, 200, 260)).toDF("id_a", "id_b")
    val t0 = graft.operators.Dedup
      .resolveClusters(basePairs, "id_a", "id_b", maxIter = 40)
    val t1 = graft.operators.Dedup.updateClusters(t0, night1)
    val got = graft.operators.Dedup.updateClusters(t1, night2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.operators.Dedup
      .resolveClusters(basePairs.unionAll(night1).unionAll(night2),
        "id_a", "id_b", maxIter = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, {
      val bad = (got.keySet ++ want.keySet)
        .filter(k => got.get(k) != want.get(k)).take(5)
      s"diverging after 2nd append: ${bad.map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; ")}"
    })
  }

  test("updateClusters with no new pairs returns the stored table unchanged") {
    import spark.implicits._
    val basePairs = Seq((2L, 1L), (10L, 11L)).toDF("id_a", "id_b")
    val existing = graft.operators.Dedup.resolveClusters(basePairs, "id_a", "id_b")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = graft.operators.Dedup.updateClusters(existing, noPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("q_dedup_clusters_incr (stored base + append) == q_dedup_clusters (full)") {
    val full = SparkEntry.queries("q_dedup_clusters")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val incr = SparkEntry.queries("q_dedup_clusters_incr")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(incr == full, "incremental maintenance drifted from the full recompute")
  }

  test("q_dedup_clusters_compact: rolled-forward artifact == in-query merge; band store covers the full corpus") {
    // clear stale compact caches (other sf dirs share the prefix) so the
    // one inspected is unambiguously this run's
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    def compactCaches() = tmp.listFiles()
      .filter(_.getName.startsWith("graft_clustercompact_cache_"))
    compactCaches().foreach { c =>
      val p = new org.apache.hadoop.fs.Path(c.getAbsolutePath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true): Unit
    }
    val merged = SparkEntry.queries("q_dedup_clusters_incr")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val compacted = SparkEntry.queries("q_dedup_clusters_compact")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(compacted == merged, "compacted cluster table drifted from the in-query merge")
    val caches = compactCaches()
    assert(caches.length == 1,
      s"expected exactly the cold-built compact artifact, found ${caches.length}")
    val idx = caches.head.getAbsolutePath
    // roll-forward law: frozen (seeded) MinHash functions mean the
    // compacted band store == re-banding the WHOLE corpus — the property
    // that lets tomorrow's append read this dir as its base
    val docs = Tables.t(spark, sf, "documents")
    val sh = graft.operators.Dedup.shinglesHashed(col("text"), 5)
    val reband = graft.operators.Dedup
      .bandedSignatures(docs, "doc_id", sh, k = 126, bands = 21)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val stored = spark.read.parquet(idx + "/bands")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(stored == reband, "compacted band store diverges from re-banding the corpus")
    // cache protocol: a second invocation serves the artifact, no rewrite
    val markers = Seq("clusters/_SUCCESS", "bands/_SUCCESS")
      .map(m => new java.io.File(idx, m))
    markers.foreach(m => assert(m.exists(), s"missing $m"))
    val before = markers.map(m => m.getAbsolutePath -> m.lastModified()).toMap
    val again = SparkEntry.queries("q_dedup_clusters_compact")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(again == merged)
    markers.foreach { m =>
      assert(m.lastModified() == before(m.getAbsolutePath),
        s"${m.getParent} was rewritten on a cache hit")
    }
  }

  test("cluster cycle: roll o roll == one full rebuild; the night-2 band store covers the corpus") {
    // clear the cycle's three artifact tags (other sf dirs share prefixes)
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    tmp.listFiles().filter(f =>
        f.getName.startsWith("graft_clbase2_cache_") ||
        f.getName.startsWith("graft_clnight1_cache_") ||
        f.getName.startsWith("graft_clnight2_cache_"))
      .foreach { c =>
        val p = new org.apache.hadoop.fs.Path(c.getAbsolutePath)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true): Unit
      }
    val cycled = SparkEntry.queries("q_dedup_clusters_cycle")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val full = SparkEntry.queries("q_dedup_clusters")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(cycled == full,
      "two successive nightly rolls drifted from the one-shot full rebuild")
    // night 2's band store == re-banding the whole corpus: the property
    // that lets night 3 read THIS dir as its base — the cycle is closed
    // at every depth, not just once
    val caches = tmp.listFiles()
      .filter(_.getName.startsWith("graft_clnight2_cache_"))
    assert(caches.length == 1)
    val docs = Tables.t(spark, sf, "documents")
    val sh = graft.operators.Dedup.shinglesHashed(col("text"), 5)
    val reband = graft.operators.Dedup
      .bandedSignatures(docs, "doc_id", sh, k = 126, bands = 21)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val stored = spark.read.parquet(caches.head.getAbsolutePath + "/bands")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(stored == reband,
      "night-2 band store diverges from re-banding the corpus")
  }

  test("cluster resolution of an empty pair set is empty (no duplicates found)") {
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.operators.Dedup.resolveClusters(noPairs, "id_a", "id_b").count() == 0)
    val docs = (1L to 3L).map(i => (i, s"d$i")).toDF("id", "text")
    val kept = graft.operators.Dedup.dropNearDuplicates(docs, noPairs, "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L), "a clean corpus must pass through unchanged")
  }

  test("keep-best dedup keeps the highest-quality member of each cluster") {
    import spark.implicits._
    // cluster {1,2,3}: quality peaks at 2; cluster {5,6}: tie -> min id 5;
    // doc 4 unclustered -> survives
    val docs = Seq(
      (1L, 10.0), (2L, 99.0), (3L, 50.0), (4L, 1.0), (5L, 7.0), (6L, 7.0))
      .toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = graft.operators.Dedup
      .dropNearDuplicatesKeepBest(docs, pairs, "id", col("q"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L), s"kept $kept")
  }

  test("cluster resolution matches union-find on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 300
    val edges = Seq.fill(600)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // reference: plain union-find over the same edges
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = touched.map(v => v -> {
      // component minimum under union-find
      val root = find(v.toInt)
      touched.filter(u => find(u.toInt) == root).min
    }).toMap
    val got = graft.operators.Dedup
      .resolveClusters(edges.toDF("id_a", "id_b"), "id_a", "id_b", maxIter = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, {
      val bad = got.keys.filter(k => got(k) != want(k)).take(5)
      s"diverging vertices: ${bad.map(k => s"$k got=${got(k)} want=${want(k)}").mkString("; ")}"
    })
  }

  test("cluster resolution rejects non-numeric ids up front with the remedy") {
    import spark.implicits._
    // string ids would NULL out the decimal fixpoint sum -> the loop could
    // never observe convergence; the guard must fire before any iteration
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException](
      graft.operators.Dedup.resolveClusters(pairs, "id_a", "id_b"))
    assert(e.getMessage.contains("numeric id columns"), e.getMessage)
    assert(e.getMessage.contains("xxhash64"), "error must name the remedy")
  }

  test("cluster resolution refuses to return an unconverged fixpoint") {
    import spark.implicits._
    // a 6-node chain needs ~5 propagation rounds; cap at 1 must throw.
    // Double ids (numeric but not integral) force the DISTRIBUTED loop —
    // a small integral graph would take the exact driver union-find
    // path, which has no iteration to cap
    val chain = (1L to 5L).map(i => (i.toDouble, (i + 1).toDouble))
      .toDF("id_a", "id_b")
    intercept[IllegalArgumentException](
      graft.operators.Dedup.resolveClusters(chain, "id_a", "id_b", maxIter = 1)
        .collect())
  }

  test("driver union-find path == the distributed fixpoint on the same graph") {
    import spark.implicits._
    // same seeded random graph through both regimes: integral ids take
    // the ≤2^18 driver path; the double-cast twin takes the distributed
    // loop — components and min-labels must agree exactly
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 400).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val ints = pairs.toDF("id_a", "id_b")
    val dbls = pairs.map { case (a, b) => (a.toDouble, b.toDouble) }
      .toDF("id_a", "id_b")
    val viaDriver = graft.operators.Dedup.resolveClusters(ints, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = graft.operators.Dedup.resolveClusters(dbls, "id_a", "id_b")
      .collect().map(r => r.getDouble(0).toLong -> r.getDouble(1).toLong).toMap
    assert(viaDriver == viaLoop,
      "driver union-find drifted from the distributed min-label fixpoint")
  }

  test("canonicalPerCluster keeps the best-quality member, ties to smallest id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("v", "cluster_rep")
    val quality = Seq((1L, 10L), (2L, 90L), (3L, 90L), (7L, 5L), (9L, 5L))
      .toDF("doc_id", "q")
    val got = Dedup.canonicalPerCluster(clusters, "v", "cluster_rep",
        quality, "doc_id", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cluster 1: ids 2 and 3 tie at q=90 -> smallest id 2 wins (NOT the
    // min-id member 1, whose quality is lower); cluster 7: tie -> id 7
    assert(got == Set((1L, 2L, 90L), (7L, 7L, 5L)))
  }

  test("duplicateSpans finds the shared run and nothing else") {
    import spark.implicits._
    val shared = (1 to 6).map(i => s"dup$i").mkString(" ") // 6 shared tokens
    val df = Seq(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("id", "text")
    val spans = Dedup.duplicateSpans(df, "id", "text", k = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 1: shared run occupies tokens 2..7; its 4-grams fully inside the
    // run are starts 2,3,4 -> covered tokens 2..7. doc 2: starts 1,2,3 ->
    // tokens 1..6. doc 3: nothing repeats.
    assert(spans == Set((1L, 2, 7), (2L, 1, 6)))
  }

  test("duplicateSpans merges overlapping gram intervals, splits at gap >= k") {
    import spark.implicits._
    val runA = (1 to 4).map(i => s"x$i").mkString(" ")
    val runB = (1 to 4).map(i => s"y$i").mkString(" ")
    // doc1 carries both runs separated by k unique tokens -> two islands
    val df = Seq(
      (1L, s"$runA f1 f2 f3 f4 $runB"),
      (2L, runA), (3L, runB)).toDF("id", "text")
    val spans = Dedup.duplicateSpans(df, "id", "text", k = 4, minDocs = 2)
      .filter(col("id") === 1L)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((0, 3), (8, 11)))
  }

  test("cutDuplicateSpans keeps the owner's copy, cuts later docs, drops fully-cut docs") {
    import spark.implicits._
    val run = (1 to 4).map(i => s"dup$i").mkString(" ")
    val df = Seq(
      (1L, s"a1 a2 $run a3"), // owner of the run -> untouched
      (2L, s"b1 $run b2"),    // run cut -> "b1 b2"
      (3L, run)               // nothing but the run -> vanishes
    ).toDF("id", "text")
    val out = Dedup.cutDuplicateSpans(df, "id", "text", k = 4, minDocs = 2)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, s"a1 a2 $run a3", 7L),
      (2L, "b1 b2", 2L)))
  }

  test("cutDuplicateSpans is identity on a duplicate-free corpus") {
    import spark.implicits._
    val df = (1L to 10L).map(i =>
      (i, (1 to 20).map(j => s"u${i}_$j").mkString(" "))).toDF("id", "text")
    val out = Dedup.cutDuplicateSpans(df, "id", "text", k = 4)
    assert(out.count() == 10)
    assert(out.join(df, "id").filter(col("clean_text") =!= col("text")).count() == 0)
  }

  test("dedupSegments keeps first occurrence and reassembles in order") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"), // segs (k=2): "a b", "c d"
      (2L, "c d e f"), // "c d" already seen -> only "e f" survives
      (3L, "a b")      // fully duplicated -> doc vanishes
    ).toDF("id", "text")
    val out = Dedup.dedupSegments(df, "id", "text", segTokens = 2)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "a b c d", 2L), (2L, "e f", 1L)))
  }

  test("dedupSegments is lossless on a duplicate-free corpus") {
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, (1 to 25).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("id", "text")
    val out = Dedup.dedupSegments(df, "id", "text", segTokens = 10)
    assert(out.count() == 20)
    val joined = out.join(df, "id")
      .filter(col("clean_text") =!= col("text")).count()
    assert(joined == 0)
  }

  // ---- differential properties: gram ops vs brute-force references ----
  // Seeded random corpora over a 5-symbol vocabulary: duplicate grams are
  // dense, planted shared runs force cross-doc spans, zero-length docs
  // and whole-doc copies exercise the vanish paths. The references work
  // on token tuples (no hashing), so agreement also certifies that the
  // 64-bit gram hashes are collision-free on these inputs.

  private def tokenize(t: String): Vector[String] =
    t.toLowerCase.split("\\s+").filterNot(_.isEmpty).toVector

  private def gramDocs(toks: Map[Long, Vector[String]], k: Int) = {
    val m = scala.collection.mutable.Map
      .empty[Seq[String], scala.collection.mutable.Set[Long]]
    for ((id, ts) <- toks; i <- 0 to ts.length - k)
      m.getOrElseUpdate(ts.slice(i, i + k),
        scala.collection.mutable.Set.empty) += id
    m
  }

  private def bruteSpans(docs: Seq[(Long, String)], k: Int,
      minDocs: Int): Set[(Long, Int, Int)] = {
    val toks = docs.map { case (id, t) => id -> tokenize(t) }.toMap
    val dup = gramDocs(toks, k).collect {
      case (g, ids) if ids.size >= minDocs => g
    }.toSet
    docs.flatMap { case (id, _) =>
      val ts = toks(id)
      val starts = (0 to ts.length - k).filter(i => dup(ts.slice(i, i + k)))
      // islands of starts with consecutive gaps <= k-1 (operator's rule)
      val islands = starts.foldLeft(Vector.empty[Vector[Int]]) { (acc, s) =>
        if (acc.nonEmpty && s - acc.last.last <= k - 1)
          acc.init :+ (acc.last :+ s)
        else acc :+ Vector(s)
      }
      islands.map(g => (id, g.head, g.last + k - 1))
    }.toSet
  }

  private def bruteCut(docs: Seq[(Long, String)], k: Int,
      minDocs: Int): Set[(Long, String, Long)] = {
    val toks = docs.map { case (id, t) => id -> tokenize(t) }.toMap
    val owners = gramDocs(toks, k).collect {
      case (g, ids) if ids.size >= minDocs => (g, ids.min)
    }.toMap
    docs.flatMap { case (id, _) =>
      val ts = toks(id)
      val cut = Array.fill(ts.length)(false)
      for (i <- 0 to ts.length - k)
        owners.get(ts.slice(i, i + k)).foreach { o =>
          if (o != id) (i until i + k).foreach(cut(_) = true)
        }
      val kept = ts.indices.filterNot(cut).map(ts)
      if (kept.isEmpty) None
      else Some((id, kept.mkString(" "), kept.length.toLong))
    }.toSet
  }

  private def bruteSegments(docs: Seq[(Long, String)],
      segTokens: Int): Set[(Long, String, Long)] = {
    val occs = docs.flatMap { case (id, t) =>
      if (t.isEmpty) Vector.empty
      else t.split(" ", -1).toVector.grouped(segTokens).zipWithIndex
        .map { case (c, i) => (id, i, c.mkString(" ")) }.toVector
    }.filter(_._3.nonEmpty)
    val winner = occs.groupBy(_._3).map { case (s, os) =>
      s -> os.minBy(o => (o._1, o._2))
    }
    occs.filter(o => winner(o._3) == o).groupBy(_._1).map { case (id, os) =>
      (id, os.sortBy(_._2).map(_._3).mkString(" "), os.length.toLong)
    }.toSet
  }

  private def seededCorpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val n = 3 + rnd.nextInt(6)
    val run = Vector.fill(4)(s"w${rnd.nextInt(5)}")
    (1L to n).map { id =>
      val ts = Vector.fill(rnd.nextInt(25))(s"w${rnd.nextInt(5)}")
      val planted =
        if (rnd.nextBoolean()) {
          val at = if (ts.isEmpty) 0 else rnd.nextInt(ts.length)
          ts.take(at) ++ run ++ ts.drop(at)
        } else ts
      (id, planted.mkString(" "))
    }
  }

  test("duplicateSpans matches the brute-force reference over seeded corpora") {
    import spark.implicits._
    for (seed <- Seq(11, 22, 33, 44)) {
      val docs = seededCorpus(seed)
      val got = Dedup.duplicateSpans(docs.toDF("id", "text"), "id", "text",
          k = 3, minDocs = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == bruteSpans(docs, 3, 2), s"seed=$seed docs=$docs")
    }
  }

  test("cutDuplicateSpans matches the brute-force ExactSubstr reference over seeded corpora") {
    import spark.implicits._
    for (seed <- Seq(11, 22, 33, 44)) {
      val docs = seededCorpus(seed)
      val got = Dedup.cutDuplicateSpans(docs.toDF("id", "text"), "id", "text",
          k = 3, minDocs = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == bruteCut(docs, 3, 2), s"seed=$seed docs=$docs")
    }
  }

  test("dedupSegments matches the brute-force first-occurrence reference over seeded corpora") {
    import spark.implicits._
    for (seed <- Seq(11, 22, 33, 44)) {
      val docs = seededCorpus(seed)
      val got = Dedup.dedupSegments(docs.toDF("id", "text"), "id", "text",
          segTokens = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == bruteSegments(docs, 3), s"seed=$seed docs=$docs")
    }
  }

  test("containment flags the embedded quote in ONE direction only") {
    import spark.implicits._
    val quote = "the five boxing wizards jump quickly over it"
    val host = s"long preamble text here ${quote} and a long epilogue follows"
    val df = Seq((1L, quote), (2L, host), (3L, "completely unrelated content"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id",
        Dedup.shinglesHashed(col("text"), 5), thresholdMilli = 800, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // quote ⊂ host: C(1→2) = 1.0 (every 5-gram of the quote occurs in host);
    // C(2→1) far below 0.8 (host has many grams the quote lacks).
    assert(got.exists { case (a, b, c) => a == 1L && b == 2L && c == 1000L },
      s"missing full containment pair in $got")
    assert(!got.exists { case (a, b, _) => a == 2L && b == 1L },
      s"reverse direction must not pass the threshold: $got")
    assert(!got.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  /** Independent model: raw-string shingles, df-cap, integer mills. */
  private def bruteContainment(docs: Seq[(Long, String)], thr: Int,
      maxDf: Int): Set[(Long, Long, Long)] = {
    def grams(t: String): Set[String] =
      (1 to math.max(t.length - 4, 1)).map(i =>
        t.substring(i - 1, math.min(i + 4, t.length))).toSet
    val all = docs.map { case (id, t) => id -> grams(t) }
    val df = all.flatMap(_._2).groupBy(identity).map { case (g, o) => g -> o.size }
    val kept = all.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }
    (for {
      (ia, sa) <- kept; (ib, sb) <- kept
      if ia != ib && sa.nonEmpty
      inter = (sa intersect sb).size.toLong
      if inter * 1000 >= thr.toLong * sa.size
    } yield (ia, ib, inter * 1000 / sa.size)).toSet
  }

  test("containment matches the brute-force model with the df-cap applied") {
    import spark.implicits._
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val words = Seq("alpha", "beta", "gamma", "delta", "epsil", "zetaa")
      val corpus = (1L to 12L).map { id =>
        id -> Seq.fill(4 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" ")
      }
      val got = Dedup.containmentPairs(corpus.toDF("doc_id", "text"), "doc_id",
          Dedup.shinglesHashed(col("text"), 5), thresholdMilli = 700, maxDf = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == bruteContainment(corpus, 700, 8), s"seed=$seed")
    }
  }
}
