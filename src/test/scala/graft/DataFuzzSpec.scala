package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, GlobalRank, Mixture, Pack, Similarity, TextAnalysis}

/** Adversarial-DATA fuzz over the pipeline operators ([[FuzzSqlSpec]]
  * covers the SQL grammar; this covers the data): seeded randomized
  * degenerate corpora — empty/whitespace/unicode/null texts, identical
  * docs (all-ties), zero/null embeddings, single-row groups, degenerate
  * weights — driven through the top pipeline operators, asserting their
  * DOCUMENTED contracts: no throw, determinism under repartitioning,
  * structural invariants (Σ-weight conservation, id_a < id_b, output ⊆
  * input, idempotence), and the two-path bit-equality the NLL scorers
  * promise. Every corpus is derived from a fixed seed so a failure
  * reproduces exactly.
  */
class DataFuzzSpec extends SparkTestBase {

  /** Degenerate text corpus: the shapes a 100 TB web crawl actually
    * contains. Ids are dense longs; `withNull` appends a null-text row.
    */
  private def fuzzDocs(seed: Long, withNull: Boolean = false): DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    val vocab = Seq("the", "cat", "sat", "mat", "dog", "und", "für", "el")
    val shapes: Seq[() => String] = Seq(
      () => "",                                  // empty
      () => "   \t  ",                           // whitespace-only
      () => "x " * (1 + rng.nextInt(50)),        // one token repeated
      () => "a" * (50 + rng.nextInt(200)),       // one giant token
      () => "自然 语言 处理 很 有趣",             // CJK
      () => "héllo wörld àccents œuf",           // accents
      () => Seq.fill(3 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
        .mkString(" "),                          // normal short doc
      () => "!!! ??? ... ;;; %%%")               // punctuation-only
    val rows = (0 until 40).map(i => (i.toLong, shapes(i % shapes.size)()))
    val base = rows.toDF("doc_id", "text")
    if (withNull)
      base.union(Seq((999L, null: String)).toDF("doc_id", "text"))
    else base
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("text expressions: defined, bounded, deterministic over degenerate docs") {
    val docs = fuzzDocs(1L, withNull = true).repartition(4)
    val toks = TextAnalysis.tokens(col("text"))
    val out = docs.select(col("doc_id"), col("text"),
      TextAnalysis.qualityScore(col("text"), toks).as("q"),
      TextAnalysis.langId(toks).as("lang"),
      TextAnalysis.tokenEstimate(col("text")).as("tok_est"))
    val rows = out.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      if (r.isNullAt(1)) {
        // null text: expression semantics — null in, null out, no throw
        assert(r.isNullAt(2) && r.isNullAt(4), s"null text must score null: $r")
      } else {
        assert(!r.isNullAt(2) && r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0,
          s"quality out of [0,1]: $r")
        assert(Set("en", "de", "es", "fr", "zh", "und")(r.getString(3)),
          s"langId outside label set: $r")
        assert(r.getInt(4) >= 0, s"negative token estimate: $r")
      }
    }
    // stats bundle: no throw, row-preserving
    assert(TextAnalysis.stats(docs, "text").count() == rows.length)
    // determinism: same seed, different partitioning, same rows
    assert(collectSorted(out) ==
      collectSorted(fuzzDocs(1L, withNull = true).repartition(7).select(
        col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text"), TextAnalysis.tokens(col("text"))).as("q"),
        TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang"),
        TextAnalysis.tokenEstimate(col("text")).as("tok_est"))))
  }

  test("unigramNll: empty/null docs score (0,0); broadcast and join paths bit-equal") {
    val docs = fuzzDocs(2L, withNull = true).repartition(4)
    val broad = TextAnalysis.unigramNll(docs, "doc_id", "text")
    val joined = TextAnalysis.unigramNll(docs, "doc_id", "text",
      maxBroadcastVocab = 1L)
    val b = collectSorted(broad)
    assert(b == collectSorted(joined),
      "unigramNll paths diverged on degenerate corpus")
    // the documented (0, 0) score for null/empty term arrays
    val zero = broad.filter(col("doc_id") === 999L).collect()
    assert(zero.length == 1 && zero(0).getLong(1) == 0L && zero(0).getLong(2) == 0L,
      s"null doc must score (0,0): ${zero.toSeq}")
  }

  test("knBigramNll: two paths bit-equal over degenerate docs") {
    val docs = fuzzDocs(3L).repartition(4)
    assert(collectSorted(TextAnalysis.knBigramNll(docs, "doc_id", "text")) ==
      collectSorted(TextAnalysis.knBigramNll(docs, "doc_id", "text",
        maxBroadcastVocab = 1L)),
      "knBigramNll paths diverged on degenerate corpus")
  }

  test("Bpe: NULL / empty / all-punct docs contribute nothing and never crash") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, ""), (3L, "!!! ???"),
      (4L, "ab ab")).toDF("doc_id", "text")
    // only doc 4 has in-word adjacency; degenerate docs add zero pairs
    val pairs = graft.operators.Bpe.pairCounts(docs, col("text")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(pairs == Map(("a", "b") -> 2L), s"degenerate docs leaked pairs: $pairs")
    // training over the degenerate corpus converges to the one real merge
    // (round 2 finds nothing new) — no throw, no empty-corpus crash
    val merges = graft.operators.Bpe.trainMerges(docs, col("text"), 4, 2)
    assert(merges == Seq(("a", "b")), s"unexpected merges: $merges")
    // encode: empty/punct docs yield EMPTY token arrays; NULL propagates
    // as NULL (SQL null-in null-out), pinned so Pack callers know to
    // filter or coalesce
    val enc = docs
      .select(col("doc_id"),
        graft.operators.Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[String](1)).map(_.toList)).toMap
    assert(enc(1L).isEmpty, "NULL text must encode to NULL")
    assert(enc(2L).contains(Nil) && enc(3L).contains(Nil),
      s"empty/punct docs must encode to [] not crash: $enc")
    assert(enc(4L).contains(List("ab", "ab")))
    // and the whole-corpus trainer survives an EMPTY corpus (zero merges)
    val none = graft.operators.Bpe.trainMerges(
      docs.filter(col("doc_id") < 0), col("text"), 4, 2)
    assert(none.isEmpty)
  }

  test("exact dedup: idempotent, keeps minima, empty corpus fine") {
    import spark.implicits._
    // force heavy duplication: texts drawn from 4 shapes over 30 rows
    val rng = new scala.util.Random(4L)
    val texts = Seq("", "a a a", "the cat", "zzz")
    val docs = (0 until 30).map(i => (i.toLong, texts(rng.nextInt(4))))
      .toDF("doc_id", "text").repartition(4)
    val once = Dedup.exact(docs, "text", "doc_id")
    assert(once.count() == 4, "one survivor per distinct text expected")
    // keep_ids are real doc ids — the smallest of each content group
    val keepIds = once.collect().map(_.getLong(0)).toSet
    val expectKeep = docs.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).values.map(_.map(_._2).min).toSet
    assert(keepIds == expectKeep, s"survivors are not the per-content minima")
    // idempotence: dedup of the kept documents changes nothing and every
    // survivor counts exactly one copy
    val kept = docs.join(once.select(col("keep_id").as("doc_id")), "doc_id")
    val twice = Dedup.exact(kept, "text", "doc_id").collect()
    assert(twice.map(_.getLong(0)).toSet == keepIds, "exact dedup not idempotent")
    assert(twice.forall(_.getLong(1) == 1L), "kept docs still counted copies")
    val empty = docs.filter(lit(false))
    assert(Dedup.exact(empty, "text", "doc_id").isEmpty)
  }

  test("minHashPairs: all-identical docs form the full clique at jac 1.0") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0L until 6L).map((_, text)).toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(docs, "doc_id",
      Dedup.tokens(col("text")), threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 15, s"6 identical docs must form C(6,2)=15 pairs: ${pairs.length}")
    pairs.foreach { case (a, b, j) =>
      assert(a < b, s"pair not canonical: ($a,$b)")
      assert(j == 1.0, s"identical docs must verify at jac 1.0: ($a,$b,$j)")
    }
    // degenerate: empty/whitespace docs must not throw or pair with text
    val weird = fuzzDocs(5L)
    val wp = Dedup.minHashPairs(weird, "doc_id",
      Dedup.tokens(col("text")), threshold = 0.8).collect()
    wp.foreach(r => assert(r.getLong(0) < r.getLong(1) &&
      r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0, s"bad pair: $r"))
  }

  test("simHashPairs: identical docs at hamming 0; bounds hold on fuzz docs") {
    import spark.implicits._
    val docs = (0L until 4L).map((_, "shared boilerplate text body"))
      .toDF("doc_id", "text")
    val same = Dedup.simHashPairs(docs, "doc_id", Dedup.tokens(col("text")))
      .collect()
    assert(same.length == 6 &&
      same.forall(_.getAs[Number](2).longValue == 0L),
      s"identical docs must pair at hamming 0: ${same.toSeq}")
    Dedup.simHashPairs(fuzzDocs(6L), "doc_id", Dedup.tokens(col("text")),
      maxHamming = 7).collect().foreach { r =>
      val h = r.getAs[Number](2).longValue
      assert(r.getLong(0) < r.getLong(1) && h >= 0L && h <= 7L, s"bad pair: $r")
    }
  }

  test("resolveClusters: reps are component minima; idempotent on its own output") {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    // random sparse graph over 30 vertices (some self-loops, dups)
    val raw = (0 until 40).map { _ =>
      val a = rng.nextInt(30).toLong; val b = rng.nextInt(30).toLong; (a, b)
    }
    val pairs = raw.toDF("a", "b").repartition(4)
    val got = Dedup.resolveClusters(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    raw.foreach { case (a, b) => parent(find(a)) = find(b) }
    val expect = parent.keys.map(v => v -> parent.keys
      .filter(u => find(u) == find(v)).min).toMap
    assert(got == expect, s"cluster reps diverged from union-find oracle")
    // idempotence: clustering the (v, rep) edges reproduces the labels
    val again = Dedup.resolveClusters(
      got.toSeq.toDF("v", "rep"), "v", "rep")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == expect, "resolveClusters not idempotent on its own output")
  }

  test("dropNearDuplicates: one survivor per cluster, non-paired docs untouched") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 4L, 5L, 7L, 8L, 9L),
      s"expected cluster minima + untouched docs, got $kept")
  }

  test("hashSplit / kfold / sampleByHash: pure functions of id — stable under repartitioning") {
    import spark.implicits._
    val ids = (0 until 200).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val s1 = Mixture.hashSplit(ids.repartition(3), "id",
      Seq("train" -> 0.8, "test" -> 0.2))
    val s2 = Mixture.hashSplit(ids.repartition(11), "id",
      Seq("train" -> 0.8, "test" -> 0.2))
    assert(collectSorted(s1) == collectSorted(s2), "hashSplit not partition-stable")
    assert(s1.filter(col("split").isNull).isEmpty, "row with no split")
    val k1 = Mixture.kfold(ids, "id", 5)
    assert(k1.filter(col("fold") < 0 || col("fold") >= 5).isEmpty)
    assert(k1.count() == 200)
    // sampleByHash monotonicity: a lower rate selects a subset of a higher
    val lo = Mixture.sampleByHash(ids, "src", "id", Map("a" -> 1000, "b" -> 0))
      .collect().map(_.getLong(0)).toSet
    val hi = Mixture.sampleByHash(ids, "src", "id", Map("a" -> 5000, "b" -> 10000))
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "md5-threshold sampling must be rate-monotone")
    assert(lo.forall(_ % 2 == 0), "rate-0 stratum leaked rows")
  }

  test("ppsSample: stride conservation under degenerate weights") {
    import spark.implicits._
    // one dominant weight + ties + zero weights
    val rows = Seq((1L, 1000L), (2L, 1L), (3L, 1L), (4L, 0L), (5L, 1L),
      (6L, 0L), (7L, 7L)).toDF("id", "w")
    val k = 10
    val got = Mixture.ppsSample(rows, "id", "w", k).collect()
    assert(got.map(_.getAs[Long]("n_strides")).sum == k,
      "systematic PPS must allocate exactly k strides")
    assert(!got.exists(_.getAs[Long]("w") == 0L), "zero-weight row selected")
    // the dominant row takes ~ w_i * k / W strides
    val dom = got.find(_.getAs[Long]("id") == 1L).map(_.getAs[Long]("n_strides"))
    assert(dom.exists(n => n >= 9L), s"dominant weight under-allocated: $dom")
  }

  test("samplePriorityByGroup: k beyond group size returns whole groups, deterministically") {
    import spark.implicits._
    // single-row groups and a 3-row group, weights with ties
    val df = Seq(("s1", 1L, 5L), ("s2", 2L, 5L), ("s3", 3L, 5L),
      ("s4", 4L, 5L), ("s4", 5L, 5L), ("s4", 6L, 5L)).toDF("grp", "id", "wt")
    val out = Mixture.samplePriorityByGroup(df, "grp", "id", col("wt"), k = 10)
    assert(out.count() == 6, "k > group size must keep every row")
    assert(collectSorted(out) == collectSorted(
      Mixture.samplePriorityByGroup(df.repartition(5), "grp", "id", col("wt"), k = 10)),
      "grouped priority draw not partition-stable")
  }

  test("Pack: budget shards conserve rows and never overfill on degenerate sizes") {
    import spark.implicits._
    // sizes: zeros, budget-exact, over-budget single row
    val rows = Seq(("k", 1L, 0L), ("k", 2L, 4L), ("k", 3L, 4L), ("k", 4L, 9L),
      ("k", 5L, 1L), ("j", 6L, 2L)).toDF("key", "ord", "sz")
    val packed = Pack.byBudget(rows, col("key"), col("ord"), col("sz"), budget = 4L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("offset"), r.getAs[Long]("shard")))
    assert(packed.length == 6, "packing dropped rows")
    packed.foreach { case (_, _, _, off, sh) =>
      assert(off >= 0 && sh == off / 4, s"shard arithmetic broken: $packed")
    }
    // rows that fit the budget never span into a shard with total > budget,
    // except the documented over-budget single row (sz=9 owns its shards)
    val perShard = packed.filter(_._3 <= 4).groupBy(p => (p._1, p._5))
      .map { case (_, g) => g.map(_._3).sum }
    assert(perShard.forall(_ <= 8L), s"shard accumulated beyond offset window: $perShard")
    val global = Pack.globalByBudget(rows, col("ord"), col("sz"), budget = 4L)
    assert(global.count() == 6)
  }

  test("shuffleShard: empty corpus, single row, and shards > n all well-defined") {
    import spark.implicits._
    // empty corpus: the percentile cutpoints aggregate sees zero rows —
    // must yield an empty result with the contract columns, not a throw
    val empty = Mixture.shuffleShard(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", 7L, 4,
      chunks = 4)
    assert(empty.count() == 0)
    assert(empty.columns.toSet == Set("doc_id", "text", "pos", "shard"))
    // single row: position 1, shard 1, regardless of shard count
    val one = Mixture.shuffleShard(Seq((42L, "x")).toDF("doc_id", "text"),
      "doc_id", 7L, 4, chunks = 4).collect()
    assert(one.length == 1 && one(0).getAs[Long]("pos") == 1L
      && one(0).getAs[Long]("shard") == 1L)
    // shards > n: NTILE's closed form degrades to shard i = row i — every
    // shard at most one row, positions still the full permutation
    val tiny = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cut = Mixture.shuffleShard(tiny, "doc_id", 7L, shards = 5, chunks = 2)
      .collect()
    assert(cut.map(_.getAs[Long]("pos")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(cut.map(_.getAs[Long]("shard")).sorted.toSeq == Seq(1L, 2L, 3L),
      "shards beyond n must stay empty, occupied shards one row each")
    // and the permutation is partition-stable
    val a = Mixture.shuffleShard(tiny.repartition(3), "doc_id", 7L, 5,
      chunks = 2)
    assert(collectSorted(a) == collectSorted(
      Mixture.shuffleShard(tiny.coalesce(1), "doc_id", 7L, 5, chunks = 2)),
      "shuffleShard not partition-stable")
  }

  test("GlobalRank.withRowNumber: a permutation of 1..n even with heavy ties") {
    import spark.implicits._
    // all-ties rank key; order columns make the total order unique
    val df = (0 until 100).map(i => (i.toLong, 7L)).toDF("id", "all_same")
      .repartition(5)
    val rn = GlobalRank.withRowNumber(df, col("all_same"),
      Seq(col("all_same"), col("id")))
    val got = rn.collect().map(_.getAs[Long]("rn")).sorted
    assert(got.toSeq == (1L to 100L), "row numbers are not a permutation of 1..n")
  }

  test("bruteForceKnn: zero and null vectors score 0/absent, never throw") {
    import spark.implicits._
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f))).toDF("id", "vec")
    val queries = Seq((10L, Array(0.0f, 0.0f)), (11L, Array(1.0f, 1.0f)),
      (12L, null: Array[Float])).toDF("id", "vec")
    // output columns: (q_id, c_id, rn, sim)
    val out = Similarity.bruteForceKnn(corpus, queries, "id", "vec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // zero-vector query: documented cosine_sim contract — sim 0.0 to all
    assert(out.filter(_._1 == 10L).forall(_._3 == 0.0),
      "zero vector must score 0 against everything")
    out.foreach { case (_, _, sim) =>
      assert(!sim.isNaN && sim >= -1.0 && sim <= 1.0, s"sim out of range: $out")
    }
    // k beyond corpus: every query gets at most |corpus| neighbors
    assert(out.groupBy(_._1).values.forall(_.size <= 3))
  }

  test("chunk: windows cover every token, bounded, empty text yields one empty chunk") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g"), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text",
      chunkTokens = 3, strideTokens = 2, maxChunks = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3)))
    out.foreach { case (_, idx, _, n) =>
      assert(idx >= 0 && n <= 3, s"chunk bounds violated: $out")
    }
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._3).mkString(" ").split(" ").distinct.sorted.toSeq ==
      Seq("a", "b", "c", "d", "e", "f", "g"), "chunking lost tokens")
    // "" splits to [""], one window — degenerate but defined
    assert(out.count(_._1 == 2L) == 1)
  }

  test("logistic trainer: degenerate docs train without throwing; empty corpus refused loudly") {
    import spark.implicits._
    val w0 = Seq.fill(256)(0L)
    // degenerate corpus: null, empty, whitespace-only, one real doc per class
    val docs = Seq(
      (1L, null.asInstanceOf[String], 1L), (2L, "", 0L), (3L, "   \t  ", 1L),
      (4L, "good clean text here", 1L), (5L, "spam spam spam", 0L))
      .toDF("id", "text", "y")
    val trained = TextAnalysis.logisticTrainN(docs, "text", col("y"),
      w0, steps = 2, lrMicro = 1000000L, n = docs.count())
    assert(trained.size == 256 && trained.exists(_ != 0L),
      "training over degenerate docs must move some weight")
    // scoring the degenerate docs is defined for all non-null texts
    val scored = TextAnalysis.linearMargins(docs, "id", "text", trained)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!scored(4L) && !scored(2L) && !scored(3L), "defined text must score")
    // the empty corpus fails with the remedy, not a bare / by zero
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.logisticTrainN(docs.limit(0), "text", col("y"),
        w0, steps = 1, lrMicro = 1000000L, n = 0L)
    }
    assert(e.getMessage.contains("non-empty corpus"))
  }
}
