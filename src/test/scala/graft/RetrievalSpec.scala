package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the retrieval/packing operators (Bm25, Pack) and the
  * rolling-hash n-gram expression they ride on — each checked against an
  * independent reimplementation, not against itself.
  */
class RetrievalSpec extends SparkTestBase {

  import graft.operators.{Bm25, Pack}

  test("BM25 matches a hand-rolled scorer on an inline corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare word here"),
      (2L, "common common common word"),
      (3L, "rare rare word word word common"),
      (4L, "nothing relevant at all")).toDF("id", "text")
    val terms = Seq("rare", "common")
    val got = Bm25.scoreMicros(docs, "id", col("text"), terms)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent reimplementation (plain Scala)
    val corpus = Map(
      1L -> "rare word here", 2L -> "common common common word",
      3L -> "rare rare word word word common", 4L -> "nothing relevant at all")
    val toks = corpus.view.mapValues(_.toLowerCase.split(" ").toSeq).toMap
    val nDocs = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / nDocs
    val (k1, b) = (1.2, 0.75)
    val expected = toks.flatMap { case (id, tk) =>
      val scores = terms.flatMap { term =>
        val tf = tk.count(_ == term).toDouble
        if (tf == 0) None
        else {
          val df = toks.values.count(_.contains(term)).toDouble
          val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
          val norm = tf + k1 * (1.0 - b + b * tk.size / avgdl)
          Some(math.round(idf * (tf * (k1 + 1.0) / norm) * 1e6))
        }
      }
      if (scores.isEmpty) None else Some(id -> scores.sum)
    }
    assert(got == expected, s"got $got expected $expected")
  }

  test("BM25 counts a duplicated query term once") {
    import spark.implicits._
    val docs = Seq((1L, "data table"), (2L, "table row")).toDF("id", "text")
    val once = Bm25.scoreMicros(docs, "id", col("text"), Seq("data"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dup = Bm25.scoreMicros(docs, "id", col("text"), Seq("data", "data"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once == dup, s"duplicate term changed scores: $once vs $dup")
  }

  test("BM25 ranks the doc saturated in a rare term above common-term docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "zebra zebra zebra data data"),
      (2L, "data data data data data"),
      (3L, "data table row"),
      (4L, "table row"),
      (5L, "table data")).toDF("id", "text")
    val top = Bm25.topK(docs, "id", col("text"), Seq("zebra", "data"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top.head == 1L, s"rare-term doc should rank first, got $top")
  }

  test("Pack assigns offsets as the exclusive per-key cumsum and shards by budget") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L), ("a", 4L, 200L),
      ("b", 1L, 50L), ("b", 2L, 1200L), ("b", 3L, 10L))
      .toDF("src", "ord", "sz")
    val got = Pack.byBudget(df, col("src"), col("ord"), col("sz"), budget = 512L)
      .select("src", "ord", "offset", "shard")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val expected = Map(
      ("a", 1L) -> (0L, 0L), ("a", 2L) -> (300L, 0L),
      ("a", 3L) -> (600L, 1L), ("a", 4L) -> (900L, 1L),
      ("b", 1L) -> (0L, 0L), ("b", 2L) -> (50L, 0L), ("b", 3L) -> (1250L, 2L))
    assert(got == expected, s"got $got")
    intercept[IllegalArgumentException](
      Pack.byBudget(df, col("src"), col("ord"), col("sz"), budget = 0L))
  }

  test("global packing equals the single-window reference cumsum") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("sz"))
    val got = Pack.globalByBudget(docs, col("doc_id"), col("sz"), budget = 512L, chunks = 8)
      .select("doc_id", "offset", "shard")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs
      .withColumn("off", sum(col("sz")).over(w) - col("sz"))
      .select(col("doc_id"), col("off"), expr("off div 512L"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("rolling n-gram hashes equal a direct per-window polynomial rebuild") {
    import graft.functions.{hashed_words, ngram_poly_hashes}
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 40)
    val rows = docs.select(col("doc_id"),
        hashed_words(col("text")).as("hw"),
        ngram_poly_hashes(hashed_words(col("text")), 5).as("nph"))
      .collect()
    assert(rows.nonEmpty)
    val M = graft.functions.RollingHash.M
    rows.foreach { r =>
      val hw = r.getSeq[Long](1)
      val got = r.getSeq[Long](2)
      // independent O(n·k) rebuild: fold each window explicitly
      val expected =
        if (hw.size < 5) Seq.empty[Long]
        else hw.sliding(5).map(_.foldLeft(0L)((acc, h) => acc * M + h)).toSeq
      assert(got == expected, s"doc ${r.getLong(0)}: rolling hash diverges")
    }
  }

  test("decontamination gram hashing is n-window-exact (no boundary slip)") {
    import spark.implicits._
    // two docs sharing exactly one 3-gram ("b c d"); n=3 must catch it,
    // n=4 must not
    val corpus = Seq((1L, "a b c d e"), (2L, "x y z")).toDF("id", "text")
    val bench = Seq((10L, "q b c d r")).toDF("id", "text")
    val kept3 = graft.operators.Decontaminate
      .decontaminate(corpus, bench, "id", "text", n = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept3 == Set(2L), s"3-gram overlap missed: kept $kept3")
    val kept4 = graft.operators.Decontaminate
      .decontaminate(corpus, bench, "id", "text", n = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept4 == Set(1L, 2L), s"false 4-gram contamination: kept $kept4")
  }

  test("inverted index: shards bounded by block, df spans shards, postings sorted") {
    import spark.implicits._
    import graft.operators.Index
    // "hot" appears in every doc across two id blocks; "only7" in doc 7
    val docs = (0L to 14L).map(i =>
      (i, if (i == 7) "hot only7" else s"hot w$i")).toDF("id", "text")
    val out = Index.postingShards(docs, "id", "text", blockSpan = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val hot = out.filter(_._1 == "hot").sortBy(_._2)
    assert(hot.map(_._2).toSeq == Seq(0L, 1L)) // two id blocks
    assert(hot.head._3 == (0L to 9L).mkString(","))
    assert(hot(1)._3 == (10L to 14L).mkString(","))
    assert(hot.forall(_._5 == 15L)) // df is corpus-wide on every shard row
    val only7 = out.filter(_._1 == "only7")
    assert(only7.toSeq == Seq(("only7", 0L, "7", 1L, 1L)))
  }

  test("url canonicalization: case, fragment, and utm params normalized away") {
    import spark.implicits._
    import graft.operators.UrlCanon
    val urls = Seq(
      (1L, "https://WWW.Site.COM/A/b?utm_source=x&id=9#frag"),
      (2L, "https://www.site.com/A/b?id=9"),
      (3L, "HTTPS://www.site.com/A/b?utm_campaign=c&id=9#other"),
      (4L, "https://www.site.com/a/B?id=9"), // path case differs -> distinct
      (5L, "https://www.site.com/plain")     // no query at all
    ).toDF("id", "url")
    val out = UrlCanon.dedupByUrl(urls, "url", "id").orderBy("canon_url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("https://www.site.com/A/b?id=9", 1L, 3L),
      ("https://www.site.com/a/B?id=9", 4L, 1L),
      ("https://www.site.com/plain", 5L, 1L)))
  }
}
