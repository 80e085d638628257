package graft

import org.apache.spark.sql.functions._

/** Property-style laws over the engine's operators (SURVEY.md §5.3),
  * exercised over a deterministic sweep of inputs (each case is a full
  * Spark job, so the sweep is kept small; scalacheck's shrinking adds
  * nothing over fixed seeds here).
  */
class PropertySpec extends SparkTestBase {

  private lazy val li = Tables.t(spark, sf, "lineitem").cache()

  test("script splitter round-trip: seeded random scripts reassemble to their statements") {
    // statements drawn with hostile content — semicolons and '--' inside
    // single-quoted literals, '' escapes, multi-line strings — joined
    // with ';' and random comments; the splitter must return exactly the
    // original statement list (modulo trim).
    val atoms = Seq(
      "SELECT 1",
      "SELECT 'a;b' AS s",
      "SELECT ';' AS semi, 2 AS n",
      "SELECT 'it''s; fine' AS esc",
      "SELECT 'line1\nline2;still' AS ml",
      "SELECT '-- not a comment;' AS c",
      "CREATE EXTERNAL TABLE t (a INT) STORED AS PARQUET LOCATION '/x;y.parquet'",
      "SELECT 1 -- inline comment with ; semicolon\n + 2 AS n",
      // Spark's default (non-ANSI) parser treats "..." as a string
      // literal too: ';' and '--' inside double quotes must survive
      "SELECT \"a;b -- not; a comment\" AS dq, 3 AS n",
      "SELECT \"mixed '; quotes\" AS dq2")
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val stmts = Seq.fill(1 + rnd.nextInt(5))(atoms(rnd.nextInt(atoms.length)))
      val glue = () => if (rnd.nextBoolean()) ";\n-- comment; with semicolon\n" else ";"
      val script = stmts.map(s => if (rnd.nextBoolean()) s + "\n" else s)
        .mkString(glue())
      val got = Repl.splitStatements(script)
      // expected: each statement with its comments stripped the same way
      val want = stmts.map(s => Repl.splitStatements(s) match {
        case Seq(one) => one
        case other    => fail(s"atom split into $other")
      })
      assert(got == want, s"script $script split to $got, wanted $want")
    }
  }

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

  test("TopKPairs aggregator matches window rank and is partitioning-invariant") {
    import org.apache.spark.sql.functions.udaf
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("n_chars"))
    val topk = udaf(new graft.functions.Aggregators.TopKPairs(3))
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("source").agg(topk(col("n_chars"), col("doc_id")).as("tk"))
      .select(col("source"), explode(col("tk")).as("p"))
      .collect().map(r => (r.getString(0), r.getStruct(1).getLong(0),
        r.getStruct(1).getLong(1))).toSet
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    val want = docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(1))).toSet
    assert(run(docs) == want)
    assert(run(docs.repartition(13)) == want, "merge must be order-insensitive")
  }

  test("GeoMean aggregator is invariant to partitioning (merge correctness)") {
    import org.apache.spark.sql.functions.udaf
    val geo = udaf(graft.functions.Aggregators.GeoMean)
    val one = li.coalesce(1).agg(geo(col("l_quantity"))).collect()(0).getDouble(0)
    val many = li.repartition(13).agg(geo(col("l_quantity"))).collect()(0).getDouble(0)
    assert(math.abs(one - many) < 1e-9, s"$one vs $many")
  }

  test("chunking with stride == chunk reconstructs the document exactly") {
    // deterministic subset: limit(n)'s row pick is plan-dependent, and this
    // test evaluates the subset twice (chunked + original)
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 50)
    val rebuilt = graft.operators.TextAnalysis
      .chunk(docs, "doc_id", "text", 30, 30, 8)
      .orderBy("doc_id", "chunk_idx").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).mkString(" ")).toMap
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    orig.foreach { case (id, text) =>
      assert(rebuilt(id) == text, s"doc $id not reconstructed")
    }
  }

  test("resample conserves event counts and starts/ends on observed buckets") {
    val ev = Tables.t(spark, sf, "events")
    val rs = graft.operators.Resample.locf(ev, "event_type", "ts",
      count(lit(1)).as("c"), "hour")
    val total = rs.agg(sum("n")).collect()(0).getLong(0)
    assert(total == ev.count(), "gap filling changed the event count")
    // every series' first grid bucket has observations (grid starts at min)
    val firsts = rs.orderBy("series", "bucket")
      .groupBy("series").agg(first("n").as("n0"))
      .collect().map(_.getLong(1))
    assert(firsts.forall(_ > 0), "grid extends before first observation")
  }

  test("band join equals the naive non-equi join") {
    val ev = Tables.t(spark, sf, "events").filter(col("event_id") < 300)
    val fast = graft.operators.RangeJoin
      .bandJoinMicros(ev, ev, "user_id", "event_id", "event_id", "ts", 120L * 1000000)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ev.select(col("user_id").as("u"), col("event_id").as("id_a"),
      unix_micros(col("ts")).as("ta"))
    val b = ev.select(col("user_id").as("u2"), col("event_id").as("id_b"),
      unix_micros(col("ts")).as("tb"))
    val naive = a.join(b, col("u") === col("u2") && col("id_a") < col("id_b") &&
        abs(col("ta") - col("tb")) <= 120L * 1000000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive, s"band join mismatch: extra=${fast -- naive} missing=${naive -- fast}")
  }

  /** Fixed sketch for the codegen-vs-interpreted differential: even doc
    * ids inserted, so the column exercises both branch outcomes.
    */
  private lazy val propertyTestBloom: org.apache.spark.util.sketch.BloomFilter = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0L until 100L by 2L).foreach(bf.putLong)
    bf
  }

  test("custom expressions: codegen and interpreted paths agree bit-for-bit") {
    import graft.functions._
    // deterministic subsets: these are evaluated once per codegen mode, and
    // limit(n) may pick different rows per plan — filter on id instead
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 100)
    val emb = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 50)
    val shingles = expr(
      "array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), i -> substring(text, i, 5)))")
    def docsOut() = docs.select(col("doc_id"),
        unaccent(concat(lit("Çafé "), col("text"))).as("u"),
        fingerprint64(col("text")).as("fp"),
        simhash64(split(col("text"), " ")).as("sh"),
        minhash_sig(shingles, 32).as("mh"),
        winnow_fingerprints(col("text")).as("wf"),
        sorted_intersect_size(
          minhash_sig(shingles, 16), minhash_sig(shingles, 16)).as("sis"),
        prefix_overlap(hashed_shingles(col("text"), 5),
          winnow_fingerprints(col("text")), 0.3).as("po"),
        bounded_jaccard(hashed_shingles(col("text"), 5),
          winnow_fingerprints(col("text")), 0.3).as("bj"),
        char_entropy(concat(lit("中é "), col("text"))).as("ce"),
        hashed_words(concat(lit("UP low "), col("text"))).as("hw"),
        ngram_poly_hashes(hashed_words(col("text")), 13).as("nph"),
        zorder2(col("doc_id").cast("int"), length(col("text")).cast("int")).as("zo"),
        bloom_might_contain(col("doc_id"), propertyTestBloom).as("bmc"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    def embOut() = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 20)
      .select(col("a.vec_id"), col("b.vec_id"),
        cosine_sim(col("a.embedding"), col("b.embedding")).as("cos"),
        dot_product(col("a.embedding"), col("b.embedding")).as("dot"),
        euclidean_dist(col("a.embedding"), col("b.embedding")).as("l2"),
        hamming64(fingerprint64(col("a.vec_id").cast("string")),
          fingerprint64(col("b.vec_id").cast("string"))).as("ham"),
        sign_lsh_buckets(col("a.embedding"), 6, 4, 64).as("lsh"))
      .orderBy("a.vec_id", "b.vec_id").collect().map(_.toString).toSeq
    val mode = "spark.sql.codegen.factoryMode"
    val saved = spark.conf.getOption(mode)
    try {
      spark.conf.set(mode, "CODEGEN_ONLY")
      val (d1, e1) = (docsOut(), embOut())
      spark.conf.set(mode, "NO_CODEGEN")
      val (d2, e2) = (docsOut(), embOut())
      assert(d1 == d2, "docs expressions diverge between codegen and interpreted")
      assert(e1 == e2, "vector expressions diverge between codegen and interpreted")
    } finally saved match {
      case Some(v) => spark.conf.set(mode, v)
      case None    => spark.conf.unset(mode)
    }
  }

  test("tableDiff equals the brute-force per-group multiset comparison") {
    import spark.implicits._
    import graft.operators.TableDiff
    forAllSeeds(Seq(1, 7, 42)) { seed =>
      val rnd = new scala.util.Random(seed)
      val groups = ('A' to 'F').map(_.toString)
      val before = (1 to 200).map(i =>
        (groups(rnd.nextInt(groups.size)), i.toLong, rnd.nextInt(5).toString))
      // mutate: drop one whole group, perturb some values, add a new group
      val dropped = groups(rnd.nextInt(groups.size))
      val after = before.filterNot(_._1 == dropped).map { case (g, id, v) =>
        if (rnd.nextInt(10) == 0) (g, id, v + "'") else (g, id, v)
      } ++ (1 to 5).map(i => ("Z", 1000L + i, "new"))
      def bf(): Set[(String, String)] = {
        val bm = before.groupBy(_._1).view
          .mapValues(_.map(t => (t._2, t._3)).sorted).toMap
        val am = after.groupBy(_._1).view
          .mapValues(_.map(t => (t._2, t._3)).sorted).toMap
        (bm.keySet ++ am.keySet).flatMap { g =>
          (bm.get(g), am.get(g)) match {
            case (Some(b), Some(a)) if b == a => None
            case (Some(_), Some(_))           => Some(g -> "changed")
            case (Some(_), None)              => Some(g -> "removed")
            case (None, Some(_))              => Some(g -> "added")
            case _                            => None
          }
        }
      }
      val got = TableDiff.diff(
          before.toDF("g", "id", "v"), after.toDF("g", "id", "v"),
          Seq("g"), Seq(col("id").cast("string"), col("v")))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == bf(), s"seed $seed: got $got want ${bf()}")
    }
  }

  test("profile measures equal independently computed aggregates") {
    import spark.implicits._
    import graft.operators.Profile
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      (i.toLong, if (rnd.nextInt(4) == 0) None else Some(s"v${rnd.nextInt(20)}"))
    }
    val df = rows.toDF("id", "s")
    val got = Profile.profile(df, Seq("s")).collect()(0)
    val vals = rows.flatMap(_._2)
    assert(got.getLong(1) == 300L)                     // n_rows
    assert(got.getLong(2) == 300L - vals.size)         // n_nulls
    assert(got.getLong(3) == vals.distinct.size.toLong) // n_distinct
    assert(got.getString(4) == vals.min && got.getString(5) == vals.max)
    assert(got.getLong(6) == vals.map(_.length.toLong).sum) // len_sum
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
