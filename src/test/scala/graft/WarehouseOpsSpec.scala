package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: CDC upsert, SCD2 history, dictionary
  * fuzzy join, robust outliers — checked on hand-built inputs with known
  * answers.
  */
class WarehouseOpsSpec extends SparkTestBase {

  import graft.operators.{Cdc, FuzzyJoin, Robust}

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("upsert replaces matched keys, inserts unmatched, keeps the rest") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "new")).toDF("k", "v")
    val got = Cdc.upsert(base, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "new"))
  }

  test("upsert with a multi-row update keyset never duplicates base rows") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    // duplicate key in updates: both rows survive (caller's contract to
    // dedup), but the BASE row must be replaced exactly once
    val updates = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val got = Cdc.upsert(base, updates, Seq("k")).collect()
    assert(got.length == 2 && got.forall(_.getLong(0) == 1L))
  }

  test("strict upsert raises on duplicate update keys (MERGE semantics)") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val dups = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Cdc.upsert(base, dups, Seq("k"), strict = true)
    }
    assert(e.getMessage.contains("more than once"))
    // clean feed passes strict unchanged
    val clean = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val got = Cdc.upsert(base, clean, Seq("k"), strict = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "x", 2L -> "y"))
  }

  test("scd2 collapses runs and builds contiguous validity intervals") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 10L, "bronze", 0.0),
      (2L, ts(5), 10L, "bronze", 0.0),   // same value -> collapsed
      (3L, ts(10), 10L, "silver", 0.0),  // change
      (4L, ts(20), 10L, "gold", 0.0),    // change
      (5L, ts(0), 20L, "basic", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Cdc.scd2(events, "user_id", "event_type", "ts", "event_id")
      .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (10L, "bronze", ts(0), ts(10), false),
      (10L, "silver", ts(10), ts(20), false),
      (10L, "gold", ts(20), null, true),
      (20L, "basic", ts(0), null, true)))
  }

  test("fuzzy dictionary pairs find known near-matches and respect the bound") {
    import spark.implicits._
    val df = Seq("red bolt", "red bolts", "red widget", "blue bolt",
      "red bolt", "blue bolt").toDF("name")
    val got = FuzzyJoin.dictionaryPairs(df, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // same block ("red"/"blue") and dist <= 2: only red bolt ~ red bolts.
    // red bolt vs red widget is dist 5; blue bolt is another block.
    assert(got == Set(("red bolt", "red bolts", 1)))
  }

  test("length pre-filter is sound: never drops a true match") {
    import spark.implicits._
    // names differing by maxDist characters of pure insertion — the
    // length-window boundary case
    val df = Seq("a x", "a xyz").toDF("name")
    val got = FuzzyJoin.dictionaryPairs(df, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a x", "a xyz")))
  }

  test("length-band blocking is no-miss vs the unbanded block join (hot token)") {
    import spark.implicits._
    // A hot first token ("acme") with lengths spread across band
    // boundaries for every w in 1..4 — incl. pairs whose lengths straddle
    // a band edge (the case naive single-band blocking silently loses).
    val base = Seq(
      "acme a", "acme ab", "acme abc", "acme abcd", "acme abcde",
      "acme abcdef", "acme abcdefg", "acme abcdefgh", "acme abXdefgh",
      "acme zz", "acme zzz", "other a", "other ab")
    val df = base.toDF("name")
    for (maxDist <- 1 to 4) {
      // ground truth: same first token, dist <= maxDist, over distinct names
      val names = base.distinct
      val blk = (s: String) => s.toLowerCase.split(" ")(0)
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val expect = (for {
        a <- names; b <- names
        if a < b && blk(a) == blk(b) && lev(a, b) <= maxDist
      } yield (a, b, lev(a, b))).toSet
      val got = FuzzyJoin.dictionaryPairs(df, "name", maxDist)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == expect, s"maxDist=$maxDist: missing=${expect.diff(got)} extra=${got.diff(expect)}")
    }
  }

  test("compaction reduces file count and loses no rows") {
    import graft.operators.Compact
    val base = sys.props("java.io.tmpdir") + s"/graft_compact_spec_${System.nanoTime()}"
    try {
      val docs = Tables.t(spark, sf, "documents")
      docs.write.mode("overwrite").option("maxRecordsPerFile", 25)
        .parquet(base + "/frag")
      // the operator's own lister — counting and sizing share one rule
      def fileCount(dir: String): Int = Compact.parquetFiles(spark, dir).size
      val before = fileCount(base + "/frag")
      val compacted = Compact.rewrite(spark, base + "/frag", base + "/out",
        targetFileBytes = 64L * 1024 * 1024)
      assert(fileCount(base + "/out") == 1, "one target-size file expected for tiny input")
      assert(before > 10, s"fragmented write should produce many files, got $before")
      assert(compacted.count() == docs.count())
    } finally {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("sorted compaction produces disjoint per-file sort-key ranges") {
    import graft.operators.Compact
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val base = sys.props("java.io.tmpdir") + s"/graft_compact_sorted_${System.nanoTime()}"
    try {
      val docs = Tables.t(spark, sf, "documents")
      docs.write.mode("overwrite").option("maxRecordsPerFile", 25)
        .parquet(base + "/frag")
      // size the target at ~1/4 of the input so the rewrite yields
      // SEVERAL files — disjointness over one file proves nothing
      val total = Compact.parquetFiles(spark, base + "/frag").map(_.getLen).sum
      val out = Compact.rewriteSorted(spark, base + "/frag", base + "/out",
        targetFileBytes = math.max(total / 4, 1L), sortCols = Seq("doc_id"))
      assert(out.count() == docs.count(), "clustered rewrite must be lossless")
      val ranges = spark.read.parquet(base + "/out")
        .groupBy(input_file_name().as("f"))
        .agg(fmin("doc_id").as("lo"), fmax("doc_id").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(ranges.length > 1,
        s"expected several output files for the range-disjointness check: ${ranges.length}")
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 < lo2, s"file id-ranges overlap: $ranges")
        case _ => ()
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("sorted compaction writes tight, disjoint row-group min/max footer statistics") {
    // The pruning claim of rewriteSorted rests on what a scan PLANNER
    // reads: the parquet footers' row-group statistics, not the data.
    // Read them directly (ParquetFileReader) and assert every row group
    // carries doc_id min/max, the per-file stat ranges are disjoint
    // across files, and the stats are TIGHT (equal to the actual per-file
    // min/max of the data) — a writer that wrote files clustered but
    // stats-less or padded would pass the read-back test yet prune
    // nothing.
    import graft.operators.Compact
    import org.apache.spark.sql.functions.{min => fmin, max => fmax}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val base = sys.props("java.io.tmpdir") + s"/graft_compact_footer_${System.nanoTime()}"
    try {
      val docs = Tables.t(spark, sf, "documents")
      docs.write.mode("overwrite").option("maxRecordsPerFile", 25)
        .parquet(base + "/frag")
      val total = Compact.parquetFiles(spark, base + "/frag").map(_.getLen).sum
      Compact.rewriteSorted(spark, base + "/frag", base + "/out",
        targetFileBytes = math.max(total / 4, 1L), sortCols = Seq("doc_id"))
      val conf = spark.sparkContext.hadoopConfiguration
      val footerRanges = Compact.parquetFiles(spark, base + "/out").map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val groups = reader.getFooter.getBlocks
          assert(!groups.isEmpty, s"${f.getPath}: no row groups")
          val stats = (0 until groups.size()).map { i =>
            val cols = groups.get(i).getColumns
            val idCol = (0 until cols.size())
              .map(cols.get)
              .find(_.getPath.toDotString == "doc_id")
              .getOrElse(fail(s"${f.getPath}: row group $i has no doc_id chunk"))
            val st = idCol.getStatistics
            assert(st != null && st.hasNonNullValue,
              s"${f.getPath}: row group $i carries no doc_id min/max statistics")
            (st.genericGetMin.asInstanceOf[Long], st.genericGetMax.asInstanceOf[Long])
          }
          (f.getPath.toString, stats.map(_._1).min, stats.map(_._2).max)
        } finally reader.close()
      }
      assert(footerRanges.length > 1,
        s"need several files for the disjointness check: ${footerRanges.length}")
      // disjoint across files, by the FOOTER ranges alone
      val sorted = footerRanges.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((fa, _, hi1), (fb, lo2, _)) =>
          assert(hi1 < lo2, s"footer stat ranges overlap: $fa [..$hi1] vs $fb [$lo2..]")
        case _ => ()
      }
      // tight: footer min/max == actual data min/max per file
      val actual = spark.read.parquet(base + "/out")
        .groupBy(org.apache.spark.sql.functions.input_file_name().as("f"))
        .agg(fmin("doc_id").as("lo"), fmax("doc_id").as("hi"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      footerRanges.foreach { case (f, lo, hi) =>
        val (alo, ahi) = actual.getOrElse(f,
          actual.find(_._1.endsWith(f.split('/').last)).map(_._2)
            .getOrElse(fail(s"no data read back for $f")))
        assert(lo == alo && hi == ahi,
          s"$f: footer stats [$lo,$hi] not tight vs data [$alo,$ahi]")
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("partitioned compaction splits a skewed partition into multiple target-size files") {
    import graft.operators.Compact
    import spark.implicits._
    val base = sys.props("java.io.tmpdir") + s"/graft_compact_skew_${System.nanoTime()}"
    try {
      // skewed: key "hot" carries 50k rows with fat payloads, "cold" 100
      val hot = spark.range(50000).select(lit("hot").as("k"),
        col("id"), concat_ws("", Seq.fill(40)(lit("payload-x")): _*).as("pad"))
      val cold = spark.range(100).select(lit("cold").as("k"), col("id"),
        lit("tiny").as("pad"))
      hot.union(cold).write.mode("overwrite")
        .option("maxRecordsPerFile", 2000).partitionBy("k").parquet(base + "/frag")
      val hotBytes = Compact.partitionBytes(spark, base + "/frag")("k=hot")
      val target = hotBytes / 4 // expect ~4 files for the hot partition
      val out = Compact.rewrite(spark, base + "/frag", base + "/out",
        targetFileBytes = target, partitionCols = Seq("k"))
      val hotFiles = Compact.parquetFiles(spark, base + "/out")
        .filter(_.getPath.toString.contains("k=hot"))
      val coldFiles = Compact.parquetFiles(spark, base + "/out")
        .filter(_.getPath.toString.contains("k=cold"))
      assert(hotFiles.size >= 3 && hotFiles.size <= 8,
        s"hot partition should split into ~4 files, got ${hotFiles.size}")
      assert(coldFiles.size == 1, s"cold partition should stay one file, got ${coldFiles.size}")
      // lossless, layout kept
      assert(out.count() == 50100)
      assert(out.filter(col("k") === "hot").count() == 50000)
    } finally {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("scd2 keeps null-attribute periods as intervals of their own") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 10L, "a", 0.0),
      (2L, ts(5), 10L, null.asInstanceOf[String], 0.0), // null period
      (3L, ts(10), 10L, "a", 0.0))                      // back to a
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Cdc.scd2(events, "user_id", "event_type", "ts", "event_id")
      .select("event_type", "valid_from", "valid_to", "is_current")
      .orderBy("valid_from")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("a", ts(0), ts(5), false),
      (null, ts(5), ts(10), false),
      ("a", ts(10), null, true)))
  }

  test("scd2 as-of lookup equals the brute-force interval join") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    val events = Seq(
      (1L, ts(0), 10L, "bronze", 0.0),
      (2L, ts(10), 10L, "silver", 0.0),
      (3L, ts(20), 10L, "gold", 0.0),
      (4L, ts(2), 20L, "basic", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val hist = Cdc.scd2(events, "user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("valid_from"), col("valid_to"),
        col("event_type").as("state"))
    val probes = Seq((100L, 10L, ts(5)), (101L, 10L, ts(15)),
      (102L, 10L, ts(25)), (103L, 20L, ts(30)))
      .toDF("probe_id", "user_id", "pts")
    val got = AsOfJoin.backward(probes, hist.drop("valid_to"), "user_id",
        "pts", "valid_from", Seq("state"))
      .select("probe_id", "state").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted
    // brute force: interval containment over the same history; sequences
    // (not maps) so a duplicated-row regression cannot hide
    val brute = probes.join(hist, probes("user_id") === hist("user_id") &&
        probes("pts") >= hist("valid_from") &&
        (hist("valid_to").isNull || probes("pts") < hist("valid_to")))
      .select("probe_id", "state").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted
    assert(got == brute)
    assert(got == Seq(100L -> "bronze", 101L -> "silver",
      102L -> "gold", 103L -> "basic"))
  }

  test("funnel counts viewers, post-view clicks, and 30-minute conversions") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 1L, "view", 0.0), (2L, ts(10), 1L, "click", 0.0),   // converts
      (3L, ts(0), 2L, "view", 0.0), (4L, ts(45), 2L, "click", 0.0),   // too late
      (5L, ts(0), 3L, "view", 0.0),                                   // never clicks
      (6L, ts(0), 4L, "click", 0.0))                                  // click, no view
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("first_view"))
    val c = events.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("first_view"))
      .groupBy("user_id").agg(min("ts").as("first_click"))
    val row = c.join(v, "user_id")
      .agg(count(lit(1)).as("clicked"),
        sum(when(col("first_click") <=
            col("first_view") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L)).as("converted")).first()
    assert(v.count() == 3 && row.getLong(0) == 2 && row.getLong(1) == 1)
  }

  test("MAD = 0 groups (majority-constant) flag nothing instead of everything") {
    import spark.implicits._
    val df = (Seq.fill(6)(5.0) ++ Seq(5.0000001, 4.9999999)).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "grp", "v")
    assert(Robust.madOutliers(df, "grp", "v", k = 3.0).count() == 0)
  }

  test("partitioned compaction keeps the directory layout") {
    import graft.operators.Compact
    val base = sys.props("java.io.tmpdir") + s"/graft_compact_part_${System.nanoTime()}"
    try {
      Tables.t(spark, sf, "orders")
        .write.mode("overwrite").option("maxRecordsPerFile", 25)
        .partitionBy("o_orderpriority").parquet(base + "/frag")
      val compacted = Compact.rewrite(spark, base + "/frag", base + "/out",
        targetFileBytes = 64L * 1024 * 1024,
        partitionCols = Seq("o_orderpriority"))
      // layout preserved: partition directories exist in the output
      val p = new org.apache.hadoop.fs.Path(base + "/out")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val partDirs = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("o_orderpriority="))
      assert(partDirs.length >= 2, s"partition dirs missing: ${partDirs.toSeq}")
      // column survives and rows are lossless
      assert(compacted.columns.contains("o_orderpriority"))
      assert(compacted.count() == Tables.t(spark, sf, "orders").count())
    } finally {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("dpp query prunes partition directories at runtime") {
    spark.catalog.clearCache()
    val plan = SparkEntry.queries("q_dpp")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"partitioned scan carries no dynamic pruning subquery:\n$plan")
  }

  test("MAD outliers flag a planted tail point that inflates the mean") {
    import spark.implicits._
    // 9 points near 10, one at 1000: stddev-based z<2 would mask it less
    // robustly; MAD flags exactly the planted point
    val vals = Seq(9.0, 9.5, 10.0, 10.0, 10.0, 10.5, 10.5, 11.0, 9.0, 1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val got = Robust.madOutliers(df, "grp", "v", k = 3.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(9L))
  }
}
