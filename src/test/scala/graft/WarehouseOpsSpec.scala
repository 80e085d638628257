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
