package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profile, TableDiff}

class ProfileDiffSpec extends SparkTestBase {

  test("profile computes nulls/distinct/minmax/length in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("aa")), (2L, Option("bb")), (3L, None),
      (4L, Option("bb")), (5L, None)
    ).toDF("id", "name")
    val got = Profile.profile(df, Seq("id", "name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5), r.getLong(6))).toSet
    assert(got == Set(
      ("id", 5L, 0L, 5L, "1", "5", 5L),
      ("name", 5L, 2L, 2L, "aa", "bb", 6L)))
  }

  test("profile exact=false keeps a plain aggregate (no Expand) and sane counts") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"k${i % 7}")).toDF("id", "k")
    val rows = Profile.profile(df, Seq("k"), exact = false).collect()
    assert(rows.length == 1)
    val nd = rows(0).getLong(3)
    assert(nd >= 6 && nd <= 8) // HLL++ on 7 keys
    val plan = Profile.profile(df, Seq("id", "k"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
  }

  test("profileBy groups the same measures per key") {
    import spark.implicits._
    val df = Seq(
      ("web", 1L, Option("aa")), ("web", 2L, None),
      ("book", 3L, Option("zz"))
    ).toDF("src", "id", "name")
    val got = Profile.profileBy(df, Seq("src"), Seq("name"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(("web", "name", 2L, 1L, 1L), ("book", "name", 1L, 0L, 1L)))
  }

  test("correlations: perfect +/- correlation, zero-variance nulls, partition-stable") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L, 7L), (2L, 4L, 2L, 7L), (3L, 6L, 1L, 7L))
      .toDF("x", "y", "z", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.correlations(d,
          Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z"), "w" -> col("w")))
        .collect().map(r => ((r.getString(0), r.getString(1)),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val got = run(df)
    assert(math.abs(got(("x", "y")).get - 1.0) < 1e-12)  // y = 2x
    assert(math.abs(got(("x", "z")).get + 1.0) < 1e-12)  // z = 4 - x
    assert(got(("x", "w")).isEmpty && got(("y", "w")).isEmpty) // w constant
    assert(run(df.repartition(3)) == got)
  }

  test("tableDiff reports only added/removed/changed groups") {
    import spark.implicits._
    val before = Seq(
      ("A", 1L, "x"), ("A", 2L, "y"), // unchanged
      ("B", 3L, "p"),                 // value changes
      ("C", 4L, "q")                  // removed
    ).toDF("g", "id", "v")
    val after = Seq(
      ("A", 1L, "x"), ("A", 2L, "y"),
      ("B", 3L, "P"),
      ("D", 5L, "r")                  // added
    ).toDF("g", "id", "v")
    val got = TableDiff.diff(before, after, Seq("g"),
        Seq(col("id").cast("string"), col("v")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      ("B", "changed", 1L, 1L),
      ("C", "removed", 1L, 0L),
      ("D", "added", 0L, 1L)))
  }

  test("tableDiff treats a null group key as a real group") {
    import spark.implicits._
    val before = Seq((Option("A"), "x"), (None, "old")).toDF("g", "v")
    val after = Seq((Option("A"), "x"), (None, "new")).toDF("g", "v")
    val got = TableDiff.diff(before, after, Seq("g"), Seq(col("v")))
      .collect().map(r => (Option(r.getString(0)), r.getString(1))).toSet
    assert(got == Set((None, "changed")))
  }
}
