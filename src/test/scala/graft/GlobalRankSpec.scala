package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank (two-phase global row numbering) against the single-window
  * reference implementation it replaces at scale.
  */
class GlobalRankSpec extends SparkTestBase {

  test("two-phase rn equals the unpartitioned-window row_number") {
    val cust = Tables.t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    val got = graft.operators.GlobalRank
      .withRowNumber(cust, col("c_acctbal"),
        Seq(col("c_acctbal"), col("c_custkey")), chunks = 8)
      .select("c_custkey", "rn", "n_total")
      .collect()
    val n = cust.count()
    assert(got.forall(_.getLong(2) == n), "n_total wrong")
    val want = cust.select(col("c_custkey"),
        row_number().over(Window.orderBy(col("c_acctbal"), col("c_custkey")))
          .cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(r.getLong(1) == want(r.getLong(0)),
      s"rn mismatch for c_custkey=${r.getLong(0)}"))
    // rn is a permutation of 1..n
    assert(got.map(_.getLong(1)).sorted.toSeq == (1L to n).toSeq)
  }

  test("inputs already carrying an output or internal column name are rejected loudly") {
    import spark.implicits._
    val G = graft.operators.GlobalRank
    // internal temp name (pre-existing guard)
    val reserved = Seq((1L, 2L)).toDF("__chunk", "v")
    intercept[IllegalArgumentException] {
      G.withRowNumber(reserved, col("v"), Seq(col("v")))
    }
    // output names: withColumn would silently REPLACE these (r14 advice)
    val hasRn = Seq((1L, 2L)).toDF("rn", "v")
    intercept[IllegalArgumentException] {
      G.withRowNumber(hasRn, col("v"), Seq(col("v")))
    }
    val hasTotal = Seq((1L, 2L)).toDF("n_total", "v")
    intercept[IllegalArgumentException] {
      G.withNtile(hasTotal, col("v"), Seq(col("v")), 2)
    }
    val hasBucket = Seq((1L, 2L)).toDF("bucket", "v")
    intercept[IllegalArgumentException] {
      G.withNtile(hasBucket, col("v"), Seq(col("v")), 2)
    }
    val hasCum = Seq((1L, 2L)).toDF("cum", "v")
    intercept[IllegalArgumentException] {
      G.withRunningSum(hasCum, col("v"), Seq(col("v")), lit(1))
    }
    // a bucket name that collides with another output is itself rejected
    intercept[IllegalArgumentException] {
      G.withNtile(Seq((1L, 2L)).toDF("a", "v"), col("v"), Seq(col("v")), 2,
        bucketCol = "rn")
    }
    // a cumCol named like an internal temp would be written then silently
    // dropped by the trailing drop — rejected up front (r15 advice)
    intercept[IllegalArgumentException] {
      G.withRunningSum(Seq((1L, 2L)).toDF("a", "v"), col("v"),
        Seq(col("v")), lit(1), cumCol = "__lcum")
    }
    // and a non-clashing custom name still works
    val ok = G.withRunningSum(Seq((1L, 2L)).toDF("a", "v"), col("v"),
      Seq(col("v")), lit(1), cumCol = "running")
    assert(ok.columns.contains("running"))
  }

  test("skewed key distributions still rank correctly (ties share a chunk)") {
    import spark.implicits._
    // 200 rows, 90% identical range-key value: every tie lands in one
    // chunk, the tie-break column makes the order total
    val df = (1 to 200).map(i => (i.toLong, if (i <= 180) 5.0 else i.toDouble))
      .toDF("id", "v")
    val got = graft.operators.GlobalRank
      .withRowNumber(df, col("v"), Seq(col("v"), col("id")), chunks = 4)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select(col("id"),
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("descending order ranks correctly (offsets follow the leading direction)") {
    val cust = Tables.t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    val got = graft.operators.GlobalRank
      .withRowNumber(cust, col("c_acctbal"),
        Seq(col("c_acctbal").desc, col("c_custkey").desc), chunks = 8)
      .select("c_custkey", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = cust.select(col("c_custkey"),
        row_number().over(Window.orderBy(col("c_acctbal").desc, col("c_custkey").desc))
          .cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("descending running sum matches the unpartitioned-window cumsum") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 101).toDouble, (i % 7 + 1).toLong))
      .toDF("id", "v", "w")
    val got = graft.operators.GlobalRank
      .withRunningSum(df, col("v"), Seq(col("v").desc, col("id").desc), col("w"), chunks = 4)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("v").desc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("id"), sum(col("w")).over(w).cast("long").as("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q_window_analytics matches the direct window-function evaluation") {
    val cust = Tables.t(spark, sf, "customer")
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val want = cust.select(col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val got = SparkEntry.queries("q_window_analytics")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == want, {
      val bad = got.keys.filter(k => got(k) != want(k)).take(5)
      s"diverging keys: ${bad.map(k => s"$k got=${got(k)} want=${want(k)}").mkString("; ")}"
    })
  }
}
