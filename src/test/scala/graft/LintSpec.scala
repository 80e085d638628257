package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanLint

/** PlanLint: each rule fires on a deliberately-bad plan, stays silent on
  * the good formulation, and the library's own headline queries carry no
  * unacknowledged errors.
  */
class LintSpec extends SparkTestBase {

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] = {
    // other suites cache these tables; InMemoryTableScan would hide the
    // parquet scans the scan-level rules inspect (the PlanAuditSpec rule)
    spark.catalog.clearCache()
    PlanLint.lint(df).map(_.rule).toSet
  }

  test("UNPARTITIONED_WINDOW fires on a global window, not on a keyed one") {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.t(spark, sf, "lineitem")
    val bad = li.withColumn("rn",
      row_number().over(Window.orderBy("l_orderkey", "l_linenumber")))
    assert(rules(bad).contains("UNPARTITIONED_WINDOW"))
    val good = li.withColumn("rn", row_number().over(
      Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
    assert(!rules(good).contains("UNPARTITIONED_WINDOW"))
  }

  test("CARTESIAN fires on a true cross product") {
    val li = Tables.t(spark, sf, "lineitem").select("l_orderkey")
    val o = Tables.t(spark, sf, "orders").select("o_orderkey")
    // disable auto-broadcast so the product cannot degrade to BNLJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(rules(li.crossJoin(o)).contains("CARTESIAN"))
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(!rules(li.join(o, li("l_orderkey") === o("o_orderkey")))
      .contains("CARTESIAN"))
  }

  test("NESTED_LOOP warns on a non-equi join") {
    val li = Tables.t(spark, sf, "lineitem").select("l_quantity")
    val bounds = Tables.t(spark, sf, "region").select(
      (col("r_regionkey") * 10).as("lo"))
    val bad = li.join(bounds, col("l_quantity") >= col("lo"))
    assert(rules(bad).contains("NESTED_LOOP"))
  }

  test("UNPUSHED_FILTER fires when a UDF blocks pushdown, not on pushable predicates") {
    val li = Tables.t(spark, sf, "lineitem")
    val opaque = udf((d: Double) => d > 10.0)
    assert(rules(li.filter(opaque(col("l_quantity"))))
      .contains("UNPUSHED_FILTER"))
    assert(!rules(li.filter(col("l_quantity") > 10.0))
      .contains("UNPUSHED_FILTER"))
  }

  test("BIG_BROADCAST catches a hinted broadcast over the limit") {
    spark.catalog.clearCache()
    val li = Tables.t(spark, sf, "lineitem")
    val o = Tables.t(spark, sf, "orders")
    val joined = li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
    val tight = PlanLint.lint(joined, broadcastLimit = 1L).map(_.rule)
    assert(tight.contains("BIG_BROADCAST"), s"got $tight")
    assert(!PlanLint.lint(joined).map(_.rule).contains("BIG_BROADCAST"),
      "default limit must tolerate a test-scale dimension")
  }

  test("SINGLE_PARTITION warns on repartition(1) of raw rows, not on a global aggregate") {
    val li = Tables.t(spark, sf, "lineitem")
    assert(rules(li.repartition(1)).contains("SINGLE_PARTITION"))
    // global agg funnels through SinglePartition BELOW a partial agg — fine
    assert(!rules(li.agg(sum("l_quantity"))).contains("SINGLE_PARTITION"))
    assert(!rules(li.agg(sum("l_quantity"))).contains("MISSING_PARTIAL_AGG"))
  }

  test("assertClean throws on errors, honors ignore and failOn") {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.t(spark, sf, "lineitem")
    val bad = li.withColumn("rn",
      row_number().over(Window.orderBy("l_orderkey", "l_linenumber")))
    intercept[IllegalStateException](PlanLint.assertClean(bad))
    // acknowledged rule passes
    PlanLint.assertClean(bad,
      ignore = Set("UNPARTITIONED_WINDOW", "SINGLE_PARTITION"))
    // info findings never fail the default gate
    PlanLint.assertClean(li.orderBy("l_orderkey", "l_linenumber"))
  }

  test("headline queries carry no unacknowledged lint errors") {
    // NESTED_LOOP/GLOBAL_SORT/info are deliberate in specific queries
    // (bounded inline tables, ordered oracles); ERRORS must be absent
    // everywhere except the documented quadratic BASELINES, which exist
    // to oracle the bounded production paths.
    val acknowledgedErrors = Set(
      "q_dedup_jaccard",   // all-pairs baseline for the LSH path
      "q_embed_pairs",     // all-pairs cosine baseline for the LSH path
      "q_join_cross"       // CROSS JOIN is the query's semantics
    )
    val offenders = ExplainDump.headline.flatMap { name =>
      spark.catalog.clearCache()
      val errs = PlanLint.lint(SparkEntry.queries(name)(spark, sf))
        .filter(_.severity == "error")
      if (errs.isEmpty) None else Some(name -> errs.map(_.rule).distinct)
    }.toMap
    val unexpected = offenders.view.filterKeys(!acknowledgedErrors(_)).toMap
    assert(unexpected.isEmpty,
      s"new scale-killers crept into headline plans: $unexpected")
  }
}
