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

  test("the REST of the board carries no unacknowledged lint errors either") {
    // Everything registered but not in the headline sweep, EXCEPT queries
    // whose BUILDER runs real jobs (streaming drains, iterative
    // driver-loop trainers/selectors, write-path round-trips) — linting
    // those would execute them; their plans are audited via EXPLAINS.md
    // and their own specs instead.
    val executesOnBuild = Set(
      // streaming drains
      "q_stream_anomaly", "q_stream_session", "q_stream_neardedup",
      "q_stream_heavy", "q_stream_join", "q_stream_sample", "q_stream_cms",
      // driver-loop iterative builders (collect per round by contract)
      "q_coreset", "q_mmr_select", "q_embed_knn_ivf", "q_embed_knn_ivfpq",
      "q_embed_knn_pq", "q_pq_assign", "q_ivf_assign", "q_kmeans_step",
      "q_pagerank", "q_dedup_clusters", "q_dedup_canonical", "q_bpe_pairs",
      "q_bpe_encode", "q_pack_bpe", "q_mixture", "q_mix_upsample",
      "q_mix_temperature", "q_sample_pps", "q_curriculum", "q_freq_items",
      "q_heavy_hitters", "q_dedup_semantic", "q_decontaminate_semantic",
      "q_recursive_cte", "q_hll_merge", "q_embed_standardize",
      // write-path round-trips (produce files on build)
      "q_write_partitioned", "q_write_bucketed", "q_write_zordered",
      "q_multiformat", "q_schema_evolution", "q_compact", "q_dpp",
      "q_incr_agg", "q_upsert", "q_zorder", "q_table_checksum",
      "q_arrow_roundtrip", "q_create_external", "q_dsv2_scan")
    val acknowledged = Set(
      "q_dedup_jaccard", "q_embed_pairs", "q_join_cross",
      // bounded-by-construction non-equi/cross shapes over tiny or
      // pre-filtered sides, each documented at the registration site
      "q_range_join", "q_band_join", "q_asof_join", "q_asof_forward",
      "q_asof_nearest", "q_asof_tolerance", "q_dedup_incr_near",
      "q_phash_neardup", "q_containment", "q_embed_pairs_lsh",
      "q_dup_spans", "q_cut_dup_spans", "q_fuzzy_names", "q_winnow",
      "q_winnow_md5", "q_dedup_minhash", "q_dedup_incr", "q_embed_knn",
      "q_embed_l2", "q_hard_negatives", "q_decontaminate")
    val rest = SparkEntry.queries.keySet -- ExplainDump.headline.toSet --
      executesOnBuild
    val offenders = rest.toSeq.sorted.flatMap { name =>
      spark.catalog.clearCache()
      val errs = PlanLint.lint(SparkEntry.queries(name)(spark, sf))
        .filter(_.severity == "error")
      if (errs.isEmpty) None else Some(name -> errs.map(_.rule).distinct)
    }.toMap
    val unexpected = offenders.view.filterKeys(!acknowledged(_)).toMap
    assert(unexpected.isEmpty,
      s"scale-killers outside the headline sweep: $unexpected")
  }
}
