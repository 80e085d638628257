package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.{t, tFan}
import graft.operators._

/** Warehouse-maintenance / data-quality surface (round 5): CDC upsert,
  * SCD2 history, dictionary fuzzy matching, robust outlier gates,
  * histogram binning. All north-star extensions — the reference's algebra
  * has no DML or analytics beyond scan/filter/project/sort/limit
  * (/root/reference/src/planner/logicalplan.rs:207-273).
  */
object WarehouseQueries {

  import Money.cents

  /** Recursively delete per-invocation temp dirs (the 2b queries' landing
    * parquet + RocksDB checkpoint) once their drains are done — repeated
    * bench/correctness runs must not accumulate corpus-slice copies and
    * state stores in /tmp. Best-effort: a failed delete never fails the
    * query that produced a correct result.
    */
  /** The FROZEN drift reference — src0's n_chars histogram materialized
    * once per corpus version ([[ArtifactCache]]): production drift
    * monitoring freezes the reference distribution as an artifact when a
    * corpus version ships and compares every live batch against it;
    * recomputing the reference per query (the pre-r17 shape) silently
    * couples the gate to whatever the reference slice CURRENTLY contains.
    * 16 rows (bucket, cnt_ref) — the exact integer cells of
    * [[graft.operators.HistQuantile.sketchBy]]; WarehouseOpsSpec pins
    * stored == recomputed.
    */
  private def materializedPsiRefDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    ArtifactCache.dir(s, d, "documents", "psiref", Seq("_SUCCESS")) { dir =>
      HistQuantile.sketchBy(
          t(s, d, "documents").filter(col("source") === "src0"),
          Nil, col("n_chars"), lo = 0L, hi = 1024L, buckets = 16)
        .select(col("hq_bucket").as("bucket"), col("cnt").as("cnt_ref"))
        .write.mode("overwrite").parquet(dir)
    }

  private def rmTemp(dirs: String*): Unit = dirs.foreach { d =>
    try {
      val p = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(p)) {
        val it = java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator()
        while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next()): Unit
      }
    } catch { case _: java.io.IOException => () }
  }

  val all: Seq[Q] = Seq(

    // CDC upsert (MERGE): every 10th order is "updated" (status U, +1.00
    // price); updates replace base rows by key, one anti-join shuffle +
    // union. The oracle recomputes the merge arithmetically, so a
    // dropped, duplicated, or stale row breaks the hash.
    Q("q_upsert",
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             |  CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |    + CASE WHEN o_orderkey % 10 = 0 THEN 100 ELSE 0 END AS BIGINT) AS price_cents
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val base = t(s, d, "orders")
        val updates = base.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        Cdc.upsert(base, updates, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_orderstatus"),
            cents(col("o_totalprice")).as("price_cents"))
          .orderBy("o_orderkey")
      }),

    // SCD type-2 dimension history from the event stream: consecutive
    // equal event types collapse, each change point gets a validity
    // interval, the open interval is current. Two stacked windows over
    // one (user, ts, id) shuffle.
    Q("q_scd2",
      Some("""WITH chg AS (
             |  SELECT user_id, event_id, event_type, ts,
             |    lag(event_type) OVER w AS prev
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |pts AS (SELECT user_id, event_id, event_type, ts FROM chg
             |        WHERE prev IS NULL OR event_type <> prev)
             |SELECT user_id, event_id, event_type, ts AS valid_from,
             |  lead(ts) OVER w2 AS valid_to,
             |  (lead(ts) OVER w2 IS NULL) AS is_current
             |FROM pts WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, valid_from, event_id""".stripMargin),
      (s, d) =>
        Cdc.scd2(t(s, d, "events"), "user_id", "event_type", "ts", "event_id")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("valid_from"), col("valid_to"), col("is_current"))
          .orderBy("user_id", "valid_from", "event_id")),

    // Dictionary fuzzy matching: near-identical part names (edit distance
    // <= 3 within first-token blocks) over DISTINCT values — the
    // entity-resolution shape whose quadratic part is bounded by the
    // vocabulary (~62-64 names across SFs), never the table.
    Q("q_fuzzy_names",
      Some("""WITH dict AS (SELECT DISTINCT p_name AS name FROM part),
             |b AS (SELECT name, split_part(lower(name), ' ', 1) AS blk FROM dict)
             |SELECT a.name AS name_a, c.name AS name_b,
             |  CAST(levenshtein(a.name, c.name) AS INT) AS dist
             |FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
             |WHERE levenshtein(a.name, c.name) <= 3
             |ORDER BY name_a, name_b""".stripMargin),
      (s, d) =>
        FuzzyJoin.dictionaryPairs(t(s, d, "part"), "p_name", maxDist = 3)
          .orderBy("name_a", "name_b")),

    // Robust outlier gate: events whose value deviates from the
    // per-event-type median by > 3 MADs — median/MAD survive the tail
    // they flag, unlike mean/stddev. Exact percentiles (tiny group
    // count), broadcast stats, map-side flagging.
    Q("q_outliers",
      Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             |  FROM events GROUP BY event_type),
             |dev AS (SELECT e.event_id, e.event_type, e.value,
             |    abs(e.value - m.med) AS absdev
             |  FROM events e JOIN med m USING (event_type)),
             |mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
             |  FROM dev GROUP BY event_type)
             |SELECT d.event_id, d.event_type,
             |  CAST(floor(d.absdev * 1e6) AS BIGINT) AS absdev_micros
             |FROM dev d JOIN mad m USING (event_type)
             |WHERE m.mad > 0 AND d.absdev > CAST(3.0 AS DOUBLE) * m.mad
             |ORDER BY event_id""".stripMargin),
      (s, d) =>
        Robust.madOutliers(t(s, d, "events"), "event_type", "value", k = 3.0)
          .select(col("event_id"), col("event_type"),
            floor(col("absdev") * lit(1e6)).as("absdev_micros"))
          .orderBy("event_id")),

    // Small-file compaction: a deliberately fragmented write (50-row
    // files) rewritten to target-size files from the LISTING only (no
    // data read for sizing), one round-robin shuffle. The oracle sees the
    // original table — compaction must be lossless. FS-level file-count
    // reduction is asserted in WarehouseOpsSpec.
    Q("q_compact",
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => {
        val base = ScratchDirs.forRun(s, "compact")
        tFan(s, d, "documents").write.mode("overwrite")
          .option("maxRecordsPerFile", 50).parquet(base + "/frag")
        Compact.rewrite(s, base + "/frag", base + "/compacted",
            targetFileBytes = 8L * 1024 * 1024)
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      }),

    // CLUSTERED compaction (Compact.rewriteSorted): same listing-sized
    // rewrite, but range-partitioned + sorted by doc_id so each output
    // file covers a tight disjoint id range — min/max row-group pruning
    // on the sort key for free (per-file disjointness spec-asserted in
    // WarehouseOpsSpec; the oracle sees the original table: clustering
    // must be lossless).
    Q("q_compact_sorted",
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n,
             |  CAST(min(doc_id) AS BIGINT) AS min_id,
             |  CAST(max(doc_id) AS BIGINT) AS max_id,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => {
        val base = ScratchDirs.forRun(s, "compact_sorted")
        tFan(s, d, "documents").write.mode("overwrite")
          .option("maxRecordsPerFile", 50).parquet(base + "/frag")
        Compact.rewriteSorted(s, base + "/frag", base + "/sorted",
            targetFileBytes = 8L * 1024 * 1024, sortCols = Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
            max("doc_id").as("max_id"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      }),

    // Dynamic partition pruning: orders written partitionBy(priority),
    // joined to a filtered priority dimension — Spark prunes the
    // partition DIRECTORIES at runtime from the broadcast join's build
    // side (plan-asserted in WarehouseOpsSpec: the scan carries a
    // dynamicpruning subquery). At 100 TB this is the difference between
    // scanning 2 partitions and scanning them all.
    Q("q_dpp",
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val base = ScratchDirs.forRun(s, "dpp")
        t(s, d, "orders").write.mode("overwrite")
          .partitionBy("o_orderpriority").parquet(base)
        val dim = t(s, d, "orders").select(col("o_orderpriority").as("pri"))
          .distinct()
          .filter(col("pri").isin("1-URGENT", "2-HIGH"))
        s.read.parquet(base)
          .join(dim, col("o_orderpriority") === col("pri"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("total_cents"))
          .orderBy("o_orderpriority")
      }),

    // Incremental aggregation: a stored partial-aggregate snapshot merged
    // with a new increment by re-aggregation (sums of counts/sums) — the
    // incremental-ETL contract: merging partials must equal the full
    // recompute (the oracle), so yesterday's 100 TB is never rescanned.
    Q("q_incr_agg",
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val li = t(s, d, "lineitem")
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"),
              sum(cents(col("l_extendedprice"))).as("price_cents"))
        val snapshot = partial(li.filter(col("l_orderkey") % 7 =!= 0))
        val increment = partial(li.filter(col("l_orderkey") % 7 === 0))
        snapshot.unionByName(increment)
          .groupBy("l_returnflag")
          .agg(sum(col("n")).cast("long").as("n"),
            sum(col("price_cents")).cast("long").as("price_cents"))
          .orderBy("l_returnflag")
      }),

    // Point-in-time (temporal) lookup against the SCD2 history: "what was
    // this user's state 7 minutes after each event" — resolved by the
    // sorted as-of merge (union-tag + one keyed window), NEVER an
    // interval nested-loop join; the oracle is DuckDB's native ASOF JOIN
    // over the same recomputed history. Deterministic because (user_id,
    // ts) is unique in this data (checked; scd2 tie-breaks by event_id).
    Q("q_scd2_lookup",
      Some("""WITH chg AS (
             |  SELECT user_id, event_id, event_type, ts,
             |    lag(event_type) OVER w AS prev, row_number() OVER w AS rn
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |hist AS (SELECT user_id, event_type AS state, ts AS valid_from
             |         FROM chg WHERE rn = 1 OR event_type <> prev),
             |probes AS (SELECT event_id, user_id, ts + INTERVAL 7 MINUTE AS pts
             |           FROM events)
             |SELECT p.event_id, h.state FROM probes p
             |ASOF JOIN hist h ON p.user_id = h.user_id AND p.pts >= h.valid_from
             |ORDER BY p.event_id""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events")
        val hist = Cdc.scd2(ev, "user_id", "event_type", "ts", "event_id")
          .select(col("user_id"), col("valid_from"),
            col("event_type").as("state"))
        val probes = ev.select(col("event_id"), col("user_id"),
          (col("ts") + expr("INTERVAL 7 MINUTES")).as("pts"))
        AsOfJoin.backward(probes, hist, "user_id", "pts", "valid_from",
            Seq("state"))
          .select("event_id", "state")
          .orderBy("event_id")
      }),

    // Conversion funnel: first view -> first subsequent click -> converted
    // within 30 minutes. Pure grouped-min aggregates joined once — no
    // window, no per-user iteration; the classic product-analytics query.
    Q("q_funnel",
      Some("""WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS first_click
             |  FROM events e JOIN v USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > v.first_view
             |  GROUP BY e.user_id)
             |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewers,
             |  CAST(count(*) AS BIGINT) AS n_clicked_after,
             |  CAST(sum(CASE WHEN c.first_click <= v2.first_view + INTERVAL 30 MINUTE
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_30m
             |FROM c JOIN v v2 USING (user_id)""".stripMargin),
      (s, d) => {
        // ONE scan + ONE user-keyed shuffle: both firsts come from two
        // stacked windows over the same partitioning (first_click_after
        // reads first_view, so they can't be one window), then a per-user
        // collapse and a global conditional aggregate — the naive
        // aggregate-join form re-reads the events scan 3-4 times
        val wu = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        val ev = t(s, d, "events")
          .withColumn("first_view",
            min(when(col("event_type") === "view", col("ts"))).over(wu))
          .withColumn("first_click",
            min(when(col("event_type") === "click" &&
                col("ts") > col("first_view"), col("ts"))).over(wu))
        ev.groupBy("user_id")
          .agg(first("first_view").as("fv"), first("first_click").as("fc"))
          .agg(count(col("fv")).as("n_viewers"),
            count(when(col("fv").isNotNull, col("fc"))).as("n_clicked_after"),
            sum(when(col("fv").isNotNull &&
                col("fc") <= col("fv") + expr("INTERVAL 30 MINUTES"), 1L)
              .otherwise(0L)).as("n_converted_30m"))
          .select("n_viewers", "n_clicked_after", "n_converted_30m")
      }),

    // Retention cohorts: users grouped by first-active week, activity
    // counted per week offset — the cohort matrix. Week buckets are
    // epoch-microsecond integer division (engine-portable; no reliance on
    // locale week-start). Two grouped aggregates + one distinct count.
    Q("q_retention",
      Some("""WITH wk AS (SELECT user_id,
             |    epoch_us(ts) // 604800000000 AS w FROM events),
             |cohort AS (SELECT user_id, min(w) AS c FROM wk GROUP BY user_id)
             |SELECT CAST(c AS BIGINT) AS cohort_week,
             |  CAST(w - c AS BIGINT) AS week_offset,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
             |FROM wk JOIN cohort USING (user_id)
             |GROUP BY c, w - c ORDER BY cohort_week, week_offset""".stripMargin),
      (s, d) => {
        val wk = t(s, d, "events")
          .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("w"))
        val cohort = wk.groupBy("user_id").agg(min("w").as("cohort_week"))
        wk.join(cohort, "user_id")
          .withColumn("week_offset", col("w") - col("cohort_week"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct("user_id").as("active_users"))
          .orderBy("cohort_week", "week_offset")
      }),

    // Fixed-width histogram: quantity binned into 10 buckets of 5 with
    // explicit floor arithmetic (identical in any engine; no reliance on
    // a width_bucket builtin). Pure partial-aggregable scan.
    Q("q_histogram",
      Some("""SELECT CAST(floor((l_quantity - CAST(1.0 AS DOUBLE)) / CAST(5.0 AS DOUBLE)) AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents
             |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(floor((col("l_quantity") - lit(1.0)) / lit(5.0)).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice"))).as("price_cents"))
          .orderBy("bucket")),

    // One-scan column profiler (Profile.profile): every per-column
    // measure — nulls, exact distinct, native-typed min/max, rendered
    // length mass — from a single partial-aggregable global aggregate,
    // exploded into long format. The oracle recomputes each column's
    // row independently.
    Q("q_profile",
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str,
             |  CAST(coalesce(sum(length(CAST($c AS VARCHAR))), 0) AS BIGINT) AS len_sum
             |FROM documents""".stripMargin
        Seq("doc_id", "lang", "n_chars", "source").map(one)
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
      },
      (s, d) =>
        Profile.profile(t(s, d, "documents"),
            Seq("doc_id", "lang", "n_chars", "source"))
          .orderBy("col_name")),

    // Per-group profile (Profile.profileBy): the per-shard report card —
    // same one-scan measures, one buffer per (group, executor), output
    // one row per (group, column).
    Q("q_profile_by",
      Some {
        def one(c: String) =
          s"""SELECT source, '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str,
             |  CAST(coalesce(sum(length(CAST($c AS VARCHAR))), 0) AS BIGINT) AS len_sum
             |FROM documents GROUP BY source""".stripMargin
        Seq("doc_id", "lang", "n_chars").map(one)
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY source, col_name")
      },
      (s, d) =>
        Profile.profileBy(t(s, d, "documents"), Seq("source"),
            Seq("doc_id", "lang", "n_chars"))
          .orderBy("source", "col_name")),

    // Snapshot diff (TableDiff.diff): what changed between two table
    // versions, answered from two per-group checksum summaries and a
    // tiny full-outer join — output proportional to the CHANGE. The
    // "after" snapshot flips URGENT statuses (changed), drops 5-LOW
    // (removed), and clones 3-MEDIUM under a new priority (added); the
    // oracle rebuilds both group summaries arithmetically.
    Q("q_table_diff",
      Some("""WITH aft AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             |    o_orderpriority
             |  FROM orders WHERE o_orderpriority <> '5-LOW'
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, '9-NEW' FROM orders
             |  WHERE o_orderpriority = '3-MEDIUM'),
             |bse AS (
             |  SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders),
             |bd AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  sum(CAST(('0x' || substr(md5(
             |    coalesce(CAST(length(CAST(o_orderkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR), '-') ||
             |    coalesce(CAST(length(o_orderstatus) AS VARCHAR) || ':' || o_orderstatus, '-')
             |  ), 1, 14)) AS BIGINT)) % 4611686018427387904 AS ck
             |  FROM bse GROUP BY o_orderpriority),
             |ad AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  sum(CAST(('0x' || substr(md5(
             |    coalesce(CAST(length(CAST(o_orderkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR), '-') ||
             |    coalesce(CAST(length(o_orderstatus) AS VARCHAR) || ':' || o_orderstatus, '-')
             |  ), 1, 14)) AS BIGINT)) % 4611686018427387904 AS ck
             |  FROM aft GROUP BY o_orderpriority)
             |SELECT coalesce(bd.o_orderpriority, ad.o_orderpriority) AS o_orderpriority,
             |  CASE WHEN bd.ck IS NULL THEN 'added'
             |       WHEN ad.ck IS NULL THEN 'removed' ELSE 'changed' END AS status,
             |  CAST(coalesce(bd.n, 0) AS BIGINT) AS rows_before,
             |  CAST(coalesce(ad.n, 0) AS BIGINT) AS rows_after
             |FROM bd FULL OUTER JOIN ad ON bd.o_orderpriority = ad.o_orderpriority
             |WHERE NOT (bd.ck IS NOT DISTINCT FROM ad.ck)
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val base = t(s, d, "orders")
        val after = base.filter(col("o_orderpriority") =!= "5-LOW")
          .withColumn("o_orderstatus",
            when(col("o_orderpriority") === "1-URGENT", lit("U"))
              .otherwise(col("o_orderstatus")))
          .unionByName(base.filter(col("o_orderpriority") === "3-MEDIUM")
            .withColumn("o_orderpriority", lit("9-NEW")))
        TableDiff.diff(base, after, Seq("o_orderpriority"),
            Seq(col("o_orderkey").cast("string"), col("o_orderstatus")))
          .orderBy("o_orderpriority")
      }),

    // Per-key OLS trend (Trend.olsPerGroup): slope/intercept of value
    // over time per event type from five exact integer sums — one
    // partial-aggregable pass, no window. Inputs quantized (epoch
    // seconds, floored cents), sums exact decimals, closed form in
    // doubles — the same IEEE expression both engines (oracle mirrors
    // it op-for-op), compared on floored nano/milli scalings.
    Q("q_ols_trend",
      Some("""WITH d AS (SELECT event_type,
             |    CAST(epoch_ns(ts) // 1000000000 AS HUGEINT) AS x,
             |    CAST(floor(value * 100.0) AS HUGEINT) AS y
             |  FROM events),
             |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
             |  FROM d GROUP BY event_type),
             |f AS (SELECT event_type, n,
             |    CASE WHEN n < 2 OR CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0 THEN NULL
             |      ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope,
             |    CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy
             |  FROM s)
             |SELECT event_type, n,
             |  CAST(floor(slope * 1000000000.0) AS BIGINT) AS slope_nano,
             |  CAST(floor((dsy - slope * dsx) / CAST(n AS DOUBLE) * 1000.0) AS BIGINT) AS intercept_milli
             |FROM f ORDER BY event_type""".stripMargin),
      (s, d) =>
        Trend.olsPerGroup(t(s, d, "events"), Seq("event_type"),
            expr("unix_micros(ts) div 1000000"), floor(col("value") * lit(100.0)))
          .select(col("event_type"), col("n"),
            floor(col("slope") * lit(1e9)).cast("long").as("slope_nano"),
            floor(col("intercept") * lit(1000.0)).cast("long").as("intercept_milli"))
          .orderBy("event_type")),

    // Rolling z-score anomaly detection (Robust.rollingZScore): each
    // event scored against its type's previous-100 frame — one keyed
    // shuffle, O(1)-state sliding sums. Exact integer cents in the
    // frame, IEEE z mirrored op-for-op, so even the z-scores oracle;
    // null-guarded (std=0 -> null, never inf) on both sides.
    Q("q_events_anomaly",
      Some("""WITH d AS (SELECT event_id, event_type, ts,
             |    CAST(floor(value * 100.0) AS BIGINT) AS v FROM events),
             |w AS (SELECT event_id, event_type, v,
             |    count(v) OVER fr AS n, sum(v) OVER fr AS s, sum(v * v) OVER fr AS ss
             |  FROM d WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
             |    ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)),
             |z AS (SELECT event_id, event_type, n,
             |    sqrt(greatest(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
             |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS sd,
             |    CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS dev
             |  FROM w WHERE n = 100)
             |SELECT event_id, event_type,
             |  CAST(floor(dev / sd * 1000.0) AS BIGINT) AS z_milli
             |FROM z WHERE sd > 0.0 AND abs(dev / sd) > 3.0
             |ORDER BY event_id, event_type, z_milli""".stripMargin),
      (s, d) =>
        Robust.rollingZScore(t(s, d, "events"), "event_type", "ts", "event_id",
            floor(col("value") * lit(100.0)), k = 100)
          .filter(col("n_prev") === 100 && abs(col("z")) > 3.0)
          .select(col("event_id"), col("event_type"),
            floor(col("z") * lit(1000.0)).cast("long").as("z_milli"))
          .orderBy("event_id", "event_type", "z_milli")),

    // The CHUNKED twin of the rolling monitor, on the scoreboard: the
    // sf1 soak showed per-key windows are parallelism-bounded by key
    // cardinality (5 event types = 5 reducers regardless of cluster
    // size). rollingZScoreChunked cuts each key's timeline into 10-day
    // chunks — keys x chunks window partitions — and replicates the last
    // k rows across each cut so the frames (and therefore every z bit)
    // are IDENTICAL to the global window's. The oracle knows nothing of
    // chunking: it is the plain global-window SQL, which is the point.
    // k=10 so every (type, chunk) holds >= k rows at all SFs (validated
    // eagerly by the operator; sf0.001 min is 16).
    Q("q_events_anomaly_chunked",
      Some("""WITH d AS (SELECT event_id, event_type, ts,
             |    CAST(floor(value * 100.0) AS BIGINT) AS v FROM events),
             |w AS (SELECT event_id, event_type, v,
             |    count(v) OVER fr AS n, sum(v) OVER fr AS s, sum(v * v) OVER fr AS ss
             |  FROM d WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
             |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
             |z AS (SELECT event_id, event_type, n,
             |    sqrt(greatest(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
             |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS sd,
             |    CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS dev
             |  FROM w WHERE n = 10)
             |SELECT event_id, event_type,
             |  CAST(floor(dev / sd * 1000.0) AS BIGINT) AS z_milli
             |FROM z WHERE sd > 0.0 AND abs(dev / sd) > 3.0
             |ORDER BY event_id, event_type, z_milli""".stripMargin),
      (s, d) =>
        Robust.rollingZScoreChunked(t(s, d, "events"), "event_type", "ts", "event_id",
            floor(col("value") * lit(100.0)), k = 10,
            chunkCol = floor(unix_micros(col("ts")) / lit(864000000000L)))
          .filter(col("n_prev") === 10 && abs(col("z")) > 3.0)
          .select(col("event_id"), col("event_type"),
            floor(col("z") * lit(1000.0)).cast("long").as("z_milli"))
          .orderBy("event_id", "event_type", "z_milli")),

    // The STREAMING twin of q_events_anomaly, on the correctness
    // scoreboard: the same events flow through a real Structured Streaming
    // query — file source -> transformWithState rolling z-ring
    // (StreamingAnomaly.score, RocksDB state) -> in-stream anomaly filter
    // -> memory sink — drained with Trigger.AvailableNow. Scores are
    // bit-identical to the batch operator (exact-long frame sums, same
    // IEEE ops; parity pinned by StreamingAnomalySpec), so the DuckDB
    // oracle is the SAME SQL as the batch query. Only confirmed anomalies
    // reach the sink, so driver-side memory stays bounded by the alert
    // rate, not the stream size.
    Q("q_stream_anomaly",
      Some("""WITH d AS (SELECT event_id, event_type, ts,
             |    CAST(floor(value * 100.0) AS BIGINT) AS v FROM events),
             |w AS (SELECT event_id, event_type, v,
             |    count(v) OVER fr AS n, sum(v) OVER fr AS s, sum(v * v) OVER fr AS ss
             |  FROM d WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
             |    ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)),
             |z AS (SELECT event_id, event_type, n,
             |    sqrt(greatest(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
             |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS sd,
             |    CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS dev
             |  FROM w WHERE n = 100)
             |SELECT event_id, event_type,
             |  CAST(floor(dev / sd * 1000.0) AS BIGINT) AS z_milli
             |FROM z WHERE sd > 0.0 AND abs(dev / sd) > 3.0
             |ORDER BY event_id, event_type, z_milli""".stripMargin),
      (s, d) => {
        val sink = "q_stream_anomaly_sink"
        // RocksDB provider + explicit state-partition sizing for the
        // duration of the drain (see StateScope — state partitioning is a
        // state-volume decision, not a CPU-count one).
        graft.streaming.StateScope.withStateConf(s) {
          val scored = graft.streaming.StreamingAnomaly.score(
            graft.Tables.eventsStream(s, d), "event_type", "ts", "event_id",
            floor(col("value") * lit(100.0)), k = 100)
          val alerts = scored
            .filter(col("n_prev") === 100 && abs(col("z")) > 3.0)
            .select(col("tie").as("event_id"), col("key").as("event_type"),
              floor(col("z") * lit(1000.0)).cast("long").as("z_milli"))
          // single-batch contract matters MOST here: RollingZProcessor
          // orders rows (ts, tie) only WITHIN a batch, so a multi-batch
          // drain would score in per-key arrival order and silently
          // diverge from the oracle
          graft.streaming.StateScope.drainSingleBatch(alerts, sink)
        }
        s.table(sink).orderBy("event_id", "event_type", "z_milli")
      }),

    // The STREAMING twin of q_events_session, on the correctness
    // scoreboard: events flow through a real Structured Streaming query —
    // file source -> transformWithState gap sessionizer
    // (GapSessionProcessor, RocksDB state, event-time timers) -> memory
    // sink — drained with Trigger.AvailableNow, then the trailing OPEN
    // sessions are recovered from the checkpoint via the state data
    // source (closed log + open-session snapshot, the production
    // "sessions so far" shape). Session bounds are exact epoch-micros, so
    // the DuckDB oracle is the SAME SQL as the batch query. session_id is
    // assigned per user by session start order, matching the oracle's
    // cumulative new-session numbering.
    Q("q_stream_session",
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                      ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM g)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  min(ts) AS session_start, max(ts) AS session_end
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
      (s, d) => {
        // Fresh checkpoint per invocation: reusing one would resume from
        // committed offsets and drain zero rows on a re-run (bench runs
        // every query twice).
        val ckpt = java.nio.file.Files
          .createTempDirectory("q-stream-session-ckpt").toString
        graft.streaming.StateScope.withStateConf(s) {
          val log = graft.streaming.StreamingSessions.drainSessionLog(
            graft.Tables.eventsStream(s, d), "ts", "user_id",
            gapMs = 30L * 60L * 1000L, sinkName = "q_stream_session_sink",
            ckptDir = ckpt)
          log.select(col("user_id"),
              row_number().over(org.apache.spark.sql.expressions.Window
                .partitionBy("user_id").orderBy("start_us"))
                .cast("long").as("session_id"),
              col("n_events"),
              timestamp_micros(col("start_us")).as("session_start"),
              timestamp_micros(col("last_us")).as("session_end"))
            .orderBy("user_id", "session_id")
        }
      }),

    // The STREAMING twin of q_dedup_minhash, on the correctness
    // scoreboard: documents flow through a real Structured Streaming
    // query — file source -> minhash banding (the SAME expressions as
    // the batch path) -> transformWithState band-bucket membership
    // (StreamingNearDedup.candidatePairs, RocksDB state: 8 bytes per doc
    // per band) -> memory sink — drained with Trigger.AvailableNow, then
    // candidates are exact-verified OUTSIDE the state store against the
    // static doc store (stream-static join shape) with the batch
    // bounded_jaccard expression. Over a drained stream the pair set
    // equals the batch LSH result (parity pinned by
    // StreamingNearDedupSpec), so the oracle is the same exact all-pairs
    // SQL as q_dedup_minhash. Single-batch drain asserted: per-bucket
    // doc_id ordering (hence new>old orientation) holds within a batch.
    Q("q_stream_neardedup",
      Some(s"""WITH ${PipelineQueries.duckPairCtes("0.7")}
              |SELECT id_a, id_b, jac FROM p ORDER BY id_a, id_b""".stripMargin),
      (s, d) => {
        val sink = "q_stream_neardedup_sink"
        graft.streaming.StateScope.withStateConf(s) {
          val cands = graft.streaming.StreamingNearDedup.candidatePairs(
            graft.Tables.tableStream(s, d, "documents"), "doc_id", "text")
          graft.streaming.StateScope.drainSingleBatch(cands, sink)
        }
        graft.streaming.StreamingNearDedup.verified(
            s.table(sink).dropDuplicates("new_id", "old_id"),
            graft.Tables.t(s, d, "documents"), "doc_id", "text", threshold = 0.7)
          .select(col("old_id").as("id_a"), col("new_id").as("id_b"), col("jac"))
          .orderBy("id_a", "id_b")
      }),

    // Streaming heavy hitters by SpaceSaving (Metwally '05), on the
    // scoreboard: events flow file source -> transformWithState
    // SpaceSaving table (≤ m counters per user in RocksDB — bounded
    // memory FOREVER, independent of stream length) -> memory sink,
    // drained AvailableNow. With m = 16 above this data's ≤ 5 distinct
    // event types per user nothing evicts, so est is the EXACT count and
    // err = 0 at any arrival order — the oracle is a plain GROUP BY.
    // Eviction-pressure behavior (the production regime at unbounded
    // item cardinality) is pinned by StreamingHeavyHittersSpec via the
    // Metwally invariants instead.
    Q("q_stream_heavy",
      Some("""SELECT user_id, event_type,
             |  CAST(count(*) AS BIGINT) AS est, CAST(0 AS BIGINT) AS err
             |FROM events GROUP BY user_id, event_type
             |HAVING count(*) >= 20
             |ORDER BY user_id, event_type""".stripMargin),
      (s, d) => {
        val sink = "q_stream_heavy_sink"
        graft.streaming.StateScope.withStateConf(s) {
          val tracked = graft.streaming.StreamingHeavyHitters.track(
            graft.Tables.eventsStream(s, d), "user_id", "event_type",
            m = 16, minGuaranteed = 20L)
          graft.streaming.StateScope.drainSingleBatch(tracked, sink)
        }
        s.table(sink)
          .select(col("key").cast("long").as("user_id"),
            col("item").as("event_type"), col("est"), col("err"))
          .orderBy("user_id", "event_type")
      }),

    // Streaming count-min sketch: the sketch TABLE as stream state —
    // every token explodes to its depth md5 cells, each cell's counter
    // lives in RocksDB keyed by cell (depth×width keys, one long each).
    // CMS linearity makes the maintained table exactly the batch sketch
    // of everything seen, at ANY batching/arrival order; the drained
    // table oracles against the whole-corpus derivation (single-batch
    // assert only so the memory sink holds one emission generation).
    Q("q_stream_cms",
      Some("""WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
             |rows_ AS (SELECT unnest(range(4)) AS j),
             |cells AS (SELECT j,
             |    CAST('0x' || substr(md5(j || '|' || token), 1, 8) AS BIGINT) % 256 AS b,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM toks CROSS JOIN rows_ GROUP BY j, b)
             |SELECT CAST(j AS INT) AS cms_row, b AS cms_bucket, cnt
             |FROM cells ORDER BY cms_row, cms_bucket""".stripMargin),
      (s, d) => {
        val sink = "q_stream_cms_sink"
        graft.streaming.StateScope.withStateConf(s) {
          val toks = graft.Tables.tableStream(s, d, "documents")
            .select(explode(split(lower(col("text")), " ")).as("token"))
          graft.streaming.StateScope.drainSingleBatch(
            graft.streaming.StreamingCms.track(toks, "token",
              depth = 4, width = 256), sink)
        }
        s.table(sink).orderBy("cms_row", "cms_bucket")
      }),

    // Streaming priority sampling (the monitor form of
    // q_sample_priority_grouped): per source, the k+1 highest
    // ⌊w·2³²/md5-u⌋ priorities live in RocksDB; priorities are pure
    // functions of (id, w), so the maintained top-k SET is
    // arrival-order-independent and a full drain equals the batch
    // sampler's draw, estimator included — the oracle IS the batch SQL.
    // Single-batch drain asserted only so the memory sink holds one
    // emission generation (the sample itself is batching-proof,
    // StreamingSampleSpec pins the multi-batch case).
    Q("q_stream_sample",
      Some("""WITH w AS (SELECT source, doc_id, CAST(length(text) AS BIGINT) AS w,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1 AS u
             |  FROM documents),
             |p AS (SELECT source, doc_id, w, (w * 4294967296) // u AS priority FROM w
             |  WHERE w >= 1 AND w <= 2147483647),
             |r AS (SELECT *, row_number() OVER (PARTITION BY source
             |    ORDER BY priority DESC, doc_id) AS rk FROM p),
             |b AS (SELECT * FROM r WHERE rk <= 9),
             |tau AS (SELECT source, coalesce(min(CASE WHEN rk = 9 THEN priority END),
             |    CAST(0 AS BIGINT)) AS tau FROM b GROUP BY source)
             |SELECT b.source, b.doc_id, b.w, b.priority,
             |  greatest(b.w * 4294967296, tau.tau) AS est_w_scaled
             |FROM b JOIN tau USING (source) WHERE rk <= 8
             |ORDER BY source, priority DESC, doc_id""".stripMargin),
      (s, d) => {
        val sink = "q_stream_sample_sink"
        graft.streaming.StateScope.withStateConf(s) {
          val prioritized = Mixture.prioritized(
            graft.Tables.tableStream(s, d, "documents"), "doc_id",
            length(col("text")))
          val tracked = graft.streaming.StreamingSample.track(
            prioritized, "source", "doc_id", k = 8)
          graft.streaming.StateScope.drainSingleBatch(tracked, sink)
        }
        s.table(sink)
          .select(col("key").as("source"), col("id").as("doc_id"),
            col("w"), col("priority"), col("est_w_scaled"))
          .orderBy(col("source"), col("priority").desc, col("doc_id"))
      }),

    // Streaming exact-dedup monitor (the streaming twin of q_dedup_exact,
    // and the monitor form of the ingest question q_dedup_incr answers in
    // batch): the dedup TABLE as stream state — one (keep_id, n_copies)
    // entry per distinct sha2-256 content digest in RocksDB. min and sum
    // are both associative+commutative, so the maintained table equals
    // the batch dedup of everything seen at ANY batching/arrival order
    // (CMS-style linearity, two-slice case pinned by StreamingDedupSpec);
    // the single-batch assert below only keeps the memory sink to one
    // emission generation. Documents never shuffle — per-partition
    // (digest, min id, count) pre-reduction, then digest-keyed state.
    Q("q_stream_dedup",
      Some("""SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
             |  CAST(count(*) AS BIGINT) AS n_copies
             |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin),
      (s, d) => {
        val sink = "q_stream_dedup_sink"
        graft.streaming.StateScope.withStateConf(s) {
          graft.streaming.StateScope.drainSingleBatch(
            graft.streaming.StreamingDedup.track(
              graft.Tables.tableStream(s, d, "documents"), "doc_id", "text"),
            sink)
        }
        s.table(sink).select(col("keep_id"), col("n_copies"))
          .orderBy("keep_id")
      }),

    // The CROSS-BATCH arrival-order contract of the streaming ingest
    // gate, made DuckDB-verifiable (every other scoreboard drain asserts
    // single-batch; the multi-batch semantics were pinned only in unit
    // specs before this): two deterministic landing slices — even doc_ids
    // land first, odd doc_ids arrive as a second file picked up by a
    // checkpoint-resumed generation — flow through StreamingDedup's
    // first-wins keepFirst gate. The keeper for a digest is therefore
    // min(even ids) when the content appeared in slice 1, else
    // min(odd ids): a closed-form oracle over arrival order itself.
    // State (RocksDB, 8 partitions) persists across the two generations
    // via the checkpoint; the memory sink can't resume one, so emissions
    // collect through foreachBatch (driver-bounded: one row per distinct
    // digest, the same bound as the memory-sink drains).
    Q("q_stream_dedup_2b",
      Some("""WITH d AS (SELECT doc_id, sha256(text) AS digest,
             |    doc_id % 2 AS par FROM documents),
             |k AS (SELECT digest,
             |    min(CASE WHEN par = 0 THEN doc_id END) AS k0,
             |    min(CASE WHEN par = 1 THEN doc_id END) AS k1
             |  FROM d GROUP BY digest)
             |SELECT digest, CAST(coalesce(k0, k1) AS BIGINT) AS keep_id
             |FROM k ORDER BY keep_id""".stripMargin),
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val land = java.nio.file.Files
          .createTempDirectory("q2b-landing").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("q2b-ckpt").toString
        // slice 1 lands before the stream starts
        docs.filter(col("doc_id") % 2 === 0).coalesce(1)
          .write.mode("overwrite").parquet(land)
        val schema = s.read.parquet(land).schema
        // Null-tolerant accumulator: a NULL-text document's digest is
        // restored to NULL on emission (StreamingDedup's sentinel), and
        // ConcurrentHashMap forbids null keys — so a plain HashMap with
        // explicit synchronization (foreachBatch runs on the stream's
        // microbatch thread, not this one).
        val acc = scala.collection.mutable.HashMap[String, Long]()
        def drainGeneration(): Unit =
          graft.streaming.StateScope.withStateConf(s) {
            val stream = s.readStream.schema(schema).parquet(land)
            graft.streaming.StateScope.drainSingleBatchInto(
              graft.streaming.StreamingDedup.keepFirst(
                stream, "doc_id", "text"), ckpt) { b =>
              val emitted = b.collect()
              acc.synchronized {
                emitted.foreach(r => acc.put(r.getString(0), r.getLong(1)))
              }
            }
          }
        drainGeneration() // generation 1: the even-id slice
        // slice 2 lands; the resumed generation sees ONLY the new file
        docs.filter(col("doc_id") % 2 === 1).coalesce(1)
          .write.mode("append").parquet(land)
        drainGeneration() // generation 2: first-wins vs checkpointed state
        // both generations drained and collected — the landing slices and
        // checkpointed state have served their purpose
        rmTemp(land, ckpt)
        acc.synchronized(acc.toSeq)
          .toDF("digest", "keep_id").orderBy("keep_id")
      }),

    // The CROSS-BATCH linearity contract of the streaming CMS, made
    // DuckDB-verifiable (q_stream_cms asserts a single batch; the
    // multi-generation accumulation was pinned only in unit specs): even
    // doc_ids land first, odd doc_ids arrive as a second file picked up
    // by a checkpoint-resumed generation. CMS linearity means a cell's
    // LAST emission carries the count of everything seen across both
    // generations — cells touched only by the even slice keep their
    // gen-1 emission (the odd slice adds nothing to them), cells touched
    // in gen 2 emit even+odd totals from the resumed RocksDB state — so
    // last-write-wins over the two drains equals the whole-corpus batch
    // sketch, cell for cell. A state store that failed to persist or
    // accumulate across the resume would leave doubly-touched cells at
    // their odd-slice-only counts and break the hash.
    Q("q_stream_cms_2b",
      Some("""WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
             |rows_ AS (SELECT unnest(range(4)) AS j),
             |cells AS (SELECT j,
             |    CAST('0x' || substr(md5(j || '|' || token), 1, 8) AS BIGINT) % 256 AS b,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM toks CROSS JOIN rows_ GROUP BY j, b)
             |SELECT CAST(j AS INT) AS cms_row, b AS cms_bucket, cnt
             |FROM cells ORDER BY cms_row, cms_bucket""".stripMargin),
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val land = java.nio.file.Files
          .createTempDirectory("qcms2b-landing").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("qcms2b-ckpt").toString
        docs.filter(col("doc_id") % 2 === 0).coalesce(1)
          .write.mode("overwrite").parquet(land)
        val schema = s.read.parquet(land).schema
        // (row, bucket) -> latest emitted count; foreachBatch runs on the
        // stream's microbatch thread, so guard the map explicitly.
        val acc = scala.collection.mutable.HashMap[(Int, Long), Long]()
        def drainGeneration(): Unit =
          graft.streaming.StateScope.withStateConf(s) {
            val toks = s.readStream.schema(schema).parquet(land)
              .select(explode(split(lower(col("text")), " ")).as("token"))
            graft.streaming.StateScope.drainSingleBatchInto(
              graft.streaming.StreamingCms.track(toks, "token",
                depth = 4, width = 256), ckpt) { b =>
              val emitted = b.collect()
              acc.synchronized {
                emitted.foreach(r =>
                  acc.put((r.getInt(0), r.getLong(1)), r.getLong(2)))
              }
            }
          }
        drainGeneration() // generation 1: the even-id slice
        docs.filter(col("doc_id") % 2 === 1).coalesce(1)
          .write.mode("append").parquet(land)
        drainGeneration() // generation 2: accumulation vs resumed state
        rmTemp(land, ckpt)
        acc.synchronized(acc.toSeq)
          .map { case ((r, bkt), n) => (r, bkt, n) }
          .toDF("cms_row", "cms_bucket", "cnt")
          .orderBy("cms_row", "cms_bucket")
      }),

    // The streaming INGEST PIPELINE composed end-to-end in one streaming
    // Catalyst plan (the streaming twin of the flagship
    // q_curation_pipeline's first two stages): per-row Gopher quality
    // gates ride the micro-batch scan (pure expressions, the SAME ones
    // as q_gopher_rules — no shuffle), survivors flow into the
    // StreamingDedup.keepFirst ingest gate (digest-keyed RocksDB state),
    // and the emitted keep_ids are exactly the documents a production
    // ingest forwards downstream. Single-batch drain = the batch
    // quality-filter + exact-dedup keeper set, so the oracle is plain
    // SQL; across batches the gate's first-wins contract applies
    // (StreamingDedupSpec).
    Q("q_stream_curation", {
      val gate = graft.operators.TextAnalysis.gopherGateSql("text")
        .map(_._2).mkString("\n  AND ")
      Some(s"""WITH ok AS (
              |  SELECT doc_id, text FROM documents
              |  WHERE $gate)
              |SELECT CAST(min(doc_id) AS BIGINT) AS keep_id
              |FROM ok GROUP BY sha256(text) ORDER BY keep_id""".stripMargin)
    },
      (s, d) => {
        val sink = "q_stream_curation_sink"
        graft.streaming.StateScope.withStateConf(s) {
          val ok = graft.Tables.tableStream(s, d, "documents")
            .filter(graft.operators.TextAnalysis.gopherGate(col("text")))
          graft.streaming.StateScope.drainSingleBatch(
            graft.streaming.StreamingDedup.keepFirst(ok, "doc_id", "text"), sink)
        }
        s.table(sink).select(col("keep_id")).orderBy("keep_id")
      }),

    // The streaming ingest CONSULTING THE STORED BATCH ARTIFACT — the
    // edge q_stream_curation leaves open: that pipeline gates + dedups
    // against its own stream state only, but a production ingest also
    // drops arrivals that the NIGHTLY near-dup job already condemned.
    // Arrivals flow gate → stream-static LEFT ANTI join against the
    // rolled-forward loser table (the q_dedup_clusters_compact artifact,
    // read once per micro-batch planning, broadcast — the 100 TB shape:
    // the loser table is a tiny id list next to the stream) → the
    // keepFirst ingest gate. This closes batch-artifact → streaming-
    // consumer: the nightly writes, the stream reads. Oracle = the batch
    // equivalent: gates ∧ NOT IN closure losers, then first-wins by
    // content digest.
    Q("q_stream_curation_vs_store", {
      val gate = graft.operators.TextAnalysis.gopherGateSql("text")
        .map(_._2).mkString("\n  AND ")
      Some(s"""WITH RECURSIVE ${PipelineQueries.closureLoserCtes},
              |ok AS (
              |  SELECT doc_id, text FROM documents
              |  WHERE ($gate)
              |    AND doc_id NOT IN (SELECT v FROM losers))
              |SELECT CAST(min(doc_id) AS BIGINT) AS keep_id
              |FROM ok GROUP BY sha256(text) ORDER BY keep_id""".stripMargin)
    },
      (s, d) => {
        val sink = "q_stream_curation_vs_store_sink"
        // the nightly artifact must exist before the stream starts — the
        // production ordering (ingest consumes what the batch job wrote)
        val losers = s.read
          .parquet(PipelineQueries.compactClusterArtifactDir(s, d) + "/clusters")
          .filter(col("v") =!= col("cluster_rep")).select(col("v").as("doc_id"))
        graft.streaming.StateScope.withStateConf(s) {
          val ok = graft.Tables.tableStream(s, d, "documents")
            .filter(graft.operators.TextAnalysis.gopherGate(col("text")))
            .join(losers, Seq("doc_id"), "left_anti")
          graft.streaming.StateScope.drainSingleBatch(
            graft.streaming.StreamingDedup.keepFirst(ok, "doc_id", "text"), sink)
        }
        s.table(sink).select(col("keep_id")).orderBy("keep_id")
      }),

    // Streaming histogram-quantile monitor (the streaming twin of
    // q_hist_quantile, on events): the equi-width bucket table as stream
    // state — every value lands in its clamped integer bucket batch-side
    // (the SAME arithmetic as HistQuantile.sketchBy) and each
    // (event_type, bucket) cell's counter lives in RocksDB; histogram
    // linearity (cellwise sum) makes the maintained table the batch
    // sketch of everything seen at ANY batching/arrival order. The p50/
    // p90/p99 estimates then run over the DRAINED sketch (groups x 64
    // rows, never the corpus) — the continuously-current SLO readout.
    // Single-batch assert keeps the memory sink to one emission
    // generation; state is at most groups x buckets longs FOREVER.
    Q("q_stream_quantile",
      Some("""WITH v AS (SELECT event_type AS g,
             |    CAST(floor(value * 100.0) AS BIGINT) AS c
             |  FROM events WHERE value IS NOT NULL),
             |s AS (SELECT g, (LEAST(12799, GREATEST(0, c)) * 64) // 12800 AS b,
             |    count(*) AS cnt FROM v GROUP BY 1, 2),
             |c2 AS (SELECT g, b, SUM(cnt) OVER (PARTITION BY g ORDER BY b) AS cum,
             |    SUM(cnt) OVER (PARTITION BY g) AS n FROM s),
             |q AS (SELECT g, phi, MIN(b) AS qb FROM c2
             |  CROSS JOIN (VALUES (500000), (900000), (990000)) p(phi)
             |  WHERE cum * 1000000 >= n * phi GROUP BY g, phi)
             |SELECT g AS event_type, CAST(phi AS BIGINT) AS phi_ppm,
             |  CAST((qb + 1) * 200 AS BIGINT) AS est
             |FROM q ORDER BY event_type, phi_ppm, est""".stripMargin),
      (s, d) => {
        val sink = "q_stream_quantile_sink"
        graft.streaming.StateScope.withStateConf(s) {
          val tracked = graft.streaming.StreamingHistQuantile.track(
            graft.Tables.eventsStream(s, d), "event_type",
            floor(col("value") * lit(100.0)).cast("long"),
            lo = 0L, hi = 12800L, buckets = 64)
          graft.streaming.StateScope.drainSingleBatch(tracked, sink)
        }
        graft.operators.HistQuantile.quantiles(
            s.table(sink).withColumnRenamed("g", "event_type"),
            Seq("event_type"), lo = 0L, hi = 12800L, buckets = 64,
            phisPpm = Seq(500000L, 900000L, 990000L))
          .orderBy("event_type", "phi_ppm", "est")
      }),

    // Streaming DRIFT monitor — the continuously-current PSI panel: each
    // non-reference source's n_chars histogram is maintained as stream
    // state (the SAME exact integer cells as StreamingHistQuantile —
    // histogram linearity makes the drained table the batch sketch of
    // everything seen at any arrival order), and PSI vs the static src0
    // reference histogram runs over the DRAINED sketch (sources × 16
    // rows, never the corpus). The production shape: the reference is a
    // frozen batch artifact, the current side is live ingest, and the
    // monitor reads per-source drift at any moment. Single-batch drain
    // asserted (memory sink holds one emission generation); the oracle
    // re-derives counts and PSI terms per source in SQL.
    Q("q_stream_drift",
      Some("""WITH cur AS (SELECT source, CAST(n_chars AS BIGINT) AS v
             |  FROM documents WHERE source <> 'src0' AND n_chars IS NOT NULL),
             |ref AS (SELECT CAST(n_chars AS BIGINT) AS v
             |  FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL),
             |curc AS (SELECT source, (LEAST(1023, GREATEST(0, v)) * 16) // 1024 AS bucket,
             |    CAST(count(*) AS BIGINT) AS cnt_cur FROM cur GROUP BY 1, 2),
             |refc AS (SELECT (LEAST(1023, GREATEST(0, v)) * 16) // 1024 AS bucket,
             |    CAST(count(*) AS BIGINT) AS cnt_ref FROM ref GROUP BY 1),
             |spine AS (SELECT s.source, CAST(b.b AS BIGINT) AS bucket
             |  FROM (SELECT DISTINCT source FROM documents WHERE source <> 'src0') s
             |  CROSS JOIN (SELECT unnest(range(16)) AS b) b),
             |f AS (SELECT sp.source, sp.bucket,
             |    coalesce(r.cnt_ref, 0) AS cnt_ref, coalesce(c.cnt_cur, 0) AS cnt_cur
             |  FROM spine sp
             |  LEFT JOIN curc c ON c.source = sp.source AND c.bucket = sp.bucket
             |  LEFT JOIN refc r ON r.bucket = sp.bucket),
             |tot AS (SELECT source, sum(cnt_ref) AS nr, sum(cnt_cur) AS nc
             |  FROM f GROUP BY source)
             |SELECT f.source, f.bucket, f.cnt_ref, f.cnt_cur,
             |  CAST(round((CAST(f.cnt_ref + 1 AS DOUBLE) / CAST(t.nr + 16 AS DOUBLE)
             |      - CAST(f.cnt_cur + 1 AS DOUBLE) / CAST(t.nc + 16 AS DOUBLE))
             |    * ln((CAST(f.cnt_ref + 1 AS DOUBLE) / CAST(t.nr + 16 AS DOUBLE))
             |        / (CAST(f.cnt_cur + 1 AS DOUBLE) / CAST(t.nc + 16 AS DOUBLE)))
             |    * 1e6, 0) AS BIGINT) AS term_micro
             |FROM f JOIN tot t USING (source) ORDER BY source, bucket""".stripMargin),
      (s, d) => {
        import graft.operators.{Drift, HistQuantile}
        val sink = "q_stream_drift_sink"
        graft.streaming.StateScope.withStateConf(s) {
          val cur = graft.Tables.tableStream(s, d, "documents")
            .filter(col("source") =!= "src0")
          graft.streaming.StateScope.drainSingleBatch(
            graft.streaming.StreamingHistQuantile.track(cur, "source",
              col("n_chars"), lo = 0L, hi = 1024L, buckets = 16), sink)
        }
        val curCnt = s.table(sink).select(col("g").as("source"),
          col("hq_bucket").as("bucket"), col("cnt").as("cnt_cur"))
        val docs = t(s, d, "documents")
        // the reference side is the FROZEN artifact, not a live recompute
        // — the full production lifecycle: freeze once, monitor forever
        val refCnt = s.read.parquet(materializedPsiRefDir(s, d))
        val spine = docs.filter(col("source") =!= "src0")
          .select(col("source")).distinct()
          .crossJoin(s.range(16).select(col("id").as("bucket")))
        val full = spine
          .join(curCnt, Seq("source", "bucket"), "left")
          .join(refCnt, Seq("bucket"), "left")
          .select(col("source"), col("bucket"),
            coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
            coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
        Drift.psiTerms(full, Seq("source"), buckets = 16)
          .orderBy("source", "bucket")
      }),

    // Batch drift vs the FROZEN reference — q_stream_drift's batch
    // sibling, completing registry parity for the drift family: the
    // original q_psi_drift recomputes the src0 histogram in-query; this
    // reads the artifact the corpus version shipped with (16 rows) and
    // pays only the current-side sketch — the shape a scheduled batch
    // drift check actually runs. Stored == recomputed is pinned by
    // WarehouseOpsSpec, so the oracle text is q_psi_drift's.
    Q("q_psi_drift_from_ref",
      Some("""WITH v AS (SELECT CAST(n_chars AS BIGINT) AS v, source = 'src0' AS r
             |  FROM documents WHERE n_chars IS NOT NULL),
             |bkt AS (SELECT (LEAST(1023, GREATEST(0, v)) * 16) // 1024 AS bucket, r FROM v),
             |cnts AS (SELECT bucket,
             |    CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ref,
             |    CAST(sum(CASE WHEN r THEN 0 ELSE 1 END) AS BIGINT) AS cnt_cur
             |  FROM bkt GROUP BY bucket),
             |spine AS (SELECT unnest(range(16)) AS bucket),
             |f AS (SELECT CAST(s.bucket AS BIGINT) AS bucket,
             |    coalesce(c.cnt_ref, 0) AS cnt_ref, coalesce(c.cnt_cur, 0) AS cnt_cur
             |  FROM spine s LEFT JOIN cnts c ON c.bucket = s.bucket),
             |tot AS (SELECT sum(cnt_ref) AS nr, sum(cnt_cur) AS nc FROM f)
             |SELECT bucket, cnt_ref, cnt_cur,
             |  CAST(round((CAST(cnt_ref + 1 AS DOUBLE) / CAST(nr + 16 AS DOUBLE)
             |      - CAST(cnt_cur + 1 AS DOUBLE) / CAST(nc + 16 AS DOUBLE))
             |    * ln((CAST(cnt_ref + 1 AS DOUBLE) / CAST(nr + 16 AS DOUBLE))
             |        / (CAST(cnt_cur + 1 AS DOUBLE) / CAST(nc + 16 AS DOUBLE)))
             |    * 1e6, 0) AS BIGINT) AS term_micro
             |FROM f, tot ORDER BY bucket""".stripMargin),
      (s, d) => {
        import graft.operators.{Drift, HistQuantile}
        val docs = t(s, d, "documents")
        val refCnt = s.read.parquet(materializedPsiRefDir(s, d))
        val curCnt = HistQuantile.sketchBy(
            docs.filter(col("source") =!= "src0"),
            Nil, col("n_chars"), lo = 0L, hi = 1024L, buckets = 16)
          .select(col("hq_bucket").as("bucket"), col("cnt").as("cnt_cur"))
        val spine = s.range(16).select(col("id").as("bucket"))
        val full = spine
          .join(refCnt, Seq("bucket"), "left")
          .join(curCnt, Seq("bucket"), "left")
          .select(col("bucket"),
            coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
            coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
        Drift.psiTerms(full, Nil, buckets = 16)
          .orderBy("bucket")
      }),

    // Stream-stream interval join on the scoreboard (the attribution
    // shape: view -> click within 2h per user): TWO file-source streams
    // over the same events directory, watermarked on both sides so the
    // interval condition bounds join state — joined matches drain with
    // AvailableNow. In a single-batch drain the watermark never advances
    // before data arrives, so no late row can be state-evicted unmatched
    // and the result equals the plain batch interval join (multi-batch
    // drains could drop watermark-late rows — asserted below, the
    // q_stream_anomaly contract).
    Q("q_stream_join",
      Some("""SELECT a.user_id AS user_id, a.event_id AS view_id,
             |  b.event_id AS click_id, a.ts AS view_ts, b.ts AS click_ts
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id
             | AND a.event_type = 'view' AND b.event_type = 'click'
             | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
             |ORDER BY a.user_id, view_id, click_id""".stripMargin),
      (s, d) => {
        val sink = "q_stream_join_sink"
        // State-partition sizing matters MOST here: a stream-stream join
        // materializes FOUR state stores per shuffle partition, and store
        // initialization is the drain's dominant fixed cost (~30 ms/store
        // measured: 128 stores at 32 partitions ≈ 3.7 s/run vs a 0.7 s
        // batch twin). StateScope pins 8 partitions (a state-volume
        // decision, see its doc) and the production RocksDB provider,
        // restoring the session defaults after.
        graft.streaming.StateScope.withStateConf(s) {
          val views = graft.Tables.eventsStream(s, d)
            .filter(col("event_type") === "view")
          val clicks = graft.Tables.eventsStream(s, d)
            .filter(col("event_type") === "click")
          val joined = graft.streaming.StreamingSessions.intervalJoin(
            views, clicks, "user_id", "ts", "4 hours", "2 hours",
            carryLeft = Seq("event_id"), carryRight = Seq("event_id"))
          graft.streaming.StateScope.drainSingleBatch(joined, sink)
        }
        s.table(sink)
          .select(col("k").as("user_id"),
            col("l_event_id").as("view_id"), col("r_event_id").as("click_id"),
            col("l_ts").as("view_ts"), col("r_ts").as("click_ts"))
          .orderBy("user_id", "view_id", "click_id")
      }),

    // Pairwise Pearson correlation matrix (Profile.correlations): all 6
    // pairs over 4 quantized lineitem measures from ONE scan — n + 2k
    // per-column sums + k(k-1)/2 cross sums, exact decimals, closed form
    // in doubles (the Trend recipe). Oracle rebuilds the same sums and
    // mirrors the formula; compared on floored micro scalings.
    Q("q_corr_matrix",
      Some {
        val quant = Map(
          "discount" -> "CAST(floor(l_discount * 100.0) AS HUGEINT)",
          "price" -> "CAST(floor(l_extendedprice * 100.0) AS HUGEINT)",
          "quantity" -> "CAST(floor(l_quantity) AS HUGEINT)",
          "tax" -> "CAST(floor(l_tax * 100.0) AS HUGEINT)")
        val names = quant.keys.toSeq.sorted
        val pairs = for { i <- names.indices; j <- (i + 1) until names.size }
          yield (names(i), names(j))
        val sumCols = names.flatMap(c => Seq(
          s"CAST(sum(${c}q) AS DOUBLE) AS s_$c",
          s"CAST(sum(${c}q * ${c}q) AS DOUBLE) AS ss_$c")) ++
          pairs.map { case (a, b) => s"CAST(sum(${a}q * ${b}q) AS DOUBLE) AS sp_${a}_$b" }
        val pairSel = pairs.map { case (a, b) =>
          val den = s"sqrt(n * ss_$a - s_$a * s_$a) * sqrt(n * ss_$b - s_$b * s_$b)"
          s"""SELECT '$a' AS col_a, '$b' AS col_b, nn AS n,
             |  CASE WHEN $den > 0.0 THEN
             |    CAST(floor((n * sp_${a}_$b - s_$a * s_$b) / ($den)
             |      * 1000000.0) AS BIGINT) ELSE NULL END AS corr_micro FROM s""".stripMargin
        }
        s"""WITH d AS (SELECT ${names.map(c => s"${quant(c)} AS ${c}q").mkString(", ")} FROM lineitem),
           |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(count(*) AS BIGINT) AS nn,
           |  ${sumCols.mkString(", ")} FROM d)
           |SELECT * FROM (${pairSel.mkString(" UNION ALL ")})
           |ORDER BY col_a, col_b""".stripMargin
      },
      (s, d) =>
        Profile.correlations(t(s, d, "lineitem"), Seq(
            "discount" -> floor(col("l_discount") * lit(100.0)),
            "price" -> floor(col("l_extendedprice") * lit(100.0)),
            "quantity" -> floor(col("l_quantity")),
            "tax" -> floor(col("l_tax") * lit(100.0))))
          .select(col("col_a"), col("col_b"), col("n"),
            floor(col("corr") * lit(1000000.0)).cast("long").as("corr_micro"))
          .orderBy("col_a", "col_b"))
  )
}
