package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.engine.GraftSql
import graft.plans._

/** The reference-reachable surface (SURVEY.md §2.1-§2.2): scan, projection
  * (named/ordinal/wildcard), selection with the eight binary operators plus
  * Not/IsNull/IsNotNull/Cast, sort, limit, empty relation, CREATE EXTERNAL
  * TABLE — each as a named query with a DuckDB oracle.
  */
object CoreQueries {

  val all: Seq[Q] = Seq(

    // DataSource V2 scan: the synthetic graftrange source with an id-range
    // predicate pushed into partition planning (SourcesSpec asserts the
    // pruning; here the driver checks the produced rows).
    Q("q_dsv2_scan",
      Some("""SELECT CAST(r.range AS BIGINT) AS id,
             |  CAST(r.range AS DOUBLE) * CAST(0.5 AS DOUBLE) AS val,
             |  'row-' || r.range AS payload
             |FROM range(0, 500) r WHERE r.range >= 100 AND r.range < 200
             |ORDER BY id""".stripMargin),
      (s, _) =>
        s.read.format("graftrange")
          .option("rows", "500").option("parts", "4").load()
          .filter(org.apache.spark.sql.functions.col("id") >= 100 &&
            org.apache.spark.sql.functions.col("id") < 200)
          .orderBy("id")),

    // Op 1 Scan (reference logicalplan.rs:233-245): full table scan.
    Q("q_scan",
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"),
      (s, d) => t(s, d, "region").orderBy("r_regionkey")),

    // Op 7 CreateTable (logicalplan.rs:260-272; queryplanner.rs:73-95):
    // mura-form DDL through our SQL frontend, then a query against the
    // registered view.
    Q("q_create_external",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin),
      (s, d) => {
        GraftSql.sql(s,
          s"""CREATE EXTERNAL TABLE lineitem_ext (
             |  l_orderkey BIGINT NOT NULL, l_partkey BIGINT NOT NULL,
             |  l_suppkey BIGINT NOT NULL, l_linenumber INT NOT NULL,
             |  l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE,
             |  l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR,
             |  l_shipdate TIMESTAMP
             |) STORED AS PARQUET LOCATION '$d/lineitem.parquet'""".stripMargin)
        s.sql("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem_ext
                |WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)
      }),

    // Op 2 Projection: named + ordinal columns via the mura-shaped builder
    // (ordinal semantics: logicalplan.rs:31, queryplanner.rs:114-118).
    Q("q_projection",
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey"),
      (s, d) =>
        PlanBuilder.scan(t(s, d, "customer"))
          .project(GExpr.cIdx(0), GExpr.c("c_name"), GExpr.c("c_acctbal"))
          .sort(GSortExpr(GCol("c_custkey"), asc = true))
          .build()),

    // Op 2 wildcard expansion (logicalplan.rs:406-418).
    Q("q_projection_wildcard",
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"),
      (s, d) =>
        PlanBuilder.scan(t(s, d, "nation"))
          .project(GWildcard)
          .sort(GSortExpr(GCol("n_nationkey"), asc = true))
          .build()),

    // Op 3 Selection, all six comparison operators (Operator Eq..GtEq,
    // logicalplan.rs:132-149).
    Q("q_filter_compare",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
             |WHERE l_quantity >= 10 AND l_quantity <= 40 AND l_linenumber > 1
             |  AND l_linenumber < 6 AND l_returnflag = 'A' AND l_linestatus <> 'F'
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") >= 10 && col("l_quantity") <= 40 &&
            col("l_linenumber") > 1 && col("l_linenumber") < 6 &&
            col("l_returnflag") === "A" && col("l_linestatus") =!= "F")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    // Op 3 Selection, boolean composition And/Or/Not (logicalplan.rs:44,
    // 132-149) — built through the GExpr algebra.
    Q("q_filter_bool",
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
             |WHERE (l_returnflag = 'R' OR l_returnflag = 'A') AND NOT (l_quantity < 25)
             |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin),
      (s, d) => {
        import GOp._
        val pred = GBinary(
          GBinary(GExpr.eq(GCol("l_returnflag"), GLit("R")), Or,
            GExpr.eq(GCol("l_returnflag"), GLit("A"))),
          And,
          GNot(GBinary(GCol("l_quantity"), Lt, GLit(25))))
        PlanBuilder.scan(t(s, d, "lineitem"))
          .filter(pred)
          .project(GExpr.c("l_orderkey"), GExpr.c("l_linenumber"),
            GExpr.c("l_returnflag"), GExpr.c("l_quantity"))
          .sort(GSortExpr(GCol("l_orderkey"), asc = true),
            GSortExpr(GCol("l_linenumber"), asc = true),
            GSortExpr(GCol("l_returnflag"), asc = true),
            GSortExpr(GCol("l_quantity"), asc = true))
          .build()
      }),

    // IsNull / IsNotNull (logicalplan.rs:46-48). The events table carries no
    // physical nulls at test SFs, so nulls are manufactured with NULLIF —
    // identically on both sides.
    Q("q_null_checks",
      Some("""SELECT event_id, NULLIF(event_type, 'error') AS et,
             |  NULLIF(event_type, 'error') IS NULL AS is_err,
             |  NULLIF(event_type, 'error') IS NOT NULL AS not_err
             |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin),
      (s, d) =>
        t(s, d, "events")
          .filter(col("event_id") < 500)
          .select(col("event_id"),
            nullif(col("event_type"), lit("error")).as("et"),
            nullif(col("event_type"), lit("error")).isNull.as("is_err"),
            nullif(col("event_type"), lit("error")).isNotNull.as("not_err"))
          .orderBy("event_id")),

    // Cast (logicalplan.rs:50-55; queryplanner.rs:141-147).
    Q("q_cast",
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS qty_int,
             |  CAST(l_orderkey AS VARCHAR) AS ok_str, CAST(l_shipdate AS DATE) AS ship_date
             |FROM lineitem WHERE l_orderkey < 200
             |ORDER BY l_orderkey, l_linenumber, qty_int, ship_date""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_orderkey") < 200)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("int").as("qty_int"),
            col("l_orderkey").cast("string").as("ok_str"),
            col("l_shipdate").cast("date").as("ship_date"))
          .orderBy("l_orderkey", "l_linenumber", "qty_int", "ship_date")),

    // Literal(ScalarValue) across types (logicalplan.rs:153-182). Spark
    // literal typing adopted over mura's everything-is-Float64
    // (queryplanner.rs:109; SURVEY.md §1.2).
    Q("q_literal_types",
      Some("""SELECT r_regionkey, TRUE AS b, 42 AS i, CAST(2.5 AS DOUBLE) AS dv,
             |  'x' AS sv, CAST(NULL AS VARCHAR) AS nv
             |FROM region ORDER BY r_regionkey""".stripMargin),
      (s, d) =>
        t(s, d, "region").select(col("r_regionkey"),
          lit(true).as("b"), lit(42).as("i"), lit(2.5).as("dv"),
          lit("x").as("sv"), lit(null).cast("string").as("nv"))
          .orderBy("r_regionkey")),

    // Op 4 Sort, multi-key asc/desc (logicalplan.rs:224-232, 56-62).
    Q("q_sort",
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin),
      (s, d) =>
        t(s, d, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc,
            col("o_orderkey").asc)),

    // Op 5 Limit on top of sort (logicalplan.rs:251-259) — Catalyst turns
    // this into TakeOrderedAndProject (no global sort materialization).
    Q("q_limit",
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
          .limit(25)),

    // Op 6 EmptyRelation (logicalplan.rs:246-250).
    Q("q_empty",
      Some("SELECT CAST(1 AS INTEGER) AS x WHERE false"),
      (s, _) => s.range(0).select(col("id").cast("int").as("x"))),

    // Arrow IPC interchange — the reference's declared memory model
    // (/root/reference/README.md:10, logicalplan.rs:17). A lineitem slice
    // (long/int/double/string/timestamp) round-trips through Arrow stream
    // bytes partition-locally; the oracle aggregates the ORIGINAL table,
    // so any interchange infidelity (lost precision, tz shift, dropped
    // rows/nulls) breaks the hash.
    Q("q_arrow_roundtrip",
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
             |  CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
             |  CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
             |  max(l_shipdate) AS max_ship
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val slice = t(s, d, "lineitem").select(
          "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
        graft.operators.ArrowInterchange.roundTrip(slice)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("cnt"),
            sum("l_orderkey").as("sum_ok"),
            sum(Money.cents(col("l_quantity"))).as("sum_qty_cents"),
            max("l_shipdate").as("max_ship"))
          .orderBy("l_returnflag")
      }),

    // The reference's own end-to-end test shape (logicalplan.rs:470-488):
    // scan with ordinal projection -> filter col = literal -> project id.
    // Their fixture is employee[id,...,state]; ours is customer with
    // c_mktsegment standing in for state.
    Q("q_compiler_pipeline",
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |ORDER BY c_custkey""".stripMargin),
      (s, d) =>
        PlanBuilder.scan(t(s, d, "customer"), projection = Some(Seq(0, 4)))
          .filter(GExpr.eq(GCol("c_mktsegment"), GLit("BUILDING")))
          .project(GExpr.c("c_custkey"))
          .sort(GSortExpr(GCol("c_custkey"), asc = true))
          .build())
  )
}
