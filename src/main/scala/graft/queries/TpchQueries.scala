package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t

/** TPC-H-shaped headline queries (Q1/Q3/Q5/Q6 adapted to this star
  * schema's columns and 1995-2001 date range) — the canonical OLAP
  * workload shapes: wide aggregation, join + top-k, 6-way star join,
  * selective scan-aggregate. Money aggregates run in exact integer cents
  * (order-independent; derived averages divide the exact sums), per the
  * determinism rules in FIXTURES.md §5.
  */
object TpchQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  val all: Seq[Q] = Seq(

    // Q1: pricing summary report.
    Q("q_tpch_q1",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
             |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
             |  avg(CAST(l_quantity AS BIGINT)) AS avg_qty,
             |  CAST(count(*) AS BIGINT) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax")))).as("sum_charge_cents"),
            avg(col("l_quantity").cast("long")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")),

    // Q3: shipping-priority — join + aggregate + top-10.
    Q("q_tpch_q3",
      Some("""SELECT o.o_orderkey,
             |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
             |  o.o_orderdate
             |FROM customer c
             |JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |WHERE c.c_mktsegment = 'BUILDING'
             |  AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
             |  AND l.l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
             |GROUP BY o.o_orderkey, o.o_orderdate
             |ORDER BY revenue_cents DESC, o.o_orderkey LIMIT 10""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("2000-03-15 00:00:00").cast("timestamp"))
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") < lit("2000-03-15 00:00:00").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")
            .filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy("o_orderkey", "o_orderdate")
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
          .select("o_orderkey", "revenue_cents", "o_orderdate")
          .orderBy(col("revenue_cents").desc, col("o_orderkey").asc)
          .limit(10)),

    // Q5: local-supplier volume — 6-way star join, customer and supplier
    // in the same nation, region-filtered.
    Q("q_tpch_q5",
      Some("""SELECT n.n_name,
             |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM customer c
             |JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |JOIN supplier sp ON l.l_suppkey = sp.s_suppkey AND c.c_nationkey = sp.s_nationkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |WHERE r.r_name = 'ASIA'
             |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
          .orderBy("n_name")),

    // Q6: revenue-change forecast — selective scan-aggregate, fully
    // pushdown-able predicates.
    Q("q_tpch_q6",
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_cents"))),

    // Q4: order-priority checking — EXISTS lowers to a left-semi join with a
    // mixed equi + range condition (this schema has no l_commitdate, so
    // "shipped after the order date" stands in for late delivery).
    Q("q_tpch_q4",
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
             |FROM orders o
             |WHERE o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
             |  AND o.o_orderdate < TIMESTAMP '2000-04-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem l
             |    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) =>
        t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("2000-04-01 00:00:00").cast("timestamp"))
          .join(t(s, d, "lineitem"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")),

    // Q10: returned-item reporting — fact filter + three-way star, top 20.
    Q("q_tpch_q10",
      Some("""SELECT c.c_custkey, c.c_name, n.n_name,
             |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM customer c
             |JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |WHERE l.l_returnflag = 'R'
             |  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
             |  AND o.o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
             |GROUP BY c.c_custkey, c.c_name, n.n_name
             |ORDER BY revenue_cents DESC, c.c_custkey LIMIT 20""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("2000-07-01 00:00:00").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("c_custkey"))
          .limit(20)),

    // Q14: promo-revenue share — fact/dim join over one shipdate month;
    // this part table has no PROMO types, so ECONOMY stands in. Both sides
    // of the would-be ratio emitted as exact cents (a double division would
    // be summation-order-sensitive).
    Q("q_tpch_q14",
      Some("""SELECT
             |  CAST(sum(CASE WHEN p.p_type = 'ECONOMY' THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS economy_cents,
             |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |WHERE l.l_shipdate >= TIMESTAMP '2000-09-01 00:00:00'
             |  AND l.l_shipdate < TIMESTAMP '2000-10-01 00:00:00'""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("2000-09-01 00:00:00").cast("timestamp") &&
            col("l_shipdate") < lit("2000-10-01 00:00:00").cast("timestamp"))
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "ECONOMY",
              cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .otherwise(lit(0L))).as("economy_cents"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("total_cents"))),

    // Q13: customer order-count distribution — LEFT OUTER join with a
    // join-side predicate (customers with zero qualifying orders must
    // survive with c_count = 0), then a re-aggregation on the outer side.
    // This schema has no o_comment, so the priority anti-filter stands in
    // for TPC-H's NOT LIKE '%special%requests%'. At scale: one shuffle for
    // the outer join + per-customer count, then a tiny re-agg on c_count
    // (cardinality <= max orders per customer) — no broadcast needed on
    // the fact side, and the second aggregate is effectively free.
    Q("q_tpch_q13",
      Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
             |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
             |  FROM customer c LEFT OUTER JOIN orders o
             |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
             |  GROUP BY c.c_custkey) t
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
      (s, d) =>
        t(s, d, "customer").select("c_custkey")
          .join(t(s, d, "orders")
              .filter(col("o_orderpriority") =!= "1-URGENT")
              .select("o_custkey", "o_orderkey"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)),

    // Q18: large-volume customers — HAVING on a grouped fact, then joins
    // back to orders/customer. The aggregate-then-join order is the scale
    // point: the HAVING filter reduces the fact side to ~1% before any
    // join, so the join input is tiny instead of the full lineitem.
    Q("q_tpch_q18",
      Some("""SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             |  CAST(big.sum_qty AS BIGINT) AS sum_qty
             |FROM (SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING sum(CAST(l_quantity AS BIGINT)) > 250) big
             |JOIN orders o ON o.o_orderkey = big.l_orderkey
             |JOIN customer c ON c.c_custkey = o.o_custkey
             |ORDER BY sum_qty DESC, o.o_orderkey""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
          .filter(col("sum_qty") > 250)
          .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("c_custkey") === col("o_custkey"))
          .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "sum_qty")
          .orderBy(col("sum_qty").desc, col("o_orderkey"))),

    // Q22: global-sales-opportunity — scalar AVG subquery threshold +
    // NOT EXISTS anti-join, grouped on the outer side (nationkey stands in
    // for Q22's phone country code; "no urgent orders" for "no orders",
    // which this synthetic data never has). Anti-join + broadcast scalar:
    // the customer side shuffles once, orders reduce to distinct urgent
    // custkeys.
    Q("q_tpch_q22",
      Some("""WITH a AS (SELECT avg(c_acctbal) AS thr FROM customer WHERE c_acctbal > 0)
             |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
             |  CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS totacctbal_cents
             |FROM customer c, a
             |WHERE c.c_acctbal > a.thr
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
             |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin),
      (s, d) => {
        val cust = t(s, d, "customer")
        val thr = cust.filter(col("c_acctbal") > 0)
          .agg(avg(col("c_acctbal")).as("thr"))
        cust.crossJoin(broadcast(thr))
          .filter(col("c_acctbal") > col("thr"))
          .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(cents(col("c_acctbal"))).as("totacctbal_cents"))
          .orderBy("c_nationkey")
      }),

    // Q17: small-quantity-order revenue — correlated scalar subquery
    // (per-part average quantity threshold). Written as SQL so Catalyst's
    // decorrelation (RewriteCorrelatedScalarSubquery) produces the plan a
    // user's query would get: the subquery becomes an aggregate joined
    // back on p_partkey, not a per-row re-scan. Exact cents for the sum.
    Q("q_tpch_q17",
      Some("""SELECT CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
             |  CAST(count(*) AS BIGINT) AS n_items
             |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE p.p_size <= 5
             |  AND l.l_quantity < (
             |    SELECT CAST(0.5 AS DOUBLE) * avg(l2.l_quantity)
             |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin),
      (s, d) => {
        graft.Tables.views(s, d, "lineitem", "part")
        s.sql("""SELECT CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                |  CAST(count(*) AS BIGINT) AS n_items
                |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                |WHERE p.p_size <= 5
                |  AND l.l_quantity < (
                |    SELECT CAST(0.5 AS DOUBLE) * avg(l2.l_quantity)
                |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
      })
  )
}
