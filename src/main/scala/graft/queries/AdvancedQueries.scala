package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.{t, views}
import graft.functions.Aggregators

/** Later-stage surface: typed custom aggregates (UDAF), grouping sets, and
  * the date/time/interval literal forms the reference's planner explicitly
  * rejects (/root/reference/src/planner/queryplanner.rs:104-112).
  */
object AdvancedQueries {

  val all: Seq[Q] = Seq(

    // Custom typed Aggregator (UDAF): geometric mean. Merge-able buffer =>
    // partial aggregation; value rounded to absorb ln-sum ordering.
    Q("q_udaf_geomean",
      Some("""SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_qty
             |FROM lineitem WHERE l_quantity > 0
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val geo = udaf(Aggregators.GeoMean)
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(round(geo(col("l_quantity")), 6).as("geo_qty"))
          .orderBy("l_returnflag")
      }),

    Q("q_grouping_sets",
      Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      (s, d) => {
        views(s, d, "lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
                |FROM lineitem
                |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
                |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      }),

    // DATE/TIMESTAMP/INTERVAL literal forms + interval arithmetic.
    Q("q_date_literals",
      Some("""SELECT o_orderkey, o_orderdate,
             |  o_orderdate - INTERVAL 1 DAY AS prev_day
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-03-01 00:00:00'
             |  AND CAST(o_orderdate AS DATE) <> DATE '1997-02-14'
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        views(s, d, "orders")
        s.sql("""SELECT o_orderkey, o_orderdate,
                |  o_orderdate - INTERVAL 1 DAY AS prev_day
                |FROM orders
                |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                |  AND o_orderdate < TIMESTAMP '1997-03-01 00:00:00'
                |  AND CAST(o_orderdate AS DATE) <> DATE '1997-02-14'
                |ORDER BY o_orderkey""".stripMargin)
      })
  )
}
