package graft.operators

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability via Spark's CollectMetrics (`Dataset.observe`):
  * named aggregate counters that ride the job's existing pass over the data
  * — no second scan, no driver-side collect of the data itself. This is the
  * standard way to get row counts / null rates / domain violations out of a
  * 100 TB batch job "for free" (the accumulators travel with task results).
  *
  * Extension surface: the reference has no metrics/monitoring of any kind
  * (its whole lifecycle is parse -> plan -> print,
  * /root/reference/src/main.rs:31-59).
  */
object Metrics {

  /** Attach standard data-quality counters for `cols` to a DataFrame. The
    * metrics appear under observation name `name` when the next action on
    * the DataFrame completes (see [[listen]]).
    */
  def observeQuality(df: DataFrame, name: String, cols: String*): DataFrame = {
    val counters: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        cols.flatMap { c =>
          Seq(count(when(col(c).isNull, 1)).as(s"${c}_nulls"),
            approx_count_distinct(col(c)).as(s"${c}_approx_distinct"))
        }
    df.observe(name, counters.head, counters.tail: _*)
  }

  /** Register a listener that records every completed observation into the
    * returned map (observation name -> metric name -> value). Call
    * `spark.listenerManager.unregister` with the returned listener when
    * done; the map is concurrent because listeners fire on another thread.
    */
  def listen(spark: SparkSession): (QueryExecutionListener, TrieMap[String, Map[String, Any]]) = {
    val sink = TrieMap.empty[String, Map[String, Any]]
    val l = new QueryExecutionListener {
      private def record(qe: QueryExecution): Unit =
        qe.observedMetrics.foreach { case (name, row: Row) =>
          sink(name) = row.schema.fieldNames.zip(row.toSeq).toMap
        }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        record(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        record(qe)
    }
    spark.listenerManager.register(l)
    (l, sink)
  }
}
