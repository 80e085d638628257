package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim: Spark 4 hides the Expression<->Column bridge behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). Custom
  * Catalyst expressions still need it to surface as `Column`s, so this
  * one-file package sits under org.apache.spark.sql purely for access — the
  * standard pattern for Spark extension libraries. No Spark behavior is
  * modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Sort-direction probe: in Spark 4 a `col.desc` Column wraps the
  * api-module `org.apache.spark.sql.internal.SortOrder` ColumnNode (NOT a
  * Catalyst SortOrder — `ColumnBridge.expression` hands back an opaque
  * `ColumnNodeExpression`), and `Column.node` is private[sql]. Operators
  * that must honor the caller's sort direction (e.g. GlobalRank's chunk
  * offset accumulation) read it through here.
  */
object SortOrderBridge {
  import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder}
  def isDescending(c: Column): Boolean = c.node match {
    case so: NodeSortOrder => so.sortDirection == NodeSortOrder.Descending
    case _ => false
  }
}

/** Listener-bus drain: QueryExecutionListener callbacks are delivered on
  * the ASYNC ExecutionListenerBus, so a reader summing audit results
  * right after its last action can race the delivery and under-count.
  * LiveListenerBus.waitUntilEmpty is private[spark]; exposed here for the
  * bench's lint gate (same access-only pattern as the other bridges).
  */
object ListenerBusBridge {
  def drain(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}

/** State-store quiesce: after a streaming query stops, its RocksDB
  * providers stay registered in StateStore's loadedProviders map and the
  * background maintenance thread keeps running snapshot/cleanup cycles
  * against checkpoint dirs the stopped query has already deleted — async
  * ERROR spew (RocksDB MANIFEST verification failures) that can land
  * arbitrarily late, even after a process's final output line.
  * StateStore.stop() unloads every provider and stops the maintenance
  * task synchronously; mains that print a machine-parsed artifact call
  * this BEFORE printing so nothing streaming-related can log after it.
  * Access-only shim (the StateStore object is sql-internal), same
  * pattern as the other bridges here.
  */
object StateStoreBridge {
  def stopAll(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}

/** Same access story for constructing a DataFrame from a custom logical
  * plan node (Dataset.ofRows is private[sql] in Spark 4).
  */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
