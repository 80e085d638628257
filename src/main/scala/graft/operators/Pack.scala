package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-size training shards by a
  * running size budget (the concat-and-chunk step in front of LLM
  * pretraining — T5/GPT-style pipelines pack tokenized docs into
  * fixed-length sequences; a doc may straddle a boundary, so shard
  * membership is by starting offset).
  *
  * Shape at 100 TB: ONE window per pack key — the running sum is computed
  * partition-parallel across keys with no global sort and no driver state.
  * The pack key is the parallelism unit: packing per (source, day) bounds
  * each window partition to what one executor holds, which is how the
  * same plan runs on a 1000-executor cluster. A global (single-key) pack
  * would serialize into one partition — callers should split the keyspace
  * instead (documented, not defended at runtime: Spark will still run it,
  * just on one core).
  *
  * The reference has no analog (it executes nothing); the operator shape
  * is the standard window-cumsum idiom.
  */
object Pack {

  /** Adds `offset` (running size before this row) and `shard` (= offset
    * integer-divided by `budget`) per `key`, ordered by `order` within the
    * key. `size` must be a non-negative integral column.
    */
  def byBudget(df: DataFrame, key: Column, order: Column, size: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val w = Window.partitionBy(key).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("offset", sum(size).over(w) - size)
      .withColumn("shard", expr(s"offset div ${budget}L"))
  }

  /** Global packing — ONE corpus-wide stream ordered by `order`, no pack
    * key. The single-key case [[byBudget]] would serialize through one
    * window partition; this goes through [[GlobalRank.withRunningSum]]
    * (range-chunked local cumsum + broadcast chunk totals), so the
    * running offset is computed partition-parallel at any scale. `order`
    * must be a total order (unique values).
    */
  def globalByBudget(df: DataFrame, order: Column, size: Column,
      budget: Long, chunks: Int = 64): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    GlobalRank.withRunningSum(df, order, Seq(order), size, "__cum", chunks)
      .withColumn("offset", col("__cum") - size)
      .withColumn("shard", expr(s"offset div ${budget}L"))
      .drop("__cum")
  }
}
