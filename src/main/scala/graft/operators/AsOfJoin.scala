package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark SQL lacks natively.
  *
  * Implemented by the union-tag trick rather than a custom SparkPlan: tag
  * both sides, union, and carry the right side's payload forward with
  * last(ignoreNulls) over a (key, time)-ordered window; keep left rows.
  * One shuffle on the key, sort within partition — the same cost profile
  * as a sort-merge join, with none of the O(n*m) blowup a naive range-join
  * formulation (BroadcastNestedLoop) would hit at scale.
  *
  * Semantics: backward inclusive — each left row matches the latest right
  * row with rightTs <= leftTs for the same key (right sorts before left on
  * ties, so an equal-timestamp right row matches).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
    val r = right
      .select((keyCol +: rightTsCol +: payloadCols).map(col): _*)
      .withColumnRenamed(rightTsCol, "__rts")
      .withColumn("__ts", col("__rts"))
      .drop("__rts")
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
