package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — batch analog of streaming
  * session windows. Extension surface: the reference has no notion of
  * streams or time at all (SURVEY.md §2.4-2.10, "streaming: completely
  * absent").
  *
  * Batch path: lag-gap + running-sum over a per-user window — one shuffle
  * on user_id, linear within partition. Streaming path: Spark's native
  * session_window, identical merge semantics, usable on a readStream
  * DataFrame with a watermark (see graft.streaming.StreamingSessions).
  */
object Sessionize {

  /** Assign a per-user 1-based session id: a new session starts when the
    * gap since the previous event exceeds `gapSeconds`. Microsecond-exact
    * integer comparison (no float time arithmetic).
    */
  def byGap(df: DataFrame, userCol: String, tsCol: String, idCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val gapMicros = gapSeconds * 1000000L
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(prevTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prevTs) > gapMicros, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session summaries: count + span per (user, session). */
  def aggByGap(df: DataFrame, userCol: String, tsCol: String, idCol: String,
      gapSeconds: Long): DataFrame =
    byGap(df, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** Spark-native session windows — the same merge semantics as [[byGap]]
    * (events within `gap` of each other coalesce), expressed through the
    * session_window grouping column. Works on batch and streaming inputs;
    * window end = last event + gap by definition.
    */
  def bySessionWindow(df: DataFrame, userCol: String, tsCol: String,
      gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("w_start"),
        col("session_window.end").as("w_end"),
        col("n_events"))
}
