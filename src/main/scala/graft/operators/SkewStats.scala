package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew diagnostics: the measurement that decides whether a join/agg
  * key needs salting ([[SkewJoin]]), AQE skew handling, or nothing. A
  * 100 TB shuffle is sized by its hottest key, not its average one — so
  * profile BEFORE paying for the shuffle, with a pass that is itself
  * scale-safe: one partial-aggregable groupBy-count (the per-key state is
  * one long), a TakeOrderedAndProject for the head, and integer (ppm)
  * shares so the numbers are engine-portable.
  */
object SkewStats {

  /** The `topN` hottest keys as (key, cnt, share_ppm), hottest first
    * (count desc, key asc — deterministic under ties). share_ppm is the
    * key's row share in parts-per-million, integer `div` — exact and
    * cross-engine stable, no float division.
    */
  def keyProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive: $topN")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = df.select(count(lit(1)).cast("long").as("__nrows"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(cnt * 1000000) div __nrows"))
      .drop("__nrows")
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topN)
  }

  /** One-row skew summary: (n_rows, n_keys, max_cnt, hot_salt) where
    * hot_salt = ceil(max_cnt · partitions / n_rows) — the number of
    * evenly-sized partitions the hottest key alone would fill, i.e. the
    * salt factor [[SkewJoin.saltedJoin]] needs so that key's rows spread
    * instead of pinning one reducer. hot_salt <= 1 means the key fits in
    * one even share: no salting needed. All-integer arithmetic.
    */
  def summary(df: DataFrame, keyCol: String, partitions: Int): DataFrame = {
    require(partitions > 0, s"partitions must be positive: $partitions")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("__cnt"))
      .agg(
        sum("__cnt").cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_keys"),
        max("__cnt").cast("long").as("max_cnt"))
      .withColumn("hot_salt",
        expr(s"(max_cnt * $partitions + n_rows - 1) div n_rows"))
  }
}
