package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) outlier detection — the data-quality gate
  * that survives the outliers it is hunting, unlike mean/stddev z-scores
  * which the outliers themselves inflate (Hampel '74; the standard
  * robust-statistics identifier).
  *
  * Scale shape: two grouped EXACT-percentile aggregates (group
  * cardinality is small — the group medians/MADs table is a broadcast
  * side), each a single keyed shuffle of the value column; the flagging
  * pass is a map-side broadcast join + filter. No global sort, no window.
  * For groups too large for exact percentile state, swap in
  * `percentile_approx` — same plan shape, sketch-bounded memory.
  */
object Robust {

  /** Rows of `df` whose `valCol` deviates from its group median by more
    * than `k` times the group MAD (median absolute deviation). Appends
    * `med`, `mad`, `absdev` columns. Comparisons run on unrounded doubles
    * computed with the same operation order in any engine.
    *
    * MAD = 0 (a majority-constant group) degenerates the test — any
    * nonzero deviation, however tiny, would exceed k*0 — so such groups
    * flag NOTHING here; callers wanting a floor can clamp the mad column
    * themselves (the standard Hampel fallback).
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    val withDev = df.join(broadcast(med), groupCol)
      .withColumn("absdev", abs(col(valCol) - col("med")))
    val mad = withDev.groupBy(groupCol)
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    withDev.join(broadcast(mad), groupCol)
      .filter(col("mad") > 0 && col("absdev") > lit(k) * col("mad"))
  }

  /** Rolling z-score anomaly detection — the streaming-monitor shape in
    * batch: each row is scored against the mean/std of its own group's
    * PREVIOUS `k` rows (never itself — no self-masking), over a
    * deterministic (orderCol, tieCol) frame. Appends `n_prev` and `z`
    * (null until the trailing window holds >= 2 rows or when its
    * variance is 0).
    *
    * Scale shape: ONE keyed shuffle (the window partition); the frame
    * sums are O(1)-state sliding aggregates, not per-row rescans.
    *
    * Determinism (the [[Trend]] recipe): `valueInt` MUST be an
    * integer-quantized column — frame sums are then exact longs, and
    * mean/std/z are the same IEEE double expression in every engine, so
    * even the z-scores are oracle-able. Σv² needs |v|·√k < 2^31.5 to
    * stay in long range; quantize accordingly.
    */
  def rollingZScore(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, valueInt: Column, k: Int): DataFrame = {
    require(k >= 2, s"rolling z-score needs a frame of k >= 2, got $k")
    // Spark evaluates a ROWS BETWEEN -k AND -1 frame WITHOUT retraction:
    // each row re-aggregates its k predecessors, O(k)/row. Negligible at
    // monitor-sized k; at large k the prefix-difference form below is the
    // same answer in O(1)/row. Both ride ONE keyed shuffle + sort; the
    // finishing arithmetic is shared, so the two paths are bit-identical
    // (pinned by RobustRollingSpec) and the crossover is an internal
    // detail.
    if (k <= DirectFrameMaxK) rollingZDirect(df, groupCol, orderCol, tieCol, valueInt, k)
    else rollingZPrefix(df, groupCol, orderCol, tieCol, valueInt, k)
  }

  /** Measured crossover (BASELINE.md sf1 soak): direct frame wins on
    * per-row constant factors up to tens of rows; by k=1000 the prefix
    * form is the only sane shape.
    */
  private val DirectFrameMaxK = 64

  private[graft] def rollingZDirect(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, valueInt: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col(orderCol), col(tieCol))
      .rowsBetween(-k, -1)
    val d = df.withColumn("__v", valueInt.cast("long"))
      .withColumn("__n", count(col("__v")).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__ss", sum(col("__v") * col("__v")).over(w))
    finishZ(d)
  }

  /** O(1)/row frame sums at any k: cumulative (sum, sumsq, count) over
    * the same keyed order, frame aggregates as exact-long differences of
    * the cumulants at lag 1 and lag k+1 (frame rows i−k..i−1 =
    * prefix[i−1] − prefix[i−k−1]). Long differences of exact long
    * prefixes equal the directly-summed frame longs, so every downstream
    * IEEE double is unchanged. Same single shuffle + sort — the lag and
    * cumulative expressions share one Window partition/order.
    */
  private[graft] def rollingZPrefix(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, valueInt: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(groupCol).orderBy(col(orderCol), col(tieCol))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def framed(c: Column): Column =
      coalesce(lag(c, 1).over(ord), lit(0L)) -
        coalesce(lag(c, k + 1).over(ord), lit(0L))
    val d = df.withColumn("__v", valueInt.cast("long"))
      .withColumn("__cs", sum(col("__v")).over(cum))
      .withColumn("__css", sum(col("__v") * col("__v")).over(cum))
      .withColumn("__cn", count(col("__v")).over(cum))
      .withColumn("__n", framed(col("__cn")))
      .withColumn("__s", framed(col("__cs")))
      .withColumn("__ss", framed(col("__css")))
      .drop("__cs", "__css", "__cn")
    finishZ(d)
  }

  /** [[rollingZScore]] with BOUNDED per-key window partitions, for LOW
    * key cardinality: the sf1 soak showed the per-key window tail
    * (q_outliers 3.3x, q_events_anomaly 2.8x at 10x data) is parallelism
    * bounded by the synthetic data's 5 event types — one reducer per key,
    * however many executors exist. Here each key's timeline is cut into
    * caller-supplied chunks (`chunkCol`, e.g. `date_trunc("day", ts)`),
    * each (key, chunk) windows independently — parallelism keys x chunks —
    * and frame continuity across the cut is restored by REPLICATING the
    * last `k` rows of each chunk into its successor as context rows
    * (they fill the frame, then are dropped from output). Frame sums are
    * the same exact longs as the global window's, so every z is
    * bit-identical to [[rollingZScore]] (pinned by RobustRollingSpec).
    *
    * Contract: `chunkCol` must be monotone non-decreasing in
    * (`orderCol`, `tieCol`) within each key (any truncation of the order
    * column qualifies), and every non-first chunk's PREDECESSOR must hold
    * at least `k` rows — context ships only across adjacent chunks, so a
    * sparser chunking would starve the successor's first frames (choose
    * chunks >= k rows; `validate = true` runs a cheap (key, chunk)-count
    * pre-check — one partial-aggregated count of the already-shuffled
    * columns — and fails loudly instead of mis-scoring).
    */
  def rollingZScoreChunked(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, valueInt: Column, k: Int, chunkCol: Column,
      validate: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"rolling z-score needs a frame of k >= 2, got $k")
    val base = df.withColumn("__chunk", chunkCol)
    if (validate) {
      val counts = base.groupBy(col(groupCol), col("__chunk"))
        .agg(count(lit(1)).as("__cnt"))
      val w = Window.partitionBy(col(groupCol)).orderBy(col("__chunk"))
      val starved = counts
        .withColumn("__next", lead(col("__chunk"), 1).over(w))
        .filter(col("__next").isNotNull && col("__cnt") < k)
        .limit(1).collect()
      require(starved.isEmpty, {
        val r = starved.head
        s"rollingZScoreChunked: chunk ${r.get(1)} of key ${r.get(0)} has " +
          s"${r.get(2)} rows (< k=$k) and a successor — its context cannot " +
          "fill the successor's first frames; choose coarser chunks"
      })
    }
    // successor chunk per (key, chunk), from the DISTINCT chunk list —
    // a keys x chunks metadata frame, not a raw-row window
    val nextW = Window.partitionBy(col(groupCol)).orderBy(col("__chunk"))
    val nexts = base.select(col(groupCol), col("__chunk")).distinct()
      .withColumn("__next", lead(col("__chunk"), 1).over(nextW))
      .filter(col("__next").isNotNull)
    // context = last k rows of each chunk, re-tagged into the successor
    val lastW = Window.partitionBy(col(groupCol), col("__chunk"))
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    val ctx = base.withColumn("__rn", row_number().over(lastW))
      .filter(col("__rn") <= k).drop("__rn")
      .join(nexts, Seq(groupCol, "__chunk"))
      .withColumn("__chunk", col("__next")).drop("__next")
      .withColumn("__ctx", lit(true))
    val all = base.withColumn("__ctx", lit(false)).unionByName(ctx)
    // the SAME direct frame as rollingZDirect, partitioned by (key, chunk)
    val w = Window.partitionBy(col(groupCol), col("__chunk"))
      .orderBy(col(orderCol), col(tieCol)).rowsBetween(-k, -1)
    val d = all.withColumn("__v", valueInt.cast("long"))
      .withColumn("__n", count(col("__v")).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__ss", sum(col("__v") * col("__v")).over(w))
    finishZ(d).filter(!col("__ctx")).drop("__ctx", "__chunk")
  }

  /** Shared finish: identical IEEE operation order for both frame paths
    * (and the DuckDB oracle, and the streaming monitor).
    */
  private def finishZ(d: DataFrame): DataFrame = {
    // null (not 0) divisor when the frame is empty: the prefix path's
    // coalesced sums are 0 where the direct path's are null, and ANSI
    // mode turns 0/0 into an error rather than the null the guard below
    // would discard anyway
    val n = when(col("__n") > 0, col("__n").cast("double"))
    val mean = col("__s").cast("double") / n
    val variance = col("__ss").cast("double") / n - mean * mean
    val std = sqrt(greatest(variance, lit(0.0)))
    d.withColumn("n_prev", col("__n"))
      .withColumn("z",
        when(col("__n") >= 2 && std > 0.0, (col("__v") - mean) / std))
      .drop("__v", "__n", "__s", "__ss")
  }
}
