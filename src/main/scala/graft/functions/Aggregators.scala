package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates — the UDAF surface the reference's
  * `AggregateFunction{name, args, return_type}` node promised but rejected
  * at typing time ("Aggregation is currently not supported",
  * /root/reference/src/planner/logicalplan.rs:73-80, :88).
  *
  * Implemented as `Aggregator[IN, BUF, OUT]`: merge-able buffers make them
  * partial-aggregation-friendly (map-side combine, then buffer merge at the
  * reducer) — the property that makes a custom aggregate scale like a
  * built-in.
  */
object Aggregators {

  /** Geometric mean: exp(mean(ln x)) over positive inputs; zero/negative
    * inputs are ignored (standard convention).
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0.0) (b._1 + math.log(x), b._2 + 1) else b
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Misra-Gries frequent-items sketch over string keys (Misra & Gries
    * '82; merge rule from Agarwal et al., "Mergeable Summaries", PODS '12).
    *
    * Buffer: at most `capacity` counters. Guarantee after any sequence of
    * reduces and merges: every key with true count > N/(capacity+1) is
    * present in the final buffer (counts may be UNDER-estimated by up to
    * N/(capacity+1), never over). So the finish output is a candidate
    * SUPERSET for any threshold above that bound — pair with an exact
    * counting pass over just the candidates to get exact heavy hitters
    * ([[graft.operators.HeavyHitters]]).
    *
    * Scale shape: constant-size buffers regardless of input size, fully
    * merge-able (map-side partials, one reducer merge) — the property that
    * lets one pass over 100 TB produce a bounded candidate set.
    */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(capacity > 0, "MisraGries capacity must be positive")

    /** Reduce-to-capacity (Mergeable Summaries): subtract the
      * (capacity+1)-th largest count from every counter, drop the
      * exhausted ones. Applied in BATCHES — buffers may grow to
      * 2*capacity between shrinks, amortizing the O(buffer) pass over
      * >= capacity insertions (O(1) amortized per row, vs the classic
      * per-row decrement's O(capacity) on every non-resident row). Total
      * subtracted mass per key stays <= N/(capacity+1), so the superset
      * guarantee is unchanged.
      */
    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= capacity) m
      else {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        m.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
      }

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] = {
      val m = b.updated(x, b.getOrElse(x, 0L) + 1)
      if (m.size > 2 * capacity) shrink(m) else m
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      shrink(b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      })

    override def finish(b: Map[String, Long]): Seq[String] =
      shrink(b).keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Bounded top-k smallest values as a sorted array — a merge-able sketch
    * of the distribution head; k values per buffer regardless of input
    * size.
    */
  /** Grouped top-k as a merge-able bounded sketch: the k largest
    * (value, id) pairs per group, value-desc then id-asc (the id is the
    * deterministic tie-break). Buffers hold at most k pairs regardless
    * of group size, so partial aggregation reduces map-side and the
    * shuffle carries ≤ k pairs per (group, map task) — grouped top-k
    * WITHOUT the per-group window sort that would shuffle every row.
    */
  final class TopKPairs(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private def top(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
      xs.sortBy { case (v, id) => (-v, id) }.take(k)
    override def zero: Seq[(Long, Long)] = Vector.empty
    override def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
      top(b :+ x)
    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      top(a ++ b)
    override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  final class BottomK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(b: Seq[Double], x: Double): Seq[Double] =
      (b :+ x).sorted.take(k)
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      (a ++ b).sorted.take(k)
    override def finish(b: Seq[Double]): Seq[Double] = b
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
