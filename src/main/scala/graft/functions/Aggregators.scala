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

  /** Bounded top-k smallest values as a sorted array — a merge-able sketch
    * of the distribution head; k values per buffer regardless of input
    * size.
    */
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
