package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-dimension statistics over an embedding column — the feature-prep
  * step (standardization, whitening diagnostics, dead-dimension checks)
  * a training pipeline runs before any vector math. A north-star
  * extension; the reference has no array types at all
  * (/root/reference/src/planner/logicalplan.rs:27-83).
  *
  * Scale shape: ONE aggregate with a constant-size mergeable buffer
  * (count + two length-`dim` arrays) — each executor folds its rows
  * locally and ships 2·dim+1 numbers, like any partial agg. The naive
  * alternative (posexplode + groupBy(dim)) multiplies the row count by
  * `dim` and shuffles all of it; here NOTHING shuffles but the buffers.
  * The single output row explodes driver-free into per-dimension rows.
  *
  * Cross-engine determinism: moments are accumulated on integer
  * "micro-units" — `floor(double(x) * scale)` — so sums are exact and
  * order-independent, and `floor` (unlike half-up/half-even `round`
  * ties) renders identically in every engine. Doubles appear only in
  * [[standardize]], which is a per-row map, not an aggregate.
  */
object VectorStats {

  /** Mergeable (count, Σm, Σm²) buffer over integer micro-unit vectors.
    * Null/ragged inputs are rejected: moments of misaligned dimensions
    * are silent garbage, so fail loudly instead.
    *
    * Σm² CANNOT live in a long at scale: with micro units ~1e6, each m²
    * term is ~1e12, so a long wraps silently at ~9 million rows — far
    * below a production embedding corpus. The accumulator is therefore a
    * hot long partial per dimension plus a BigInt spill total: every row
    * does pure long arithmetic, and the partial drains into the BigInt
    * once per ~4.6e18 of accumulated mass (amortized one BigInt op per
    * ~millions of rows). Output Σm² is decimal(38,0) — exact to 1e38.
    * Σm keeps a long: |m|·rows bounds it, ~9e12 rows at micro 1e6 —
    * beyond any per-aggregation row count this library targets; the
    * per-term require below keeps m² itself inside a long.
    */
  final class VecMoments(dim: Int)
      extends Aggregator[Seq[Long], (Long, Array[Long], Array[Long], Array[Long]),
        (Long, Seq[Long], Seq[String])] {
    import VecMoments.Spill
    override def zero: (Long, Array[Long], Array[Long], Array[Long]) =
      (0L, Array.fill(dim)(0L), Array.fill(dim)(0L), Array.fill(dim)(0L))
    override def reduce(b: (Long, Array[Long], Array[Long], Array[Long]), x: Seq[Long]):
        (Long, Array[Long], Array[Long], Array[Long]) = {
      require(x != null && x.length == dim,
        s"expected vector of dim $dim, got ${if (x == null) "null" else x.length.toString}")
      var i = 0
      while (i < dim) {
        val m = x(i)
        // |m| <= 2e9 keeps m*m <= 4e18, so lo (< Spill = 4.61e18) never
        // overflows mid-add: lo + m*m < 8.6e18 < Long.MaxValue
        require(math.abs(m) <= 2000000000L,
          s"micro unit $m exceeds |2e9| — m*m would overflow a long; lower the scale")
        b._2(i) += m
        b._3(i) += m * m
        while (b._3(i) >= Spill) { b._4(i) += 1L; b._3(i) -= Spill }
        i += 1
      }
      (b._1 + 1, b._2, b._3, b._4)
    }
    override def merge(a: (Long, Array[Long], Array[Long], Array[Long]),
        b: (Long, Array[Long], Array[Long], Array[Long])): (Long, Array[Long], Array[Long], Array[Long]) = {
      var i = 0
      while (i < dim) {
        a._2(i) += b._2(i)
        a._4(i) += b._4(i)
        a._3(i) += b._3(i) // both < Spill, sum < Long.MaxValue
        while (a._3(i) >= Spill) { a._4(i) += 1L; a._3(i) -= Spill }
        i += 1
      }
      (a._1 + b._1, a._2, a._3, a._4)
    }
    // Σm² = hi·Spill + lo, rendered as a decimal string (Catalyst has no
    // unbounded-integer external type for arrays; a string is exact and
    // moments() casts it straight to decimal(38,0)).
    override def finish(b: (Long, Array[Long], Array[Long], Array[Long])): (Long, Seq[Long], Seq[String]) =
      (b._1, b._2.toSeq,
        (0 until dim).map(i => (BigInt(b._4(i)) * Spill + b._3(i)).toString))
    override def bufferEncoder: Encoder[(Long, Array[Long], Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Long], Array[Long], Array[Long])]()
    override def outputEncoder: Encoder[(Long, Seq[Long], Seq[String])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long], Seq[String])]()
  }

  object VecMoments {
    /** Spill chunk for the Σm² carry: lo stays in [0, Spill); each carry
      * is exactly one Spill of mass, so total = hi·Spill + lo exactly.
      */
    private[operators] val Spill: Long = Long.MaxValue / 2
  }

  /** Count + per-dimension Σm only — the lighter buffer for consumers
    * that never read Σm² (k-means centroid recompute, PQ codebook
    * training): no BigInt spill machinery in their hot path. Bound:
    * Σm overflows at ~|m|·9.2e18 total mass (~9e12 rows at micro 1e6).
    */
  final class VecSums(dim: Int)
      extends Aggregator[Seq[Long], (Long, Array[Long]), (Long, Seq[Long])] {
    override def zero: (Long, Array[Long]) = (0L, Array.fill(dim)(0L))
    override def reduce(b: (Long, Array[Long]), x: Seq[Long]): (Long, Array[Long]) = {
      require(x != null && x.length == dim,
        s"expected vector of dim $dim, got ${if (x == null) "null" else x.length.toString}")
      var i = 0
      while (i < dim) { b._2(i) += x(i); i += 1 }
      (b._1 + 1, b._2)
    }
    override def merge(a: (Long, Array[Long]), b: (Long, Array[Long])): (Long, Array[Long]) = {
      var i = 0
      while (i < dim) { a._2(i) += b._2(i); i += 1 }
      (a._1 + b._1, a._2)
    }
    override def finish(b: (Long, Array[Long])): (Long, Seq[Long]) = (b._1, b._2.toSeq)
    override def bufferEncoder: Encoder[(Long, Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Long])]()
    override def outputEncoder: Encoder[(Long, Seq[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long])]()
  }

  /** Integer micro-unit rendering of a float/double array column:
    * element-wise `floor(double(x) * scale)`.
    */
  def microUnits(vec: Column, scale: Long): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Per-dimension exact integer moments of `vecCol` (array<float/double>,
    * fixed dimension `dim`): one row per dimension,
    * (dim, n, sum_micro, sumsq_micro), where micro = floor(x * scale).
    * One constant-buffer aggregate; no row explosion, no data shuffle.
    * `sumsq_micro` is decimal(38,0): a long wraps at ~9M rows of 1e6-scale
    * micros (see [[VecMoments]]); callers that KNOW their scale fits may
    * cast it down, and ANSI mode turns a bad downcast into an error
    * instead of a silent wrap.
    */
  def moments(df: DataFrame, vecCol: Column, dim: Int,
      scale: Long = 1000000L): DataFrame = {
    val agg = udaf(new VecMoments(dim))
    df.select(microUnits(vecCol, scale).as("__m"))
      .agg(agg(col("__m")).as("mo"))
      .select(posexplode(arrays_zip(col("mo._2"), col("mo._3")))
          .as(Seq("dim", "z")),
        col("mo._1").as("__n"))
      .select(col("dim"), col("__n").as("n"),
        col("z._2").cast("long").as("sum_micro"),
        col("z._3").cast("decimal(38,0)").as("sumsq_micro"))
  }

  /** Element-wise z-score standardization of `vecCol`: (x - mean_d) /
    * std_d per dimension, from the exact integer moments (population
    * std; dimensions with zero variance pass through as 0.0 rather than
    * dividing by zero). The per-dimension mean/std table is `dim`-sized
    * — a bounded driver round-trip, same contract as the IVF centroid
    * table (Similarity.scala) — and is folded into the plan as two
    * literal arrays, so standardization itself is a pure per-row map.
    */
  def standardize(df: DataFrame, vecCol: Column, dim: Int,
      scale: Long = 1000000L, outCol: String = "std_vec"): DataFrame = {
    val mo = moments(df, vecCol, dim, scale).orderBy("dim")
      .select(col("n"), col("sum_micro"), col("sumsq_micro"))
      .collect() // dim rows — bounded by construction
    val s = scale.toDouble
    val means = mo.map(r => r.getLong(1).toDouble / r.getLong(0) / s)
    val stds = mo.map { r =>
      val n = r.getLong(0).toDouble
      val mean = r.getLong(1) / n
      // decimal -> double is correctly rounded, identical to the former
      // long -> double conversion wherever the value fits a long
      val varMicro = r.getDecimal(2).doubleValue() / n - mean * mean
      math.sqrt(math.max(varMicro, 0.0)) / s
    }
    val meanArr = array(means.map(lit(_)): _*)
    val stdArr = array(stds.map(lit(_)): _*)
    df.withColumn(outCol,
      zip_with(microUnits(vecCol, scale), sequence(lit(0), lit(dim - 1)),
        (m, i) => {
          val mu = element_at(meanArr, i + 1)
          val sd = element_at(stdArr, i + 1)
          when(sd === 0.0, lit(0.0)).otherwise((m / s - mu) / sd)
        }))
  }
}
