package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two numeric vectors, as a native Catalyst
  * expression with whole-stage codegen.
  *
  * The reference has no vector operations at all (its ScalarFunction node
  * ships zero functions, /root/reference/src/planner/logicalplan.rs:64-71);
  * this is north-star surface for embedding similarity search. A
  * higher-order-function formulation (aggregate(zip_with(...))) computes the
  * same thing but breaks whole-stage codegen and allocates per row — at
  * 100 TB the fused loop below is the difference between scan-bound and
  * CPU-bound.
  *
  * Accumulation is in double regardless of input element type, matching
  * what a DuckDB list_cosine_similarity over DOUBLE[] computes, so oracle
  * rank comparisons agree.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {


  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall { e =>
      e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _                                    => false
      }
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float> or array<double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xIsFloat = elemType(left) == FloatType
    val yIsFloat = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getX = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getY = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.$getX($i);
         |  double y = (double) $b.$getY($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product, same codegen structure as [[CosineSimilarity]] — used by the
  * LSH hyperplane bucketing path where vectors are pre-normalized.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def getter(e: Expression): String =
    if (e.dataType.asInstanceOf[ArrayType].elementType == FloatType) "getFloat" else "getDouble"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val yf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.${getter(left)}($i)) * ((double) $b.${getter(right)}($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance between two numeric vectors — same fused-loop
  * codegen shape as [[CosineSimilarity]]; sequential double accumulation in
  * index order, matching DuckDB's list_distance for oracle comparison.
  */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def getter(e: Expression): String =
    if (e.dataType.asInstanceOf[ArrayType].elementType == FloatType) "getFloat"
    else "getDouble"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"euclidean_dist expects array<float> or array<double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xF = getter(left) == "getFloat"
    val yF = getter(right) == "getFloat"
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = (if (xF) x.getFloat(i).toDouble else x.getDouble(i)) -
        (if (yF) y.getFloat(i).toDouble else y.getDouble(i))
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = ((double) $a.${getter(left)}($i)) - ((double) $b.${getter(right)}($i));
         |  $acc += d * d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All sign-LSH bucket ids for a vector in ONE fused pass: `nTables`
  * independent tables of `nPlanes` hyperplanes each, bucket bit p set iff
  * dot(vec, plane_p) > 0. Returns array<long> of length nTables.
  *
  * Replaces nTables*nPlanes separate dot-product-vs-literal expressions —
  * whose generated code re-reads the vector and boxes a literal array per
  * plane — with a triple loop over one flat coefficient table
  * (nTables*nPlanes*dim doubles, shipped once via a codegen reference).
  * Plane values are identical to Similarity.hyperplanes(nPlanes, dim,
  * tableSeed(t)) so bucket ids match the composed form bit-for-bit.
  */
case class SignLshBuckets(child: Expression, nPlanes: Int, nTables: Int,
    dim: Int, seed: Long, tableSeedStride: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(nPlanes > 0 && nPlanes <= 63, "nPlanes must be in [1, 63]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_lsh_buckets expects array<float|double>, got ${other.simpleString}")
    }

  private def getter: String =
    if (child.dataType.asInstanceOf[ArrayType].elementType == FloatType) "getFloat"
    else "getDouble"

  /** Flat [t][p][i] coefficient table, matching Similarity.hyperplanes. */
  private lazy val coef: Array[Double] = {
    val out = new Array[Double](nTables * nPlanes * dim)
    var t = 0
    while (t < nTables) {
      val s = seed + t * tableSeedStride
      var p = 0
      while (p < nPlanes) {
        var i = 0
        while (i < dim) {
          val bits = graft.functions.Hashing64.splitmix(s + p.toLong * dim + i)
          out((t * nPlanes + p) * dim + i) = bits.toDouble / Long.MaxValue.toDouble
          i += 1
        }
        p += 1
      }
      t += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val isFloat = getter == "getFloat"
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var dot = 0.0
        val base = (t * nPlanes + p) * dim
        var i = 0
        while (i < n) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += x * coef(base + i)
          i += 1
        }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val coefRef = ctx.addReferenceObj("lshCoef", coef, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val t = ctx.freshName("t"); val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val bucket = ctx.freshName("bucket")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $dim);
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    double $dot = 0.0;
         |    int $base = ($t * $nPlanes + $p) * $dim;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ((double) $c.$getter($i)) * $coefRef[$base + $i];
         |    }
         |    if ($dot > 0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
