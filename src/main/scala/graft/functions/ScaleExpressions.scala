package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Expressions whose whole point is the 100 TB shape: a broadcast-sketch
  * membership predicate (semi-join reduction before the shuffle) and the
  * Morton/Z-order interleave used for multi-dimensional data layout.
  *
  * North-star scale surface; no trace in the reference (its function node
  * carries a bare name and is rejected at typing time,
  * /root/reference/src/planner/logicalplan.rs:64-71, :88).
  */
private[graft] object ZOrderImpl {

  /** Spread the low 16 bits of v to the even bit positions of a long —
    * the standard Morton-code bit-twiddle (public domain construction,
    * e.g. Bit Twiddling Hacks "Interleave bits by Binary Magic Numbers").
    */
  def spread16(v: Int): Long = {
    var x = (v & 0xffff).toLong
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Z-value of (x, y): 32-bit Morton interleave of the two low-16-bit
    * halves (x on even bits, y on odd bits).
    */
  def interleave16(x: Int, y: Int): Long =
    spread16(x) | (spread16(y) << 1)
}

/** Morton/Z-order interleave of two int columns' low 16 bits.
  *
  * Sorting (or range-partitioning) a table by this value before writing
  * gives multi-dimensional data clustering: a scan filtered on EITHER
  * dimension touches O(sqrt) of the files instead of all of them, because
  * nearby (x, y) points land in nearby z-ranges. That file-skipping is
  * what makes a 100 TB table selectively readable on two axes at once —
  * the same layout trick Delta/Iceberg's OPTIMIZE ZORDER applies.
  * Codegen'd; inputs outside [0, 65535] contribute their low 16 bits.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == IntegerType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects (int, int), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderImpl.interleave16(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderImpl.interleave16($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Membership test of a long key against a pre-built Bloom filter — the
  * executor side of a semi-join reduction.
  *
  * The filter is built once over the (much smaller) build side, shipped to
  * every task inside the expression (`bytes` rides the serialized plan;
  * ~1.2 MB/M keys at 1% fpp), and applied as a codegen'd scan-side
  * predicate — so at 100 TB the probe side sheds non-matching rows BEFORE
  * the shuffle instead of after it. False positives (rate = fpp) survive
  * the predicate and MUST be removed by the exact join that follows; this
  * expression alone is a reduction, not a join.
  */
case class BloomMightContainLong(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bytes)

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects bigint key, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one deserialized filter per codegen'd stage, referenced (not
    // re-parsed) per row
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  // Array[Byte] case-class fields compare by reference; content equality
  // keeps Catalyst canonicalization (CSE, exchange reuse, plan cache)
  // working for logically identical predicates.
  override def equals(o: Any): Boolean = o match {
    case b: BloomMightContainLong =>
      child == b.child && java.util.Arrays.equals(bytes, b.bytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bytes)
}
