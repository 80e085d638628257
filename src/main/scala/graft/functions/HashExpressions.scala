package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared 64-bit hashing helpers for the dedup/fingerprint expressions.
  *
  * Everything is seeded xxHash64 (Spark's own XXH64 implementation) plus
  * splitmix64-derived universal-hash coefficients — standard public
  * constructions (Broder '97 minwise hashing; Charikar '02 simhash).
  */
private[graft] object Hashing64 {
  def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUTF8String(s, seed)

  /** splitmix64 — deterministic stream of well-mixed 64-bit constants. */
  def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** MinHash signature: array of k minwise hashes over a token array.
  *
  * One xxHash64 per token, then k universal-hash rotations
  * (g_i(h) = a_i*h + b_i) — O(tokens + k*tokens cheap multiplies), not k
  * full rehashes. Each signature slot is the min over tokens, so the
  * collision probability of slot i between two documents equals their
  * Jaccard similarity — the estimator LSH banding builds on.
  *
  * North-star operator; no trace in the reference (SURVEY.md §2.4-2.10:
  * no functions exist, logicalplan.rs:64-71).
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Reachable from SQL via the registered minhash_sig — reject non-token
  // inputs at analysis time, not with an executor ClassCastException.
  // array<bigint> is the documented pre-hashed-token form, not an accident.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string> tokens or array<bigint> " +
            s"pre-hashed tokens, got ${other.simpleString}")
    }

  /** Input is either array<string> tokens (hashed here) or array<long>
    * pre-hashed tokens (e.g. from [[HashedShingles]] — used as-is).
    */
  private lazy val preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  private lazy val as: Array[Long] =
    Array.tabulate(k)(i => Hashing64.splitmix(seed + 2L * i) | 1L) // odd multiplier
  private lazy val bs: Array[Long] =
    Array.tabulate(k)(i => Hashing64.splitmix(seed + 2L * i + 1))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = if (preHashed) arr.getLong(j)
          else Hashing64.hashUtf8(arr.getUTF8String(j), seed)
        var i = 0
        while (i < k) {
          val g = as(i) * h + bs(i)
          if (g < mins(i)) mins(i) = g
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    val hExpr = (c: String, j: String) =>
      if (preHashed) s"$c.getLong($j)"
      else s"org.apache.spark.sql.catalyst.expressions.XXH64" +
        s".hashUTF8String($c.getUTF8String($j), ${seed}L)"
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins"); val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val g = ctx.freshName("g")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $h = ${hExpr(c, j)};
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $g = $asRef[$i] * $h + $bsRef[$i];
         |      if ($g < $mins[$i]) $mins[$i] = $g;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a token array (Charikar '02): per-token 64-bit hash,
  * signed bit-vote accumulation, sign -> bit. Documents within small Hamming
  * distance are near-duplicates.
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // Same analysis-time guard as MinHashSignature (SQL-reachable via
  // simhash64); array<bigint> means pre-hashed tokens by contract.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string> tokens or array<bigint> " +
            s"pre-hashed tokens, got ${other.simpleString}")
    }

  /** array<string> tokens (hashed here) or array<long> pre-hashed tokens. */
  private lazy val preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = if (preHashed) arr.getLong(j)
          else Hashing64.hashUtf8(arr.getUTF8String(j), seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hExpr = (c: String, j: String) =>
      if (preHashed) s"$c.getLong($j)"
      else s"org.apache.spark.sql.catalyst.expressions.XXH64" +
        s".hashUTF8String($c.getUTF8String($j), ${seed}L)"
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes"); val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $h = ${hExpr(c, j)};
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two 64-bit hashes — codegen'd to a single
  * Long.bitCount, so simhash near-dup joins stay inside whole-stage codegen.
  */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Whole-document 64-bit fingerprint: xxHash64 of the UTF-8 bytes. */
case class Fingerprint64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Hashing64.hashUtf8(v.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.XXH64" +
        s".hashUTF8String($c, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD '03): rolling
  * k-gram hashes over the character stream, minimum per window of w,
  * deduplicated + sorted. The canonical local-fingerprint set for
  * plagiarism/near-dup detection; emitted as array<long> so set overlap is
  * a plain array_intersect.
  */
object WinnowHash {
  def fingerprints(v: UTF8String, k: Int, w: Int, seed: Long): ArrayData = {
    val bytes = v.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = seed
      var j = 0
      while (j < k) { h = (h ^ bytes(i + j)) * 0x100000001b3L; j += 1 }
      grams(i) = Hashing64.splitmix(h)
      i += 1
    }
    // min per sliding window of w
    val out = scala.collection.mutable.TreeSet.empty[Long]
    var s = 0
    val lastStart = math.max(0, m - w)
    while (s <= lastStart) {
      var best = Long.MaxValue
      var j = s
      val end = math.min(s + w, m)
      while (j < end) { if (grams(j) < best) best = grams(j); j += 1 }
      out += best
      s += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowHash.fingerprints(v.asInstanceOf[UTF8String], k, w, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.WinnowHash.fingerprints($c, $k, $w, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** NFD-decompose + drop combining marks: 'Çafé' -> 'Cafe'. The standard
  * accent-fold step of text normalization pipelines (DuckDB strip_accents,
  * Postgres unaccent). Static so whole-stage codegen can call it directly.
  */
object TextNorm {
  def unaccent(s: UTF8String): UTF8String = {
    val str = s.toString
    if (!java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFD)) {
      strip(java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD))
    } else if (hasMark(str)) strip(str)
    else s // fast path: already mark-free ASCII-ish text, zero-copy
  }
  private def hasMark(str: String): Boolean = {
    var i = 0
    while (i < str.length) {
      if (Character.getType(str.charAt(i)) == Character.NON_SPACING_MARK) return true
      i += 1
    }
    false
  }
  private def strip(norm: String): UTF8String = {
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val ch = norm.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Accent folding as a codegen'd unary expression over strings. */
case class Unaccent(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    TextNorm.unaccent(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.unaccent($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Intersection size of two SORTED long arrays by linear merge — the hot
  * inner loop of Jaccard verification. Replaces array_intersect's
  * per-invocation hash-set build (one allocation + ~n hash probes per
  * pair) with an allocation-free two-pointer scan inside whole-stage
  * codegen. Inputs MUST be sorted ascending (sort once per document,
  * merge per pair).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects array<bigint>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m"); val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long xv = $a.getLong($i); long yv = $b.getLong($j);
         |  if (xv < yv) $i++;
         |  else if (xv > yv) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shannon entropy (bits/char) over a string's code-point distribution —
  * a cheap, language-agnostic quality signal (low entropy = repetitive /
  * boilerplate text; the complement of the Gopher repetition rules). One
  * pass to count code points, one deterministic pass over the sorted
  * frequency map, all inside codegen — no explode/groupBy per document.
  */
object CharEntropyImpl {
  def entropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) 0.0
    else {
      val counts = new java.util.TreeMap[Integer, Integer]()
      var i = 0; var total = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        val old = counts.get(cp)
        counts.put(cp, if (old == null) 1 else old + 1)
        total += 1
        i += Character.charCount(cp)
      }
      var h = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / total
        h -= p * (math.log(p) / math.log(2.0))
      }
      h
    }
  }
}

case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    CharEntropyImpl.entropy(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyImpl.entropy($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused thresholded Jaccard over SORTED long arrays: ONE two-pointer merge
  * per pair computing jac = |A∩B| / |A∪B| exactly, with a positional
  * early-exit (Xiao et al., WWW '08 PPJoin's suffix bound): once
  * c + min(remaining_a, remaining_b) can no longer reach
  * ceil(t·(n+m)/(1+t)) — the overlap a pair needs for jac >= t — the merge
  * aborts and returns -1. Composing size/intersect/divide as separate
  * expressions evaluates the merge more than once per pair (no common
  * subexpression elimination across a BNL join's filter + project);
  * fusing makes the all-pairs verification a single bounded scan.
  * Completed merges return the same double division as the composed form,
  * so threshold comparisons are bit-identical to the oracle's.
  */
case class BoundedJaccard(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_jaccard expects sorted array<bigint>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 && m == 0) 1.0
    else {
      // floor underestimates the true requirement -> abort is conservative
      val cmin = math.floor(threshold * (n + m) / (1.0 + threshold)).toInt
      var i = 0; var j = 0; var c = 0
      var jac = -1.0
      var done = false
      while (!done && i < n && j < m) {
        val xi = x.getLong(i); val yj = y.getLong(j)
        if (xi < yj) i += 1
        else if (xi > yj) j += 1
        else { c += 1; i += 1; j += 1 }
        if (c + math.min(n - i, m - j) < cmin) done = true
      }
      if (!done) jac = c.toDouble / (n + m - c)
      jac
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val cmin = ctx.freshName("cmin")
      val done = ctx.freshName("done")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |if ($n == 0 && $m == 0) {
         |  ${ev.value} = 1.0;
         |} else {
         |  int $cmin = (int) Math.floor($threshold * ($n + $m) / (1.0 + $threshold));
         |  int $i = 0, $j = 0, $c = 0;
         |  boolean $done = false;
         |  while (!$done && $i < $n && $j < $m) {
         |    long xv = $a.getLong($i); long yv = $b.getLong($j);
         |    if (xv < yv) $i++;
         |    else if (xv > yv) $j++;
         |    else { $c++; $i++; $j++; }
         |    if ($c + Math.min($n - $i, $m - $j) < $cmin) $done = true;
         |  }
         |  ${ev.value} = $done ? -1.0 : ((double) $c) / ($n + $m - $c);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PPJoin-style prefix filter over SORTED long arrays (Xiao et al.,
  * WWW '08; Chaudhuri et al., ICDE '06 SSJoin): for Jaccard >= t the
  * required overlap is alpha_a = ceil(t*|A|) (since |A∪B| >= |A|), and any
  * pair with |A∩B| >= alpha must share its SMALLEST common element within
  * the first |A|-alpha_a+1 elements of A and |B|-alpha_b+1 of B. Disjoint
  * prefixes therefore prove jac < t — an O(prefix) reject (~(1-t) of a
  * full merge) that never drops a true pair. Used between the cheap
  * size-ratio bound and the full two-pointer merge in all-pairs Jaccard.
  */
case class PrefixOverlap(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {

  // threshold <= 0 would make the prefix bound n+1 and read past the array
  // (UnsafeArrayData does no bounds check — silent garbage reads).
  require(threshold > 0.0 && threshold <= 1.0,
    s"prefix_overlap threshold must be in (0, 1], got $threshold")

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"prefix_overlap expects sorted array<bigint>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 || m == 0) n == 0 && m == 0
    else {
      // Epsilon-guarded ceil: double rounding can push an exact integer
      // product (e.g. 0.9*10) infinitesimally above its true value, which
      // would shorten the prefix by 1 and drop pairs whose Jaccard equals
      // the threshold exactly. Clamp keeps the bound within the array even
      // if the arithmetic still surprises.
      val pa = math.min(n, n - math.ceil(threshold * n - 1e-9).toInt + 1)
      val pb = math.min(m, m - math.ceil(threshold * m - 1e-9).toInt + 1)
      var i = 0; var j = 0; var found = false
      while (!found && i < pa && j < pb) {
        val xi = x.getLong(i); val yj = y.getLong(j)
        if (xi < yj) i += 1
        else if (xi > yj) j += 1
        else found = true
      }
      found
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val pa = ctx.freshName("pa"); val pb = ctx.freshName("pb")
      val found = ctx.freshName("found")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |boolean $found;
         |if ($n == 0 || $m == 0) {
         |  $found = ($n == 0 && $m == 0);
         |} else {
         |  int $pa = Math.min($n, $n - (int) Math.ceil($threshold * $n - 1e-9) + 1);
         |  int $pb = Math.min($m, $m - (int) Math.ceil($threshold * $m - 1e-9) + 1);
         |  $found = false;
         |  int $i = 0, $j = 0;
         |  while (!$found && $i < $pa && $j < $pb) {
         |    long xv = $a.getLong($i); long yv = $b.getLong($j);
         |    if (xv < yv) $i++;
         |    else if (xv > yv) $j++;
         |    else $found = true;
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Character k-gram shingle generator — a custom Catalyst `Generator`
  * (UDTF): one output row per shingle position, produced lazily instead of
  * materializing a per-document array first. The last of the reference's
  * implied extension points (scalar / aggregate / table function; its
  * name-keyed function nodes never shipped any,
  * /root/reference/src/planner/logicalplan.rs:64-80).
  *
  * Laziness is the scale point: `transform(sequence(...))` materializes
  * every shingle of a document in memory before exploding; this iterator
  * hands Spark one row at a time, so a 1 MB document never allocates its
  * ~1M-element shingle array.
  */
case class ExplodeShingles(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {

  require(k > 0, "shingle length must be positive")

  override def elementSchema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("pos", IntegerType, nullable = false)
      .add("shingle", StringType, nullable = false)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow):
      scala.collection.IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString
      val n = math.max(s.length - k + 1, 0)
      new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < n
        override def next(): org.apache.spark.sql.catalyst.InternalRow = {
          val row = org.apache.spark.sql.catalyst.InternalRow(
            i, UTF8String.fromString(s.substring(i, i + k)))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Byte-level rolling shingle hasher: xxhash64 of every k-byte window of
  * the UTF-8 payload, sorted + deduplicated. Produces exactly the same
  * hash set as `sort_array(array_distinct(transform(<substrings>,
  * xxhash64)))` on ASCII text (XXH64 over the same byte slices, same
  * seed), but allocates no substring objects and no intermediate arrays —
  * one long[] per document. On a shingling-heavy near-dedup pass this is
  * the difference between allocation-bound and hash-bound. Windows are
  * BYTE windows: on multi-byte UTF-8 they may split code points (set
  * semantics still consistent engine-side; char-exact oracles assume
  * ASCII, which this corpus is).
  */
object ShingleHash {
  def hashedShingles(s: UTF8String, k: Int, seed: Long): ArrayData = {
    val n = s.numBytes() - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = XXH64.hashUnsafeBytes(base, off + i, k, seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }
}

/** Sorted distinct k-byte-window hashes of a string (codegen'd through a
  * single static call). Drop-in replacement for the substring-based
  * shingle chain wherever only hash-set identity matters (Jaccard,
  * MinHash, winnowing-style overlap).
  */
case class HashedShingles(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  require(k > 0, "shingle length must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ShingleHash.hashedShingles(v.asInstanceOf[UTF8String], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.ShingleHash.hashedShingles($c, $k, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Byte-level whitespace tokenizer + hasher: xxhash64 of each
  * ASCII-lowercased whitespace-delimited token, in document order (NOT
  * deduplicated — SimHash weights repeated tokens by their count). Produces
  * exactly the hash values of `transform(split(lower(text), '\\s+'),
  * xxhash64)` on ASCII text, with no string or array materialization.
  */
object WordHash {
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == '\f'

  def hashedWords(s: UTF8String, seed: Long): ArrayData = {
    val n = s.numBytes()
    val buf = new Array[Byte](n)
    org.apache.spark.unsafe.Platform.copyMemory(
      s.getBaseObject, s.getBaseOffset, buf,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, n)
    var i = 0
    while (i < n) { // ASCII lowercase in place
      val b = buf(i)
      if (b >= 'A' && b <= 'Z') buf(i) = (b + 32).toByte
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    i = 0
    while (i < n) {
      while (i < n && isSpace(buf(i))) i += 1
      val start = i
      while (i < n && !isSpace(buf(i))) i += 1
      if (i > start) {
        out += XXH64.hashUnsafeBytes(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, seed)
      }
    }
    new GenericArrayData(out.result())
  }
}

/** Rolling polynomial combine of every length-`n` window of an
  * array<bigint> of element hashes: out(i) = Σ_j h(i+j)·M^(n-1-j) in
  * wrapping 64-bit arithmetic (Rabin-Karp, CACM '87). O(tokens) total — a
  * per-window rebuild is O(tokens·n), and hashing n-gram STRINGS is
  * O(bytes·n) plus allocation; this slides in pure long arithmetic with
  * one multiply-subtract-add per position. Collision quality is that of
  * the input hashes (64-bit), which decontamination/dedup joins tolerate
  * by design.
  */
object RollingHash {
  val M = 1000003L

  def ngrams(hs: ArrayData, n: Int): ArrayData = {
    val len = hs.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    var mPow = 1L // M^(n-1), wrapping
    var j = 1
    while (j < n) { mPow *= M; j += 1 }
    val out = new Array[Long](len - n + 1)
    var acc = 0L
    var i = 0
    while (i < n) { acc = acc * M + hs.getLong(i); i += 1 }
    out(0) = acc
    while (i < len) {
      acc = (acc - hs.getLong(i - n) * mPow) * M + hs.getLong(i)
      out(i - n + 1) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Window hashes of every n-gram of a pre-hashed token array (codegen'd;
  * see [[RollingHash]]).
  */
case class NgramPolyHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"n-gram length must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_poly_hashes expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    RollingHash.ngrams(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.RollingHash.ngrams($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hashed word tokens of a string (codegen'd; see [[WordHash]]). */
case class HashedWords(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordHash.hashedWords(v.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.WordHash.hashedWords($c, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
