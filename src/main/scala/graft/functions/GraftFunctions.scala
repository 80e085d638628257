package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL registration for graft's custom Catalyst expressions, so the same
  * operators are reachable from `spark.sql` text as from the Column API —
  * the registry the reference's name-keyed function nodes implied but never
  * shipped (/root/reference/src/planner/logicalplan.rs:64-80).
  * Idempotent; safe to call per-query on a shared session.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.PushFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.PushFilterThroughAsOfJoin
    }
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("euclidean_dist",
      exprs => EuclideanDistance(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming64",
      exprs => HammingDistance64(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), org.apache.spark.sql.types.LongType)), "built-in")
    reg.createOrReplaceTempFunction("unaccent",
      exprs => Unaccent(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("fingerprint64",
      exprs => Fingerprint64(exprs(0), 42L), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs(0), 42L), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1), "k"), 42L), "built-in")
    reg.createOrReplaceTempFunction("explode_shingles",
      exprs => ExplodeShingles(exprs(0), intArg(exprs(1), "k")), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      exprs => WinnowFingerprints(exprs(0),
        intArg(exprs(1), "k"), intArg(exprs(2), "w"), 42L), "built-in")
    reg.createOrReplaceTempFunction("char_entropy",
      exprs => CharEntropy(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")
  }
}
