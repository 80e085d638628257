package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration point for graft's custom Catalyst expressions, so they are
  * callable from SQL (`expr("cosine_sim(a, b)")`) as well as the Column API.
  * Idempotent; safe to call per-query on a shared session.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    // Filled in as custom expressions land (cosine_sim, minhash_sig, ...).
  }
}
