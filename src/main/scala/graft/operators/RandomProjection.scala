package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse signed random projection (Johnson–Lindenstrauss) for embedding
  * compression — the map-side-only dimensionality reduction that runs
  * BEFORE any ANN index build at corpus scale (project 64→16 dims, then
  * index the short vectors; 4× less shuffle volume and state everywhere
  * downstream).
  *
  * Weights follow Achlioptas (JCSS '03, "Database-friendly random
  * projections"): w(i,j) ∈ {+1, −1, 0} with P = {1/6, 1/6, 2/3}, drawn
  * here DETERMINISTICALLY from md5("rp|seed|i|j") so any engine — Spark,
  * DuckDB, a feature store backfill — derives the identical matrix from
  * the seed string alone; nothing is shipped but the seed. Inputs are
  * floored to integer micros before the fold, so every projected
  * coordinate is an exact long and the operator is hash-stable across
  * partitionings and engines (FIXTURES.md §5).
  *
  * Scale shape: the d×d' matrix is a few KB of driver-computed literals
  * (bounded by contract, data-independent); the projection itself is one
  * codegen'd HOF fold per output dim riding the scan — zero shuffle,
  * zero state, embarrassingly parallel on a 1000-executor cluster.
  *
  * North-star extension; no counterpart in the reference (its algebra
  * ends at scan/filter/project/sort/limit, logicalplan.rs:207-273).
  */
object RandomProjection {

  /** The signed ternary weight for input dim i → output dim j: first 8
    * hex chars of md5("rp|seed|i|j") as an unsigned 32-bit value, mod 6;
    * 0 → +1, 1 → −1, 2..5 → 0 (Achlioptas √3-sparse scheme, the √3
    * factor dropped since downstream distances only need a consistent
    * scale).
    */
  def weight(seed: String, i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp|$seed|$i|$j".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 6 match {
      case 0 => 1
      case 1 => -1
      case _ => 0
    }
  }

  /** Project `vecCol` (array<float|double>, length `dimIn`) to `dimOut`
    * exact-long coordinates `p00..p<dimOut-1>` appended to `idCol`.
    * Each output dim is an `aggregate(zip_with(...))` fold over the
    * micro-quantized input — whole-stage-codegen'd, no UDF.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      dimIn: Int, dimOut: Int, seed: String): DataFrame = {
    require(dimOut > 0 && dimOut <= 64, "dimOut must be in 1..64")
    val micros: Column = transform(col(vecCol),
      x => floor(x.cast("double") * lit(1e6)).cast("long"))
    val projCols = (0 until dimOut).map { j =>
      val w = array((0 until dimIn).map(i => lit(weight(seed, i, j).toLong)): _*)
      aggregate(
        zip_with(micros, w, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as(f"p$j%02d")
    }
    df.select(col(idCol) +: projCols: _*)
  }

  /** The DuckDB mirror of [[weight]] as a SQL scalar — `iExpr`/`jExpr`
    * are SQL fragments (a literal or a lambda variable), so an oracle can
    * RE-DERIVE the whole matrix itself inside a `list_transform` instead
    * of trusting Scala-side literals. Lives here so the weight rule has
    * exactly one definition per engine.
    */
  def weightSql(seed: String, iExpr: String, jExpr: String): String =
    s"(CASE (CAST('0x' || substr(md5('rp|$seed|' || ($iExpr) || '|' || ($jExpr)), 1, 8) AS BIGINT) % 6)" +
      " WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END)"
}
