package graft.queries

/** DuckDB SQL fragments that mirror the repo's vector expressions
  * BIT-FOR-BIT, for oracling the LSH / IVF approximate-search queries.
  *
  * Why this is exact: the Catalyst expressions (`CosineSimilarity`,
  * `SignLshBuckets`, `VectorExpressions.scala`) accumulate in double with a
  * single ascending loop starting from 0.0. DuckDB's `list_reduce` folds
  * sequentially left-to-right with the first element as the seed, and IEEE
  * `0.0 + a == a` exactly, so the fold parenthesization — and therefore
  * every intermediate double bit — is identical. Hyperplane coefficients
  * are embedded as shortest-round-trip literals (`Double.toString`), which
  * any correctly-rounded parser (DuckDB uses one) reads back to the same
  * bits. The result: bucket ids, cell assignments and similarity ranks are
  * re-derived in DuckDB from first principles, independent of this repo's
  * execution, yet agree on every bit.
  */
object OracleVec {

  /** Sequential left fold `((x1 op x2) op x3) ...` — the SQL twin of the
    * expressions' ascending accumulation loop.
    */
  private def foldSum(listExpr: String): String =
    s"list_reduce($listExpr, (acc, el) -> acc + el)"

  /** dot(a, b) with Spark's accumulation order. */
  def dotSql(a: String, b: String): String =
    foldSum(s"list_transform(list_zip($a, $b), zz -> zz[1] * zz[2])")

  private def norm2Sql(a: String): String =
    foldSum(s"list_transform($a, xx -> xx * xx)")

  /** cosine_sim(a, b) == CosineSimilarity.nullSafeEval bit-for-bit:
    * dot / sqrt(na * nb), 0.0 on a zero-norm side.
    */
  def cosSql(a: String, b: String): String =
    s"""(CASE WHEN ${norm2Sql(a)} = 0.0 OR ${norm2Sql(b)} = 0.0 THEN 0.0
       | ELSE ${dotSql(a, b)} / sqrt(${norm2Sql(a)} * ${norm2Sql(b)}) END)""".stripMargin

  /** Σ(a_i - b_i)² with Spark's accumulation order — the inner sum of
    * `EuclideanDistance` and of `Pq.lutExpr`'s per-codeword fold.
    */
  def sqDiffSql(a: String, b: String): String =
    foldSum(s"list_transform(list_zip($a, $b), zz -> (zz[1] - zz[2]) * (zz[1] - zz[2]))")

  /** euclidean_dist(a, b) == the codegen'd expression bit-for-bit. */
  def euclidSql(a: String, b: String): String =
    s"sqrt(${sqDiffSql(a, b)})"

  /** One hyperplane as a DOUBLE[] literal. `Double.toString` emits the
    * shortest decimal that round-trips, so DuckDB re-reads the exact bits.
    */
  private def planeLit(plane: Array[Double]): String =
    plane.map(java.lang.Double.toString).mkString("[", ", ", "]")

  /** Sign-LSH bucket id of DOUBLE[] column `v` for one table — the SQL twin
    * of `SignLshBuckets` (same splitmix-derived planes, same dot order,
    * same strict `> 0` sign test).
    */
  def lshBucketSql(v: String, nPlanes: Int, dim: Int, tableSeed: Long): String =
    graft.operators.Similarity.hyperplanes(nPlanes, dim, tableSeed)
      .zipWithIndex.map { case (plane, p) =>
        s"(CASE WHEN ${dotSql(v, planeLit(plane))} > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString("(", " + ", ")")
}
