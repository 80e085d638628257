package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark-side program plus (when SQL-expressible)
  * the ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  *
  * Determinism rules (FIXTURES.md §5): every oracle-matched query ends in an
  * ORDER BY with a unique tie-break; float aggregations go through exact
  * integer arithmetic (integral doubles, or cents via round(x*100)) so
  * summation order cannot perturb the hash.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
