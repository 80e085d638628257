package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named query here; the
  * driver dumps each result at sf0.01 and hash-compares against the DuckDB
  * oracle SQL. Queries live in graft.queries.* grouped by surface area.
  */
object SparkEntry {

  private lazy val registry: Seq[Q] =
    CoreQueries.all ++ RelationalQueries.all ++ PipelineQueries.all ++ AdvancedQueries.all ++ FunctionQueries.all ++ TpchQueries.all ++ ScaleQueries.all ++ WarehouseQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end curation pipeline — quality gates → exact dedup →
    * 13-gram decontamination → sequence packing — composed from the
    * library operators into one Catalyst plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_curation_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
