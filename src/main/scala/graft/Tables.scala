package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. One parquet per table under the scale-factor dir
  * (TESTDATA.md). Reads are plain `spark.read.parquet` so Catalyst's column
  * pruning / predicate pushdown reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
      // default (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate to
      // microseconds — the same ns->us truncation DuckDB's reader applies,
      // so oracle comparisons stay exact. `div` keeps the arithmetic in
      // integer space (ns-since-epoch overflows double precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register tables as temp views for SQL-expressed queries. */
  def views(spark: SparkSession, dir: String, tables: String*): Unit = {
    val list = if (tables.isEmpty) names else tables.toSeq
    list.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
  }
}
