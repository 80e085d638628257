package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GraftSources

class SourcesSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$name").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("csv round-trip preserves rows and values") {
    val df = Tables.t(spark, sf, "nation")
    val path = tmp("csv")
    GraftSources.writeCsv(df, path)
    val back = GraftSources.readCsv(spark, path,
      schema = Some(df.schema))
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("json round-trip preserves rows and values") {
    val df = Tables.t(spark, sf, "region")
    val path = tmp("json")
    GraftSources.writeJson(df, path)
    val back = GraftSources.readJson(spark, path, schema = Some(df.schema))
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      df.orderBy("r_regionkey").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val df = Tables.t(spark, sf, "customer")
    val path = tmp("pq")
    GraftSources.writeParquet(df, path, partitionBy = Seq("c_mktsegment"))
    val one = GraftSources.readParquet(spark, path)
      .filter(col("c_mktsegment") === "BUILDING")
    // partition pruning: the scan should touch only the BUILDING directory
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() ==
      df.filter(col("c_mktsegment") === "BUILDING").count())
    assert(scanned.contains("PartitionFilters: [isnotnull(c_mktsegment"),
      s"no partition filter in:\n$scanned")
  }

  test("schema'd csv read applies declared types") {
    val path = tmp("csv2")
    GraftSources.writeCsv(Tables.t(spark, sf, "supplier"), path)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
    val back = GraftSources.readCsv(spark, path, Some(schema))
    assert(back.schema("s_acctbal").dataType == DoubleType)
    assert(back.count() == 10)
  }
}
