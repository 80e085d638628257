package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming ingestion and partitioned writes leave
  * thousands of KB-sized files, and file-open overhead (plus driver
  * listing memory) then dominates scan cost. Compaction rewrites a
  * directory into files near a target size.
  *
  * Scale shape: the only full pass is the copy itself (unavoidable);
  * sizing comes from the file-system LISTING (no data read), and the
  * rewrite is one `repartition(n)` round-robin shuffle producing n
  * uniform files. Use [[rewriteSorted]] to pay the same pass but leave
  * the data clustered by a key (combine with a Z-order column for
  * two-dimensional locality — see `q_write_zordered`).
  */
object Compact {

  /** Total byte size of the parquet files under `dir` from the listing
    * only.
    */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  private def targetPartitions(spark: SparkSession, inDir: String,
      targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    math.max(1, math.ceil(dirBytes(spark, inDir).toDouble / targetFileBytes).toInt)
  }

  /** Rewrite `inDir` to `outDir` as ~`targetFileBytes`-sized files
    * (round-robin; no ordering guarantee). Returns the compacted frame's
    * reader.
    */
  def rewrite(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long): DataFrame = {
    val n = targetPartitions(spark, inDir, targetFileBytes)
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Same pass, but range-partitioned and sorted by `sortCols` so the
    * compacted files also carry min/max-prunable clustering.
    */
  def rewriteSorted(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, sortCols: Seq[String]): DataFrame = {
    val n = targetPartitions(spark, inDir, targetFileBytes)
    val cols = sortCols.map(org.apache.spark.sql.functions.col)
    spark.read.parquet(inDir)
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
