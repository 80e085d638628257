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

  /** Recursive listing of the parquet data files under `dir` — the ONE
    * file-matching rule compaction sizing and its tests share.
    */
  def parquetFiles(spark: SparkSession, dir: String): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) buf += f
    }
    buf.result()
  }

  /** Total byte size of the parquet files under `dir` from the listing
    * only.
    */
  def dirBytes(spark: SparkSession, dir: String): Long =
    parquetFiles(spark, dir).map(_.getLen).sum

  private def targetPartitions(spark: SparkSession, inDir: String,
      targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    math.max(1, math.ceil(dirBytes(spark, inDir).toDouble / targetFileBytes).toInt)
  }

  /** Rewrite `inDir` to `outDir` as ~`targetFileBytes`-sized files
    * (round-robin; no ordering guarantee). Returns the compacted frame's
    * reader.
    *
    * Partitioned tables: pass the table's partition columns as
    * `partitionCols` to KEEP the directory layout (read at the table
    * ROOT so Spark materializes the partition columns, compact per
    * partition). Calling this with `Nil` on a partitioned root flattens
    * the layout (partition values become plain columns — data preserved,
    * pruning lost), and pointing it at a single LEAF directory drops the
    * partition column entirely (its value lives only in the directory
    * name).
    */
  def rewrite(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    val n = targetPartitions(spark, inDir, targetFileBytes)
    val df = spark.read.parquet(inDir)
    val writer =
      (if (partitionCols.isEmpty) df.repartition(n)
       else df.repartition(n, partitionCols.map(org.apache.spark.sql.functions.col): _*))
        .write.mode("overwrite")
    (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
      .parquet(outDir)
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
