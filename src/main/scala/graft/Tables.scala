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
    case "events" => normalizeEvents(readEvents(spark, s"$dir/$name.parquet"))
    case _        => spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Read the events parquet WITHOUT mutating session conf unless the file
    * actually ships the legacy TIMESTAMP(NANOS) encoding. Spark 4 rejects a
    * NANOS footer at schema-inference time unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set, so: try the plain read
    * first (the common, current-generation path — zero conf mutation), and
    * only on the NANOS rejection set the flag and retry. The flag then stays
    * on for the session — it only affects NANOS columns, and once one legacy
    * file is present every events read in that suite needs it anyway.
    */
  private def readEvents(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Throwable if isNanosRejection(e) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  private def isNanosRejection(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(m =>
        m.contains("NANOS") || m.contains("nanosAsLong")))

  /** events.ts has shipped with two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 rejects unless
    * read legacy nanos-as-long) and plain timestamp[us] without tz (read as
    * TIMESTAMP_NTZ). Branch on the dtype the frame actually has and
    * normalize to session-TZ TimestampType — the session TZ is pinned to
    * UTC everywhere, so the NTZ wall-clock and the µs-since-epoch value
    * coincide and DuckDB oracle comparisons stay exact.
    */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // legacy ns-as-long: truncate ns->us in integer space (ns-since-
        // epoch overflows double precision), same truncation DuckDB applies.
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — extend Tables.normalizeEvents")
    }
  }

  /** [[t]] plus an up-front fan-out for HEAVY per-row compute consumers
    * (BPE merge chains, per-token md5 grams, shingle hashing): a compact
    * store can come back as a single scan split (one parquet row group
    * reads as ONE task), which serializes all downstream map-side work on
    * one core however many the session has. When — and only when — the
    * scan yields fewer splits than the session's default parallelism,
    * redistribute the scanned rows once before the expensive stage.
    *
    * Scale-adaptive by construction: at production scale the scan has
    * splits >= cores and this is a NO-OP (no exchange is added — the
    * corpus is never reshuffled for free parallelism it already has);
    * locally it costs one exchange of the raw rows and buys scan-stage
    * parallelism. Partition-count probing is safe here because [[t]]
    * returns an exchange-free scan (nothing to materialize under AQE).
    * Deterministic: round-robin repartition sorts its input partition
    * first (sortBeforeRepartition, on by default) and every consumer of
    * this path is order-insensitive by the oracle contract anyway.
    */
  def tFan(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val cores = spark.sparkContext.defaultParallelism
    if (scanSplits(spark, dir, name, df) < cores) df.repartition(cores) else df
  }

  /** Split count of the exchange-free scan [[t]] returns, cached per
    * (dir, table, cores): `df.rdd.getNumPartitions` converts the plan to
    * an RDD on the driver, and paying that conversion on EVERY tFan
    * consumer is per-query planning overhead in the bench's mid-tail
    * (VERDICT r20 item 7). The split count is a pure function of the
    * table's files and the session's split sizing, both stable for a
    * (dir, table) within a suite; the core count rides the key so a
    * session at a different parallelism (the driver's 8-core scaling run)
    * can't serve a count computed under different packing.
    */
  private val splitCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Int]()

  private def scanSplits(spark: SparkSession, dir: String, name: String,
      df: DataFrame): Int =
    splitCache.computeIfAbsent(
      (dir, name, spark.sparkContext.defaultParallelism),
      _ => df.rdd.getNumPartitions)

  /** The events table as an UNBOUNDED file-source stream (same normalized
    * schema as the batch read) — the ingest shape of a production monitor:
    * new parquet files landing in the directory flow through incrementally.
    * In tests/Verify the directory holds one static file, which a
    * Trigger.AvailableNow pass drains in one batch.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // readEvents sets the legacy-nanos flag only if this file needs it; the
    // inferred schema below then matches what the stream source will read.
    val physical = readEvents(spark, path).schema
    normalizeEvents(fileStream(spark, path, physical))
  }

  /** Any test table as an unbounded file-source stream (same schema as the
    * batch read) — e.g. the documents table as an ingestion stream for the
    * streaming near-dedup monitor.
    */
  def tableStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(name != "events", "use eventsStream: events needs ts normalization")
    val path = s"$dir/$name.parquet"
    fileStream(spark, path, spark.read.parquet(path).schema)
  }

  private def fileStream(spark: SparkSession, path: String,
      physical: org.apache.spark.sql.types.StructType): DataFrame = {
    // The file-stream source requires a DIRECTORY to list (new files
    // landing in it flow through incrementally — the production ingest
    // shape). Two testdata layouts exist: Spark-written tables ARE
    // directories of part files (stream them directly); driver-written
    // tables are single parquet FILES, so stage a landing directory
    // holding a symlink to the file. The source does NOT follow a
    // symlink to a directory — streaming a dir through one silently
    // reads zero files, so the branch below is load-bearing.
    val streamDir =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path))) path
      else {
        val abs = java.nio.file.Paths.get(path).toAbsolutePath
        val stagePath = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft-stream",
          abs.getParent.toString.replaceAll("[^A-Za-z0-9.]", "_"),
          abs.getFileName.toString.replaceAll("[^A-Za-z0-9.]", "_"))
        // A pre-refactor staging layout left a SYMLINK at what is now the
        // per-table stage directory path; clear it so createDirectories
        // can't trip over the stale entry.
        if (java.nio.file.Files.isSymbolicLink(stagePath))
          java.nio.file.Files.delete(stagePath)
        val stage = java.nio.file.Files.createDirectories(stagePath)
        val link = stage.resolve(abs.getFileName.toString)
        // deleteIfExists first: Files.exists FOLLOWS a symlink, so a dangling
        // link (testdata regenerated between rounds) reads as "absent" and
        // create then throws FileAlreadyExistsException. Recreating
        // unconditionally also repoints a stale link; concurrent suites racing
        // on the same sf dir are absorbed by the catch (either winner links
        // the same target).
        java.nio.file.Files.deleteIfExists(link)
        try java.nio.file.Files.createSymbolicLink(link, abs)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
        stage.toString
      }
    spark.readStream.schema(physical).parquet(streamDir)
  }

  /** Register tables as temp views for SQL-expressed queries. */
  def views(spark: SparkSession, dir: String, tables: String*): Unit = {
    val list = if (tables.isEmpty) names else tables.toSeq
    list.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
  }
}
