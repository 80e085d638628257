package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference (mura) is a single-process REPL (`src/main.rs:27-61` in
  * /root/reference) whose "session" is a fresh parser+planner per line. Our
  * session is a configured SparkSession: Catalyst supplies the
  * parse/analyze/optimize/execute lifecycle the reference only declares
  * (`README.md:10`), and our custom functions are registered on top.
  *
  * Scale notes (100 TB posture, tested at local[32]):
  *  - AQE on: runtime coalescing, skew-join splitting, join-strategy switch.
  *  - shuffle.partitions default kept modest locally; on a real cluster this
  *    is overridden per-job (or left to AQE's coalescing from a high initial).
  *  - session TZ pinned UTC so timestamp semantics match the DuckDB oracle.
  */
object GraftSession {

  def local(appName: String = "graft", cores: String = "*"): SparkSession = {
    val spark = SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
