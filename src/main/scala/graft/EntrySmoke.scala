package graft

import org.apache.spark.sql.SparkSession

/** Driver t1 analog: SparkEntry.entry must return rows on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry returned no rows")
  }
}
