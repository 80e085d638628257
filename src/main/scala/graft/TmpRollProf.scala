package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Robust

object TmpRollProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = Tables.t(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 100).cast("long").as("v"))
    ev.count()
    def tm(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[roll] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to 2).foreach { _ =>
      for (k <- Seq(20, 1000)) {
        tm(s"direct k=$k")(Robust.rollingZDirect(ev, "user_id", "ts", "event_id",
          col("v"), k).write.format("noop").mode("overwrite").save())
        tm(s"prefix k=$k")(Robust.rollingZPrefix(ev, "user_id", "ts", "event_id",
          col("v"), k).write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
