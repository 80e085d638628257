package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** Pins the file-stream source's layout handling in `Tables.eventsStream`:
  * testdata tables arrive either as a single parquet FILE (driver-written)
  * or as a DIRECTORY of part files (Spark-written, e.g. the SoakGen sf1
  * replica). The source does not follow a symlink to a directory — the
  * round-9 sf1 soak caught it silently reading ZERO files that way — so
  * both layouts must drain the full table, asserted here by row count
  * against the batch read.
  */
class StreamingLayoutSpec extends SparkTestBase {

  private def drainCount(dir: String, name: String): Long = {
    val q = Tables.eventsStream(spark, dir)
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).count()
  }

  test("single-file layout: stream drains every batch row") {
    val batch = Tables.t(spark, sf, "events").count()
    assert(batch > 0)
    assert(drainCount(sf, "layout_file_sink") == batch)
  }

  test("directory layout (Spark-written table): stream drains every batch row") {
    val tmp = Files.createTempDirectory("graft-layout-").toString
    Tables.t(spark, sf, "events")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val batch = Tables.t(spark, tmp, "events").count()
    assert(batch > 0)
    assert(drainCount(tmp, "layout_dir_sink") == batch)
  }
}
