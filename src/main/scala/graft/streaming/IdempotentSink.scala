package graft.streaming

import java.io.File
import org.apache.spark.sql.DataFrame

/** Exactly-once `foreachBatch` parquet sink.
  *
  * Structured Streaming guarantees foreachBatch is called with a
  * monotonically increasing batchId and replays the LAST uncommitted batch
  * after a failure/restart — so a sink is exactly-once iff it is idempotent
  * per batchId. This sink gets there two ways:
  *  - a batch directory is (re)written with mode=overwrite, so a crash
  *    mid-write leaves no partial state a replay can't fix;
  *  - a commit marker is recorded only after the write completes, and
  *    already-committed batchIds are skipped entirely on replay.
  *
  * The same recipe (stage under batch=<id>, commit marker last) is how an
  * exactly-once sink is built against any object store at 100 TB; the
  * marker write is the one non-atomic step and is a single empty file.
  *
  * The reference has no sinks of any kind (SURVEY.md §2.4; its lifecycle
  * ends at plan printing, /root/reference/src/main.rs:31-59).
  */
object IdempotentSink {

  /** A (DataFrame, batchId) => Unit function for `writeStream.foreachBatch`,
    * writing each batch to `outDir/batch=<id>/` exactly once.
    */
  def parquet(outDir: String): (DataFrame, Long) => Unit = { (df, batchId) =>
    if (!committed(outDir, batchId)) {
      df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      val marker = new File(s"$outDir/_graft_commits/$batchId")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
  }

  def committed(outDir: String, batchId: Long): Boolean =
    new File(s"$outDir/_graft_commits/$batchId").exists()
}
