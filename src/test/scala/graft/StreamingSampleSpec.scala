package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Mixture
import graft.streaming.{StreamingSample, WsItem}

/** Streaming priority sampler: the final emission equals the batch
  * grouped sampler REGARDLESS of how the stream is batched (priorities
  * are pure data functions, so the top-k set is order-independent) —
  * the property the SpaceSaving monitor cannot have.
  */
class StreamingSampleSpec extends SparkTestBase {

  /** The production drain conf (RocksDB provider + pinned state
    * partitions), restored on exit — restart tests must run the same
    * conf shape as the scoreboard drains, and in ONE place.
    */
  private def withRocksDb[A](body: => A): A =
    graft.streaming.StateScope.withStateConf(spark)(body)

  test("multi-batch drain ends at exactly the batch sampler's draw") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val rows = (1L to 200L).map(i => (s"g${i % 3}", i, 1L + (i * 41) % 120))
      val df = rows.toDF("grp", "id", "wt")
      // feed the SAME rows in three arbitrary slices, adversarially
      // ordered (descending id), through the monitor
      val items = Mixture.prioritized(df, "id", col("wt"))
        .select(col("grp").as("key"), col("id"), col("w"), col("priority"))
        .as[WsItem].collect().sortBy(-_.id)
      val Seq(s1, s2, s3) = items.grouped((items.length + 2) / 3).toSeq
      val mem = MemoryStream[WsItem]
      @volatile var finalBatch: Set[(String, Long, Long, Long, Long)] = Set.empty
      val q = StreamingSample.track(mem.toDF(), "key", "id", k = 5)
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = bdf.collect().map(r => (r.getString(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getLong(4))).toSet
          if (rows.nonEmpty) finalBatch = rows
        }
        .start()
      try {
        mem.addData(s1.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(s2.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(s3.toIndexedSeq: _*); q.processAllAvailable()
        val batch = Mixture.samplePriorityByGroup(df, "grp", "id", col("wt"), 5)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        assert(finalBatch == batch,
          s"stream drain diverged from batch draw:\n  stream=$finalBatch\n  batch=$batch")
      } finally q.stop()
    }
  }

  test("streaming CMS: multi-batch drain equals the batch sketch (linearity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val words = (1 to 120).map(i => s"w${i % 17}")
      val mem = MemoryStream[String]
      @volatile var finalCells: Set[(Int, Long, Long)] = Set.empty
      val q = graft.streaming.StreamingCms.track(
          mem.toDF().withColumnRenamed("value", "token"), "token",
          depth = 3, width = 32)
        .writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = bdf.collect()
            .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
          if (rows.nonEmpty) {
            // later batches re-emit only TOUCHED cells with updated
            // counts — overlay them on the running view
            val touched = rows.map(c => (c._1, c._2))
            finalCells = finalCells.filterNot(c => touched((c._1, c._2))) ++ rows
          }
        }
        .start()
      try {
        val Seq(a, b) = words.grouped(60).toSeq
        mem.addData(a.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
        val batch = graft.operators.CountMin.sketch(
            words.toDF("token"), "token", depth = 3, width = 32)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        assert(finalCells == batch,
          s"stream table diverged:\n  stream=$finalCells\n  batch=$batch")
      } finally q.stop()
    }
  }

  test("CMS cell state survives a checkpointed stop/restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-cms-ckpt").toString
      val words = (1 to 90).map(i => s"w${i % 11}")
      val mem = MemoryStream[String]
      val cells = new scala.collection.concurrent.TrieMap[(Int, Long), (Long, Long)]()
      def start() = graft.streaming.StreamingCms.track(
          mem.toDF().withColumnRenamed("value", "token"), "token",
          depth = 3, width = 32)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          // keep the LATEST batch's reading per cell (batch ids continue
          // across restarts, so later generations win)
          df.collect().foreach { r =>
            val k = (r.getInt(0), r.getLong(1))
            val v = (id, r.getLong(2))
            cells.updateWith(k) {
              case Some((b, _)) if b > id => Some(cells(k))
              case _                      => Some(v)
            }
          }
          ()
        }
        .start()
      val Seq(a, b) = words.grouped(45).toSeq
      val q1 = start()
      try { mem.addData(a.toIndexedSeq: _*); q1.processAllAvailable() }
      finally q1.stop()
      // resume from the RocksDB checkpoint: counts must CONTINUE
      val q2 = start()
      try { mem.addData(b.toIndexedSeq: _*); q2.processAllAvailable() }
      finally q2.stop()
      val got = cells.map { case (k, (_, n)) => (k._1, k._2, n) }.toSet
      val batch = graft.operators.CountMin.sketch(
          words.toDF("token"), "token", depth = 3, width = 32)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batch,
        s"state lost across restart:\n  stream=$got\n  batch=$batch")
    }
  }

  test("sampler state survives a checkpointed stop/restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-ws-ckpt").toString
      val rows = (1L to 120L).map(i => (s"g${i % 2}", i, 1L + (i * 53) % 90))
      val df = rows.toDF("grp", "id", "wt")
      val items = Mixture.prioritized(df, "id", col("wt"))
        .select(col("grp").as("key"), col("id"), col("w"), col("priority"))
        .as[WsItem].collect().sortBy(-_.id)
      val Seq(s1, s2) = items.grouped(60).toSeq
      val mem = MemoryStream[WsItem]
      // latest generation wins: batch ids continue across restarts
      @volatile var lastBatch = (-1L, Set.empty[(String, Long, Long, Long, Long)])
      def start() = StreamingSample.track(mem.toDF(), "key", "id", k = 4)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, id: Long) =>
          val rs = bdf.collect().map(r => (r.getString(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getLong(4))).toSet
          if (rs.nonEmpty && id > lastBatch._1) lastBatch = (id, rs)
        }
        .start()
      val q1 = start()
      try { mem.addData(s1.toIndexedSeq: _*); q1.processAllAvailable() }
      finally q1.stop()
      // resume from the RocksDB checkpoint: the maintained top-(k+1) per
      // key must CONTINUE — the post-restart draw equals the batch
      // sampler over ALL rows, not just the second slice
      val q2 = start()
      try { mem.addData(s2.toIndexedSeq: _*); q2.processAllAvailable() }
      finally q2.stop()
      val batch = Mixture.samplePriorityByGroup(df, "grp", "id", col("wt"), 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(lastBatch._2 == batch,
        s"state lost across restart:\n  stream=${lastBatch._2}\n  batch=$batch")
    }
  }

  test("estimator tau appears only once k+1 rows have been seen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[WsItem]
      val out = StreamingSample.track(mem.toDF(), "key", "id", k = 3)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("ws_tau").start()
      try {
        // 2 rows < k: est must be the raw scaled weight (tau = 0)
        mem.addData(WsItem("k", 1L, 10L, 500L), WsItem("k", 2L, 20L, 400L))
        q.processAllAvailable()
        val first = spark.table("ws_tau").collect()
        assert(first.forall(r => r.getLong(4) == r.getLong(2) * 4294967296L))
      } finally q.stop()
    }
  }
}
