package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamingNearDedup

/** Top-level for Catalyst codegen deserializers. */
case class DocRow(doc_id: Long, text: String)

class StreamingNearDedupSpec extends SparkTestBase {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocks[A](body: => A): A = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try body finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  // small but near-dup-bearing slice; driver-side for MemoryStream feeding
  private lazy val docRows: Array[DocRow] =
    Tables.t(spark, sf, "documents").filter(col("doc_id") < 200)
      .select("doc_id", "text").collect()
      .map(r => DocRow(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)

  private lazy val docsDf = Tables.t(spark, sf, "documents")
    .filter(col("doc_id") < 200).select("doc_id", "text").cache()

  private def batchPairs: Set[(Long, Long, Double)] =
    Dedup.minHashPairsHashed(docsDf, "doc_id",
        Dedup.shinglesHashed(col("text"), 5), threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("whole-stream pair set == batch all-pairs LSH, jac bit-identical") {
    withRocks {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[DocRow]
      val cands = StreamingNearDedup.candidatePairs(
        mem.toDF(), "doc_id", "text")
      val out = StreamingNearDedup.verified(cands, docsDf, "doc_id", "text",
        threshold = 0.7)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("snd_out").start()
      try {
        val Array(b1, b2, b3) =
          Array(docRows.slice(0, 70), docRows.slice(70, 140), docRows.slice(140, 200))
        mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
        val streamed = spark.table("snd_out").collect()
          .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet // (old,new)=(a,b)
        assert(streamed == batchPairs,
          s"stream-only=${streamed -- batchPairs} batch-only=${batchPairs -- streamed}")
        assert(streamed.nonEmpty, "slice carries no near-dups; widen it")
        // orientation: new always arrived after old (ids fed in order)
        val raw = spark.table("snd_out").collect()
        assert(raw.forall(r => r.getLong(0) > r.getLong(1)))
      } finally q.stop()
    }
  }

  test("cross-batch slice == batch minHashIncremental(new, corpus)") {
    withRocks {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[DocRow]
      val out = StreamingNearDedup.verified(
        StreamingNearDedup.candidatePairs(mem.toDF(), "doc_id", "text"),
        docsDf, "doc_id", "text", threshold = 0.7)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("snd_incr").start()
      try {
        val (corpus, fresh) = docRows.partition(_.doc_id < 140)
        mem.addData(corpus.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(fresh.toIndexedSeq: _*); q.processAllAvailable()
        val crossStream = spark.table("snd_incr").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .filter { case (n, o, _) => n >= 140 && o < 140 }.toSet
        val corpusDf = docsDf.filter(col("doc_id") < 140)
        val freshDf = docsDf.filter(col("doc_id") >= 140)
        val batchIncr = Dedup.minHashIncrementalHashed(freshDf, corpusDf,
            "doc_id", Dedup.shinglesHashed(col("text"), 5), threshold = 0.7)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(crossStream == batchIncr,
          s"stream-only=${crossStream -- batchIncr} incr-only=${batchIncr -- crossStream}")
      } finally q.stop()
    }
  }

  test("restart mid-stream: RocksDB band-bucket state survives, no pair lost") {
    withRocks {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-snd")
        .toFile.getAbsolutePath
      val mem = MemoryStream[DocRow]
      val outDir = s"$dir/out"
      def start() = StreamingNearDedup.verified(
          StreamingNearDedup.candidatePairs(mem.toDF(), "doc_id", "text"),
          docsDf, "doc_id", "text", threshold = 0.7)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.write.mode("overwrite").parquet(s"$outDir/b$id")
        }
        .start()
      val q1 = start()
      mem.addData(docRows.slice(0, 100).toIndexedSeq: _*)
      q1.processAllAvailable()
      q1.stop() // planned stop mid-stream; state is in RocksDB + ckpt
      val q2 = start()
      try {
        mem.addData(docRows.slice(100, 200).toIndexedSeq: _*)
        q2.processAllAvailable()
      } finally q2.stop()
      val rows = spark.read.parquet(s"$outDir/b*").collect()
      val streamed = rows.map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
      assert(streamed == batchPairs,
        s"missing=${batchPairs -- streamed} extra=${streamed -- batchPairs}")
      // pairs MUST cross the restart boundary (old pre-stop, new post)
      assert(streamed.exists { case (a, b, _) => a < 100 && b >= 100 },
        "no cross-restart pair — state did not survive")
    }
  }
}
