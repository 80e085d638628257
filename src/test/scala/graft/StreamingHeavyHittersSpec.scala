package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{HhItem, StreamingHeavyHitters}

/** SpaceSaving monitor: exact-count regime (capacity ≥ cardinality)
  * equals a batch GROUP BY across multi-batch streams; eviction regime
  * maintains the Metwally invariants (over-estimate bounded by err,
  * err ≤ n/m, no true heavy hitter missed, state never exceeds m).
  */
class StreamingHeavyHittersSpec extends SparkTestBase {

  /** The production drain conf (RocksDB provider + pinned state
    * partitions), restored on exit — restart tests must run the same
    * conf shape as the scoreboard drains, and in ONE place.
    */
  private def withRocksDb[A](body: => A): A =
    graft.streaming.StateScope.withStateConf(spark)(body)

  test("capacity >= cardinality: exact counts across batches, err = 0") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val b1 = Seq.fill(5)(HhItem("u1", "a")) ++ Seq.fill(3)(HhItem("u1", "b")) ++
        Seq.fill(4)(HhItem("u2", "a"))
      val b2 = Seq.fill(2)(HhItem("u1", "a")) ++ Seq.fill(6)(HhItem("u2", "c"))
      val mem = MemoryStream[HhItem]
      val out = StreamingHeavyHitters.track(mem.toDF(), "key", "item",
        m = 8, minGuaranteed = 1L)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("hh_exact").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        // the LAST emission per (key, item) is the final table state
        val finalRows = spark.table("hh_exact")
          .withColumn("__r", monotonically_increasing_id())
          .groupBy("key", "item").agg(max_by(struct(col("est"), col("err")), col("__r")).as("s"))
          .select(col("key"), col("item"), col("s.est"), col("s.err"))
          .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
          .toMap
        val truth = (b1 ++ b2).groupBy(i => (i.key, i.item))
          .map { case (k, o) => k -> o.size.toLong }
        assert(finalRows.keySet == truth.keySet)
        truth.foreach { case (k, n) =>
          assert(finalRows(k) == ((n, 0L)), s"$k: ${finalRows(k)} vs exact $n")
        }
      } finally q.stop()
    }
  }

  test("eviction regime: Metwally invariants hold, table bounded by m") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      // 6 distinct items through m=3 counters: a=9, b=6, c=4, d/e/f=1 each
      val items = Seq.fill(9)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
        Seq("d", "e", "f")
      val data = items.map(HhItem("k", _))
      val mem = MemoryStream[HhItem]
      val out = StreamingHeavyHitters.track(mem.toDF(), "key", "item",
        m = 3, minGuaranteed = 0L)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("hh_evict").start()
      try {
        mem.addData(data: _*); q.processAllAvailable()
        val rows = spark.table("hh_evict")
          .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        val n = items.size.toLong
        assert(rows.length <= 3, s"table exceeded m: ${rows.toSeq}")
        val truth = items.groupBy(identity).map { case (i, o) => i -> o.size.toLong }
        rows.foreach { case (item, est, err, nKey) =>
          assert(nKey == n)
          val t = truth(item)
          assert(est >= t, s"$item: est $est under-counts true $t")
          assert(est - err <= t, s"$item: guaranteed ${est - err} exceeds true $t")
          assert(err <= n / 3, s"$item: err $err above n/m ${n / 3}")
        }
        // every item with true count > n/m = 7 must be tracked (a=9)
        assert(rows.exists(_._1 == "a"), "true heavy hitter evicted")
        // counts are conserved: Σ est ≥ n (over-estimates), Σ(est−err) ≤ n
        assert(rows.map(_._2).sum >= rows.map(r => truth(r._1)).sum)
      } finally q.stop()
    }
  }

  test("SpaceSaving state survives a checkpointed stop/restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-hh-ckpt").toString
      val mem = MemoryStream[HhItem]
      // memory sink cannot resume from a checkpoint; collect emissions
      // per batch via foreachBatch (batch ids continue across restarts)
      val emitted = new scala.collection.concurrent.TrieMap[
        (Long, String), (Long, Long, Long)]()
      def start() = StreamingHeavyHitters.track(mem.toDF(), "key", "item",
          m = 4, minGuaranteed = 1L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.collect().foreach(r =>
            emitted((id, r.getString(1))) =
              (r.getLong(2), r.getLong(3), r.getLong(4)))
        }
        .start()
      val q1 = start()
      try {
        mem.addData(Seq.fill(5)(HhItem("k", "a")) ++ Seq.fill(2)(HhItem("k", "b")): _*)
        q1.processAllAvailable()
      } finally q1.stop()
      // second generation resumes from the RocksDB checkpoint: counts must
      // CONTINUE from (a=5, b=2), not restart from zero
      val q2 = start()
      try {
        mem.addData(Seq.fill(3)(HhItem("k", "a")) ++ Seq.fill(4)(HhItem("k", "c")): _*)
        q2.processAllAvailable()
        val lastBatch = emitted.keys.map(_._1).max
        val last = emitted.collect {
          case ((b, item), v) if b == lastBatch => item -> v
        }.toMap
        assert(last("a") == ((8L, 0L, 14L)), s"state lost across restart: $last")
        assert(last("c") == ((4L, 0L, 14L)), s"post-restart item wrong: $last")
        assert(last.get("b").forall(_ == ((2L, 0L, 14L))))
      } finally q2.stop()
    }
  }

  test("minGuaranteed gates emissions to guaranteed-heavy entries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val data = (Seq.fill(30)("hot") ++ Seq.fill(2)("cold")).map(HhItem("k", _))
      val mem = MemoryStream[HhItem]
      val out = StreamingHeavyHitters.track(mem.toDF(), "key", "item",
        m = 8, minGuaranteed = 10L)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("hh_gate").start()
      try {
        mem.addData(data: _*); q.processAllAvailable()
        val items = spark.table("hh_gate").collect().map(_.getString(1)).toSet
        assert(items == Set("hot"), s"gate leaked: $items")
      } finally q.stop()
    }
  }
}
