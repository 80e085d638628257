package graft

import graft.streaming.StateScope

/** StateScope — the scoping contract the scoreboard drains rely on: the
  * RocksDB provider and the state-partition count hold exactly for the
  * body's duration, and the session's previous values come back whether
  * the body returns or throws (a drain failure must not leak an 8-way
  * shuffle default into the rest of a 32-core batch session).
  */
class StateScopeSpec extends SparkTestBase {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val shuffleKey = "spark.sql.shuffle.partitions"

  test("body sees RocksDB provider + pinned partitions; both restored after") {
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevProvider = spark.conf.getOption(providerKey)
    val seen = StateScope.withStateConf(spark, statePartitions = 5) {
      (spark.conf.get(providerKey), spark.conf.get(shuffleKey))
    }
    assert(seen == (StateScope.RocksDb, "5"))
    assert(spark.conf.get(shuffleKey) == prevShuffle)
    assert(spark.conf.getOption(providerKey) == prevProvider)
  }

  test("restores on exception too, and propagates it") {
    val prevShuffle = spark.conf.get(shuffleKey)
    val boom = intercept[IllegalStateException] {
      StateScope.withStateConf(spark) { throw new IllegalStateException("drain failed") }
    }
    assert(boom.getMessage == "drain failed")
    assert(spark.conf.get(shuffleKey) == prevShuffle)
  }

  test("a previously-set provider value is restored, not unset") {
    spark.conf.set(providerKey, "com.example.SomeProvider")
    try {
      StateScope.withStateConf(spark) {
        assert(spark.conf.get(providerKey) == StateScope.RocksDb)
      }
      assert(spark.conf.get(providerKey) == "com.example.SomeProvider")
    } finally spark.conf.unset(providerKey)
  }

  test("returns the body's value") {
    assert(StateScope.withStateConf(spark)(41 + 1) == 42)
  }

  // ---- drainSingleBatch: the shared scoreboard drain harness ----------

  /** A landing dir holding `n` single-row parquet files (the file-stream
    * source's unit of batching under maxFilesPerTrigger).
    */
  private def landingDir(n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drain")
      .toFile.getAbsolutePath
    (1 to n).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  test("drainSingleBatch: a one-batch drain lands all rows in the named sink") {
    val dir = landingDir(3)
    val schema = spark.read.parquet(dir).schema
    // no per-trigger file cap -> AvailableNow takes all files in ONE batch
    val src = spark.readStream.schema(schema).parquet(dir)
    StateScope.drainSingleBatch(src, "scope_drain_ok")
    assert(spark.table("scope_drain_ok").count() == 3)
  }

  test("drainSingleBatch: a multi-batch drain fails loudly, not silently") {
    val dir = landingDir(2)
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // 2 files x 1 file/trigger = 2 data micro-batches: the exact shape
    // (files landing incrementally) that would silently break the
    // scoreboard oracles' within-one-batch ordering/emission contracts
    val boom = intercept[IllegalArgumentException] {
      StateScope.drainSingleBatch(src, "scope_drain_multi")
    }
    assert(boom.getMessage.contains("saw 2 data micro-batches"),
      s"unexpected failure: ${boom.getMessage}")
  }
}
