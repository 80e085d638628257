package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PageRank, TextAnalysis}

/** Fault injection through the operators whose persist/localCheckpoint
  * choices were made FOR failure recovery: every task that scans the
  * operator's input throws on its FIRST attempt (local[4,2] grants one
  * retry), so each materialization barrier — resolveClusters' pair
  * persist + per-round localCheckpoints, PageRank's edge-list
  * checkpoint, scoreByCostTable's RDD-level cost persist — executes at
  * least once under a task failure. The contract under test: the
  * operator COMPLETES and its result is bit-equal to the clean run
  * (retries must not double-count into a persist, skew a draw, or leave
  * a partial checkpoint behind). Executor LOSS (cached-block
  * re-derivation from lineage) cannot be driven in a single-JVM local
  * master — the RDD-persist-keeps-lineage argument in scoreByCostTable's
  * Scaladoc covers that regime; what local mode CAN drive is exactly
  * this: failed attempts interleaved with the operators' own actions.
  */
class ChaosSpec extends SparkTestBase {

  import ChaosSpec.injected

  /** Wrap a DataFrame so every task of every job that scans it fails its
    * first attempt. Retried attempts (attemptNumber > 0) pass the rows
    * through untouched, so the data is identical to the clean input.
    */
  private def flaky(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.rdd.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) {
        injected.incrementAndGet()
        throw new RuntimeException("chaos: injected first-attempt failure")
      }
      it
    }
    spark.createDataFrame(rdd, schema)
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("resolveClusters: hash-equal under first-attempt failures in the pair scan") {
    import spark.implicits._
    injected.set(0)
    // two chains and a triangle across 4 partitions — multi-round
    // convergence so the per-round localCheckpoint loop runs under the
    // post-failure blocks
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b").repartition(4)
    val clean = collectSorted(Dedup.resolveClusters(pairs, "a", "b"))
    val chaos = collectSorted(Dedup.resolveClusters(flaky(pairs), "a", "b"))
    assert(injected.get() >= 1, "no failure was actually injected")
    assert(chaos == clean, "clusters diverged under injected task failures")
  }

  test("PageRank: hash-equal under first-attempt failures in the edge scan") {
    import spark.implicits._
    injected.set(0)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "a"), ("e", "a")).toDF("s", "d").repartition(4)
    val clean = collectSorted(PageRank.ranks(edges, "s", "d", iterations = 5))
    val chaos = collectSorted(PageRank.ranks(flaky(edges), "s", "d", iterations = 5))
    assert(injected.get() >= 1, "no failure was actually injected")
    assert(chaos == clean, "ranks diverged under injected task failures")
  }

  private def docs = {
    import spark.implicits._
    Seq((1L, "the cat sat on the mat"), (2L, "the dog sat"),
      (3L, "a cat and a dog"), (4L, "the mat the cat the dog"))
      .toDF("doc_id", "text").repartition(4)
  }

  test("unigramNll broadcast path: hash-equal under injected failures") {
    injected.set(0)
    val clean = collectSorted(TextAnalysis.unigramNll(docs, "doc_id", "text"))
    val chaos = collectSorted(TextAnalysis.unigramNll(flaky(docs), "doc_id", "text"))
    assert(injected.get() >= 1, "no failure was actually injected")
    assert(chaos == clean, "scores diverged under injected task failures")
  }

  test("unigramNll join path: hash-equal under injected failures") {
    injected.set(0)
    // maxBroadcastVocab = 1 forces the distributed explode+join path: the
    // persisted cost table is built AND re-joined against the flaky
    // input, so the failure fires in at least two separate jobs
    val clean = collectSorted(
      TextAnalysis.unigramNll(docs, "doc_id", "text", maxBroadcastVocab = 1L))
    val chaos = collectSorted(
      TextAnalysis.unigramNll(flaky(docs), "doc_id", "text", maxBroadcastVocab = 1L))
    assert(injected.get() >= 2, s"expected failures in both the cost build " +
      s"and the scoring join, saw ${injected.get()}")
    assert(chaos == clean, "join-path scores diverged under injected task failures")
  }

  test("knBigramNll: hash-equal under injected failures through the persisted type table") {
    injected.set(0)
    val clean = collectSorted(
      TextAnalysis.knBigramNll(docs, "doc_id", "text", maxBroadcastVocab = 1L))
    val chaos = collectSorted(
      TextAnalysis.knBigramNll(flaky(docs), "doc_id", "text", maxBroadcastVocab = 1L))
    assert(injected.get() >= 1, "no failure was actually injected")
    assert(chaos == clean, "KN scores diverged under injected task failures")
  }
}

object ChaosSpec {
  /** Shared across tasks — valid because the test master is single-JVM. */
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)
}
