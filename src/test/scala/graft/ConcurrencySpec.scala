package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-caller contract: the library runs inside notebook servers
  * and multi-tenant drivers where SEVERAL queries execute on ONE
  * SparkSession at once. The operators keep no mutable shared state, and
  * the few session-level mutations on the batch path are same-value
  * idempotent (re-registering a temp view with identical content;
  * `Tables`' legacy-conf set for the drifted events encoding), so
  * concurrent submission must return exactly the sequential answers.
  * This spec pins that: one query per family raced on a thread pool vs
  * its sequential run, plus the fixed-temp-view query raced against
  * ITSELF (createOrReplaceTempView on the same name from four threads).
  *
  * Deliberately out of scope: the streaming scoreboard drains — their
  * memory-sink queryNames are per-query constants, so two concurrent
  * drains of the SAME monitor collide by design (the drain harness is a
  * bench/oracle rig, not a server surface); and `StateScope.withStateConf`
  * documents its conf scope as per-drain, same-value across drains.
  */
class ConcurrencySpec extends SparkTestBase {

  // one query per family, all cheap at sf0.001, no streaming drains
  private val raced = Seq(
    "q_tpch_q1",        // aggregation
    "q_dedup_exact",    // dedup shuffle
    "q_embed_knn",      // ANN broadcast + heaps
    "q_text_quality",   // expression-chain text signals
    "q_sample_pps",     // two-phase global cumsum
    "q_topk_grouped",   // UDAF sketch
    "q_shuffle_shard",  // two-phase rank + ntile
    "q_recursive_cte")  // fixed-name temp view registration

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq

  test("eight families raced on one session equal their sequential runs") {
    val sequential = raced.map(n => n -> run(n)).toMap
    val pool = Executors.newFixedThreadPool(raced.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val concurrent = Await.result(
        Future.sequence(raced.map(n => Future(n -> run(n)))), 10.minutes).toMap
      raced.foreach { n =>
        assert(concurrent(n) == sequential(n),
          s"$n diverged under concurrent submission")
      }
    } finally pool.shutdown()
  }

  test("self-race: the temp-view query is safe against its own re-registration") {
    val expected = run("q_recursive_cte")
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val four = Await.result(
        Future.sequence(Seq.fill(4)(Future(run("q_recursive_cte")))), 10.minutes)
      four.zipWithIndex.foreach { case (got, i) =>
        assert(got == expected, s"self-raced run $i diverged")
      }
    } finally pool.shutdown()
  }
}
