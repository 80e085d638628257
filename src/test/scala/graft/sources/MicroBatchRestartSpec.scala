package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Offset-contract unit tests for the graftrange micro-batch stream:
  * checkpoint recovery hands a FRESH stream instance its committed offset
  * via deserializeOffset, and latestOffset must never regress below it
  * (a regression yields a run of empty micro-batches after restart).
  */
class MicroBatchRestartSpec extends AnyFunSuite {

  private def stream(rows: Long = 1000L, perBatch: Long = 100L) =
    new GraftRangeMicroBatchStream(rows, parts = 4, rowsPerBatch = perBatch,
      cols = Array("id", "val", "payload"))

  test("latestOffset advances from a restored offset, not from zero") {
    val s = stream()
    // recovery path: engine restores the committed offset into the fresh
    // instance before asking for the next latest offset
    s.deserializeOffset("700")
    assert(s.latestOffset().json().toLong == 800L,
      "latestOffset regressed below the committed offset after restart")
  }

  test("restored offset beyond rows clamps at rows") {
    val s = stream(rows = 250L)
    s.deserializeOffset("250")
    assert(s.latestOffset().json().toLong == 250L)
  }

  test("fresh stream without recovery starts at the first batch") {
    val s = stream()
    assert(s.initialOffset().json().toLong == 0L)
    assert(s.latestOffset().json().toLong == 100L)
  }

  test("planInputPartitions covers exactly the uncommitted tail") {
    val s = stream()
    val start = s.deserializeOffset("700")
    val end = s.latestOffset()
    val parts = s.planInputPartitions(start, end).map(_.asInstanceOf[RangePartition])
    assert(parts.map(p => p.end - p.start).sum == 100L)
    assert(parts.forall(p => p.start >= 700L && p.end <= 800L))
  }
}
