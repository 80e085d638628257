package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MapSideCombine, StreamingSample, WsItem}

/** Map-side pre-combine used by the streaming monitors: the size-capped
  * count combine preserves exact sums across flushes, and the sampler's
  * per-partition top-(k+1) reduction keeps exactly the rows the stateful
  * processor could ever retain. Pure-JVM tests — no SparkSession.
  */
class StreamingCombineSpec extends AnyFunSuite {

  test("counts: exact sums, single delta per key when under cap") {
    val keys = Seq("a", "b", "a", "c", "a", "b")
    val out = MapSideCombine.counts(keys.iterator, cap = 100).toSeq
    assert(out.size == 3, s"one delta per key expected: $out")
    assert(out.toMap == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("counts: cap forces flushes but sums are preserved") {
    // 10 distinct keys, 50 occurrences each, cap 3 → many flushes; the
    // per-key deltas must still sum to the exact occurrence count and
    // no flush may hold more than cap distinct keys
    val rng = new scala.util.Random(42)
    val keys = rng.shuffle(Seq.tabulate(500)(i => s"k${i % 10}"))
    val out = MapSideCombine.counts(keys.iterator, cap = 3).toSeq
    assert(out.size > 10, s"cap=3 over 10 keys must flush repeatedly: ${out.size}")
    val sums = out.groupBy(_._1).map { case (k, d) => k -> d.map(_._2).sum }
    assert(sums == Seq.tabulate(10)(i => s"k$i" -> 50L).toMap)
  }

  test("counts: empty input yields empty output") {
    assert(MapSideCombine.counts(Iterator.empty[String]).isEmpty)
  }

  test("minCounts: exact per-key min and count, preserved across cap flushes") {
    val rng = new scala.util.Random(7)
    // 10 keys, values shuffled so each key's min lands at a random position
    val pairs = rng.shuffle(for { k <- 0 until 10; v <- 0 until 50 }
      yield (s"k$k", (v * 37 + k).toLong))
    val expectMin = pairs.groupBy(_._1).map { case (k, p) => k -> p.map(_._2).min }
    val expectN = pairs.groupBy(_._1).map { case (k, p) => k -> p.size.toLong }
    for (cap <- Seq(3, 100)) {
      val out = MapSideCombine.minCounts(pairs.iterator, cap = cap).toSeq
      val mins = out.groupBy(_._1).map { case (k, d) => k -> d.map(_._2._1).min }
      val sums = out.groupBy(_._1).map { case (k, d) => k -> d.map(_._2._2).sum }
      assert(mins == expectMin, s"cap=$cap mins diverged")
      assert(sums == expectN, s"cap=$cap counts diverged")
      if (cap == 3) assert(out.size > 10, "cap=3 over 10 keys must flush repeatedly")
    }
    assert(MapSideCombine.minCounts(Iterator.empty[(String, Long)]).isEmpty)
  }

  test("counts: pull-based — does not consume past the cap before emitting") {
    // an infinite iterator must still produce deltas (the combine map
    // flushes at cap rather than draining the input first)
    val infinite = Iterator.from(0).map(i => s"k$i")
    val first = MapSideCombine.counts(infinite, cap = 4).take(8).toSeq
    assert(first.size == 8)
    assert(first.forall(_._2 == 1L))
  }

  test("partitionTopK: per key, exactly the sort-order top-(k+1) survive") {
    val rng = new scala.util.Random(7)
    val rows = rng.shuffle(for {
      g <- 0 until 4
      i <- 0 until 37
    } yield WsItem(s"g$g", i.toLong, 1L + i % 5, rng.nextLong(1L << 40)))
    val k = 5
    val kept = StreamingSample.partitionTopK(rows.iterator, k).toSeq
    val expect = rows.groupBy(_.key).flatMap { case (_, rs) =>
      rs.sortBy(r => (-r.priority, r.id)).take(k + 1)
    }.toSet
    assert(kept.toSet == expect, "pre-reduce dropped a row the processor could retain")
    assert(kept.groupBy(_.key).values.forall(_.size == k + 1))
  }

  test("partitionTopK: fewer rows than k+1 pass through untouched") {
    val rows = Seq(WsItem("g", 1L, 2L, 100L), WsItem("g", 2L, 3L, 50L))
    val kept = StreamingSample.partitionTopK(rows.iterator, k = 5).toSeq
    assert(kept.toSet == rows.toSet)
  }

  test("partitionTopK: priority ties break by id, matching the processor") {
    val rows = Seq(WsItem("g", 9L, 1L, 77L), WsItem("g", 3L, 1L, 77L),
      WsItem("g", 6L, 1L, 77L))
    val kept = StreamingSample.partitionTopK(rows.iterator, k = 1).toSeq
    // processor order: (-priority, id) → ids 3 then 6 survive at k+1 = 2
    assert(kept.map(_.id).sorted == Seq(3L, 6L))
  }
}
