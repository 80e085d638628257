package graft.streaming

import scala.collection.mutable

/** Size-capped per-partition pre-aggregation for streaming monitors.
  *
  * `transformWithState`'s `groupByKey` shuffles one row per input row —
  * it has no map-side combine. For monitors whose state update is a sum
  * of per-key deltas (CMS cell counts, SpaceSaving weighted adds), the
  * occurrences can be counted inside each task first so the stateful
  * exchange carries (key, count) deltas instead of raw occurrences — at
  * 100 TB the difference between re-shuffling the corpus and shuffling a
  * bounded delta set per task.
  *
  * The combine map is capped: when it reaches `cap` distinct keys the
  * current deltas are emitted and the map cleared, so worst-case task
  * memory stays O(cap) REGARDLESS of the key domain (a CMS sized at the
  * maximum 16·2^20 cells, or an unbounded (key, item) domain, cannot
  * balloon a task). Emitting a key twice is harmless for any
  * associative+commutative state update — the deltas still sum to the
  * exact occurrence count.
  */
object MapSideCombine {

  /** Default flush threshold: a few hundred thousand entries keeps the
    * map tens of MB at worst while still collapsing virtually all
    * duplication in practice (a micro-batch partition rarely touches
    * more distinct keys than this).
    */
  val DefaultCap: Int = 1 << 18

  /** Count occurrences of `keys` within one partition, flushing the
    * running map whenever it holds `cap` distinct keys. Pull-based: the
    * input iterator is consumed incrementally, never materialized.
    */
  def counts[K](keys: Iterator[K], cap: Int = DefaultCap): Iterator[(K, Long)] =
    new Iterator[(K, Long)] {
      private val local = mutable.HashMap.empty[K, Long]
      private var out: Iterator[(K, Long)] = Iterator.empty

      private def refill(): Unit = {
        while (keys.hasNext && local.size < cap) {
          val k = keys.next()
          local.update(k, local.getOrElse(k, 0L) + 1L)
        }
        // snapshot before clearing — the iterator must outlive the map
        out = local.toArray.iterator
        local.clear()
      }

      override def hasNext: Boolean = {
        if (!out.hasNext && keys.hasNext) refill()
        out.hasNext
      }
      override def next(): (K, Long) = {
        if (!hasNext) throw new NoSuchElementException("empty")
        out.next()
      }
    }

  /** Per-key (min value, occurrence count) within one partition, same
    * size-capped flush discipline as [[counts]]. For state updates that
    * take a min and a sum (the exact-dedup monitor: keep_id = min id,
    * n_copies = sum) — both associative+commutative, so flush-duplicated
    * keys recombine exactly in the stateful processor.
    */
  def minCounts[K](pairs: Iterator[(K, Long)],
      cap: Int = DefaultCap): Iterator[(K, (Long, Long))] =
    new Iterator[(K, (Long, Long))] {
      private val local = mutable.HashMap.empty[K, (Long, Long)]
      private var out: Iterator[(K, (Long, Long))] = Iterator.empty

      private def refill(): Unit = {
        while (pairs.hasNext && local.size < cap) {
          val (k, v) = pairs.next()
          local.get(k) match {
            case Some((m, n)) => local.update(k, (math.min(m, v), n + 1L))
            case None         => local.update(k, (v, 1L))
          }
        }
        out = local.toArray.iterator
        local.clear()
      }

      override def hasNext: Boolean = {
        if (!out.hasNext && pairs.hasNext) refill()
        out.hasNext
      }
      override def next(): (K, (Long, Long)) = {
        if (!hasNext) throw new NoSuchElementException("empty")
        out.next()
      }
    }
}
