package graft.streaming

import scala.collection.mutable

/** Size-capped per-partition pre-aggregation for streaming monitors.
  *
  * `transformWithState`'s `groupByKey` shuffles one row per input row —
  * it has no map-side combine. For monitors whose state update is an
  * associative+commutative fold of per-key deltas (CMS cell counts,
  * SpaceSaving weighted adds, exact-dedup min+count), the occurrences
  * can be pre-reduced inside each task first so the stateful exchange
  * carries (key, delta) rows instead of raw occurrences — at 100 TB the
  * difference between re-shuffling the corpus and shuffling a bounded
  * delta set per task.
  *
  * The combine map is capped: when it reaches `cap` distinct keys the
  * current deltas are emitted and the map cleared, so worst-case task
  * memory stays O(cap) REGARDLESS of the key domain (a CMS sized at the
  * maximum 16·2^20 cells, or an unbounded (key, item) domain, cannot
  * balloon a task). Emitting a key twice is harmless for any
  * associative+commutative state update — flushed duplicates recombine
  * exactly in the stateful processor.
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
    combine[K, K, Long](keys, identity, _ => 1L, (n, _) => n + 1L, cap)

  /** Sum pre-weighted (key, delta) pairs within one partition, same
    * size-capped flush discipline as [[counts]] — the second combine
    * stage of count-then-hash pipelines (deltas for the same key sum
    * exactly, so flush duplication is harmless).
    */
  def sums[K](pairs: Iterator[(K, Long)],
      cap: Int = DefaultCap): Iterator[(K, Long)] =
    combine[(K, Long), K, Long](pairs, _._1, _._2, (acc, p) => acc + p._2, cap)

  /** Per-key (min value, occurrence count) within one partition, same
    * size-capped flush discipline as [[counts]]. For state updates that
    * take a min and a sum (the exact-dedup monitor: keep_id = min id,
    * n_copies = sum) — both associative+commutative, so flush-duplicated
    * keys recombine exactly in the stateful processor.
    */
  def minCounts[K](pairs: Iterator[(K, Long)],
      cap: Int = DefaultCap): Iterator[(K, (Long, Long))] =
    combine[(K, Long), K, (Long, Long)](pairs, _._1, p => (p._2, 1L),
      { case ((m, n), p) => (math.min(m, p._2), n + 1L) }, cap)

  /** The one capped fold-by-key both entry points share. Pull-based
    * (never materializes the input) with snapshot-then-clear flushes: the
    * emitted iterator must outlive the map it was drawn from.
    */
  private def combine[In, K, V](in: Iterator[In], key: In => K,
      seed: In => V, merge: (V, In) => V, cap: Int): Iterator[(K, V)] = {
    require(cap > 0, s"combine cap must be positive: $cap")
    new Iterator[(K, V)] {
      private val local = mutable.HashMap.empty[K, V]
      private var out: Iterator[(K, V)] = Iterator.empty

      private def refill(): Unit = {
        while (in.hasNext && local.size < cap) {
          val row = in.next()
          val k = key(row)
          local.get(k) match {
            case Some(v) => local.update(k, merge(v, row))
            case None    => local.update(k, seed(row))
          }
        }
        out = local.toArray.iterator
        local.clear()
      }

      override def hasNext: Boolean = {
        if (!out.hasNext && in.hasNext) refill()
        out.hasNext
      }
      override def next(): (K, V) = {
        if (!hasNext) throw new NoSuchElementException("empty")
        out.next()
      }
    }
  }
}
