package graft.streaming

import java.sql.Timestamp

/** Exact epoch-microseconds of a Timestamp. `getTime` alone truncates to
  * milliseconds; `getNanos` carries the full sub-second fraction, so combine
  * whole seconds with nanos/1000 (floorDiv for pre-epoch safety). events.ts
  * is µs-precision, so every streaming operator that orders or stores event
  * times MUST work in micros — ms truncation silently reorders same-ms rows
  * and truncates session bounds away from the batch/oracle values.
  */
object Micros {
  def of(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Smallest millisecond instant not before the given micros — the timer
    * registration point for a µs deadline on Spark's ms-based timer API.
    */
  def ceilMillis(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
}
