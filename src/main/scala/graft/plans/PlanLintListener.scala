package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Session-level plan audit: a [[QueryExecutionListener]] that runs
  * [[PlanLint]] over the executed plan of EVERY query the session runs
  * and logs findings — the audit discipline this library's CI applies to
  * its own query board ([[graft.LintSpec]]), offered to users at
  * runtime. Opt-in:
  *
  *   - programmatic: `PlanLint.watch(spark)` (returns the listener, so
  *     callers can also read findings back), or
  *   - config: `spark.sql.queryExecutionListeners=graft.plans.PlanLintListener`
  *     (Spark instantiates and registers it on session build).
  *
  * Findings are logged at WARN with a `[graft-lint]` prefix and retained
  * in a bounded in-memory ring (newest [[PlanLintListener.MaxReports]]),
  * for dashboards/tests. Auditing is post-hoc (the query has already
  * run) — the point is the NEXT run: a 100 TB pipeline's scale-killers
  * show up in the logs of its sf0.01 dry run. Lint failures are
  * swallowed: observation must never break the query stream.
  */
final class PlanLintListener extends QueryExecutionListener {
  import PlanLintListener._

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val buf = new java.util.concurrent.ConcurrentLinkedDeque[Report]()
  private val errCount = new java.util.concurrent.atomic.AtomicLong()

  /** Newest-last reports (bounded at [[MaxReports]]) — a DASHBOARD view,
    * not an accounting one: on a busy session benign info findings (a
    * board of ORDER BY queries emits GLOBAL_SORT per action) evict older
    * reports past the cap. Gates must read [[errorCount]] instead.
    */
  def reports: Seq[Report] = buf.iterator.asScala.toSeq

  /** Monotonic count of error-severity findings across ALL audited
    * actions since registration (or [[clear]]) — never evicted, so it is
    * the sound basis for a zero-scale-killers gate even when the report
    * ring has wrapped. Readers should drain the async listener bus first
    * (`ListenerBusBridge.drain`): callbacks arrive on the
    * ExecutionListenerBus, not the action's thread.
    */
  def errorCount: Long = errCount.get()

  /** Reset the report ring and the error counter. NOT atomic with respect
    * to in-flight audits: a callback landing between the two steps leaves
    * a report whose errors the counter missed (or vice versa). Callers
    * must quiesce first — no actions in flight and the async listener bus
    * drained (`ListenerBusBridge.drain`) — exactly the discipline
    * [[errorCount]] documents for reads. Gates that cannot quiesce should
    * snapshot a baseline `errorCount` and diff instead of clearing.
    */
  def clear(): Unit = { buf.clear(); errCount.set(0L) }

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = audit(funcName, qe)
  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = audit(funcName, qe)

  private def audit(action: String, qe: QueryExecution): Unit =
    try {
      val findings = PlanLint.lintPlan(qe.executedPlan)
      if (findings.nonEmpty) {
        val nErr = findings.count(_.severity == "error")
        if (nErr > 0) errCount.addAndGet(nErr.toLong)
        buf.addLast(Report(action, findings))
        while (buf.size > MaxReports) buf.pollFirst()
        findings.foreach(f => log.warn(s"[graft-lint] $action: $f"))
      }
    } catch { case NonFatal(_) => () }
}

object PlanLintListener {
  final case class Report(action: String, findings: Seq[PlanLint.Finding])
  val MaxReports = 128

  /** Register a fresh listener on the session and return it. */
  def watch(spark: SparkSession): PlanLintListener = {
    val l = new PlanLintListener
    spark.listenerManager.register(l)
    l
  }

  def unwatch(spark: SparkSession, l: PlanLintListener): Unit =
    spark.listenerManager.unregister(l)
}
