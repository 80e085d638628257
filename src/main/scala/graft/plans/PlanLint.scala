package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ColumnarToRowExec, FileSourceScanExec,
  FilterExec, InputAdapter, ProjectExec, SortExec, SparkPlan,
  TakeOrderedAndProjectExec, UnaryExecNode, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
  ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.physical.{RangePartitioning,
  SinglePartition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final,
  Partial}

/** Physical-plan linter: the scale anti-patterns this library's own test
  * suite pins (PlanAuditSpec), exposed as a user-facing API so a query can
  * be audited BEFORE it is paid for on a 1000-executor cluster. A plan
  * that lints clean is not guaranteed fast, but each finding is a shape
  * that provably degrades at scale: work that concentrates on one task,
  * joins whose cost is a product instead of a sum, scans that read what
  * the query will immediately drop.
  *
  * Severities: `error` = will not survive a 100x scale-up (single-task
  * collapse or quadratic cost); `warn` = usually wrong, legitimate in
  * bounded cases the caller should be able to name; `info` = worth a look.
  *
  * Pure plan inspection: no jobs run, nothing is cached (queries whose
  * CONSTRUCTION runs jobs — two-pass sketches — still run those).
  */
object PlanLint {

  final case class Finding(rule: String, severity: String, node: String,
      detail: String) {
    override def toString: String = f"[$severity%-5s] $rule ($node): $detail"
  }

  /** Broadcast-side logical size above which BIG_BROADCAST fires. The
    * default is deliberately far above autoBroadcastJoinThreshold: it
    * catches `broadcast()` HINTS on unbounded relations (the hint
    * bypasses the threshold), not Spark's own sizing decisions.
    */
  val defaultBroadcastLimit: Long = 128L << 20

  def lint(df: DataFrame,
      broadcastLimit: Long = defaultBroadcastLimit): Seq[Finding] =
    lintPlan(df.queryExecution.executedPlan, broadcastLimit)

  def lintPlan(root: SparkPlan,
      broadcastLimit: Long = defaultBroadcastLimit): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]

    def walk(p: SparkPlan, underTopK: Boolean): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, underTopK); return
        // post-execution AQE wraps exchanges in leaf stage nodes
        case q: QueryStageExec => walk(q.plan, underTopK); return
        case _ =>
      }

      p match {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          out += Finding("UNPARTITIONED_WINDOW", "error", p.nodeName,
            "window over the whole dataset sorts on ONE task; partition it " +
              "or use a two-phase global rank (graft GlobalRank)")
        case _: CartesianProductExec =>
          out += Finding("CARTESIAN", "error", p.nodeName,
            "cost is |left| x |right|; add an equi-key (quantize/bucket a " +
              "range predicate) or bound one side")
        case j: BroadcastNestedLoopJoinExec =>
          out += Finding("NESTED_LOOP", "warn", p.nodeName,
            s"${j.joinType} per-row scan of the broadcast side; fine vs a " +
              "bounded inline table, quadratic vs anything that grows")
        case f: FilterExec =>
          unpushedScan(f).foreach { scan =>
            out += Finding("UNPUSHED_FILTER", "warn", scan.nodeName,
              "filter sits above a parquet scan but no predicate was " +
                "pushed (UDF/expression not translatable?) — the scan reads " +
                "every row-group")
          }
        case b: BroadcastExchangeExec =>
          b.child.logicalLink.map(_.stats.sizeInBytes).foreach { size =>
            if (size > broadcastLimit)
              out += Finding("BIG_BROADCAST", "warn", p.nodeName,
                s"broadcast side estimated at $size bytes (> $broadcastLimit); " +
                  "a hinted broadcast of an unbounded relation OOMs every " +
                  "executor at scale")
          }
        case s: SortExec if s.global && !underTopK =>
          out += Finding("GLOBAL_SORT", "info", p.nodeName,
            "range-partitioned total sort; legitimate for ordered output / " +
              "sorted layout, wasted work if only a top-k or an aggregate " +
              "follows")
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
          if (!e.child.isInstanceOf[HashAggregateExec] &&
              !e.child.isInstanceOf[ObjectHashAggregateExec] &&
              !e.child.isInstanceOf[SortAggregateExec])
            out += Finding("SINGLE_PARTITION", "warn", p.nodeName,
              "everything shuffles to ONE task (coalesce(1)/repartition(1)?); " +
                "bounded only if a partial aggregate already shrank the data")
        case agg: HashAggregateExec if isFinalOnly(agg) =>
          out += Finding("MISSING_PARTIAL_AGG", "warn", p.nodeName,
            "final aggregate without a map-side partial below it: every raw " +
              "row shuffles")
        case agg: ObjectHashAggregateExec if isFinalOnly(agg) =>
          out += Finding("MISSING_PARTIAL_AGG", "warn", p.nodeName,
            "final aggregate without a map-side partial below it: every raw " +
              "row shuffles")
        case _ =>
      }

      val childTopK = underTopK || p.isInstanceOf[TakeOrderedAndProjectExec]
      (p.children ++ p.subqueries).foreach(walk(_, childTopK))
    }

    walk(root, underTopK = false)
    out.result()
  }

  /** Render findings the way a human wants them in a REPL. */
  def report(df: DataFrame,
      broadcastLimit: Long = defaultBroadcastLimit): String = {
    val fs = lint(df, broadcastLimit)
    if (fs.isEmpty) "plan lints clean"
    else fs.mkString("\n")
  }

  /** CI guard: throw if any finding at or above `failOn` severity remains
    * after dropping explicitly-acknowledged rules. `ignore` names the
    * rules the caller accepts (e.g. NESTED_LOOP for a bounded inline
    * dimension) — acknowledgment is per-rule and deliberate, mirroring
    * this repo's own PlanAuditSpec allowlists.
    */
  def assertClean(df: DataFrame, ignore: Set[String] = Set.empty,
      failOn: String = "warn"): Unit = {
    val rank = Map("info" -> 0, "warn" -> 1, "error" -> 2)
    val bad = lint(df).filterNot(f => ignore(f.rule))
      .filter(f => rank(f.severity) >= rank(failOn))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"plan failed lint:\n${bad.mkString("\n")}")
  }

  /** The parquet scan under `f` (through projections) iff `f`'s predicate
    * pushed nothing down to it.
    */
  private def unpushedScan(f: FilterExec): Option[FileSourceScanExec] = {
    def descend(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case s: FileSourceScanExec => Some(s)
      case pr: ProjectExec => descend(pr.child)
      case c: ColumnarToRowExec => descend(c.child)
      case i: InputAdapter => descend(i.child)
      case w: WholeStageCodegenExec => descend(w.child)
      case _ => None
    }
    descend(f.child).filter { scan =>
      scan.metadata.getOrElse("PushedFilters", "[]") == "[]" &&
        scan.partitionFilters.isEmpty
    }
  }

  /** Aggregate whose modes are Final/Complete AND whose input reaches a
    * shuffle before any Partial stage — i.e. raw rows shuffle unreduced.
    * A Complete-mode aggregate over co-partitioned (bucketed) input has
    * no shuffle at all and is the OPTIMAL shape, so mode alone is not a
    * finding.
    */
  private def isFinalOnly(agg: SparkPlan): Boolean = {
    val modes = agg match {
      case h: HashAggregateExec => h.aggregateExpressions.map(_.mode)
      case o: ObjectHashAggregateExec => o.aggregateExpressions.map(_.mode)
      case s: SortAggregateExec => s.aggregateExpressions.map(_.mode)
      case _ => return false
    }
    if (modes.isEmpty || !modes.forall(m => m == Final || m == Complete))
      return false
    def partialModes(p: SparkPlan): Boolean = p match {
      case h: HashAggregateExec => h.aggregateExpressions.exists(_.mode == Partial)
      case o: ObjectHashAggregateExec => o.aggregateExpressions.exists(_.mode == Partial)
      case s: SortAggregateExec => s.aggregateExpressions.exists(_.mode == Partial)
      case _ => false
    }
    // a partial aggregate at the top of the shuffle's INPUT side means
    // the data was reduced map-side before moving
    def reducedBelow(p: SparkPlan): Boolean = p match {
      case q: QueryStageExec => reducedBelow(q.plan)
      case a if partialModes(a) => true
      case u: UnaryExecNode => reducedBelow(u.child)
      case _ => false
    }
    // true iff a shuffle is reached with no partial aggregate in between
    def shuffledUnreduced(p: SparkPlan): Boolean = p match {
      case q: QueryStageExec => shuffledUnreduced(q.plan)
      case _ if partialModes(p) => false
      case e: ShuffleExchangeExec => !reducedBelow(e.child)
      case other => other.children.exists(shuffledUnreduced)
    }
    agg.children.exists(shuffledUnreduced)
  }

  /** Session-level audit: register a [[PlanLintListener]] that lints
    * EVERY query the session runs and logs findings (see its Scaladoc
    * for the config-based alternative). Returns the listener so callers
    * can read findings back or unregister it.
    */
  def watch(spark: org.apache.spark.sql.SparkSession): PlanLintListener =
    PlanLintListener.watch(spark)
}
