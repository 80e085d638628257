package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.types.DataType

/** The reference's expression algebra
  * (/root/reference/src/planner/logicalplan.rs:27-83), re-expressed as a
  * small ADT that resolves to Spark `Column`s. Resolution happens against a
  * concrete DataFrame so ordinal references (`Column(idx)`,
  * logicalplan.rs:31) and wildcard expansion (logicalplan.rs:406-418) have
  * the input schema available — the same information flow as the
  * reference's name->index resolution (queryplanner.rs:114-118).
  *
  * Divergences, deliberate (SURVEY.md §7): binary expressions type like
  * Spark, not "always Boolean" (the reference's latent bug,
  * logicalplan.rs:89); synthetic field names ("lit"/"cast"/"binary_expr",
  * utils.rs:36-57) are replaced by Spark's auto-aliases plus explicit
  * `as`.
  */
sealed trait GExpr {
  def as(alias: String): GExpr = GAlias(this, alias)
}
final case class GCol(name: String)                               extends GExpr
final case class GColIndex(idx: Int)                              extends GExpr
final case class GLit(value: Any)                                 extends GExpr
final case class GBinary(left: GExpr, op: GOp, right: GExpr)      extends GExpr
final case class GNot(child: GExpr)                               extends GExpr
final case class GIsNull(child: GExpr)                            extends GExpr
final case class GIsNotNull(child: GExpr)                         extends GExpr
final case class GCast(child: GExpr, to: DataType)                extends GExpr
final case class GSortExpr(child: GExpr, asc: Boolean)            extends GExpr
final case class GScalarFn(name: String, args: Seq[GExpr])        extends GExpr
final case class GAggFn(name: String, args: Seq[GExpr])           extends GExpr
final case class GAlias(child: GExpr, alias: String)              extends GExpr
case object GWildcard                                             extends GExpr

/** Binary operators — exactly the reference's eight
  * (`Operator`, logicalplan.rs:132-149) plus arithmetic, which the
  * reference's SQL translation lacks entirely (queryplanner.rs:121-132).
  */
sealed trait GOp
object GOp {
  case object Eq extends GOp; case object NotEq extends GOp
  case object Lt extends GOp; case object LtEq extends GOp
  case object Gt extends GOp; case object GtEq extends GOp
  case object And extends GOp; case object Or extends GOp
  case object Plus extends GOp; case object Minus extends GOp
  case object Mult extends GOp; case object Div extends GOp
}

object GExpr {
  /** Helpers mirroring the reference's `col`/`col_index`/`eq` constructors
    * (logicalplan.rs:106-128).
    */
  def c(name: String): GExpr             = GCol(name)
  def cIdx(i: Int): GExpr                = GColIndex(i)
  def l(v: Any): GExpr                   = GLit(v)
  def eq(a: GExpr, b: GExpr): GExpr      = GBinary(a, GOp.Eq, b)

  /** Resolve against an input DataFrame's schema. */
  def resolve(df: DataFrame, e: GExpr): Column = e match {
    case GCol(n)        => col(n)
    case GColIndex(i)   => col(df.columns(i))
    case GLit(null)     => lit(null)
    case GLit(v)        => lit(v)
    case GBinary(a, op, b) =>
      val (x, y) = (resolve(df, a), resolve(df, b))
      op match {
        case GOp.Eq => x === y;  case GOp.NotEq => x =!= y
        case GOp.Lt => x < y;    case GOp.LtEq  => x <= y
        case GOp.Gt => x > y;    case GOp.GtEq  => x >= y
        case GOp.And => x && y;  case GOp.Or    => x || y
        case GOp.Plus => x + y;  case GOp.Minus => x - y
        case GOp.Mult => x * y;  case GOp.Div   => x / y
      }
    case GNot(ch)        => not(resolve(df, ch))
    case GIsNull(ch)     => resolve(df, ch).isNull
    case GIsNotNull(ch)  => resolve(df, ch).isNotNull
    case GCast(ch, to)   => resolve(df, ch).cast(to)
    case GSortExpr(ch, asc) => if (asc) resolve(df, ch).asc else resolve(df, ch).desc
    case GScalarFn(n, args) =>
      org.apache.spark.sql.functions.call_function(n, args.map(resolve(df, _)): _*)
    case GAggFn(n, args) =>
      org.apache.spark.sql.functions.call_function(n, args.map(resolve(df, _)): _*)
    case GAlias(ch, a)   => resolve(df, ch).as(a)
    case GWildcard       => throw new IllegalStateException(
      "Wildcard is expanded by project(), not resolved directly " +
        "(reference: logicalplan.rs:101)")
  }
}

/** Port of the reference's `LogicalPlanBuilder`
  * (/root/reference/src/planner/logicalplan.rs:365-462): scan → filter →
  * project → sort → limit, building a *Spark* logical plan underneath
  * instead of a private IR, so Catalyst optimizes and executes what the
  * reference could only pretty-print.
  */
final class PlanBuilder private (
    private val df: DataFrame,
    private val shadow: MuraPlan) {
  import MuraPlan._

  /** Projection with wildcard expansion by input ordinal, the semantics of
    * the reference's `project()` (logicalplan.rs:406-418). Wildcards are
    * expanded at build time, as in the reference, so the recorded plan
    * holds the concrete columns.
    */
  def project(exprs: GExpr*): PlanBuilder = {
    val expanded = exprs.flatMap {
      case GWildcard => df.columns.toSeq.map(GCol(_): GExpr)
      case other     => Seq(other)
    }
    new PlanBuilder(
      df.select(expanded.map(GExpr.resolve(df, _)): _*),
      MProjection(expanded, shadow))
  }

  def filter(e: GExpr): PlanBuilder =
    new PlanBuilder(df.filter(GExpr.resolve(df, e)), MSelection(e, shadow))

  def sort(exprs: GExpr*): PlanBuilder =
    new PlanBuilder(
      df.orderBy(exprs.map(GExpr.resolve(df, _)): _*),
      MSort(exprs, shadow))

  def limit(n: Int): PlanBuilder =
    new PlanBuilder(df.limit(n), MLimit(n, shadow))

  def build(): DataFrame = df

  /** Analog of the reference's indented plan printer
    * (logicalplan.rs:292-362) for golden-plan tests, on the Spark tree.
    */
  def explainTree: String = df.queryExecution.logical.treeString

  /** The reference's own printer format, byte-identical — what its single
    * unit test asserts on (logicalplan.rs:481-485). See [[MuraFormat]].
    */
  def muraString: String = MuraFormat.print(shadow)
}

object PlanBuilder {
  import MuraPlan._

  /** Scan with optional column-index projection
    * (reference `Scan`, logicalplan.rs:233-245; builder 383-401). The
    * projection becomes a `select`, which Catalyst pushes into the parquet
    * reader (ReadSchema pruning) — realizing what the reference only
    * stored. `tableName` exists only for the printed plan (the reference's
    * Scan carries it, logicalplan.rs:236).
    */
  def scan(df: DataFrame, projection: Option[Seq[Int]] = None,
           tableName: String = "table"): PlanBuilder = {
    val shadow = MScan(tableName, projection)
    projection match {
      case Some(idxs) =>
        val names = idxs.map(df.columns(_))
        new PlanBuilder(df.select(names.map(col): _*), shadow)
      case None => new PlanBuilder(df, shadow)
    }
  }

  def scanTable(spark: SparkSession, name: String, projection: Option[Seq[Int]]): PlanBuilder =
    scan(spark.table(name), projection, tableName = name)

  /** Reference `EmptyRelation` (logicalplan.rs:246-250). */
  def empty(spark: SparkSession): PlanBuilder =
    new PlanBuilder(spark.emptyDataFrame, MEmpty)
}
