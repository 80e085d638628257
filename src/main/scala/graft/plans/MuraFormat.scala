package graft.plans

import org.apache.spark.sql.types._

/** The reference's plan pretty-printer, byte-for-byte
  * (/root/reference/src/planner/logicalplan.rs:292-362): `fmt_with_indent`
  * over the plan tree plus Rust's derived `Debug` for `Expression`
  * (logicalplan.rs:25-83), `Operator` (132-149) and `ScalarValue`
  * (152-182). `PlanBuilder` records this shadow tree next to the Spark
  * plan it actually builds, so the port's one observable output — the
  * printed plan the reference's only test asserts on
  * (logicalplan.rs:481-485) — is exactly comparable.
  */
sealed trait MuraPlan
object MuraPlan {
  case object MEmpty                                            extends MuraPlan
  final case class MScan(table: String, projection: Option[Seq[Int]]) extends MuraPlan
  final case class MProjection(exprs: Seq[GExpr], input: MuraPlan)    extends MuraPlan
  final case class MSelection(expr: GExpr, input: MuraPlan)           extends MuraPlan
  final case class MSort(exprs: Seq[GExpr], input: MuraPlan)          extends MuraPlan
  final case class MLimit(n: Int, input: MuraPlan)                    extends MuraPlan
  final case class MCreateTable(name: String)                         extends MuraPlan
}

object MuraFormat {
  import MuraPlan._

  def print(p: MuraPlan): String = {
    val sb = new StringBuilder
    fmt(p, 0, sb)
    sb.toString
  }

  // fmt_with_indent (logicalplan.rs:293-300): children on a new line,
  // two spaces per indent level.
  private def fmt(p: MuraPlan, indent: Int, sb: StringBuilder): Unit = {
    if (indent > 0) { sb.append('\n'); sb.append("  " * indent) }
    p match {
      case MEmpty => sb.append("EmptyRelation")
      case MScan(t, proj) =>
        val ps = proj match {
          case None       => "None"
          case Some(idxs) => idxs.mkString("Some([", ", ", "])")
        }
        sb.append(s"Scan: $t projection=$ps")
      case MProjection(es, in) =>
        sb.append("Projection: ").append(es.map(expr).mkString(", "))
        fmt(in, indent + 1, sb)
      case MSelection(e, in) =>
        sb.append("Selection: ").append(expr(e)); fmt(in, indent + 1, sb)
      case MSort(es, in) =>
        sb.append("Sort: ").append(es.map(expr).mkString(", "))
        fmt(in, indent + 1, sb)
      case MLimit(n, in) =>
        // The reference's SQL path wraps every numeric literal as Float64
        // (queryplanner.rs:109), so LIMIT n prints as a Float64 literal.
        sb.append(s"Limit: Literal(Float64($n.0))"); fmt(in, indent + 1, sb)
      case MCreateTable(n) => sb.append(s"""CreateTable: "$n"""")
    }
  }

  /** Rust `{:?}` of `Expression` (logicalplan.rs:25-83; `Arc<Expression>`
    * Debug-delegates to the inner value). `GAlias` is this port's
    * extension — the reference has no alias node, so it prints its child.
    * `GScalarFn`/`GAggFn` omit the reference's `return_type` field (our
    * ADT defers typing to Catalyst; documented divergence, SURVEY §7).
    */
  private[plans] def expr(e: GExpr): String = e match {
    case GCol(n)      => s"""UnresolvedColumn("$n")"""
    case GColIndex(i) => s"Column($i)"
    case GLit(v)      => s"Literal(${scalar(v)})"
    case GBinary(l, op, r) =>
      s"BinaryExpression { left: ${expr(l)}, op: ${opName(op)}, right: ${expr(r)} }"
    case GNot(c)       => s"Not(${expr(c)})"
    case GIsNull(c)    => s"IsNull(${expr(c)})"
    case GIsNotNull(c) => s"IsNotNull(${expr(c)})"
    case GCast(c, to)  => s"Cast { expr: ${expr(c)}, data_type: ${arrowType(to)} }"
    case GSortExpr(c, asc) => s"Sort { expr: ${expr(c)}, asc: $asc }"
    case GScalarFn(n, args) =>
      s"""ScalarFunction { name: "$n", args: [${args.map(expr).mkString(", ")}] }"""
    case GAggFn(n, args) =>
      s"""AggregateFunction { name: "$n", args: [${args.map(expr).mkString(", ")}] }"""
    case GAlias(c, _) => expr(c)
    case GWildcard    => "Wildcard"
  }

  // Operator Debug names (logicalplan.rs:132-149). Arithmetic is this
  // port's extension (the reference's SQL translation lacks it,
  // queryplanner.rs:121-132) — printed with the obvious names.
  private def opName(op: GOp): String = op match {
    case GOp.Eq => "Eq";   case GOp.NotEq => "NotEq"
    case GOp.Lt => "Lt";   case GOp.LtEq  => "LtEq"
    case GOp.Gt => "Gt";   case GOp.GtEq  => "GtEq"
    case GOp.And => "And"; case GOp.Or    => "Or"
    case GOp.Plus => "Plus"; case GOp.Minus => "Minus"
    case GOp.Mult => "Multiply"; case GOp.Div => "Divide"
  }

  // ScalarValue Debug (logicalplan.rs:152-182), Scala runtime type ->
  // the reference's variant.
  private def scalar(v: Any): String = v match {
    case null       => "Null"
    case b: Boolean => s"Boolean($b)"
    case b: Byte    => s"Int8($b)"
    case s: Short   => s"Int16($s)"
    case i: Int     => s"Int32($i)"
    case l: Long    => s"Int64($l)"
    case f: Float   => s"Float32(${rustFloat(f.toDouble)})"
    case d: Double  => s"Float64(${rustFloat(d)})"
    case s: String  => s"""Utf8("$s")"""
    case other      => s"""Utf8("$other")"""
  }

  // Rust's f64 Debug always keeps a fractional part: 5.0 prints "5.0".
  private def rustFloat(d: Double): String =
    if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  // Arrow DataType Debug names (logicalplan.rs:17 imports
  // arrow::datatypes::DataType; variants per arrow 0.16).
  private def arrowType(t: DataType): String = t match {
    case BooleanType   => "Boolean"
    case ByteType      => "Int8"
    case ShortType     => "Int16"
    case IntegerType   => "Int32"
    case LongType      => "Int64"
    case FloatType     => "Float32"
    case DoubleType    => "Float64"
    case StringType    => "Utf8"
    case BinaryType    => "Binary"
    case DateType      => "Date32(Day)"
    case TimestampType => "Timestamp(Nanosecond, None)"
    case other         => other.simpleString
  }
}
