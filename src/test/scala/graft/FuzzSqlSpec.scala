package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.GraftSql
import graft.plans._

/** Differential fuzzing of the SQL frontend against the mura builder
  * path — the reference's own declared contract tested in depth: its
  * planner translates the accepted SQL surface (scan / projection /
  * selection / sort / limit with the eight binary operators, casts, null
  * checks; /root/reference/src/planner/queryplanner.rs:36-71) into the
  * same logical algebra its LogicalPlanBuilder exposes, so the two
  * entries MUST agree on every query. Here: a generator over that
  * grammar emits each random plan BOTH as SQL text through
  * [[GraftSql.sql]] (Catalyst's parser) and as [[PlanBuilder]] calls
  * over [[GExpr]] (the algebra), and the results are compared
  * row-for-row. 1000 seed-deterministic queries (seed = iteration
  * index, so failures replay exactly; scalacheck shrinking adds nothing
  * over a printable failing seed).
  *
  * DuckDB cannot sit on the other side of this differential (it is
  * driver-side tooling, not a test dependency), but the frontend's
  * DuckDB agreement is already pinned per-query by the oracle board;
  * what THIS spec adds is grammar-wide coverage of SQL-text ≡ algebra.
  */
class FuzzSqlSpec extends SparkTestBase {

  private val NIter = 1000

  // ---- fixture: one small mixed-type table with nulls everywhere ------
  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("b", BooleanType),
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("s", StringType)))
  private val colNames = schema.fieldNames.toIndexedSeq
  private val words = IndexedSeq("", "a", "ab", "ba", "zq", "m")

  private lazy val table = {
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    (0 until 120).foreach { i =>
      rows.add(Row(
        i.toLong,
        if (i % 7 == 3) null else i % 2 == 0,
        if (i % 11 == 5) null else (i * 13 % 201) - 100,
        if (i % 13 == 6) null else ((i * 31 % 2001) - 1000).toLong,
        if (i % 17 == 2) null else (((i * 7 % 400) - 200) / 8.0).toFloat,
        if (i % 19 == 4) null else ((i * 23 % 4000) - 2000) / 16.0,
        if (i % 23 == 9) null else words(i % words.size)))
    }
    val df = spark.createDataFrame(rows, schema).repartition(3).cache()
    df.count()
    df.createOrReplaceTempView("fuzz_t")
    df
  }

  // ---- GExpr -> SQL text (parenthesize everything; no precedence) -----
  private def sqlLit(v: Any): String = v match {
    case null       => "NULL"
    case s: String  => "'" + s + "'" // generator emits [a-z]* only
    case d: Double  => s"${d}D"      // D suffix: DOUBLE, not DECIMAL
    case b: Boolean => b.toString
    case other      => other.toString
  }
  private def sqlOf(e: GExpr): String = e match {
    case GCol(n)      => n
    case GColIndex(i) => colNames(i)
    case GLit(v)      => sqlLit(v)
    case GBinary(a, op, b) =>
      val o = op match {
        case GOp.Eq => "="; case GOp.NotEq => "!="
        case GOp.Lt => "<"; case GOp.LtEq => "<="
        case GOp.Gt => ">"; case GOp.GtEq => ">="
        case GOp.And => "AND"; case GOp.Or => "OR"
        case GOp.Plus => "+"; case GOp.Minus => "-"
        case GOp.Mult => "*"; case GOp.Div => "/"
      }
      s"(${sqlOf(a)} $o ${sqlOf(b)})"
    case GNot(c)        => s"(NOT ${sqlOf(c)})"
    case GIsNull(c)     => s"(${sqlOf(c)} IS NULL)"
    case GIsNotNull(c)  => s"(${sqlOf(c)} IS NOT NULL)"
    case GCast(c, to)   => s"CAST(${sqlOf(c)} AS ${to.sql})"
    case GAlias(c, a)   => s"${sqlOf(c)} AS $a"
    case GSortExpr(c, asc) => s"${sqlOf(c)} ${if (asc) "ASC" else "DESC"}"
    case GScalarFn(n, args) => s"$n(${args.map(sqlOf).mkString(", ")})"
    case GAggFn(n, args)    => s"$n(${args.map(sqlOf).mkString(", ")})"
    case GWildcard          => "*"
  }

  // ---- generators over the mura-reachable grammar ---------------------
  // All column references are drawn from `avail` (the scan projection),
  // so a projected scan never produces dangling names; "id" is always
  // scanned and always a numeric candidate.
  private val numCols = Seq("i", "l", "f", "d")
  // ANSI-safe magnitudes: |col| <= 1000, |lit| <= 50, one arith level =>
  // no overflow; Div denominators are NON-ZERO literals (ANSI throws on
  // x/0) — the generator owns that invariant, not the consumer
  private val genNumLit: Gen[GExpr] =
    Gen.oneOf(Gen.choose(-50, 50).map(n => GLit(n)),
      Gen.choose(-50.0, 50.0).map(x => GLit(math.rint(x * 8) / 8)))
  private val genCmpOp: Gen[GOp] = Gen.oneOf(
    GOp.Eq, GOp.NotEq, GOp.Lt, GOp.LtEq, GOp.Gt, GOp.GtEq)

  private def genPred(depth: Int, avail: Seq[String]): Gen[GExpr] = {
    val nums = "id" +: numCols.filter(avail.contains)
    val genNumCol: Gen[GExpr] = Gen.oneOf(nums.map(GCol): Seq[GExpr])
    val genCast: Gen[GExpr] = Gen.oneOf(
      nums.map(c => GCast(GCol(c), DoubleType): GExpr) ++
        Seq("i", "f").filter(nums.contains).map(c =>
          GCast(GCol(c), LongType): GExpr))
    val genArith: Gen[GExpr] = for {
      a <- genNumCol
      op <- Gen.oneOf(GOp.Plus, GOp.Minus, GOp.Mult, GOp.Div)
      b <- if (op == GOp.Div)
        Gen.oneOf(2, 3, 4, 7, -5, 16).map(n => GLit(n)) // non-zero only
      else genNumLit
    } yield GBinary(a, op, b)
    val genNumExpr: Gen[GExpr] =
      Gen.frequency(4 -> genNumCol, 2 -> genNumLit, 2 -> genCast, 2 -> genArith)
    val strOpts: Seq[Gen[GExpr]] =
      (if (avail.contains("s")) Seq(Gen.const(GCol("s"): GExpr)) else Nil) ++
        Seq(Gen.oneOf(words).map(w => GLit(w): GExpr)) ++
        nums.take(2).map(c => Gen.const(GCast(GCol(c), StringType): GExpr))
    val genStrExpr: Gen[GExpr] = Gen.oneOf(strOpts).flatMap(identity)
    val atoms = Seq(
      4 -> (for { a <- genNumExpr; op <- genCmpOp; b <- genNumExpr }
        yield GBinary(a, op, b)),
      2 -> (for { a <- genStrExpr; op <- genCmpOp; b <- genStrExpr }
        yield GBinary(a, op, b)),
      1 -> Gen.oneOf(avail.map(c => GIsNull(GCol(c)): GExpr)),
      1 -> Gen.oneOf(avail.map(c => GIsNotNull(GCol(c)): GExpr))) ++
      (if (avail.contains("b")) Seq(1 -> Gen.const(GCol("b"): GExpr)) else Nil)
    val genAtom: Gen[GExpr] = Gen.frequency(atoms: _*)
    def loop(d: Int): Gen[GExpr] =
      if (d <= 0) genAtom
      else Gen.frequency(
        3 -> genAtom,
        1 -> loop(d - 1).map(GNot),
        2 -> (for {
          a <- loop(d - 1); op <- Gen.oneOf(GOp.And, GOp.Or)
          b <- loop(d - 1)
        } yield GBinary(a, op, b)))
    loop(depth)
  }

  private case class FuzzQuery(
      scanProj: Option[Seq[Int]], pred: Option[GExpr],
      proj: Seq[GExpr], sortKeys: Seq[GExpr], limit: Option[Int])

  private val genQuery: Gen[FuzzQuery] = for {
    scanProj <- Gen.option(Gen.someOf(colNames.indices).map(_.sorted.toSeq)
      .map(is => if (is.contains(0)) is else 0 +: is)) // keep id scanned
    avail = scanProj.map(_.map(colNames)).getOrElse(colNames)
    availNum = numCols.filter(avail.contains)
    pred <- Gen.option(genPred(2, avail.toSeq))
    wildcard <- Gen.prob(0.25)
    projCols <- Gen.someOf(avail.filterNot(_ == "id"))
    castProj <- Gen.prob(0.3)
    extra <- if (castProj && availNum.nonEmpty)
      Gen.oneOf(availNum).map(c =>
        Seq(GCast(GCol(c), DoubleType).as("x_cast"): GExpr))
    else Gen.const(Seq.empty[GExpr])
    proj = if (wildcard) Seq(GWildcard)
      else (GCol("id"): GExpr) +: projCols.map(GCol(_): GExpr) ++: extra
    sortable = if (wildcard) avail else "id" +: projCols.toSeq
    nSort <- Gen.choose(0, 2)
    keys <- Gen.pick(math.min(nSort, sortable.size), sortable)
    dirs <- Gen.listOfN(keys.size, Gen.oneOf(true, false))
    limit <- Gen.option(Gen.choose(0, 140))
  } yield {
    // a LIMIT needs a total order underneath to be deterministic: always
    // tiebreak by the unique id (also gives sorted runs a fixed order)
    val sk = keys.toSeq.zip(dirs).map { case (c, a) => GSortExpr(GCol(c), a) }
    FuzzQuery(scanProj, pred, proj, sk :+ GSortExpr(GCol("id"), asc = true),
      limit)
  }

  private def sqlTextOf(q: FuzzQuery): String = {
    val from = q.scanProj match {
      case Some(is) =>
        s"(SELECT ${is.map(colNames).mkString(", ")} FROM fuzz_t) scan_t"
      case None => "fuzz_t"
    }
    val where = q.pred.map(p => s" WHERE ${sqlOf(p)}").getOrElse("")
    val order = s" ORDER BY ${q.sortKeys.map(sqlOf).mkString(", ")}"
    val lim = q.limit.map(n => s" LIMIT $n").getOrElse("")
    s"SELECT ${q.proj.map(sqlOf).mkString(", ")} FROM $from$where$order$lim"
  }

  private def builderOf(q: FuzzQuery): org.apache.spark.sql.DataFrame = {
    var b = PlanBuilder.scan(table, q.scanProj, "fuzz_t")
    q.pred.foreach(p => b = b.filter(p))
    b = b.project(q.proj: _*).sort(q.sortKeys: _*)
    q.limit.foreach(n => b = b.limit(n))
    b.build()
  }

  test(s"SQL text and builder algebra agree on $NIter generated queries") {
    table // force fixture init: registers the fuzz_t temp view
    var ran = 0
    (0 until NIter).foreach { seed =>
      genQuery(Gen.Parameters.default, Seed(seed.toLong)).foreach { q =>
        ran += 1
        val sqlText = sqlTextOf(q)
        val viaSql =
          try GraftSql.sql(spark, sqlText).collect()
          catch { case e: Throwable =>
            fail(s"seed=$seed SQL side threw for: $sqlText\n$e")
          }
        val viaAlg =
          try builderOf(q).collect()
          catch { case e: Throwable =>
            fail(s"seed=$seed builder side threw for: $sqlText\n$e")
          }
        def canon(rs: Array[Row]) = rs.map(_.toSeq).toSeq
        assert(canon(viaSql) == canon(viaAlg),
          s"seed=$seed diverged (${viaSql.length} vs ${viaAlg.length} rows): $sqlText")
      }
    }
    // Gen.option/someOf cannot fail to produce, but guard the guard:
    assert(ran >= NIter * 9 / 10, s"only $ran/$NIter queries generated")
  }

  test("CREATE EXTERNAL TABLE column defs round-trip for 500 generated schemas") {
    // the other half of the frontend: the reference's SQL-type -> Arrow
    // mapping (queryplanner.rs:176-191), realized as parseSchema — fuzz
    // the rendered `name TYPE [NOT NULL]` defs against the parsed
    // StructType field-for-field.
    // Two DELIBERATE divergences from the reference's table (documented
    // at GraftSql.parseSchema): FLOAT/REAL map to Spark's 32-bit
    // FloatType where queryplanner.rs maps Float(_)/Real -> Float64
    // (we honor the declared width; the reference widens), and
    // TIMESTAMP is Spark's microsecond TimestampType where Arrow's is
    // nanosecond (Spark has no ns timestamp). This test pins OUR
    // contract, not byte-fidelity to the reference's Arrow schema.
    val types: Seq[(String, DataType)] = Seq(
      "BOOLEAN" -> BooleanType, "TINYINT" -> ByteType,
      "SMALLINT" -> ShortType, "INT" -> IntegerType,
      "INTEGER" -> IntegerType, "BIGINT" -> LongType,
      "FLOAT" -> FloatType, "REAL" -> FloatType, "DOUBLE" -> DoubleType,
      "CHAR" -> StringType, "VARCHAR" -> StringType, "TEXT" -> StringType,
      "STRING" -> StringType, "TIMESTAMP" -> TimestampType,
      "DATE" -> DateType, "BINARY" -> BinaryType,
      "UINT8" -> ShortType, "UINT16" -> IntegerType,
      "UINT32" -> LongType, "UINT64" -> DecimalType(20, 0))
    val genSchema: Gen[Seq[(String, (String, DataType), Boolean)]] = for {
      n <- Gen.choose(1, 12)
      ts <- Gen.listOfN(n, Gen.oneOf(types))
      nn <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield ts.zip(nn).zipWithIndex.map { case ((t, not), i) => (s"c$i", t, not) }
    (0 until 500).foreach { seed =>
      genSchema(Gen.Parameters.default, Seed(seed.toLong)).foreach { fields =>
        val defs = fields.map { case (nm, (sql, _), nn) =>
          s"$nm $sql${if (nn) " NOT NULL" else ""}"
        }.mkString(", ")
        val parsed = graft.engine.GraftSql.parseSchema(defs)
        assert(parsed.length == fields.size, s"seed=$seed: $defs")
        parsed.fields.zip(fields).foreach { case (f, (nm, (_, dt), nn)) =>
          assert(f.name == nm && f.dataType == dt && f.nullable == !nn,
            s"seed=$seed field ${f.name}: got (${f.dataType}, nullable=${f.nullable})" +
              s" want ($dt, nullable=${!nn}) from: $defs")
        }
      }
    }
  }
}
