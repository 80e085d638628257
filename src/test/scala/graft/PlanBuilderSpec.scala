package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.plans._

/** Port of the reference's single unit test, `test_simple_plan_builder`
  * (/root/reference/src/planner/logicalplan.rs:469-488): employee
  * scan(projection=[0,3]) -> filter(state = 'CO') -> project(id), asserted
  * on plan shape — plus the result assertions the reference couldn't make
  * (it had no executor).
  */
class PlanBuilderSpec extends SparkTestBase {

  // The reference's employee fixture (logicalplan.rs:490-498).
  private lazy val employee = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("first_name", StringType, nullable = false),
      StructField("last_name", StringType, nullable = false),
      StructField("state", StringType, nullable = false),
      StructField("salary", IntegerType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, "Alice", "Ashton", "CO", 90000),
        Row(2, "Bob", "Baker", "CA", 80000),
        Row(3, "Cleo", "Cole", "CO", 85000),
        Row(4, "Dan", "Dow", "WA", 70000)),
      schema)
  }

  test("golden plan: scan(proj [0,3]) -> filter(state='CO') -> project(id)") {
    val plan = PlanBuilder.scan(employee, projection = Some(Seq(0, 3)))
      .filter(GExpr.eq(GCol("state"), GLit("CO")))
      .project(GExpr.c("id"))
    // Plan shape: Project over Filter over (projected) scan — the same
    // nesting the reference asserts as a pretty-printed string.
    val tree = plan.explainTree
    assert(tree.contains("Project"))
    assert(tree.contains("Filter"))
    val analyzed = plan.build().queryExecution.analyzed
    assert(analyzed.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project])
    // ...and the part mura never had: the result.
    val rows = plan.sort(GSortExpr(GCol("id"), asc = true)).build()
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 3))
  }

  test("golden plan string: exact tree shape (exprIds normalized)") {
    // The reference's assertion style (logicalplan.rs:481-485): compare the
    // pretty-printed plan against a golden literal. Spark embeds exprIds
    // (#12) and a LocalRelation leaf; normalize both.
    val tree = PlanBuilder.scan(employee, projection = Some(Seq(0, 3)))
      .filter(GExpr.eq(GCol("state"), GLit("CO")))
      .project(GExpr.c("id"))
      .explainTree
    val normalized = tree
      .replaceAll("#\\d+", "")
      .replaceAll("(?s)\\+- LocalRelation.*", "+- LocalRelation [...]")
      .trim
    val golden =
      """'Project ['id]
        |+- Filter (state = CO)
        |   +- Project [id, state]
        |      +- LocalRelation [...]""".stripMargin.trim
    assert(normalized == golden, s"plan drifted:\n$tree")
  }

  test("mura-format printer matches the reference's golden literal byte-for-byte") {
    // The exact expected string from the reference's only unit test
    // (logicalplan.rs:481-485), including its \n + two-space indentation.
    val plan = PlanBuilder.scan(employee, projection = Some(Seq(0, 3)), tableName = "employee")
      .filter(GExpr.eq(GCol("state"), GLit("CO")))
      .project(GExpr.c("id"))
    val expected =
      "Projection: UnresolvedColumn(\"id\")" +
        "\n  Selection: BinaryExpression { left: UnresolvedColumn(\"state\"), op: Eq, right: Literal(Utf8(\"CO\")) }" +
        "\n    Scan: employee projection=Some([0, 3])"
    assert(plan.muraString == expected)
  }

  test("mura-format printer covers the remaining node and expression forms") {
    val p = PlanBuilder.scan(employee, tableName = "employee")
      .filter(GBinary(GIsNotNull(GCol("state")), GOp.And,
        GNot(GBinary(GCol("salary"), GOp.Lt, GLit(50000)))))
      .project(GExpr.cIdx(0), GCast(GCol("salary"), LongType).as("s"),
        GScalarFn("abs", Seq(GLit(1.5))))
      .sort(GSortExpr(GCol("id"), asc = true))
      .limit(10)
    val s = p.muraString
    assert(s.startsWith("Limit: Literal(Float64(10.0))"))
    assert(s.contains("\n  Sort: Sort { expr: UnresolvedColumn(\"id\"), asc: true }"))
    assert(s.contains("Column(0), Cast { expr: UnresolvedColumn(\"salary\"), data_type: Int64 }"))
    assert(s.contains("ScalarFunction { name: \"abs\", args: [Literal(Float64(1.5))] }"))
    assert(s.contains("Not(BinaryExpression { left: UnresolvedColumn(\"salary\"), op: Lt, right: Literal(Int32(50000)) })"))
    assert(s.contains("IsNotNull(UnresolvedColumn(\"state\"))"))
    // scan sits at depth 4 (limit > sort > projection > selection > scan)
    assert(s.endsWith("\n" + "  " * 4 + "Scan: employee projection=None"))
    assert(PlanBuilder.empty(spark).muraString == "EmptyRelation")
  }

  test("ordinal projection resolves by input position (logicalplan.rs:31)") {
    val df = PlanBuilder.scan(employee)
      .project(GExpr.cIdx(0), GExpr.cIdx(3))
      .build()
    assert(df.columns.toSeq == Seq("id", "state"))
  }

  test("wildcard expands to all input columns in order (logicalplan.rs:406-418)") {
    val df = PlanBuilder.scan(employee).project(GWildcard, GExpr.c("id").as("id2")).build()
    assert(df.columns.toSeq == Seq("id", "first_name", "last_name", "state", "salary", "id2"))
  }

  test("empty relation has zero rows (logicalplan.rs:246-250)") {
    assert(PlanBuilder.empty(spark).build().count() == 0)
  }

  test("binary ops + not/isnull/cast resolve with Spark typing") {
    import GOp._
    val df = PlanBuilder.scan(employee)
      .filter(GBinary(
        GBinary(GCol("salary"), GtEq, GLit(80000)), And,
        GNot(GExpr.eq(GCol("state"), GLit("WA")))))
      .project(GExpr.c("id"), GCast(GCol("salary"), LongType).as("sal_l"))
      .sort(GSortExpr(GCol("id"), asc = true))
      .build()
    assert(df.schema("sal_l").dataType == LongType)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("limit caps rows (logicalplan.rs:251-259)") {
    assert(PlanBuilder.scan(employee).limit(2).build().count() == 2)
  }
}
