package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Sessionize}

class SessionizeSpec extends SparkTestBase {

  private lazy val events = Tables.t(spark, sf, "events").cache()

  test("byGap and native session_window agree on session count per user") {
    // same gap, same data: the number of sessions per user must match
    val gapped = Sessionize.aggByGap(events, "user_id", "ts", "event_id", 1800)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sw = Sessionize.bySessionWindow(events, "user_id", "ts", "30 minutes")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gapped == sw)
  }

  test("session boundaries respect the gap") {
    val sessions = Sessionize.aggByGap(events, "user_id", "ts", "event_id", 1800)
      .orderBy("user_id", "session_id").collect()
    // consecutive sessions of one user start > 30min after the prior ends
    sessions.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getTimestamp(3).getTime - a.getTimestamp(4).getTime
          assert(gap > 1800 * 1000L, s"gap $gap ms <= 30min between sessions")
        case _ =>
      }
    }
  }

  test("as-of join: every match is the latest right row at-or-before") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "e1"), (1L, 200L, "e2"), (1L, 50L, "e0"), (2L, 100L, "f1")
    ).toDF("k", "t", "name").withColumn("ts", timestamp_micros(col("t") * 1000000))
    val right = Seq(
      (1L, 90L, 900L), (1L, 150L, 950L), (2L, 400L, 999L)
    ).toDF("k", "t", "payload").withColumn("rts", timestamp_micros(col("t") * 1000000))
      .drop("t")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("payload"))
      .select("name", "payload").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("e0").isEmpty)              // nothing at-or-before t=50
    assert(out("e1").contains(900L))       // 90 <= 100
    assert(out("e2").contains(950L))       // latest of {90, 150}
    assert(out("f1").isEmpty)              // right row is in the future
  }

  test("nearest as-of: closest side wins, ties go backward, one-sided falls through") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "mid"),   // backward at 90 (d=10) vs forward at 150 (d=50) -> 90
      (1L, 140L, "fwd"),   // backward at 90 (d=50) vs forward at 150 (d=10) -> 150
      (1L, 120L, "tie"),   // 90 and 150 both d=30 -> backward wins the tie
      (1L, 10L, "onlyF"),  // nothing at-or-before -> forward 90
      (2L, 500L, "onlyB"), // nothing at-or-after -> backward 400
      (3L, 7L, "none")     // no right rows for key 3 at all
    ).toDF("k", "t", "name").withColumn("ts", timestamp_micros(col("t") * 1000000))
    val right = Seq(
      (1L, 90L, 90L), (1L, 150L, 150L), (2L, 400L, 400L)
    ).toDF("k", "t", "payload").withColumn("rts", timestamp_micros(col("t") * 1000000))
      .drop("t")
    val out = AsOfJoin.nearest(left, right, "k", "ts", "rts", Seq("payload"))
      .select("name", "payload").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("mid").contains(90L))
    assert(out("fwd").contains(150L))
    assert(out("tie").contains(90L), s"tie must break backward: ${out("tie")}")
    assert(out("onlyF").contains(90L))
    assert(out("onlyB").contains(400L))
    assert(out("none").isEmpty)
  }

  test("native (custom Catalyst operator) as-of join == union-trick implementation") {
    val ev = events.filter(col("user_id") < 30)
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("last_error_id"))
    val viaWindow = graft.operators.AsOfJoin.backward(
        ev, errs.withColumnRenamed("err_ts", "ts2").withColumnRenamed("ts2", "ts"),
        "user_id", "ts", "ts", Seq("last_error_id"))
      .select("event_id", "last_error_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val viaNative = graft.operators.AsOfJoin.native(
        ev, errs, "user_id", "ts", "err_ts", Seq("last_error_id"))
      .select("event_id", "last_error_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaNative == viaWindow)
    assert(viaNative.values.exists(_.nonEmpty))
  }

  test("optimizer rule pushes left-only filters through the as-of node") {
    val ev = events
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("last_error_id"))
    val joined = graft.operators.AsOfJoin.native(
      ev, errs, "user_id", "ts", "err_ts", Seq("last_error_id"))
    val filtered = joined.filter(col("event_type") === "purchase")
    val optimized = filtered.queryExecution.optimizedPlan
    // the Filter must sit BELOW AsOfJoinNode after optimization
    val nodeChildFiltered = optimized.collect {
      case aj: graft.plans.AsOfJoinNode =>
        aj.left.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("purchase") => f
        }.isDefined
    }
    assert(nodeChildFiltered == Seq(true),
      s"filter not pushed below AsOfJoinNode:\n${optimized.treeString}")
    // and semantics are unchanged vs filtering after the fact
    val viaTop = joined.collect().filter(_.getAs[String]("event_type") == "purchase")
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("last_error_id"))).toMap
    val viaPushed = filtered.collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("last_error_id"))).toMap
    assert(viaPushed == viaTop)
  }

  test("native as-of join rejects unknown columns with a clear error") {
    val ev = events.limit(10)
    val e = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.native(ev, ev.select(col("user_id"), col("ts").as("rts")),
        "nope", "ts", "rts", Seq())
    }
    assert(e.getMessage.contains("nope"))
  }

  test("native as-of join handles null keys/timestamps like the window path") {
    import spark.implicits._
    // null keys and null timestamps on both sides: the window path groups
    // nulls as one key (Window partitionBy) and sorts nulls first; the
    // native merge must agree instead of NPE-ing in the key ordering.
    val left = Seq(
      (1L, 100L, "a"), (0L, 150L, "b"), (2L, 100L, "c"), (1L, 0L, "d")
    ).toDF("k0", "t0", "name")
      .select(
        when(col("k0") =!= 0L, col("k0")).as("k"), // k0=0 -> null key
        when(col("t0") =!= 0L, timestamp_micros(col("t0") * 1000000)).as("ts"),
        col("name"))
    val right = Seq(
      (1L, 90L, 900L), (0L, 120L, 111L), (0L, 140L, 222L), (2L, 0L, 333L)
    ).toDF("k0", "t0", "payload")
      .select(
        when(col("k0") =!= 0L, col("k0")).as("k"),
        when(col("t0") =!= 0L, timestamp_micros(col("t0") * 1000000)).as("rts"),
        col("payload"))
    val viaWindow = AsOfJoin.backward(
        left, right.withColumnRenamed("rts", "ts"), "k", "ts", "ts", Seq("payload"))
      .select("name", "payload").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    val viaNative = AsOfJoin.native(left, right, "k", "ts", "rts", Seq("payload"))
      .select("name", "payload").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(viaNative == viaWindow, s"native $viaNative vs window $viaWindow")
    assert(viaNative("a").contains(900L)) // plain backward match still works
    assert(viaNative("b").contains(222L)) // null key matches latest null-key right
  }

  test("as-of join ties: equal timestamp right row matches (inclusive)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e")).toDF("k", "t", "name")
      .withColumn("ts", timestamp_micros(col("t") * 1000000))
    val right = Seq((1L, 100L, 7L)).toDF("k", "t", "payload")
      .withColumn("rts", timestamp_micros(col("t") * 1000000)).drop("t")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("payload"))
      .select("payload").collect()(0).getLong(0)
    assert(out == 7L)
  }

  test("non-orderable (map) payload columns still join: excluded from the tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e")).toDF("k", "t", "name")
      .withColumn("ts", timestamp_micros(col("t") * 1000000)).drop("t")
    // a map payload cannot be a Window sort key — the tiebreak must skip
    // it rather than fail the whole join at analysis
    val right = Seq((1L, 90L, Map("a" -> "1")), (1L, 80L, Map("b" -> "2")))
      .toDF("k", "t", "attrs")
      .withColumn("rts", timestamp_micros(col("t") * 1000000)).drop("t")
    Seq(
      AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("attrs")),
      AsOfJoin.forward(left.withColumn("ts",
        timestamp_micros(lit(50L) * 1000000)), right, "k", "ts", "rts", Seq("attrs")),
      AsOfJoin.nearest(left, right, "k", "ts", "rts", Seq("attrs"))
    ).foreach { out =>
      val m = out.select("attrs").collect()(0).getMap[String, String](0)
      assert(m.nonEmpty)
    }
    // backward must still pick the LATEST map (ts=90), no tie involved
    val b = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("attrs"))
      .select("attrs").collect()(0).getMap[String, String](0)
    assert(b == Map("a" -> "1"))
  }

  test("duplicate (key, ts) right rows resolve deterministically at any partitioning") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e")).toDF("k", "t", "name")
      .withColumn("ts", timestamp_micros(col("t") * 1000000)).drop("t")
    // three right rows at the SAME (key, ts) with different payloads —
    // last() over equal-ordering-key peers used to be order-undefined;
    // the contract is a STABLE pick (greatest payload hash), so assert
    // one consistent winner across partitionings and variants, not a
    // particular value
    val right = Seq((1L, 90L, 5L), (1L, 90L, 9L), (1L, 90L, 1L))
      .toDF("k", "t", "payload")
      .withColumn("rts", timestamp_micros(col("t") * 1000000)).drop("t")
    def picks(rep: Int): Seq[Long] = Seq(
      AsOfJoin.backward(left, right.repartition(rep), "k", "ts", "rts",
        Seq("payload")),
      AsOfJoin.forward(left.withColumn("ts",
        timestamp_micros(lit(50L) * 1000000)), right.repartition(rep),
        "k", "ts", "rts", Seq("payload")),
      AsOfJoin.nearest(left, right.repartition(rep), "k", "ts", "rts",
        Seq("payload"))
    ).map(_.select("payload").collect()(0).getLong(0))
    val all = (1 to 3).map(picks)
    assert(all.distinct.size == 1,
      s"tie pick varies with partitioning: $all")
    assert(all.head.distinct.size == 1 && Set(5L, 9L, 1L)(all.head.head),
      s"variants disagree or picked a non-row: ${all.head}")
  }
}
