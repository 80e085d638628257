package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.ArrowInterchange

/** Arrow IPC interchange fidelity (ArrowInterchange.scala): every
  * supported type round-trips exactly, nulls survive, batches split
  * correctly, and the payloads are genuine Arrow streams (magic check).
  */
class ArrowInterchangeSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("b", BooleanType), StructField("i8", ByteType),
    StructField("i16", ShortType), StructField("i32", IntegerType),
    StructField("i64", LongType), StructField("f32", FloatType),
    StructField("f64", DoubleType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("d", DateType),
    StructField("ts", TimestampType)))

  private def fixture = {
    val rows = java.util.Arrays.asList(
      Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5, "héllo",
        Array[Byte](1, 2, 3), Date.valueOf("2020-02-29"),
        Timestamp.valueOf("2021-06-01 12:34:56.789")),
      Row(false, (-1).toByte, (-2).toShort, -3, -4L, -1.5f, -2.5, "",
        Array[Byte](), Date.valueOf("1969-12-31"),
        Timestamp.valueOf("1969-12-31 23:59:59.999999")),
      Row(null, null, null, null, null, null, null, null, null, null, null))
    spark.createDataFrame(rows, schema)
  }

  test("all supported types + nulls round-trip exactly") {
    val back = ArrowInterchange.roundTrip(fixture).collect()
    val orig = fixture.collect()
    assert(back.length == orig.length)
    // Sort both by a stable key (nulls last) for order-insensitive compare.
    def key(r: Row) = if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)
    val (b, o) = (back.sortBy(key), orig.sortBy(key))
    b.zip(o).foreach { case (x, y) =>
      (0 until schema.length).foreach { c =>
        (x.get(c), y.get(c)) match {
          case (a: Array[Byte], e: Array[Byte]) => assert(a.sameElements(e), s"col $c")
          case (a, e) => assert(a == e, s"col $c: $a != $e")
        }
      }
    }
  }

  test("toArrowIpc emits valid Arrow stream payloads, one per batch") {
    val df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s")
    val ipc = ArrowInterchange.toArrowIpc(df.coalesce(1), batchSize = 4).collect()
    // 10 rows in batches of 4 -> 3 payloads.
    assert(ipc.length == 3)
    // Arrow IPC streams open with a 0xFFFFFFFF continuation marker.
    ipc.foreach { bytes =>
      assert(bytes.length > 8)
      assert(bytes.take(4).forall(_ == -1), "missing Arrow stream continuation marker")
    }
    val back = ArrowInterchange.fromArrowIpc(
      spark.createDataset(ipc.toSeq)(org.apache.spark.sql.Encoders.BINARY),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("s", StringType))))
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == (0L until 10L))
  }

  test("roundTrip is identity on a real table slice (lineitem)") {
    val slice = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    val a = slice.orderBy("l_orderkey", "l_linenumber", "l_quantity").collect()
    val b = ArrowInterchange.roundTrip(slice, batchSize = 100)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("unsupported type raises up front with the field name") {
    val df = spark.range(3).selectExpr("id", "CAST(id AS DECIMAL(10,2)) AS dec")
    val e = intercept[IllegalArgumentException](ArrowInterchange.toArrowIpc(df))
    assert(e.getMessage.contains("dec"))
  }
}
