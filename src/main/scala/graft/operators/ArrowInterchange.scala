package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{Instant, LocalDate}

import scala.collection.JavaConverters._

import org.apache.arrow.memory.{BufferAllocator, RootAllocator}
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, FieldType, Field => AField, Schema => ASchema}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC interchange — the reference's declared memory model
  * (/root/reference/README.md:10 "query compiler ... built on Apache
  * Arrow"; logicalplan.rs:17 imports `arrow::datatypes`), realized as a
  * distributed surface: each partition encodes to self-contained Arrow
  * IPC stream bytes (schema + record batches) and decodes back, via the
  * public Arrow Java API that ships with Spark — no Spark-private
  * converters.
  *
  * Scale design: everything is per-partition and bounded — batches of
  * `batchSize` rows encode/decode inside `mapPartitions`, nothing is
  * collected to the driver, and the IPC payload streams through the
  * existing partitioning (no shuffle). At 100 TB this is the shape an
  * Arrow-native consumer (Flight server, Python/pandas sidecar, another
  * engine) would tap: `toArrowIpc` is a produce-side tap, `fromArrowIpc`
  * the ingest side.
  *
  * Supported field types: boolean, byte/short/int/long, float/double,
  * string, binary, date, timestamp / timestamp_ntz (µs) — the Arrow-native subset of
  * the reference's type table (SURVEY §1.2). Anything else raises up
  * front with the offending field name.
  */
object ArrowInterchange {

  /** df -> one Arrow IPC stream (schema + one batch) per `batchSize` rows,
    * encoded inside each partition.
    */
  def toArrowIpc(df: DataFrame, batchSize: Int = 4096): Dataset[Array[Byte]] = {
    val schema = df.schema
    validate(schema)
    df.mapPartitions { it =>
      val allocator = partitionAllocator()
      it.grouped(batchSize).map(rows => encodeBatch(rows, schema, allocator))
    }(Encoders.BINARY)
  }

  /** Inverse of [[toArrowIpc]]: decode IPC stream bytes back to rows.
    * `schema` must match the encoded schema (it is also embedded in every
    * IPC payload; the explicit parameter keeps the result's Catalyst
    * schema static for the planner).
    */
  def fromArrowIpc(ipc: Dataset[Array[Byte]], schema: StructType): DataFrame = {
    validate(schema)
    ipc.mapPartitions { it =>
      val allocator = partitionAllocator()
      it.flatMap(bytes => decodeBatch(bytes, schema, allocator))
    }(Encoders.row(schema))
  }

  /** Encode-then-decode round trip, partition-local. Identity on the data;
    * used to prove Arrow interchange fidelity (oracle = same aggregate on
    * the un-round-tripped table).
    */
  def roundTrip(df: DataFrame, batchSize: Int = 4096): DataFrame =
    fromArrowIpc(toArrowIpc(df, batchSize), df.schema)

  // ---------------------------------------------------------------- internals

  /** One allocator per task, closed on task completion (the standard Spark
    * lifecycle for native Arrow memory).
    */
  private def partitionAllocator(): BufferAllocator = {
    val allocator = new RootAllocator()
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => allocator.close())
    allocator
  }

  private def validate(schema: StructType): Unit =
    schema.fields.foreach(f => arrowType(f): Unit)

  private def arrowType(f: StructField): ArrowType = f.dataType match {
    case BooleanType   => ArrowType.Bool.INSTANCE
    case ByteType      => new ArrowType.Int(8, true)
    case ShortType     => new ArrowType.Int(16, true)
    case IntegerType   => new ArrowType.Int(32, true)
    case LongType      => new ArrowType.Int(64, true)
    case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType    => ArrowType.Utf8.INSTANCE
    case BinaryType    => ArrowType.Binary.INSTANCE
    case DateType      => new ArrowType.Date(DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC")
    case TimestampNTZType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, null)
    case other => throw new IllegalArgumentException(
      s"ArrowInterchange: unsupported type $other for field ${f.name}")
  }

  private def toArrowSchema(schema: StructType): ASchema =
    new ASchema(schema.fields.map(f =>
      new AField(f.name, FieldType.nullable(arrowType(f)),
        java.util.Collections.emptyList[AField]())).toList.asJava)

  private[operators] def encodeBatch(
      rows: Seq[Row], schema: StructType, allocator: BufferAllocator): Array[Byte] = {
    val root = VectorSchemaRoot.create(toArrowSchema(schema), allocator)
    try {
      rows.zipWithIndex.foreach { case (row, i) =>
        schema.fields.indices.foreach { c =>
          setValue(root.getVector(c), i, row, c, schema.fields(c).dataType)
        }
      }
      root.setRowCount(rows.size)
      val baos = new ByteArrayOutputStream()
      val writer = new ArrowStreamWriter(root, null, Channels.newChannel(baos))
      try { writer.start(); writer.writeBatch(); writer.end() }
      finally writer.close()
      baos.toByteArray
    } finally root.close()
  }

  private[operators] def decodeBatch(
      bytes: Array[Byte], schema: StructType, allocator: BufferAllocator): Seq[Row] = {
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val out = Seq.newBuilder[Row]
      while (reader.loadNextBatch()) {
        (0 until root.getRowCount).foreach { i =>
          out += Row.fromSeq(schema.fields.indices.map(c =>
            getValue(root.getVector(c), i, schema.fields(c).dataType)))
        }
      }
      out.result()
    } finally reader.close()
  }

  private def setValue(v: FieldVector, i: Int, row: Row, c: Int, t: DataType): Unit =
    if (row.isNullAt(c)) v.asInstanceOf[BaseValueVector] match {
      case fw: BaseFixedWidthVector    => fw.setNull(i)
      case vw: BaseVariableWidthVector => vw.setNull(i)
      case other => throw new IllegalStateException(s"unexpected vector ${other.getClass}")
    } else t match {
      case BooleanType => v.asInstanceOf[BitVector].setSafe(i, if (row.getBoolean(c)) 1 else 0)
      case ByteType    => v.asInstanceOf[TinyIntVector].setSafe(i, row.getByte(c))
      case ShortType   => v.asInstanceOf[SmallIntVector].setSafe(i, row.getShort(c))
      case IntegerType => v.asInstanceOf[IntVector].setSafe(i, row.getInt(c))
      case LongType    => v.asInstanceOf[BigIntVector].setSafe(i, row.getLong(c))
      case FloatType   => v.asInstanceOf[Float4Vector].setSafe(i, row.getFloat(c))
      case DoubleType  => v.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(c))
      case StringType  => v.asInstanceOf[VarCharVector].setSafe(i, row.getString(c).getBytes(UTF_8))
      case BinaryType  => v.asInstanceOf[VarBinaryVector].setSafe(i, row.getAs[Array[Byte]](c))
      case DateType    => v.asInstanceOf[DateDayVector].setSafe(i,
        row.getAs[java.sql.Date](c).toLocalDate.toEpochDay.toInt)
      case TimestampType =>
        val inst = row.getAs[java.sql.Timestamp](c).toInstant
        v.asInstanceOf[TimeStampMicroTZVector].setSafe(i,
          Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L), inst.getNano / 1000L))
      case TimestampNTZType =>
        val ldt = row.getAs[java.time.LocalDateTime](c)
        v.asInstanceOf[TimeStampMicroVector].setSafe(i,
          Math.addExact(
            Math.multiplyExact(ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
            ldt.getNano / 1000L))
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }

  private def getValue(v: FieldVector, i: Int, t: DataType): Any =
    if (v.isNull(i)) null
    else t match {
      case BooleanType => v.asInstanceOf[BitVector].get(i) == 1
      case ByteType    => v.asInstanceOf[TinyIntVector].get(i)
      case ShortType   => v.asInstanceOf[SmallIntVector].get(i)
      case IntegerType => v.asInstanceOf[IntVector].get(i)
      case LongType    => v.asInstanceOf[BigIntVector].get(i)
      case FloatType   => v.asInstanceOf[Float4Vector].get(i)
      case DoubleType  => v.asInstanceOf[Float8Vector].get(i)
      case StringType  => new String(v.asInstanceOf[VarCharVector].get(i), UTF_8)
      case BinaryType  => v.asInstanceOf[VarBinaryVector].get(i)
      case DateType    =>
        java.sql.Date.valueOf(LocalDate.ofEpochDay(v.asInstanceOf[DateDayVector].get(i).toLong))
      case TimestampType =>
        val micros = v.asInstanceOf[TimeStampMicroTZVector].get(i)
        java.sql.Timestamp.from(Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
      case TimestampNTZType =>
        val micros = v.asInstanceOf[TimeStampMicroVector].get(i)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }
}
