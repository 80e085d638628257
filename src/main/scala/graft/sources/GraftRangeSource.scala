package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 batch source: a deterministic synthetic table
  * `(id BIGINT, val DOUBLE, payload STRING)` of `rows` rows in `parts`
  * slices, with
  *   - partition planning: each slice is an [[InputPartition]] scheduled
  *     independently (the 1000-executor story: planInputPartitions IS the
  *     parallelism contract),
  *   - filter pushdown: id-range predicates prune whole partitions at plan
  *     time and bound the generator loop inside surviving ones,
  *   - column pruning: only requested columns are generated.
  *
  * This is the extension path a new file format / service connector takes
  * on Spark — the reference's `FileType` enum declares exactly one format
  * and no reader (/root/reference/src/parser/mod.rs:21-24); DSv2 is how
  * that contract generalizes. Registered as format "graftrange" via
  * META-INF/services.
  */
class GraftRangeSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftrange"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftRangeTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("parts", "4").toInt)
}

object GraftRangeSource {
  val fullSchema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("val", DoubleType, nullable = false)
    .add("payload", StringType, nullable = false)

  /** Deterministic row content (same everywhere, any partitioning). */
  def valOf(id: Long): Double = id * 0.5
  def payloadOf(id: Long): String = s"row-$id"
}

private[sources] class GraftRangeTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graftrange($rows,$parts)"
  override def schema(): StructType = GraftRangeSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(rows, parts,
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(100L))
}

private[sources] class GraftRangeScanBuilder(rows: Long, parts: Int,
    rowsPerBatch: Long = 100L)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = GraftRangeSource.fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var lo: Long = 0L        // inclusive id lower bound
  private var hi: Long = Long.MaxValue // exclusive id upper bound

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept id-range filters (they tighten [lo, hi)); everything else is
    * returned as residual for Spark to evaluate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull("id")                   => true // nothing is null here
      case _                                 => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graftrange rows=$rows parts=$parts pushed=[${pushed.mkString(", ")}] id in [$lo, $hi)"

    override def planInputPartitions(): Array[InputPartition] = {
      val bound = math.min(hi, rows)
      val per = math.max(1L, (rows + parts - 1) / parts)
      (0 until parts).iterator
        .map { p =>
          val s = p * per
          val e = math.min(s + per, rows)
          // intersect the slice with the pushed id range: empty -> pruned
          RangePartition(math.max(s, lo), math.min(e, bound))
        }
        .filter(ip => ip.start < ip.end)
        .toArray[InputPartition]
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new RangeReaderFactory(required.fieldNames)

    override def toMicroBatchStream(checkpointLocation: String):
        org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new GraftRangeMicroBatchStream(rows, parts, rowsPerBatch, required.fieldNames)
  }
}

private[sources] case class RangePartition(start: Long, end: Long) extends InputPartition

private[sources] class RangeReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var cur = rp.start - 1
      override def next(): Boolean = { cur += 1; cur < rp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id"      => cur
          case "val"     => GraftRangeSource.valOf(cur)
          case "payload" => UTF8String.fromString(GraftRangeSource.payloadOf(cur))
        })
      override def close(): Unit = ()
    }
  }
}

/** Streaming extension of the graftrange source: each micro-batch emits the
  * next `rowsPerBatch` ids until `rows` are exhausted — a deterministic,
  * replayable rate-style stream. Offsets are plain "last id emitted"
  * watermarks, so restart-from-checkpoint replays exactly the uncommitted
  * tail (the same contract a file/kafka source honors).
  */
private[sources] class GraftRangeMicroBatchStream(rows: Long, parts: Int,
    rowsPerBatch: Long, cols: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset}

  private case class IdOffset(last: Long) extends SOffset {
    override def json(): String = last.toString
  }

  @volatile private var emitted: Long = 0L

  override def initialOffset(): SOffset = IdOffset(0L)
  override def deserializeOffset(json: String): SOffset = {
    // Checkpoint recovery: a fresh stream instance starts with emitted = 0,
    // so latestOffset() would regress below the committed start offset and
    // emit a run of empty batches. Seed progress from every restored offset
    // (deserializeOffset is how the engine hands us checkpointed state).
    val restored = json.toLong
    if (restored > emitted) emitted = restored
    IdOffset(restored)
  }
  override def latestOffset(): SOffset = {
    emitted = math.min(rows, emitted + rowsPerBatch)
    IdOffset(emitted)
  }
  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[IdOffset].last
    val e = end.asInstanceOf[IdOffset].last
    val per = math.max(1L, (e - s + parts - 1) / parts)
    (0 until parts).iterator
      .map(p => RangePartition(s + p * per, math.min(s + (p + 1) * per, e)))
      .filter(ip => ip.start < ip.end)
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(cols)
  override def commit(offset: SOffset): Unit = ()
  override def stop(): Unit = ()
}
