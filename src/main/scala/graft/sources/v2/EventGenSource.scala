package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic `events`
  * generator (`spark.read.format("graft.sources.v2.EventGenSource")
  * .option("rows", n).option("parts", p)`). Exercises the full
  * connector surface a production source needs — TableProvider →
  * SupportsRead → ScanBuilder with COLUMN-PRUNING pushdown →
  * planInputPartitions → per-partition readers — with zero I/O, so
  * specs can pin the contract (schema, parallelism, pruned read
  * schema, exact values) without a network or filesystem.
  *
  * Determinism: row i is a pure function of i (Weyl-hash value,
  * modulo user/type), identical on any partitioning — the same
  * layout-blindness rule every graft sampler follows. Scale: rows
  * are generated partition-locally from [start, end) index ranges —
  * the connector shape for any range-partitionable upstream (a REST
  * API with offset paging, a keyspace scan, a queue with offsets). */
class EventGenSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventGenSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventGenTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(4))
}

object EventGenSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val types: Array[String] = Array("click", "view", "purchase", "error", "search")

  /** Row i as (event_id, user_id, event_type, value) — pure in i. */
  def row(i: Long): (Long, Long, String, Double) = {
    val u = (i * 2654435761L) % 4294967296L
    (i, i % 97, types((i % types.length).toInt), (u % 100000L) / 1000.0)
  }
}

private class EventGenTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_event_gen($rows)"
  override def schema(): StructType = EventGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventGenScanBuilder(rows, parts,
      Option(options.get("batchRows")).map(_.toLong).getOrElse(100L))
}

/** Column pruning AND event_id-range filter pushdown reach the
  * generator: only requested fields are materialized, and pushed
  * `event_id` bounds shrink the generated index range itself — the V2
  * analogue of parquet's ReadSchema + PushedFilters, except the
  * "skipped" rows are never produced at all (an offset-pageable
  * upstream would likewise turn them into a narrower page range). */
private class EventGenScanBuilder(rows: Long, parts: Int, batchRows: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = EventGenSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Only INTEGRAL comparison values are accepted: a fractional bound
  // (e.g. LessThan(event_id, 4.5)) truncated via longValue would
  // silently change semantics (hi=4 wrongly excludes id 4), and once a
  // filter is reported as pushed Spark does NOT re-apply it. Spark's
  // UnwrapCastInBinaryComparison usually rewrites such comparisons
  // before they reach the connector, but the contract shouldn't rely on
  // that — fractional values stay in the rejected (residual) set.
  private def integral(v: Any): Boolean = v match {
    case _: java.lang.Long | _: java.lang.Integer |
         _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("event_id", v) => integral(v)
      case GreaterThanOrEqual("event_id", v) => integral(v)
      case LessThan("event_id", v) => integral(v)
      case LessThanOrEqual("event_id", v) => integral(v)
      case EqualTo("event_id", v) => integral(v)
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("event_id", v: Number) => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("event_id", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("event_id", v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("event_id", v: Number) => hi = math.min(hi, v.longValue + 1)
      case EqualTo("event_id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case _ => ()
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new EventGenScan(lo, math.max(lo, hi), parts, required, batchRows)
}

private case class EventGenRange(start: Long, end: Long) extends InputPartition

private class EventGenScan(
    lo: Long, hi: Long, parts: Int, required: StructType, batchRows: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    EventGenScan.ranges(lo, hi, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    new EventGenReaderFactory(required)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EventGenMicroBatch(lo, hi, parts, required, batchRows)
}

private object EventGenScan {
  def ranges(lo: Long, hi: Long, parts: Int): Array[InputPartition] = {
    val rows = hi - lo
    if (rows <= 0) return Array(EventGenRange(lo, lo))
    val step = math.max(1L, (rows + parts - 1) / parts)
    (lo until hi by step)
      .map(s => EventGenRange(s, math.min(hi, s + step)): InputPartition)
      .toArray
  }
}

/** Offset = the next unread row index, serialized as its decimal
  * string — enough for exactly-once restart: the checkpoint's end
  * offset IS the next batch's start. */
private case class EventGenOffset(index: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = index.toString
}

/** Micro-batch form of the same generator: admission control advances
  * the offset by at most `batchRows` per trigger until the row cap —
  * the offset/plan/commit lifecycle of any replayable streaming source
  * (Kafka-style), minus the broker. Determinism means a replayed range
  * reproduces its rows exactly, which is what makes checkpoint
  * recovery exactly-once. */
private class EventGenMicroBatch(
    lo: Long, hi: Long, parts: Int, required: StructType, batchRows: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = EventGenOffset(lo)
  override def latestOffset(): Offset = EventGenOffset(hi)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    EventGenOffset(
      math.min(hi, start.asInstanceOf[EventGenOffset].index + batchRows))
  override def reportLatestOffset(): Offset = EventGenOffset(hi)
  override def deserializeOffset(json: String): Offset =
    EventGenOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventGenOffset].index
    val e = end.asInstanceOf[EventGenOffset].index
    EventGenScan.ranges(s, math.max(s, e), parts)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EventGenReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class EventGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[EventGenRange]
    // resolve pruned-field positions once per partition, not per row
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow = {
        val (id, user, tpe, value) = EventGenSource.row(i)
        InternalRow.fromSeq(fields.toSeq.map {
          case "event_id" => id
          case "user_id" => user
          case "event_type" => UTF8String.fromString(tpe)
          case "value" => value
        })
      }
      override def close(): Unit = ()
    }
  }
}
