package graft.bus

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `format("graftbus")` — a DataSource V2 connector over the embedded
  * [[BusBroker]], implementing the Kafka connector's CONTRACT so the
  * reference's live streaming path (001_init_spotify_tracks.sql:25-47
  * consumes the topic continuously; spotify_metadata_to_kafka.py:52-70
  * produces per run) executes end-to-end in-process:
  *
  *  - source schema `(key binary, value binary, topic, partition,
  *    offset, timestamp)` — the Kafka source's core columns, so
  *    `CAST(value AS STRING)` pipelines are transport-agnostic;
  *  - micro-batch streaming read with per-partition long offsets,
  *    earliest-offset initial position, offset commit after each
  *    durable batch (observable via [[BusBroker.committedOffsets]]);
  *  - distributed batch write taking `(key?, value)` in string or
  *    binary form (the Kafka sink's input contract), each task writer
  *    reporting its delivered counts through its commit message —
  *    aggregated exactly the way the reference counts producer
  *    delivery callbacks (A4).
  *
  * Used by tests and any single-JVM run; a cluster swaps
  * `format("kafka")` into the same [[graft.ingest.KafkaFrames]] /
  * [[graft.streaming.TracksStream]] entry points.
  */
class BusProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftbus"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusTable.SourceSchema

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // accept the Kafka source's `subscribe` spelling and the sink's
    // `topic` so the call sites stay connector-agnostic
    val topic = Option(properties.get("topic"))
      .orElse(Option(properties.get("subscribe")))
      .getOrElse(throw new IllegalArgumentException(
        "graftbus requires option 'topic' (or 'subscribe')"))
    new BusTable(topic)
  }
}

object BusTable {
  /** The Kafka source's core columns (key/value binary + provenance). */
  val SourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
  ))
}

class BusTable(topic: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftbus/$topic"
  override def schema(): StructType = BusTable.SourceSchema
  override def capabilities(): util.Set[TableCapability] = Set(
    TableCapability.BATCH_READ,
    TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE,
    // the write schema is (key?, value), not the source schema
    TableCapability.ACCEPT_ANY_SCHEMA,
  ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new BusScan(topic)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new BusWriteBuilder(topic, info.schema())
}

// ---------------------------------------------------------------- read

class BusScan(topic: String) extends Scan {
  override def readSchema(): StructType = BusTable.SourceSchema

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val ends = BusBroker.endOffsets(topic)
      ends.indices.map(p => BusInputPartition(topic, p, 0L, ends(p)): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = BusReaderFactory()
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BusMicroBatchStream(topic)
}

/** Streaming offsets: one exclusive end offset per partition, JSON
  * `[o0,o1,...]`. Base-class equality compares `json()`, which is what
  * the engine uses to decide whether a new batch is due.
  */
case class BusOffset(offsets: Seq[Long]) extends Offset {
  override def json(): String = offsets.mkString("[", ",", "]")
}

object BusOffset {
  def parse(json: String): BusOffset =
    BusOffset(json.stripPrefix("[").stripSuffix("]").split(",")
      .filter(_.nonEmpty).map(_.trim.toLong).toSeq)
}

class BusMicroBatchStream(topic: String) extends MicroBatchStream {
  override def initialOffset(): Offset =
    BusOffset(Seq.fill(BusBroker.numPartitions(topic))(0L)) // earliest

  override def latestOffset(): Offset = BusOffset(BusBroker.endOffsets(topic).toSeq)

  override def deserializeOffset(json: String): Offset = BusOffset.parse(json)

  /** The engine calls this once a micro-batch is durably committed to
    * the checkpoint — recorded on the broker so tests can assert the
    * offset-commit half of the contract.
    */
  override def commit(end: Offset): Unit =
    BusBroker.recordCommit(topic, BusOffset.parse(end.json()).offsets.toArray)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = BusOffset.parse(start.json()).offsets
    val e = BusOffset.parse(end.json()).offsets
    e.indices
      .map(p => BusInputPartition(topic, p, if (p < s.length) s(p) else 0L, e(p)))
      .filter(ip => ip.until > ip.from)
      .map(ip => ip: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = BusReaderFactory()

  override def stop(): Unit = ()
}

case class BusInputPartition(topic: String, partition: Int, from: Long, until: Long)
    extends InputPartition

case class BusReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BusInputPartition]
    new PartitionReader[InternalRow] {
      private var i = p.from - 1
      override def next(): Boolean = { i += 1; i < p.until }
      override def get(): InternalRow = {
        val rec = BusBroker.read(p.topic, p.partition, i)
        new GenericInternalRow(Array[Any](
          rec.key, rec.value, UTF8String.fromString(p.topic),
          p.partition, i, rec.timestampMs * 1000L))
      }
      override def close(): Unit = ()
    }
  }
}

// --------------------------------------------------------------- write

class BusWriteBuilder(topic: String, schema: StructType) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BusBatchWrite(topic, schema)
  }
}

class BusBatchWrite(topic: String, schema: StructType) extends BatchWrite {
  // validate the producer frame shape up front (driver side): a
  // required value column, an optional key, both string or binary —
  // the Kafka sink's contract
  BusWriters.valueIndex(schema)
  BusWriters.keyIndex(schema)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    BusWriterFactory(topic, schema)

  /** Writer commit messages carry per-partition delivered counts; the
    * aggregate is the delivery report the reference derives from
    * producer callbacks (spotify_metadata_to_kafka.py:52-70).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val merged = messages.collect { case BusDelivered(counts) => counts }
      .foldLeft(Map.empty[Int, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (p, c)) => a.updated(p, a.getOrElse(p, 0L) + c) }
      }
    BusBroker.recordDelivery(topic, merged)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

object BusWriters {
  private def bytesIndex(schema: StructType, name: String): Option[(Int, Boolean)] =
    schema.fields.zipWithIndex.collectFirst {
      case (StructField(`name`, BinaryType, _, _), i) => (i, false)
      case (StructField(`name`, StringType, _, _), i) => (i, true)
    }

  def valueIndex(schema: StructType): (Int, Boolean) =
    bytesIndex(schema, "value").getOrElse(throw new IllegalArgumentException(
      s"graftbus write requires a string or binary 'value' column, got ${schema.simpleString}"))

  def keyIndex(schema: StructType): Option[(Int, Boolean)] = bytesIndex(schema, "key")
}

case class BusDelivered(perPartition: Map[Int, Long]) extends WriterCommitMessage

case class BusWriterFactory(topic: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val (vIdx, vIsString) = BusWriters.valueIndex(schema)
      private val kIdx = BusWriters.keyIndex(schema)
      private val counts = scala.collection.mutable.Map.empty[Int, Long]

      private def bytes(row: InternalRow, idx: Int, isString: Boolean): Array[Byte] =
        if (row.isNullAt(idx)) null
        else if (isString) row.getUTF8String(idx).getBytes
        else row.getBinary(idx)

      override def write(row: InternalRow): Unit = {
        val key = kIdx.map { case (i, s) => bytes(row, i, s) }.orNull
        val value = bytes(row, vIdx, vIsString)
        val (p, _) = BusBroker.append(topic, key, value)
        counts(p) = counts.getOrElse(p, 0L) + 1
      }

      override def commit(): WriterCommitMessage = BusDelivered(counts.toMap)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
