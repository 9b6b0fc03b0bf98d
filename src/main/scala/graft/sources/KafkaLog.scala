package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Kafka-SHAPED DataSource V2 micro-batch source ("kafkalog").
  *
  * The reference's input is a Kafka topic — one JSON envelope per
  * message (reference: steps/ingesters.py:30,109) — but no Kafka
  * connector or broker exists in this environment, so the engine's
  * streaming story exercises the Kafka API SEMANTICS through a
  * file-backed topic: a directory of `partition=N/log.jsonl`
  * append-only logs, one record per line, line index = offset. The
  * source speaks Spark's full streaming-source contract the way the
  * real kafka source does:
  *
  *  - Kafka's EXACT schema: (key BINARY, value BINARY, topic STRING,
  *    partition INT, offset LONG, timestamp TIMESTAMP,
  *    timestampType INT) — a query written against this source runs
  *    unchanged against `format("kafka")` on a real cluster;
  *  - per-partition offsets, checkpointed as `{"p":nextOffset,...}`
  *    JSON and resumed exactly (SourcesSpec proves a restart with the
  *    same checkpoint processes only appended records — offsets are
  *    the source of truth, never file mtimes);
  *  - admission control: `maxRecordsPerTrigger` caps a microbatch
  *    (per-partition quota, the moral of kafka's maxOffsetsPerTrigger)
  *    via the ReadLimit API, so a backlog drains in bounded batches;
  *  - Trigger.AvailableNow support (SupportsTriggerAvailableNow):
  *    the end target is pinned at prepare time, then drained in
  *    rate-limited batches — late appends are left for the next run.
  *
  * At 100 TB the layout maps 1:1 onto a real topic: partitions scale
  * horizontally, each microbatch plans one InputPartition per topic
  * partition (read parallelism = partition count, Kafka's contract),
  * and offsets give exactly-once via the checkpoint — the standard
  * replayable-source + idempotent-sink story.
  */
object KafkaLog {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Deterministic per-record event time: epoch base + offset seconds
    * (a real topic carries broker append time; the fixture needs
    * reproducible values under the hash gate).
    */
  val TsBaseUs: Long = 1600000000000000L
  def timestampUs(offset: Long): Long = TsBaseUs + offset * 1000000L

  private[sources] def partitionDirs(topicDir: String): Seq[(Int, java.io.File)] =
    Option(new java.io.File(topicDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("partition="))
      .map(f => f.getName.stripPrefix("partition=").toInt -> f)
      .sortBy(_._1).toSeq

  private[sources] def logFile(dir: java.io.File): java.io.File =
    new java.io.File(dir, "log.jsonl")

  /** Current end offset (= line count) per partition. */
  private[sources] def endOffsets(topicDir: String): Map[Int, Long] =
    partitionDirs(topicDir).map { case (p, dir) =>
      val f = logFile(dir)
      val n = if (!f.exists()) 0L
      else {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().size.toLong finally src.close()
      }
      p -> n
    }.toMap
}

/** Per-partition offset map, JSON round-tripped through the checkpoint
  * log exactly like KafkaSourceOffset's `{"topic":{"0":123,...}}`
  * (flattened: one topic per source).
  */
case class KafkaLogOffset(parts: Map[Int, Long]) extends Offset {
  override def json(): String =
    parts.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object KafkaLogOffset {
  def fromJson(json: String): KafkaLogOffset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val b = Map.newBuilder[Int, Long]
    node.properties().forEach(e => b += e.getKey.toInt -> e.getValue.asLong())
    KafkaLogOffset(b.result())
  }
}

class KafkaLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafkalog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new KafkaLogTable(properties.asScala.toMap)
}

class KafkaLogTable(props: Map[String, String]) extends Table with SupportsRead {
  private def topicDir: String = props.getOrElse("path",
    throw new IllegalArgumentException("kafkalog requires option 'path'"))
  override def name(): String = s"kafkalog:$topicDir"
  override def schema(): StructType = KafkaLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaLogScan(topicDir,
        Option(options.get("maxRecordsPerTrigger")).map(_.toLong),
        Option(options.get("startingOffsets")).getOrElse("earliest"))
    }
}

class KafkaLogScan(topicDir: String, maxPerTrigger: Option[Long],
    startingOffsets: String) extends Scan {
  override def readSchema(): StructType = KafkaLog.schema
  override def description(): String = s"kafkalog $topicDir"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaLogMicroBatchStream(topicDir, maxPerTrigger, startingOffsets)
}

class KafkaLogMicroBatchStream(topicDir: String, maxPerTrigger: Option[Long],
    startingOffsets: String)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // AvailableNow contract: the drain target is pinned ONCE at prepare
  // time; appends racing the drain are left for the next run
  private var availableTarget: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(KafkaLog.endOffsets(topicDir))

  override def initialOffset(): Offset = {
    val ends = KafkaLog.endOffsets(topicDir)
    startingOffsets match {
      case "latest" => KafkaLogOffset(ends)
      case "earliest" => KafkaLogOffset(ends.map { case (p, _) => p -> 0L })
      case json => KafkaLogOffset.fromJson(json) // explicit per-partition
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val ends = availableTarget.getOrElse(KafkaLog.endOffsets(topicDir))
    val from = start.asInstanceOf[KafkaLogOffset].parts
    val cap = limit match {
      case r: ReadMaxRows =>
        // per-partition quota — the simple deterministic split of a
        // global row budget (kafka prorates by lag; either honors the
        // bound, which is what admission control promises)
        math.max(1L, r.maxRows() / math.max(1, ends.size))
      case _ => Long.MaxValue
    }
    KafkaLogOffset(ends.map { case (p, end) =>
      val s = from.getOrElse(p, 0L)
      p -> math.min(end, if (cap == Long.MaxValue) end else s + cap)
    })
  }

  override def reportLatestOffset(): Offset =
    KafkaLogOffset(KafkaLog.endOffsets(topicDir))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaLogOffset].parts
    val e = end.asInstanceOf[KafkaLogOffset].parts
    val topic = new java.io.File(topicDir).getName
    KafkaLog.partitionDirs(topicDir).flatMap { case (p, dir) =>
      val from = s.getOrElse(p, 0L)
      val until = e.getOrElse(p, 0L)
      if (until > from)
        Some(KafkaLogInputPartition(KafkaLog.logFile(dir).getPath, topic, p, from, until)
          : InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaLogReaderFactory

  override def deserializeOffset(json: String): Offset = KafkaLogOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One topic partition's [from, until) offset range — read parallelism
  * equals partition count, Kafka's planning contract.
  */
case class KafkaLogInputPartition(path: String, topic: String, partition: Int,
    from: Long, until: Long) extends InputPartition

class KafkaLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KafkaLogInputPartition]
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(p.path, "UTF-8")
      private val lines = src.getLines().zipWithIndex
        .collect { case (l, i) if i >= p.from && i < p.until => (l, i.toLong) }
      private var cur: (String, Long) = _
      override def next(): Boolean =
        if (lines.hasNext) { cur = lines.next(); true } else false
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        null,
        cur._1.getBytes("UTF-8"),
        UTF8String.fromString(p.topic),
        p.partition,
        cur._2,
        KafkaLog.timestampUs(cur._2),
        0))
      override def close(): Unit = src.close()
    }
  }
}
