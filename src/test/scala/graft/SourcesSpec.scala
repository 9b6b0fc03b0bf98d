package graft

import java.io.File

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.KafkaLog

/** The Kafka-shaped DSv2 source (sources/KafkaLog.scala): offset
  * semantics a real `format("kafka")` deployment relies on — resume
  * from checkpointed per-partition offsets across a restart, bounded
  * microbatches under admission control, Kafka's exact schema.
  */
class SourcesSpec extends SparkSpec {

  private def appendLog(partitionDir: File, lines: Seq[String]): Unit = {
    partitionDir.mkdirs()
    val w = new java.io.FileWriter(new File(partitionDir, "log.jsonl"), true)
    try lines.foreach(l => w.write(l + "\n")) finally w.close()
  }

  test("kafkalog resumes from checkpointed offsets: restart processes appended records only") {
    val base = new File("/tmp/graft_kafkalog_resume_spec")
    graft.Stage.deleteRecursively(base)
    val topic = new File(base, "t")
    val p0 = new File(topic, "partition=0")
    val p1 = new File(topic, "partition=1")
    appendLog(p0, Seq("a0", "a1", "a2"))
    appendLog(p1, Seq("b0", "b1"))
    val out = new File(base, "out").getPath
    val ckpt = new File(base, "ckpt").getPath
    def run(): Unit = {
      val q = spark.readStream.format("kafkalog").option("path", topic.getPath)
        .load()
        .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() === 5)
    // records land while the query is DOWN — offsets, not file mtimes,
    // decide what the restart reads
    appendLog(p0, Seq("a3"))
    appendLog(p1, Seq("b2", "b3"))
    run()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows.length === 8, "restart reprocessed or lost records")
    assert(rows.toSet === Set(
      (0, 0L, "a0"), (0, 1L, "a1"), (0, 2L, "a2"), (0, 3L, "a3"),
      (1, 0L, "b0"), (1, 1L, "b1"), (1, 2L, "b2"), (1, 3L, "b3")))
    graft.Stage.deleteRecursively(base)
  }

  test("kafkalog admits partitions added mid-stream: new partition starts at offset 0") {
    // the one rebalance-adjacent semantic a Spark deployment actually
    // faces (SURVEY §13 design note): the topic GROWS a partition
    // between runs. The planner's next offset pass must discover it and
    // start it at earliest, while the checkpointed partitions resume
    // exactly — no reprocessing, no loss.
    val base = new File("/tmp/graft_kafkalog_grow_spec")
    graft.Stage.deleteRecursively(base)
    val topic = new File(base, "t")
    appendLog(new File(topic, "partition=0"), Seq("a0", "a1"))
    appendLog(new File(topic, "partition=1"), Seq("b0"))
    val out = new File(base, "out").getPath
    val ckpt = new File(base, "ckpt").getPath
    def run(): Unit = {
      val q = spark.readStream.format("kafkalog").option("path", topic.getPath)
        .load()
        .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() === 3)
    // the topic grows partition 2 while the query is down; existing
    // partitions also append
    appendLog(new File(topic, "partition=2"), Seq("c0", "c1"))
    appendLog(new File(topic, "partition=0"), Seq("a2"))
    run()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(rows === Set(
      (0, 0L, "a0"), (0, 1L, "a1"), (0, 2L, "a2"),
      (1, 0L, "b0"),
      (2, 0L, "c0"), (2, 1L, "c1")),
      s"partition growth mishandled: $rows")
  }

  test("kafkalog admission control: maxRecordsPerTrigger drains the backlog in bounded microbatches") {
    val base = new File("/tmp/graft_kafkalog_limit_spec")
    graft.Stage.deleteRecursively(base)
    val topic = new File(base, "t")
    appendLog(new File(topic, "partition=0"), (0 until 10).map(i => s"r$i"))
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("kafkalog").option("path", topic.getPath)
      .option("maxRecordsPerTrigger", 3)
      .load()
      .writeStream.option("checkpointLocation", new File(base, "ckpt").getPath)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        sizes.synchronized { sizes += b.count() }; ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(sizes.sum === 10L)
    assert(sizes.forall(_ <= 3L), s"a batch exceeded the admission cap: $sizes")
    assert(sizes.length >= 4, s"backlog drained in too few batches: $sizes")
    graft.Stage.deleteRecursively(base)
  }

  test("kafkalog speaks Kafka's exact schema") {
    val base = new File("/tmp/graft_kafkalog_schema_spec")
    graft.Stage.deleteRecursively(base)
    val topic = new File(base, "t")
    appendLog(new File(topic, "partition=0"), Seq("x"))
    val df = spark.readStream.format("kafkalog").option("path", topic.getPath).load()
    assert(df.schema === KafkaLog.schema)
    assert(df.isStreaming)
    graft.Stage.deleteRecursively(base)
  }
}
