package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming STATE-SCALE probe (SURVEY §8 protocol, round-14 ask): the
  * stateful machines' 100 TB story is "state is bounded by the entity
  * universe, not the event volume" — this main measures that claim
  * instead of asserting it. Run the named streaming operators against
  * a base dir and an Nx-USERS dir (tools/probe10x.py events mode gives
  * every replica tier a DISJOINT user range — N× entities at constant
  * per-user density) and compare the listener-captured curves:
  *
  *  - max state rows / state memory per query (expect ~N×: state is
  *    per-entity);
  *  - per-batch duration (expect far below N×: batches are
  *    shuffle-partitioned scans over the same partition count);
  *  - wall seconds (expect ≲N· at worst — linear in data).
  *
  * Prints one JSON line:
  * {"metric":"state_probe","sf":…,"queries":{"st_x":{"wall_sec":…,
  *   "batches":…, "max_state_rows":…, "max_state_mem_bytes":…,
  *   "max_batch_ms":…, "mean_batch_ms":…}}}
  */
object StateProbe {

  private final case class Batch(durationMs: Long, stateRows: Long, stateMem: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      "st_stale_users,st_markov,st_ab_test").split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batches = mutable.Map.empty[String, mutable.Buffer[Batch]]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val rows = p.stateOperators.map(_.numRowsTotal).sum
        val mem = p.stateOperators.map(_.memoryUsedBytes).sum
        batches.synchronized {
          batches.getOrElseUpdate(Option(p.name).getOrElse("?"),
            mutable.Buffer.empty) += Batch(p.batchDuration, rows, mem)
        }
        ()
      }
    })

    val results = names.map { name =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async — drain before reading
      Thread.sleep(1000)
      val bs = batches.synchronized {
        batches.filter(_._1.startsWith(name)).values.flatten.toSeq
      }
      val durs = bs.map(_.durationMs)
      name -> (f"""{"wall_sec":$wall%.2f,"out_rows":$rows,""" +
        s""""batches":${bs.size},""" +
        s""""max_state_rows":${if (bs.isEmpty) 0 else bs.map(_.stateRows).max},""" +
        s""""max_state_mem_bytes":${if (bs.isEmpty) 0 else bs.map(_.stateMem).max},""" +
        s""""max_batch_ms":${if (durs.isEmpty) 0 else durs.max},""" +
        s""""mean_batch_ms":${if (durs.isEmpty) 0 else durs.sum / durs.size}}""")
    }
    println(s"""{"metric":"state_probe","sf":"$sfDir","queries":{""" +
      results.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",") + "}}")
    spark.stop()
  }
}
