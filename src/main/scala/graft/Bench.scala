package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Each query is materialized through the noop datasource sink — every
  * row is produced and every column computed (unlike `.count()`, which
  * lets Catalyst prune projection-only plans down to a row count).
  * Failures are NOT swallowed into a timing: a failed query reports -1
  * and is listed in `failed`, so a broken query can never masquerade as
  * a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session/codegen warmup so the first measured query isn't charged
    // for JVM startup, codegen compilation, Jackson/crypto class init
    // and FS metadata priming
    try {
      spark.read.parquet(s"$sfDir/region.parquet").write
        .format("noop").mode("overwrite").save()
      graft.pipeline.Ingest.pipeline(
          graft.pipeline.Envelope.synthesize(spark, sfDir).limit(8))
        .write.format("noop").mode("overwrite").save()
      // streaming machinery warmup (MicroBatchExecution, state store,
      // memory sink classes) over the 5-row region table — the first
      // streaming query otherwise pays ~2.5s of one-time init. The
      // file stream source requires a DIRECTORY (same constraint
      // Streaming.eventsStream works around), so expose the single
      // parquet file through a symlink dir.
      val regionSchema = spark.read.parquet(s"$sfDir/region.parquet").schema
      val dir = java.nio.file.Paths.get("/tmp/graft_bench_warmup_region")
      if (!java.nio.file.Files.exists(dir)) {
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("region.parquet"),
          java.nio.file.Paths.get(s"$sfDir/region.parquet"))
      }
      val q = spark.readStream.schema(regionSchema)
        .parquet(dir.toString)
        .dropDuplicates("r_regionkey") // primes the dedup state operator
        .groupBy("r_name").count()
        .writeStream.format("memory").queryName("bench_warmup_stream")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed (continuing): ${e.getMessage}")
    }
    // optional comma-separated name filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // the cached-stage operators (Stage.cached) register logical
      // plans in the session CacheManager, and plan-matching would let
      // an earlier query's cache serve a later query's FIRST run —
      // clear before cold so cold stays a true cold number across
      // rounds; the steady re-measure then legitimately reflects the
      // warm-cache path
      spark.catalog.clearCache()
      // cold = the first run; steady = best of two for rows over 1.0s.
      // Both are reported so cross-round deltas stay apples-to-apples
      // (a best-of-2-only number flatters comparisons against rounds
      // measured cold). A single shared-JVM run can catch a GC pause or
      // codegen compile burst; the 1.0s threshold covers every row where
      // run-to-run noise has mis-graded a query before (a 0.7s query
      // once benched at 2.9s in a shared-JVM sweep and drew a false
      // regression flag); sub-second rows aren't worth the wall time,
      // so there cold == steady. A failure in the RE-measure must not
      // discard the valid first timing.
      val (cold, steady) =
        try {
          val t1 = run()
          val t2 =
            if (t1 > 1.0) scala.util.Try(run()).toOption.fold(t1)(math.min(t1, _))
            else t1
          (t1, t2)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          (-1.0, -1.0)
        }
      (name, cold, steady)
    }
    val qs = results.map { case (k, _, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val colds = results.map { case (k, c, _) => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, _, v) if v >= 0 => v }.sum
    val totalCold = results.collect { case (_, c, _) if c >= 0 => c }.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","value_cold":$totalCold,"queries":$qs,"queries_cold":$colds,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // under a non-forked sbt runMain, println routes through sbt's
    // logger and lands with an "[info] " prefix, which a strict
    // line-parser chokes on — also emit the bare line straight to fd 1
    // and to a stable file
    new java.io.PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
      .println(line)
    try {
      val w = new java.io.PrintWriter("BENCH_LOCAL.json")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
