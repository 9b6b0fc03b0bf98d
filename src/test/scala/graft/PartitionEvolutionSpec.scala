package graft

import org.apache.spark.sql.functions._

import graft.pipeline.PartitionEvolution

class PartitionEvolutionSpec extends SparkSpec {

  test("cross-spec read equals a raw full-scan twin") {
    val got = PartitionEvolution.pPartitionEvolve(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val cd = PartitionEvolution.cutoffDay(spark, sfDir)
    val day = 86400000000L
    val raw = Tables.events(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
      .filter(expr(s"us div $day").between(cd - 2, cd - 1) ||
        (expr(s"us div $day") === cd && expr(s"(us % $day) div 3600000000") < 12))
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === raw)
    assert(got.values.sum > 0)
  }

  test("each generation prunes at its own grain: 2 day dirs, 12 hour dirs") {
    // inputFiles ignores partition pruning — measure the files the SCAN
    // actually selects after partitionFilters apply
    def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      val scan = flatten(df.queryExecution.executedPlan).collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec"))
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files.map(_.fileStatus.getPath.toString)).toSeq
    }
    val (gen1, gen2) = PartitionEvolution.generationScans(spark, sfDir)
    val g1Dirs = scannedPaths(gen1)
      .flatMap("pdate=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).distinct
    assert(g1Dirs.nonEmpty && g1Dirs.length <= 2,
      s"day generation scanned ${g1Dirs.mkString(",")} — pruning failed")
    val g2 = scannedPaths(gen2)
    val g2Hours = g2
      .flatMap("phour=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt)).distinct
    assert(g2Hours.nonEmpty && g2Hours.forall(_ < 12),
      s"hour generation scanned hours ${g2Hours.sorted.mkString(",")}")
    val g2Days = g2
      .flatMap("pdate=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).distinct
    assert(g2Days.length === 1, "hour generation must prune to the cutoff day")
  }
}
