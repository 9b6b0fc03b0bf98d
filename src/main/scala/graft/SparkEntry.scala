package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Query blocks, in SURVEY §2 order. */
  private def blocks: Seq[QueryDef] =
    Analytics.all ++ Temporal.all ++ Behavior.all ++ Stats.all ++ Cbo.all ++
      PipelineQueries.all ++
      graft.operators.Dedup.all ++ graft.operators.Ann.all ++
      graft.operators.Text.all ++ graft.operators.Skew.all ++
      graft.sources.Formats.all ++ graft.pipeline.Bucketing.all ++
      graft.pipeline.Layout.all ++ graft.pipeline.BloomIndex.all ++
      graft.pipeline.PartitionEvolution.all ++
      graft.pipeline.DeletionVectors.all ++
      graft.plans.MvRewrite.all ++
      graft.multimodal.Multimodal.all ++
      graft.streaming.Streaming.all

  /** Flagship on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full CDI read path: synthesize encrypted envelopes → parse →
    * key-resolve → AES-CTR decrypt → validate → sanitise → derived
    * daily-increment columns.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.pipeline.Ingest.dailyIncrement(
      graft.pipeline.Ingest.pipeline(
        graft.pipeline.Envelope.synthesize(spark, "/root/testdata/sf0.001")),
      "2021-06-15")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    blocks.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    blocks.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
