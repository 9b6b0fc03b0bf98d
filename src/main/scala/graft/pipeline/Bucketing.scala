package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout (SURVEY §4): pre-shuffle a fact table into N
  * buckets on its join key at WRITE time so every subsequent join or
  * aggregation on that key runs exchange-free — at 100 TB the repeated
  * per-query shuffle is the cost being amortized. Spark bucketing rides
  * the session catalog (`saveAsTable` + `bucketBy`); both sides of a
  * join bucketed on the same key with the same count co-locate.
  */
object Bucketing {

  /** Write `df` as a managed table bucketed on `key` (sorted within
    * buckets, so merge-friendly downstream).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "zstd")
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
