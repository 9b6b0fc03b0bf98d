package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef
import graft.queries.QueryDef.moneySum

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

  /** Write `df` bucketed unless the table already exists in this
    * session's catalog (a fresh JVM may still find the previous run's
    * warehouse directory on disk — clear it first, saveAsTable refuses
    * to overwrite an unknown location).
    */
  private def ensureBucketed(s: SparkSession, table: String, key: String,
      buckets: Int)(df: => DataFrame): Unit =
    if (!s.catalog.tableExists(table)) {
      val dir = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$table")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (dir.exists()) rm(dir)
      writeBucketed(df, table, key, buckets)
    }

  /** A24: join + aggregation over co-bucketed tables — the amortized
    * layout in action. Orders and customer are bucketed on the customer
    * key at write time; the join AND the per-customer aggregation then
    * plan with ZERO shuffle exchanges (self-checked — the query refuses
    * to return a plan that shuffles). At 100 TB this is the difference
    * between re-shuffling the fact table on every query and paying the
    * shuffle once at layout time.
    */
  def qBucketJoin(s: SparkSession, d: String): DataFrame = {
    val oT = s"bj_orders_${math.abs(d.hashCode)}"
    val cT = s"bj_customer_${math.abs(d.hashCode)}"
    ensureBucketed(s, oT, "o_custkey", 16)(
      Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"))
    ensureBucketed(s, cT, "o_custkey", 16)(
      Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")))
    val joined = read(s, oT).join(read(s, cT), Seq("o_custkey"))
      .groupBy("o_custkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("spend"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    require(shuffles.isEmpty,
      s"co-bucketed join planned ${shuffles.length} shuffle exchange(s)")
    joined
  }

  val qBucketJoinSql: String =
    """SELECT o_custkey, c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_custkey, c_mktsegment""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_bucket_join", qBucketJoin, Some(qBucketJoinSql)))
}
