package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.pipeline.Bucketing

/** Proof that the bucketed layout removes the join shuffle: two tables
  * bucketed on the same key join with ZERO ShuffleExchange operators,
  * and the result matches the plain (shuffling) join.
  */
class BucketingSpec extends SparkSpec {

  /** drop the table AND its warehouse dir (a fresh JVM's catalog knows
    * nothing about a previous run's directory — saveAsTable would fail
    * with LOCATION_ALREADY_EXISTS)
    */
  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$table")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (dir.exists()) rm(dir)
  }

  test("join of co-bucketed tables plans without any shuffle exchange") {
    dropHard("bspec_orders")
    dropHard("bspec_lineitem")
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "bspec_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "bspec_lineitem", "o_orderkey", 8)

    val joined = Bucketing.read(spark, "bspec_orders")
      .join(Bucketing.read(spark, "bspec_lineitem"), Seq("o_orderkey"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"expected exchange-free co-located join, found ${shuffles.length} shuffles")

    // and the co-located join is still correct
    val plain = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .join(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        Seq("o_orderkey"))
    assert(joined.count() === plain.count())

    spark.sql("DROP TABLE IF EXISTS bspec_orders")
    spark.sql("DROP TABLE IF EXISTS bspec_lineitem")
  }

  test("aggregation on the bucket key also plans without a shuffle") {
    dropHard("bspec_li_agg")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "bspec_li_agg", "l_orderkey", 8)
    val agg = Bucketing.read(spark, "bspec_li_agg")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    val shuffles = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected shuffle-free agg, found ${shuffles.length}")
    assert(agg.count() === Tables.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count())
    spark.sql("DROP TABLE IF EXISTS bspec_li_agg")
  }

  test("q_dpp carries a runtime partition-pruning filter and matches the direct result") {
    import org.apache.spark.sql.functions._
    val df = graft.pipeline.Bucketing.qDpp(spark, sfDir)
    // the query itself require()s the dynamicpruning filter; check results
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = Tables.orders(spark, sfDir)
      .withColumn("y", year(col("o_orderdate")))
      .filter(col("y") % 2 === 0)
      .groupBy("y").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }
}
