package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef
import graft.queries.QueryDef.{dec, moneySum}

/** Explicit skew mitigation (SURVEY §5).
  *
  * AQE's skew-join splitting already re-plans sort-merge joins whose
  * partitions blow past the skew thresholds. This is the explicit
  * variant for the cases AQE can't touch — a shuffle feeding an
  * aggregate, broadcast-ineligible hash joins, or non-AQE deployments:
  * the skewed side gets a deterministic per-row salt in [0, salts), the
  * other side is replicated `salts`×, and the join key becomes
  * (key, salt) — one hot key fans out across `salts` reducers at the
  * cost of replicating the (smaller) right side.
  */
object Skew {

  /** Deterministic per-row salt: hash of the whole row content — rows
    * under one hot key spread uniformly, and reruns are stable (no
    * rand()).
    */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong))

  /** Inner equi-join with the LEFT side treated as skewed. */
  def saltedJoin(skewed: DataFrame, other: DataFrame,
      keys: Seq[String], salts: Int): DataFrame = {
    val left = skewed.withColumn("__salt", rowSalt(skewed, salts))
    val right = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    left.join(right, keys :+ "__salt").drop("__salt")
  }

  /** Registered query: the salted join must produce exactly the plain
    * join's result (the oracle is the unsalted SQL join) — orders
    * treated as the skewed side, customer replicated 8×, revenue per
    * market segment aggregated above the fanned-out join.
    */
  def qSkewJoin(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .withColumnRenamed("o_custkey", "custkey")
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    saltedJoin(orders, cust, Seq("custkey"), salts = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), moneySum(col("o_totalprice")).as("total"))
  }

  val qSkewJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_skew_join", qSkewJoin, Some(qSkewJoinSql)),
  )
}
