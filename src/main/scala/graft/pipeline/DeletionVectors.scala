package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef
import graft.queries.QueryDef._

/** Deletion vectors — positional soft deletes over immutable files (the
  * Delta/Iceberg v2 "merge-on-read" delete shape).
  *
  * The reference lands logical deletes as CDC flags and either carries
  * them as a column or pays a full snapshot rewrite to drop the rows
  * (steps/ingesters.py:380-420 latest-record merge — every merge
  * rewrites the partition). A deletion vector splits that differently:
  * the delete batch is resolved ONCE into per-file row POSITIONS (the
  * sidecar a lakehouse persists next to the data file), and every
  * subsequent read applies the positions with a cheap positional
  * anti-join — the base files are never rewritten, and readers don't
  * need to know the delete key or re-evaluate the delete predicate.
  *
  * Spark-first mechanics: file identity and row position come from the
  * parquet reader's `_metadata.file_path` / `_metadata.row_index`
  * hidden columns — stable per file, independent of split planning —
  * so the resolve pass and the read pass agree on positions without
  * any bookkeeping of our own. The read path is the base scan (column
  * pruning and pushdown intact — positions are metadata, not data)
  * LEFT ANTI joined to the vector on (file, position): the DV side is
  * one row per DELETED row of this batch, broadcast when small (the
  * common case — a delete batch touches a sliver of the table), and
  * AQE falls back to a shuffle join for pathological batch sizes. At
  * 100 TB the positional form is what makes merge-on-read viable:
  * the sidecar is O(deletes), the read-side probe is O(1) per row
  * against a hash of this-file positions, and compaction can fold
  * vectors into files on its own schedule (p_optimize's job), exactly
  * the Delta DV lifecycle.
  */
object DeletionVectors {

  /** The delete batch: a keyed CDC feed names the orders to retire
    * (hash-sampled ~1% here). Keys, not a pushable predicate — readers
    * of the vector never see this condition.
    */
  private def deleteKeys(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("l_orderkey"))

  private def scanWithPos(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/lineitem.parquet")
      .select(col("_metadata.file_path").as("f"),
        col("_metadata.row_index").as("pos"),
        col("l_orderkey"), col("l_returnflag"), col("l_quantity"))

  /** Resolve the delete batch to positions: one scan, broadcast semi
    * join against the keys. This frame IS the persisted sidecar in a
    * real deployment (a bitmap per file after roaring-compression —
    * the row form keeps the oracle exact here).
    */
  def buildVector(s: SparkSession, d: String): DataFrame =
    scanWithPos(s, d)
      .join(broadcast(deleteKeys(s, d)), Seq("l_orderkey"), "left_semi")
      .select("f", "pos")

  /** The merge-on-read path: base scan minus the vector's positions,
    * then an aggregate a downstream consumer would run. The anti-join
    * probes (file, position) — the reader never re-derives the delete
    * predicate or touches the delete key.
    */
  def pDeletionVectors(s: SparkSession, d: String): DataFrame = {
    val dv = buildVector(s, d)
    scanWithPos(s, d)
      .join(broadcast(dv), Seq("f", "pos"), "left_anti")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_live"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy("l_returnflag")
  }

  val pDeletionVectorsSql: String =
    """SELECT l_returnflag, count(*) AS n_live,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey NOT IN
      |  (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("p_deletion_vectors", pDeletionVectors, Some(pDeletionVectorsSql)))
}
