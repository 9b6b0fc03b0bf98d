package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
