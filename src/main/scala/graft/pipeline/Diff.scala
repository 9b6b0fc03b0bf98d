package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic dataset diff — classify every key of two table versions as
  * added / removed / changed / unchanged. Schema-generic: "changed"
  * compares the null-safe STRUCT of all non-key columns (`<=>` lifts
  * to structs), so any table diffs with no per-column code and no
  * hashing (exact, and an oracle can re-express it column-wise). One
  * shuffle on the key columns; at 100 TB both sides pre-bucketed on
  * the key make it exchange-free (q_bucket_join's layout).
  */
object Diff {

  /** Row-level diff: the key columns plus a `change` label; v1's
    * non-key columns are carried for `removed`/`changed`/`unchanged`
    * rows, v2's for `added` rows.
    */
  def tableDiff(v1: DataFrame, v2: DataFrame, keys: Seq[String]): DataFrame = {
    require(v1.columns.sameElements(v2.columns),
      s"schema mismatch: ${v1.columns.mkString(",")} vs ${v2.columns.mkString(",")}")
    val payload = v1.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, side: String) = df.select(
      keys.map(col) :+ struct(payload.map(col): _*).as(s"p_$side"): _*)
    packed(v1, "a").join(packed(v2, "b"), keys, "full_outer")
      .withColumn("change",
        when(col("p_a").isNull, "added")
          .when(col("p_b").isNull, "removed")
          .when(col("p_a") <=> col("p_b"), "unchanged")
          .otherwise("changed"))
      .select(keys.map(col) :+ col("change") :+
        coalesce(col("p_a"), col("p_b")).as("row"): _*)
  }
}
