package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge between graft's custom logical plans and the public Dataset
  * API (Spark 4 hides `Dataset.ofRows` and the analyzed-plan accessor
  * behind `private[sql]`; same shim pattern as [[ColumnBridge]]).
  */
object PlanBridge {
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
