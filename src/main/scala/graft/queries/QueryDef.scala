package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-checkable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs over the same parquet tables.
  * `oracle == None` → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Money math contract shared with every oracle: compute in DECIMAL(18,2)
    * (exact, order-independent) and emit DOUBLE — so a parallel Spark
    * aggregation and a serial DuckDB one produce bit-identical values.
    */
  val Money: DecimalType = DecimalType(18, 2)
  def dec(c: Column): Column = c.cast(Money)
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")
}
