package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst Expressions and the public
  * Column API (Spark 4 hides the Expression constructor behind
  * `private[sql]`, the standard extension-library workaround is a shim in
  * an org.apache.spark.sql subpackage).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
