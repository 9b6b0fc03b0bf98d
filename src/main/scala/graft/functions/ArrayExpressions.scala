package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Set algebra over SORTED distinct long arrays (signature/gram sets).
  *
  * `array_intersect` builds a hash set per evaluation; on a candidate
  * verify that runs per PAIR, the alloc dominates. A linear merge over
  * pre-sorted arrays is allocation-free and codegen-friendly — sort
  * once per document in the staged projection, merge per pair.
  */
object SortedArrayOps {
  /** |A ∩ B| for sorted long arrays (jaccard = i / (|A| + |B| - i)). */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Count of common elements between two sorted array<bigint> columns. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayOps.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedArrayOps.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
