package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** bigint hash → membership probe against a pre-built Bloom filter held
  * as a codegen reference object.
  *
  * The 100 TB pattern: build the filter once over the BOUNDED side (a
  * prior corpus release, an eval set, a blocklist) with
  * `df.stat.bloomFilter` (distributed treeAggregate, driver merge),
  * then probe it scan-locally on the unbounded side — no shuffle of the
  * big corpus, false positives resolved by an exact join over the tiny
  * candidate set only. Same runtime-filter idea Spark injects for
  * shuffle joins (InjectRuntimeFilter), applied where the bounded side
  * is a persisted artifact rather than a join branch.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  protected override def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
