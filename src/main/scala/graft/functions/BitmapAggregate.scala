package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** EXACT distinct counting via container bitmaps — the Doris/ClickHouse
  * BITMAP pattern (and the shape RoaringBitmap formalizes): keys are
  * sliced into 2¹⁶-value containers keyed by their high bits, each
  * container a 1024-word bitset, and the aggregate state merges with
  * pure word-OR. Why this beats the alternatives at scale:
  *
  *  - `count(distinct x)` plans an Expand + two-phase dedup: one
  *    shuffled row PER DISTINCT VALUE, re-sorted and re-grouped. The
  *    bitmap ships one fixed-size buffer per (group, mapper) — at 10⁹
  *    rows per group the shuffle payload is the bitmap, not the data.
  *  - the HLL sketch (q_distinct_approx / st_hll) is constant-size but
  *    approximate; the bitmap is EXACT and still mergeable, the
  *    warehouse default when the key domain is integer-dense (user
  *    ids, supplier keys, dictionary-encoded anything).
  *
  * Simplification vs production roaring: sparse containers keep the
  * full 8 KB word array instead of demoting to a sorted-array
  * container; swapping the container encoding touches only this file.
  * Keys must be non-negative (enforced; dictionary-encode first — the
  * same contract Doris imposes).
  */
object BitmapOps {
  val ContainerWords = 1024 // 2^16 bits

  def update(buffer: mutable.LongMap[Array[Long]], key: Long): Unit = {
    require(key >= 0, s"bitmap aggregate needs non-negative keys, got $key")
    val hi = key >>> 16
    val lo = (key & 0xffffL).toInt
    val words = buffer.getOrElseUpdate(hi, new Array[Long](ContainerWords))
    words(lo >>> 6) |= 1L << (lo & 63)
  }

  def merge(buffer: mutable.LongMap[Array[Long]],
      other: mutable.LongMap[Array[Long]]): Unit =
    other.foreach { case (hi, ow) =>
      buffer.get(hi) match {
        case Some(words) =>
          var i = 0
          while (i < ContainerWords) { words(i) |= ow(i); i += 1 }
        case None => buffer.update(hi, ow.clone())
      }
    }

  def cardinality(buffer: mutable.LongMap[Array[Long]]): Long = {
    var n = 0L
    buffer.foreach { case (_, words) =>
      var i = 0
      while (i < ContainerWords) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  /** Wire form: containers in ASCENDING hi order (canonical — two
    * equal bitmaps serialize identically regardless of insert order).
    */
  def serialize(buffer: mutable.LongMap[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      4 + buffer.size * (8 + ContainerWords * 8))
    bb.putInt(buffer.size)
    buffer.toSeq.sortBy(_._1).foreach { case (hi, words) =>
      bb.putLong(hi)
      var i = 0
      while (i < ContainerWords) { bb.putLong(words(i)); i += 1 }
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): mutable.LongMap[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Array[Long]]
    var c = 0
    while (c < n) {
      val hi = bb.getLong
      val words = new Array[Long](ContainerWords)
      var i = 0
      while (i < ContainerWords) { words(i) = bb.getLong; i += 1 }
      m.update(hi, words)
      c += 1
    }
    m
  }

  /** |A ∩ B| straight off the wire forms: both container lists are
    * hi-sorted, so intersection is one linear merge-walk ANDing only
    * the containers PRESENT IN BOTH — disjoint key ranges cost nothing.
    */
  def andCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = java.nio.ByteBuffer.wrap(a)
    val bbuf = java.nio.ByteBuffer.wrap(b)
    val na = ba.getInt
    val nb = bbuf.getInt
    val stride = 8 + ContainerWords * 8
    var ia = 0
    var ib = 0
    var n = 0L
    while (ia < na && ib < nb) {
      val ha = ba.getLong(4 + ia * stride)
      val hb = bbuf.getLong(4 + ib * stride)
      if (ha < hb) ia += 1
      else if (hb < ha) ib += 1
      else {
        val offA = 4 + ia * stride + 8
        val offB = 4 + ib * stride + 8
        var i = 0
        while (i < ContainerWords) {
          n += java.lang.Long.bitCount(
            ba.getLong(offA + i * 8) & bbuf.getLong(offB + i * 8))
          i += 1
        }
        ia += 1
        ib += 1
      }
    }
    n
  }
}

/** Shared TypedImperativeAggregate core for the bitmap family; the
  * leaf classes differ only in what eval() emits (count vs wire form).
  */
abstract class BitmapAggBase
  extends TypedImperativeAggregate[mutable.LongMap[Array[Long]]] {
  def child: Expression

  override def createAggregationBuffer(): mutable.LongMap[Array[Long]] =
    mutable.LongMap.empty[Array[Long]]

  override def update(
      buffer: mutable.LongMap[Array[Long]],
      input: InternalRow): mutable.LongMap[Array[Long]] = {
    val v = child.eval(input)
    if (v != null) BitmapOps.update(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: mutable.LongMap[Array[Long]],
      other: mutable.LongMap[Array[Long]]): mutable.LongMap[Array[Long]] = {
    BitmapOps.merge(buffer, other)
    buffer
  }

  override def serialize(buffer: mutable.LongMap[Array[Long]]): Array[Byte] =
    BitmapOps.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Array[Long]] =
    BitmapOps.deserialize(bytes)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a BIGINT key, got ${other.sql}")
    }

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
}

case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BitmapAggBase {

  override def eval(buffer: mutable.LongMap[Array[Long]]): Any =
    BitmapOps.cardinality(buffer)

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Same aggregate, but eval emits the canonical WIRE FORM — the
  * materialized bitmap column (Doris `bitmap_union`): store per-segment
  * bitmaps once, answer any segment-overlap question later with pure
  * bitmap algebra (bitmap_and_count) instead of re-scanning facts.
  */
case class BitmapBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BitmapAggBase {

  override def eval(buffer: mutable.LongMap[Array[Long]]): Any =
    BitmapOps.serialize(buffer)

  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** |A ∩ B| over two serialized bitmaps — pure bitmap algebra on the
  * canonical wire form (hi-sorted container merge-walk), no fact-table
  * rescan. The codegen'd probe side of [[BitmapBuild]].
  */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_and_count"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.andCardinality(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitmapOps.andCardinality($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
