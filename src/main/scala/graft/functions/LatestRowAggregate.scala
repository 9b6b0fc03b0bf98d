package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Latest-row-per-group as a TypedImperativeAggregate — the
  * ObjectHashAggregate form of `max_by(struct(payload), ord)`
  * (r17, VERDICT r16 ask #3).
  *
  * STATUS — implemented, spec'd, measured, and NOT wired into the
  * production paths: the hypothesis was that MaxBy's immutable struct
  * buffer (which demotes the aggregate to SortAggregate, a local
  * O(rows log rows) sort per partition) is a scale term worth removing.
  * The A/B said otherwise: ObjectHashAggregateExec itself falls back
  * to sort-based aggregation once a partition's hash map passes
  * spark.sql.objectHashAggregate.sortBased.fallbackThreshold (default
  * 128 keys), so with realistic key cardinalities this pays the same
  * sort PLUS per-row object churn — standalone sf10: p_latest_by_key
  * 0.99 s (max_by) vs 2.27 s (this), p_cdc_apply 1.64 vs 2.48. Kept
  * (with LatestRowSpec) as the documented, measured alternative: it
  * becomes the right shape only where key cardinality per partition is
  * small or the fallback threshold is deliberately raised.
  *
  * Semantics are EXACTLY max_by's, tie for tie: strict-greater
  * replacement on the order key (a later equal-order row never
  * replaces the held one, so with a unique order key the result is
  * deterministic and identical to the row_number window twin; with
  * tied order keys both forms are first-seen-wins within the merge
  * order, which is the documented max_by contract); null order keys
  * are skipped; an all-null group yields null.
  */
case class LatestRow(
    payload: Expression,
    ord: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestRow.Buf] {

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)
  @transient private lazy val bufProjection: UnsafeProjection =
    UnsafeProjection.create(Array(ord.dataType, payload.dataType))

  override def createAggregationBuffer(): LatestRow.Buf = new LatestRow.Buf(null, null)

  // eval() results may point into reused row buffers (UnsafeRow slices,
  // UTF8String views) — anything held across rows must be deep-copied
  private def copied(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case other => other // primitives / Decimal (immutable)
  }

  override def update(buf: LatestRow.Buf, input: InternalRow): LatestRow.Buf = {
    val o = ord.eval(input)
    if (o != null && (buf.ord == null || ordering.compare(o, buf.ord) > 0)) {
      buf.ord = copied(o)
      buf.payload = copied(payload.eval(input))
    }
    buf
  }

  override def merge(buf: LatestRow.Buf, other: LatestRow.Buf): LatestRow.Buf = {
    if (other.ord != null &&
        (buf.ord == null || ordering.compare(other.ord, buf.ord) > 0)) {
      buf.ord = other.ord
      buf.payload = other.payload
    }
    buf
  }

  override def eval(buf: LatestRow.Buf): Any = buf.payload

  override def serialize(buf: LatestRow.Buf): Array[Byte] =
    if (buf.ord == null) Array.emptyByteArray
    else bufProjection(InternalRow(buf.ord, buf.payload)).getBytes

  override def deserialize(bytes: Array[Byte]): LatestRow.Buf =
    if (bytes.isEmpty) createAggregationBuffer()
    else {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      new LatestRow.Buf(
        copied(row.get(0, ord.dataType)),
        copied(row.get(1, payload.dataType)))
    }

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(ord.dataType, prettyName)

  override def dataType: DataType = payload.dataType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(payload, ord)
  override def prettyName: String = "latest_row"

  override def withNewMutableAggBufferOffset(newOffset: Int): LatestRow =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LatestRow =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(payload = newChildren(0), ord = newChildren(1))
}

object LatestRow {
  /** Mutable holder: `ord == null` ⇔ empty (no qualifying row seen). */
  final class Buf(var ord: Any, var payload: Any)
}
