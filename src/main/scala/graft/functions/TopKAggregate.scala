package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-memory top-k aggregate — the SCALE path for top-N-per-group:
  * the window form (`row_number().over(partitionBy(g).orderBy(...))`)
  * shuffles and sorts EVERY row of every group; this
  * TypedImperativeAggregate keeps a k-bounded heap per group, combines
  * map-side (each partition ships at most k rows per group), and its
  * state is O(k) regardless of group size — the same partial-agg
  * contract as max_by (SURVEY §8 lesson 4) generalized to k > 1.
  *
  * Input: struct(score double, id bigint). Keeps the k best by
  * (score DESC, id ASC); returns array<struct<score, id>> best-first.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"topk_rows needs k > 0, got $k")

  // the queue's MAX element (head of dequeue order) is the WORST kept
  // row: lowest score, ties broken toward the higher id
  private val worstFirst: Ordering[(Double, Long)] = (x, y) => {
    val c = java.lang.Double.compare(y._1, x._1)
    if (c != 0) c else java.lang.Long.compare(x._2, y._2)
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  override def update(
      buffer: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        buffer.enqueue((row.getDouble(0), row.getLong(1)))
        if (buffer.size > k) buffer.dequeue()
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buffer.enqueue(e)
      if (buffer.size > k) buffer.dequeue()
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    // total-order comparator (java.lang.Double.compare, same as the
    // heap's): primitive >/!= would make NaN non-transitive under
    // TimSort and break -0.0 ties differently from eviction
    val best = buffer.toArray.sorted(Ordering.comparatorToOrdering(
      new java.util.Comparator[(Double, Long)] {
        override def compare(a: (Double, Long), b: (Double, Long)): Int = {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }))
    new GenericArrayData(best.map { case (score, id) =>
      InternalRow(score, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    buffer.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    q
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b))
          if a.dataType == DoubleType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_rows expects struct<score: double, id: bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk_rows"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
