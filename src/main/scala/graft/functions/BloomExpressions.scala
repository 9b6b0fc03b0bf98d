package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
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

/** Distributed Bloom-filter build as a real aggregate: folds bigint
  * hashes into one `org.apache.spark.util.sketch.BloomFilter` per
  * group, map-side-combining partials (bitwise OR merge — insertion
  * order never matters, so the built filter is deterministic under any
  * partitioning). Emits the serialized filter (binary).
  *
  * This is the per-FILE index-build path (pipeline/BloomIndex.scala):
  * `groupBy(input_file_name()).agg(bloom_agg(hash))` builds one filter
  * per data file in ONE scan of the table — state is O(filter bytes)
  * per file regardless of row count, exactly the partial-agg contract
  * of max_by/TopKRows applied to a sketch.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[BloomFilter] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: org.apache.spark.sql.catalyst.InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_build"
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Probe a SERIALIZED Bloom filter column with a literal batch of
  * hashes: true iff the filter might contain ANY of them. Deserializes
  * the filter ONCE per row and probes all K hashes against it — over a
  * file manifest this is O(files · K) probes and O(files)
  * deserializations, so "which files might hold any of these keys" is
  * a distributed scan of the manifest TABLE with only the survivors
  * collected (the manifest never needs to fit on the driver, unlike a
  * probe loop over a collected manifest).
  */
/** Point query against a serialized Count-Min sketch (the readable half
  * of Spark's own `count_min_sketch` aggregate, which builds the binary
  * but ships no SQL-surface probe): estimated occurrence count of a
  * LONG key. One deserialization per eval — callers keep the sketch on
  * a broadcast-sized side (one row per group), never per input row.
  */
case class CmsEstimate(sketchBytes: Expression, key: Expression)
    extends BinaryExpression {
  override def left: Expression = sketchBytes
  override def right: Expression = key
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"
  protected override def nullSafeEval(b: Any, k: Any): Any =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(b.asInstanceOf[Array[Byte]]))
      .estimateCount(k.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.util.sketch.CountMinSketch"
    defineCodeGen(ctx, ev, (b, k) =>
      s"$cls.readFrom(new java.io.ByteArrayInputStream($b))" +
        s".estimateCount((Object)(Long)$k)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketchBytes = newLeft, key = newRight)
}

case class BloomMightContainAny(bloomBytes: Expression, hashes: Seq[Long])
    extends UnaryExpression {
  override def child: Expression = bloomBytes
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_any"
  protected override def nullSafeEval(b: Any): Any = {
    val bf = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(b.asInstanceOf[Array[Byte]]))
    hashes.exists(bf.mightContainLong)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hs = ctx.addReferenceObj("hashes", hashes.toArray, "long[]")
    val bfCls = classOf[BloomFilter].getName
    nullSafeCodeGen(ctx, ev, c => {
      val bf = ctx.freshName("bf")
      val i = ctx.freshName("i")
      val found = ctx.freshName("found")
      s"""$bfCls $bf = $bfCls.readFrom(new java.io.ByteArrayInputStream($c));
         |boolean $found = false;
         |for (int $i = 0; $i < $hs.length && !$found; $i++) {
         |  $found = $bf.mightContainLong($hs[$i]);
         |}
         |${ev.value} = $found;""".stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(bloomBytes = newChild)
}
