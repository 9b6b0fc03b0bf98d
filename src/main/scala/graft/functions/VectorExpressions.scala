package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Vector math over `array<double>` embedding columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array per evaluation and walks it twice;
  * at ~10⁵–10⁹ candidate pairs that alloc is the dominant cost. These
  * are single-pass, allocation-free loops over the unsafe array data,
  * with `doGenCode` emitting the same loop inline so the whole
  * similarity predicate stays in whole-stage codegen.
  */
object VectorMath {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** dot(a, b) over two array<double> columns (null-safe, codegen'd). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) in one fused pass (dot and both norms together). */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cosine"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Trained-codebook kernels: nearest-cell assignment and product
  * quantization. The composable form — one `aggregate(zip_with(...))`
  * per centroid, `array(...)` over all of them — builds a K×dim-literal
  * expression tree whose ANALYSIS + codegen dominates the query (for
  * 16 cells × 64 dims the tree has >1k nodes; the PQ encoder is 8
  * subspaces × 16 centroids more of the same). These kernels hold the
  * trained codebook as one JVM object (attached to generated code via
  * `ctx.addReferenceObj`) and loop over it natively — identical float
  * math in identical order, constant-size plan.
  */
object CentroidOps {

  /** Indices of the `probes` nearest centroids by squared L2; ties →
    * lower index (same order as sorting struct(dist, cell) ascending).
    */
  def nearestCells(v: ArrayData, cents: Array[Array[Double]], probes: Int): ArrayData = {
    val k = cents.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      val n = math.min(v.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) { val dx = v.getDouble(i) - cv(i); acc += dx * dx; i += 1 }
      dists(c) = acc
      c += 1
    }
    val out = new Array[Int](probes)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < probes) {
      var best = -1
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        if (!taken(j) && dists(j) < bestD) { bestD = dists(j); best = j }
        j += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode: per subspace, the 1-based index of the nearest codebook
    * centroid (first-min on ties — parity with
    * `array_position(dists, array_min(dists))`). Subspace s covers
    * elements [s*sub, (s+1)*sub) of the vector.
    */
  def pqEncode(v: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val out = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cents = books(s)
      val sub = cents(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var acc = 0.0
        var i = 0
        while (i < sub) { val dx = v.getDouble(off + i) - cv(i); acc += dx * dx; i += 1 }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(s) = best + 1
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC lookup tables for a query vector, flattened: element s*K + c is
    * the squared L2 distance of the query's subspace-s slice to codebook
    * centroid c.
    */
  def pqLuts(qv: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val k = books(0).length
    val out = new Array[Double](m * k)
    var s = 0
    var off = 0
    while (s < m) {
      val cents = books(s)
      val sub = cents(0).length
      var c = 0
      while (c < k) {
        val cv = cents(c)
        var acc = 0.0
        var i = 0
        while (i < sub) { val dx = qv.getDouble(off + i) - cv(i); acc += dx * dx; i += 1 }
        out(s * k + c) = acc
        c += 1
      }
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance: sum over subspaces of the flattened LUT entry
    * selected by the (1-based) code — same left-to-right accumulation
    * order as the composable `element_at` sum.
    */
  def adc(luts: ArrayData, codes: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) { acc += luts.getDouble(s * k + codes.getInt(s) - 1); s += 1 }
    acc
  }
}

/** vec → the `probes` nearest centroid indices (array<int>). */
case class NearestCells(child: Expression, cents: Array[Array[Double]], probes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells"
  protected override def nullSafeEval(a: Any): Any =
    CentroidOps.nearestCells(a.asInstanceOf[ArrayData], cents, probes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidOps.nearestCells($c, $ref, $probes)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** vec → PQ codes, one 1-based centroid index per subspace (array<int>). */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  protected override def nullSafeEval(a: Any): Any =
    CentroidOps.pqEncode(a.asInstanceOf[ArrayData], books)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidOps.pqEncode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** query vec → flattened ADC lookup tables (array<double>, M*K wide). */
case class PqLuts(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_luts"
  protected override def nullSafeEval(a: Any): Any =
    CentroidOps.pqLuts(a.asInstanceOf[ArrayData], books)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidOps.pqLuts($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (flattened LUTs, codes) → approximate (ADC) squared L2 distance. */
case class PqAdc(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    CentroidOps.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CentroidOps.adc($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
