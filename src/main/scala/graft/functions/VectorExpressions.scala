package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

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

  /** Late-interaction MaxSim in 4th-decimal fixed point: for every
    * query token vector in `q`, the max over `c`'s token vectors of
    * `floor(cosine·10⁴ + 0.5)` as a BIGINT, summed over query tokens.
    * Integer max and sum are accumulation-order-free, so a SQL oracle
    * re-derives the score bit-for-bit (the same trick as the Lloyd
    * fixed-point sums); the one lossy step — quantizing each PAIR's
    * cosine — is the same 4-decimal grid the ANN family already ranks
    * on. Single fused pass, no intermediate score arrays.
    */
  def maxsimFx(q: ArrayData, c: ArrayData): Long = {
    val nq = q.numElements()
    val nc = c.numElements()
    var sum = 0L
    var i = 0
    while (i < nq) {
      val qv = q.getArray(i)
      var best = Long.MinValue
      var j = 0
      while (j < nc) {
        val fx = math.floor(cosine(qv, c.getArray(j)) * 10000.0 + 0.5).toLong
        if (fx > best) best = fx
        j += 1
      }
      if (nc > 0) sum += best
      i += 1
    }
    sum
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

/** MaxSim (late-interaction, ColBERT-style) fixed-point score between
  * two multi-vector documents held as array<array<double>> columns:
  * Σ over left's token vectors of max over right's of the 4th-decimal
  * fixed-point cosine. The composable HOF form
  * (`aggregate(q, 0L, (acc, qt) => acc + array_max(transform(c, ...)))`)
  * is CodegenFallback at every level and allocates a score array per
  * (pair, query-token); this is one allocation-free codegen'd loop.
  */
case class MaxSimFx(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "maxsim_fx"
  protected override def nullSafeEval(q: Any, c: Any): Any =
    VectorMath.maxsimFx(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c) => s"graft.functions.VectorMath.maxsimFx($q, $c)")
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

  /** Routed exact nearest-cell scan — identical output to
    * [[nearestCells]] (the flat path's selection is "sort cells by
    * (dist, index), take first `probes`"; this maintains exactly that
    * set, with candidate distances computed by the same
    * ascending-index inner loop, so equal-distance results are
    * bit-identical). Groups are visited ascending by triangle-
    * inequality lower bound; the scan stops when the (safety-shrunk)
    * bound strictly exceeds the current worst kept distance — a cell
    * that would tie the worst and win on lower index is never pruned
    * because its shrunk bound sits strictly below its true distance.
    */
  def nearestCellsRouted(v: ArrayData, cents: Array[Array[Double]],
      router: CellRouter, probes: Int): ArrayData = {
    val g = router.centers.length
    val gd = new Array[Double](g) // actual (sqrt) distances to group centers
    var j = 0
    while (j < g) {
      val gc = router.centers(j)
      val n = math.min(v.numElements(), gc.length)
      var acc = 0.0
      var i = 0
      while (i < n) { val dx = v.getDouble(i) - gc(i); acc += dx * dx; i += 1 }
      gd(j) = math.sqrt(acc)
      j += 1
    }
    // group visit order: ascending lower bound (insertion sort; g ≈ √k)
    val lb = new Array[Double](g)
    val order = new Array[Int](g)
    j = 0
    while (j < g) {
      lb(j) = gd(j) - router.radii(j)
      order(j) = j
      j += 1
    }
    j = 1
    while (j < g) {
      val oj = order(j); val key = lb(oj)
      var m = j - 1
      while (m >= 0 && lb(order(m)) > key) { order(m + 1) = order(m); m -= 1 }
      order(m + 1) = oj
      j += 1
    }
    // top-`probes` kept as (dist, idx) pairs, lexicographic worst tracked
    val bestD = new Array[Double](probes)
    val bestI = new Array[Int](probes)
    java.util.Arrays.fill(bestD, Double.MaxValue)
    java.util.Arrays.fill(bestI, Int.MaxValue)
    var worst = 0 // slot holding the lexicographically largest pair
    var oi = 0
    while (oi < g) {
      val grp = order(oi)
      val bound = lb(grp)
      // shrunk strict bound: immune to the ~1e-13 relative fp error in
      // gd/radius while never pruning a true winner or a tie-breaker.
      // s must stay positive before squaring — for a tiny positive
      // bound the absolute shrink drives s negative and s·s would
      // compare as a LARGE value, spuriously pruning (and, with the
      // sorted early-exit, killing the rest of the scan)
      if (bound > 0 && { val s = bound * (1 - 1e-9) - 1e-12; s > 0 && s * s > bestD(worst) }) {
        oi = g // sorted ascending → every later group is also pruned
      } else {
        val mem = router.members(grp)
        var mi = 0
        while (mi < mem.length) {
          val c = mem(mi)
          val cv = cents(c)
          val n = math.min(v.numElements(), cv.length)
          var acc = 0.0
          var i = 0
          while (i < n) { val dx = v.getDouble(i) - cv(i); acc += dx * dx; i += 1 }
          if (acc < bestD(worst) || (acc == bestD(worst) && c < bestI(worst))) {
            bestD(worst) = acc
            bestI(worst) = c
            var p = 1
            worst = 0
            while (p < probes) {
              if (bestD(p) > bestD(worst) ||
                (bestD(p) == bestD(worst) && bestI(p) > bestI(worst))) worst = p
              p += 1
            }
          }
          mi += 1
        }
        oi += 1
      }
    }
    // emit ascending by (dist, idx) — the flat path's output order
    val idx = Array.range(0, probes)
    val out = new Array[Int](probes)
    var p = 0
    while (p < probes) {
      var sel = p
      var q = p + 1
      while (q < probes) {
        if (bestD(idx(q)) < bestD(idx(sel)) ||
          (bestD(idx(q)) == bestD(idx(sel)) && bestI(idx(q)) < bestI(idx(sel)))) sel = q
        q += 1
      }
      val t = idx(p); idx(p) = idx(sel); idx(sel) = t
      out(p) = bestI(idx(p))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Per-CELL all-pairs cosine top-k: the kNN-join inner loop as ONE
    * kernel call per cell instead of one joined row per candidate
    * pair. The row-at-a-time join form materializes ~N·probes·√N pair
    * rows each carrying two dim-wide vectors (≈270 GB of row copies at
    * the 100× probe), and even a kernel-per-probe-row form pays ~1M
    * unsafe-access scans (measured 13.5 s of the query's 22 s); here
    * both sides of a cell ride in primitive block columns, bulk-copied
    * ONCE per cell to double[]/long[] (four toArray calls per cell, not
    * per pair), and the pair scan is a straight double[] loop the JIT
    * can unroll. Keeping k per (probe, cell) is lossless for the
    * global top-k. Contracts match the row form exactly: cosine is
    * VectorMath.cosine's fused loop (same float ops, same order),
    * rounded HALF_UP to 4dp the way Catalyst's Round does (NaN/Inf
    * pass through), ranking is (score DESC, id ASC) with
    * java.lang.Double.compare — TopKRows' comparator — and the self
    * pair is skipped inside the kernel so it never occupies a slot.
    * Output: one struct<qid, score, id> per kept pair, the k per qid
    * emitted best-first.
    */
  def cellTopK(qidsA: ArrayData, qflatA: ArrayData, idsA: ArrayData,
      flatA: ArrayData, k: Int): ArrayData = {
    val qids = qidsA.toLongArray()
    val qflat = qflatA.toDoubleArray()
    val ids = idsA.toLongArray()
    val flat = flatA.toDoubleArray()
    val nq = qids.length
    val n = ids.length
    val qdim = if (nq == 0) 0 else qflat.length / nq
    val cdim = if (n == 0) 0 else flat.length / n
    val vn = math.min(qdim, cdim)
    val score = new Array[Double](k)
    val id = new Array[Long](k)
    def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      // (s1, i1) ranks strictly after (s2, i2) in (score DESC, id ASC)
      val c = java.lang.Double.compare(s2, s1)
      c > 0 || (c == 0 && i1 > i2)
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](nq * math.min(k, math.max(n - 1, 0)))
    var qi = 0
    while (qi < nq) {
      val selfId = qids(qi)
      val qoff = qi * qdim
      var size = 0
      var worst = 0 // slot holding the (score DESC, id ASC)-largest entry
      var bi = 0
      while (bi < n) {
        val nid = ids(bi)
        if (nid != selfId) {
          // VectorMath.cosine's fused loop over the primitive blocks —
          // identical float ops in identical order
          val off = bi * cdim
          var dot = 0.0
          var na = 0.0
          var nb = 0.0
          var i = 0
          while (i < vn) {
            val x = qflat(qoff + i); val y = flat(off + i)
            dot += x * y; na += x * x; nb += y * y
            i += 1
          }
          val raw = dot / (math.sqrt(na) * math.sqrt(nb))
          // cheap reject BEFORE the HALF_UP rounding: BigDecimal
          // rounding (valueOf → decimal digits → setScale → parse
          // back) costs ~1 µs and at ~N·Probes·√N pairs it, not the
          // cosine, dominated the whole query (measured 14 s of 22 s).
          // round(x) can exceed x by at most 5e-5 (+1 ulp), so
          // raw + 6e-5 < worst ⟹ round(raw) < worst ⟹ the candidate
          // cannot enter the kept set OR tie its worst — identical
          // output, ~k+ε roundings per probe instead of √N. (NaN fails
          // the comparison and falls through to the passthrough arm.)
          if (!(size == k && raw + 6e-5 < score(worst))) {
            val s =
              if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
              else java.math.BigDecimal.valueOf(raw)
                .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            if (size < k) {
              score(size) = s; id(size) = nid
              if (worse(s, nid, score(worst), id(worst))) worst = size
              size += 1
            } else if (worse(score(worst), id(worst), s, nid)) {
              score(worst) = s; id(worst) = nid
              var p = 1
              worst = 0
              while (p < k) {
                if (worse(score(p), id(p), score(worst), id(worst))) worst = p
                p += 1
              }
            }
          }
        }
        bi += 1
      }
      // best-first per qid, same total order as TopKRows.eval
      val order = Array.range(0, size)
      var p = 0
      while (p < size) {
        var sel = p
        var q = p + 1
        while (q < size) {
          if (worse(score(order(sel)), id(order(sel)), score(order(q)), id(order(q)))) sel = q
          q += 1
        }
        val t = order(p); order(p) = order(sel); order(sel) = t
        out += InternalRow(selfId, score(order(p)), id(order(p)))
        p += 1
      }
      qi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-cell SemDeDup drop scan: vec_id a is dropped iff some
    * same-cell b with b.vec_id < a.vec_id has round(cos(a,b), 6) ≥ τ —
    * exactly the a⋈b self-join + filter + distinct, as one kernel call
    * per cell over primitive blocks (the join form materializes every
    * ordered pair with both vectors; this form also EARLY-EXITS per a
    * on the first qualifying b, which a join cannot). Pair order is
    * immaterial to the result (the qualifying-pair SET is identical);
    * the 6-dp HALF_UP rounding is Catalyst's BigDecimal semantics,
    * applied only inside the |raw − τ| ≤ 6e-7 boundary band — outside
    * it raw alone decides, since |round(x) − x| ≤ 5e-7 + ulp.
    * Returns the dropped vec_ids (each at most once: one cell per
    * vector at probes = 1).
    */
  def cellDropped(idsA: ArrayData, flatA: ArrayData, tau: Double): ArrayData = {
    val ids = idsA.toLongArray()
    val flat = flatA.toDoubleArray()
    val n = ids.length
    val dim = if (n == 0) 0 else flat.length / n
    // process in ascending vec_id so "some earlier b" = "some b seen
    // so far"
    val order = Array.range(0, n)
    scala.util.Sorting.stableSort(order, (x: Int, y: Int) => ids(x) < ids(y))
    val out = new scala.collection.mutable.ArrayBuffer[Any](n / 4)
    var j = 1
    while (j < n) {
      val a = order(j)
      val aoff = a * dim
      var dropped = false
      var i = 0
      while (i < j && !dropped) {
        val b = order(i)
        val boff = b * dim
        var dot = 0.0
        var na = 0.0
        var nb = 0.0
        var x = 0
        while (x < dim) {
          val p = flat(aoff + x); val q = flat(boff + x)
          dot += p * q; na += p * p; nb += q * q
          x += 1
        }
        val raw = dot / (math.sqrt(na) * math.sqrt(nb))
        if (raw >= tau + 6e-7) dropped = true // round(raw) ≥ raw − 5e-7 > τ
        else if (raw >= tau - 6e-7 &&
            !java.lang.Double.isNaN(raw) && !java.lang.Double.isInfinite(raw) &&
            java.math.BigDecimal.valueOf(raw)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() >= tau) {
          dropped = true
        }
        i += 1
      }
      if (dropped) out += ids(a)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-bucket qualifying-pair scan for embedding near-dup detection:
    * all (id_a < id_b) pairs in the block with round(cos, 4) ≥ τ, as
    * one kernel call per LSH bucket. Replaces a pair join that
    * materialized every candidate pair with both vectors aboard AND
    * dropDuplicates'd the full pair stream BEFORE filtering (the
    * qualifying set is ~10⁴× smaller than the candidate set). The 4-dp
    * HALF_UP rounding is Catalyst's BigDecimal semantics, evaluated
    * only inside the |raw − τ| ≤ 6e-5 boundary band for the QUALIFY
    * decision and once per EMITTED pair for the output value —
    * identical set, identical values to round-then-filter. Cross-table
    * duplicates of a pair carry identical cos, so a later
    * dropDuplicates on (id_a, id_b) is value-stable.
    */
  /** Greedy MMR selection over one query's shortlist block: pick k ids
    * maximizing 7·relFx − 3·max_{s∈selected} simFx(c, s) (λ = 0.7 in
    * tenths; first pick pure relevance), ties toward the smaller id.
    * simFx = floor(cos·10⁴ + 0.5) with the same accumulation loop as
    * vec_cosine, so the kernel is bit-equal to the join-unrolled form
    * and the oracle's CTE chain. O(k·n) sim evaluations per block —
    * the whole greedy chain is ONE eval per query row.
    */
  def mmrSelect(idsA: ArrayData, relA: ArrayData, flatA: ArrayData, k: Int): ArrayData = {
    val ids = idsA.toLongArray()
    val rel = relA.toLongArray()
    val flat = flatA.toDoubleArray()
    val n = ids.length
    val dim = if (n == 0) 0 else flat.length / n
    def simFx(a: Int, b: Int): Long = {
      val ao = a * dim; val bo = b * dim
      var dot = 0.0; var na = 0.0; var nb = 0.0; var x = 0
      while (x < dim) {
        val p = flat(ao + x); val q = flat(bo + x)
        dot += p * q; na += p * p; nb += q * q
        x += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000.0 + 0.5).toLong
    }
    val taken = new Array[Boolean](n)
    // msim(c) = max sim to the selected set so far, updated incrementally
    val msim = Array.fill(n)(Long.MinValue)
    val out = new Array[Any](math.min(k, n))
    var r = 0
    while (r < out.length) {
      var best = -1
      var bestScore = Long.MinValue
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          val score = if (r == 0) rel(c) else 7L * rel(c) - 3L * msim(c)
          if (best == -1 || score > bestScore ||
              (score == bestScore && ids(c) < ids(best))) {
            best = c; bestScore = score
          }
        }
        c += 1
      }
      taken(best) = true
      out(r) = InternalRow(r + 1, ids(best), rel(best))
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val sf = simFx(j, best)
          if (sf > msim(j)) msim(j) = sf
        }
        j += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  def cellPairs(idsA: ArrayData, flatA: ArrayData, tau: Double): ArrayData = {
    val ids = idsA.toLongArray()
    val flat = flatA.toDoubleArray()
    val n = ids.length
    val dim = if (n == 0) 0 else flat.length / n
    val order = Array.range(0, n)
    scala.util.Sorting.stableSort(order, (x: Int, y: Int) => ids(x) < ids(y))
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var j = 1
    while (j < n) {
      val b = order(j)
      val boff = b * dim
      var i = 0
      while (i < j) {
        val a = order(i)
        val aoff = a * dim
        var dot = 0.0
        var na = 0.0
        var nb = 0.0
        var x = 0
        while (x < dim) {
          val p = flat(aoff + x); val q = flat(boff + x)
          dot += p * q; na += p * p; nb += q * q
          x += 1
        }
        val raw = dot / (math.sqrt(na) * math.sqrt(nb))
        if (raw >= tau - 6e-5 && !java.lang.Double.isNaN(raw)
            && !java.lang.Double.isInfinite(raw)) {
          val r = java.math.BigDecimal.valueOf(raw)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          if (r >= tau) out += InternalRow(ids(a), ids(b), r)
        }
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** All LSH bucket ids of a vector in one pass: bucket of table t =
    * Σ_h (dot(v, plane[t][h]) > 0) ? 1<<h : 0 — bit-for-bit the
    * composable `when(vec_dot(v, typedlit(p)) > 0, 1<<h).reduce(_+_)`
    * column stack (same dot loop, same sign test, integer adds are
    * order-free), but as ONE kernel holding the plane family as a
    * reference object instead of tables×hyper separate expression
    * evaluations per row.
    */
  def lshBuckets(v: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Int](planes.length)
    var t = 0
    while (t < planes.length) {
      val fam = planes(t)
      var bucket = 0
      var h = 0
      while (h < fam.length) {
        val p = fam(h)
        val n = math.min(v.numElements(), p.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getDouble(i) * p(i); i += 1 }
        if (acc > 0) bucket |= 1 << h
        h += 1
      }
      out(t) = bucket
      t += 1
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

/** vec → the `probes` nearest centroid indices (array<int>). With a
  * router, the scan is triangle-inequality-pruned — same output, ~√k
  * of the work (see [[CellRouter]]).
  */
case class NearestCells(child: Expression, cents: Array[Array[Double]], probes: Int,
    router: Option[CellRouter] = None)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells"
  protected override def nullSafeEval(a: Any): Any = router match {
    case Some(r) => CentroidOps.nearestCellsRouted(a.asInstanceOf[ArrayData], cents, r, probes)
    case None => CentroidOps.nearestCells(a.asInstanceOf[ArrayData], cents, probes)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = router match {
    case Some(r) =>
      val cref = ctx.addReferenceObj("cents", cents, "double[][]")
      val rref = ctx.addReferenceObj("router", r, classOf[CellRouter].getName)
      defineCodeGen(ctx, ev,
        c => s"graft.functions.CentroidOps.nearestCellsRouted($c, $cref, $rref, $probes)")
    case None =>
      val cref = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev, c => s"graft.functions.CentroidOps.nearestCells($c, $cref, $probes)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** vec → per-table LSH bucket ids (array<int>), the plane family as one
  * reference object (see [[CentroidOps.lshBuckets]]).
  */
case class LshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"
  protected override def nullSafeEval(a: Any): Any =
    CentroidOps.lshBuckets(a.asInstanceOf[ArrayData], planes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidOps.lshBuckets($c, $ref)")
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

/** Exact-search router over a codebook: centroids grouped by a
  * deterministic mini-Lloyd over the CODEBOOK (not the data), each
  * group carrying its center and covering radius. The nearest-cell
  * scan then visits groups in ascending lower-bound order —
  * d(v, cell) ≥ d(v, groupCenter) − radius(group), the triangle
  * inequality — and STOPS once the bound can no longer beat the
  * current top-`probes` worst. Pure acceleration: bounds are shrunk by
  * a relative safety margin and pruning is strict, so any cell that
  * could win outright OR on the lowest-index tie-break always gets its
  * exact distance computed in the same loop as the flat scan — output
  * is bit-identical at every k (spec-asserted against the flat path).
  * Per-row work falls from k·dim to ~(√k + visited·|group|)·dim; at
  * the √N cell counts this turns the corpus-assignment term of the
  * IVF build from N·√N toward N·N^¼ — the difference between 993× and
  * ~30× work at a 100× scale-up.
  */
final class CellRouter(val members: Array[Array[Int]],
    val centers: Array[Array[Double]], val radii: Array[Double])
  extends Serializable

object CellRouter {
  /** Below this codebook size the flat scan's k·dim pass is already
    * cheaper than computing √k group bounds plus the visited members.
    */
  val MinCells = 256

  /** Deterministic grouping: strided init over the codebook, two plain
    * Lloyd passes (router quality only affects pruning efficiency,
    * never results — no fixed-point ceremony needed), then members and
    * covering radii from the final assignment.
    */
  def build(cents: Array[Array[Double]]): CellRouter = {
    val k = cents.length
    val dim = cents(0).length
    val g = math.max(2, math.sqrt(k.toDouble).toInt)
    var centers: Array[Array[Double]] = Array.tabulate(g)(j => cents((j.toLong * k / g).toInt).clone())
    val assign = new Array[Int](k)
    def assignAll(): Unit = {
      var c = 0
      while (c < k) {
        val cv = cents(c)
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < g) {
          val gc = centers(j)
          var acc = 0.0
          var i = 0
          while (i < dim) { val dx = cv(i) - gc(i); acc += dx * dx; i += 1 }
          if (acc < bestD) { bestD = acc; best = j }
          j += 1
        }
        assign(c) = best
        c += 1
      }
    }
    var iter = 0
    while (iter < 2) {
      assignAll()
      val sums = Array.fill(g)(new Array[Double](dim))
      val counts = new Array[Int](g)
      var c = 0
      while (c < k) {
        val j = assign(c); counts(j) += 1
        var i = 0
        while (i < dim) { sums(j)(i) += cents(c)(i); i += 1 }
        c += 1
      }
      centers = Array.tabulate(g) { j =>
        if (counts(j) == 0) centers(j)
        else { val s = sums(j); Array.tabulate(dim)(i => s(i) / counts(j)) }
      }
      iter += 1
    }
    assignAll()
    val buf = Array.fill(g)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var c = 0
    while (c < k) { buf(assign(c)) += c; c += 1 }
    val radii = Array.tabulate(g) { j =>
      var r = 0.0
      buf(j).foreach { cc =>
        val cv = cents(cc); val gc = centers(j)
        var acc = 0.0
        var i = 0
        while (i < dim) { val dx = cv(i) - gc(i); acc += dx * dx; i += 1 }
        val d = math.sqrt(acc)
        if (d > r) r = d
      }
      r
    }
    new CellRouter(buf.map(_.toArray), centers, radii)
  }
}

/** (probe ids, probe vecs flat, candidate ids, candidate vecs flat) →
  * per-cell all-pairs cosine top-k as array<struct<qid, score, id>>,
  * k per qid best-first (see [[CentroidOps.cellTopK]]). Evaluates once
  * per CELL row (~√N rows total), so interpreted eval (CodegenFallback)
  * costs nothing while keeping the expression out of codegen's 4-child
  * template ceiling.
  */
case class CellTopK(qids: Expression, qflat: Expression, ids: Expression,
    flat: Expression, k: Int)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(qids, qflat, ids, flat)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "block_topk"
  override def eval(input: InternalRow): Any = {
    val a = qids.eval(input)
    val b = qflat.eval(input)
    val c = ids.eval(input)
    val d = flat.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else CentroidOps.cellTopK(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData], k)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(qids = newChildren(0), qflat = newChildren(1),
      ids = newChildren(2), flat = newChildren(3))
}

/** (block ids, block vecs flat) → vec_ids dropped by the SemDeDup
  * within-cell scan at threshold `tau` (see [[CentroidOps.cellDropped]]).
  * One eval per cell row → CodegenFallback costs nothing.
  */
case class CellDropped(ids: Expression, flat: Expression, tau: Double)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(ids, flat)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cell_dropped"
  override def eval(input: InternalRow): Any = {
    val a = ids.eval(input)
    val b = flat.eval(input)
    if (a == null || b == null) null
    else CentroidOps.cellDropped(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], tau)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ids = newChildren(0), flat = newChildren(1))
}

/** (shortlist ids, relFx, vecs flat, k) → greedy MMR selection
  * (see [[CentroidOps.mmrSelect]]). One eval per query row →
  * CodegenFallback costs nothing.
  */
case class MmrSelect(ids: Expression, rel: Expression, flat: Expression, k: Int)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(ids, rel, flat)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sel_rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("relfx", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mmr_select"
  override def eval(input: InternalRow): Any = {
    val a = ids.eval(input)
    val b = rel.eval(input)
    val c = flat.eval(input)
    if (a == null || b == null || c == null) null
    else CentroidOps.mmrSelect(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], k)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ids = newChildren(0), rel = newChildren(1), flat = newChildren(2))
}

/** (block ids, block vecs flat) → qualifying (id_a < id_b, cos) pairs
  * at threshold `tau` (see [[CentroidOps.cellPairs]]). One eval per
  * bucket row → CodegenFallback costs nothing.
  */
case class CellPairs(ids: Expression, flat: Expression, tau: Double)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(ids, flat)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cell_pairs"
  override def eval(input: InternalRow): Any = {
    val a = ids.eval(input)
    val b = flat.eval(input)
    if (a == null || b == null) null
    else CentroidOps.cellPairs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], tau)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ids = newChildren(0), flat = newChildren(1))
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

/** Scalar-quantization kernels (SQ8): per-dimension affine int8 codes.
  * Unlike PQ (a codebook per SUBSPACE), SQ trains only 2·dim numbers —
  * a [min, max] interval per dimension — and quantizes each coordinate
  * independently to an 8-bit level: code = ⌊(x − min)·255/(max − min)⌋
  * clamped to [0, 255]. Scoring is asymmetric in FIXED POINT: the
  * reconstruction x̂ = min + code·Δ is carried as exact BIGINTs
  * (minFx + code·dFx at 2^20 scale), so the inner product
  * Σ qFx·x̂Fx is integer arithmetic — order-free, overflow-safe at
  * these magnitudes, and bit-reproducible by a serial SQL oracle.
  */
object SqOps {
  /** v (double array) → int codes under per-dim [mins, maxs]. */
  def encode(v: ArrayData, mins: Array[Double], maxs: Array[Double]): ArrayData = {
    val n = mins.length
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val lo = mins(i)
      val hi = maxs(i)
      val c =
        if (hi <= lo) 0
        else {
          val f = math.floor((v.getDouble(i) - lo) * 255.0 / (hi - lo))
          if (f < 0.0) 0 else if (f > 255.0) 255 else f.toInt
        }
      out(i) = c
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_d qFx(d) · (minFx(d) + code(d)·dFx(d)) — exact int64. */
  def adc(qfx: ArrayData, codes: ArrayData, minFx: Array[Long], dFx: Array[Long]): Long = {
    val n = codes.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += qfx.getLong(i) * (minFx(i) + codes.getInt(i) * dFx(i))
      i += 1
    }
    acc
  }
}

/** vec → per-dimension int8 levels under the trained [mins, maxs]. */
case class SqEncode(child: Expression, mins: Array[Double], maxs: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_encode"
  protected override def nullSafeEval(a: Any): Any =
    SqOps.encode(a.asInstanceOf[ArrayData], mins, maxs)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("mins", mins, "double[]")
    val mx = ctx.addReferenceObj("maxs", maxs, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.SqOps.encode($c, $mn, $mx)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (qFx, codes) → fixed-point asymmetric inner product (bigint). */
case class SqAdc(left: Expression, right: Expression,
    minFx: Array[Long], dFx: Array[Long]) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_adc"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    SqOps.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], minFx, dFx)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("minFx", minFx, "long[]")
    val dd = ctx.addReferenceObj("dFx", dFx, "long[]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SqOps.adc($a, $b, $mn, $dd)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
