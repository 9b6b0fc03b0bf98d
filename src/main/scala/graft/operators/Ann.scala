package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{vec_cosine, vec_dot}
import graft.queries.QueryDef

/** Block D — approximate-nearest-neighbor search over the embedding
  * column (SURVEY.md §2.D).
  *
  * s_ann_brute is the correctness baseline: a BOUNDED query set is
  * broadcast against the corpus (Q×N with Q small — the corpus is
  * streamed once, never self-joined). s_ann_lsh is the scale path:
  * random-hyperplane signatures put corpus and queries into buckets, the
  * candidate join shuffles on the bucket key, and cosine is computed
  * within buckets only. Both rank with one window over the (small)
  * candidate set per query.
  */
object Ann {

  private val NumQueries = 8
  private val TopK = 10
  // L tables × H hyperplanes each: 4×6 → 64 buckets/table, candidates
  // from any table agreeing on all 6 signs.
  private val Tables_ = 4
  private val Hyper = 6
  private val Dim = 64

  /** Seeded deterministic hyperplane family: `tables` bucket tables ×
    * `hyper` sign bits each.
    */
  def hyperplanes(tables: Int, hyper: Int, seed: Long): IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(tables)(IndexedSeq.fill(hyper)(Array.fill(Dim)(rnd.nextGaussian())))
  }

  private val planes = hyperplanes(Tables_, Hyper, seed = 7)

  private def vecCol: Column = col("embedding").cast("array<double>")

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), vecCol.as("v"))

  private def queries(s: SparkSession, d: String): DataFrame =
    corpus(s, d).filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

  private def ranked(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** D1: brute-force cosine top-k — broadcast the bounded query set,
    * one streaming pass over the corpus, window-rank per query.
    */
  def sAnnBrute(s: SparkSession, d: String): DataFrame = {
    val scored = corpus(s, d)
      .crossJoin(broadcast(queries(s, d)))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", vec_cosine(col("v"), col("qv")))
    ranked(scored)
  }

  /** signature bucket per table t: sign bits packed into an int. The
    * plane is a typedlit CONSTANT array — `array(lit, lit, …)` is a
    * CreateArray that rebuilds the 64-element array per row per plane
    * (measured: the bucketing dominated the bucketed join it feeds).
    */
  private def bucketColFor(family: IndexedSeq[IndexedSeq[Array[Double]]],
      v: Column, t: Int): Column =
    family(t).zipWithIndex.map { case (p, h) =>
      when(vec_dot(v, typedlit(p.toSeq)) > 0, 1 << h).otherwise(0)
    }.reduce(_ + _)

  /** (row, table, bucket) — one row per table per vector (constant
    * factor, not a join explosion). Shared by the ANN queries and the
    * embedding near-dup candidate generation (Dedup.dEmbedCos).
    *
    * The bucket array is materialized behind a hard barrier BEFORE the
    * explode: Generate re-evaluates its child per OUTPUT row, so an
    * inline bucket expression would be computed `tables`× per vector
    * (measured ~8× the whole hyperplane dot work at 8 tables).
    */
  def withBucketsFor(df: DataFrame, v: Column,
      family: IndexedSeq[IndexedSeq[Array[Double]]]): DataFrame = {
    val staged = graft.Stage.barrier(df.withColumn("_buckets",
      array(family.indices.map(t => bucketColFor(family, v, t)): _*)))
    staged
      .select(df.columns.map(col).toSeq :+ posexplode(col("_buckets")): _*)
      .withColumnRenamed("pos", "t")
      .withColumnRenamed("col", "bucket")
  }

  private def withBuckets(df: DataFrame, v: Column): DataFrame =
    withBucketsFor(df, v, planes)

  /** D2: random-hyperplane LSH ANN — the scale path. Candidates come
    * from a shuffle join on (table, bucket); a 100 TB corpus never meets
    * the queries outside shared buckets.
    */
  def sAnnLsh(s: SparkSession, d: String): DataFrame = {
    val c = withBuckets(corpus(s, d), col("v"))
    val q = withBuckets(queries(s, d), col("qv"))
    val candidates = c.join(q, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "qv", "vec_id", "v")
      .dropDuplicates("query_id", "vec_id")
    ranked(candidates.withColumn("cos", vec_cosine(col("v"), col("qv"))))
  }

  // ---- IVF (inverted-file) ANN: coarse k-means quantizer ----

  private val Cells = 16
  private val LloydIters = 3
  private val Probes = 3

  /** Train the coarse quantizer on a bounded deterministic sample
    * COLLECTED to the driver, then run Lloyd there: quantizer quality
    * needs a representative subset, not the corpus (production IVF
    * trains offline on a sample of a 100 TB collection), and the
    * sample is k-bounded tiny (TrainSample × Dim doubles). Running the
    * iterations as Spark jobs spent more time planning/codegen'ing the
    * 16×64-literal distance expressions than computing (3 jobs ×
    * ~1s each at any SF); driver Lloyd on the same sample is
    * sub-millisecond, sequentially deterministic, and leaves only two
    * distributed assignment passes (corpus + queries) in the plan.
    */
  private val TrainSample = 1024

  private[operators] def trainCentroids(c: DataFrame,
      cells: Int = Cells): Array[(Int, Seq[Double])] = {
    val spark = c.sparkSession
    import spark.implicits._
    val sample = math.max(TrainSample, cells * 8)
    val train: Array[Array[Double]] = c.orderBy("vec_id").limit(sample)
      .select("v").as[Seq[Double]].collect().map(_.toArray)
    val k0 = math.min(cells, train.length)
    var centroids: Array[Array[Double]] = train.take(k0).map(_.clone())
    for (_ <- 1 to LloydIters) {
      val sums = Array.fill(k0)(new Array[Double](Dim))
      val counts = new Array[Long](k0)
      train.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var k = 0
        while (k < k0) {
          var dist = 0.0
          var i = 0
          while (i < Dim) { val dx = v(i) - centroids(k)(i); dist += dx * dx; i += 1 }
          if (dist < bestD) { bestD = dist; best = k } // tie → lowest cell
          k += 1
        }
        counts(best) += 1
        var i = 0
        while (i < Dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k0) { k =>
        if (counts(k) == 0) centroids(k) // empty cell keeps its centroid
        else Array.tabulate(Dim)(i => sums(k)(i) / counts(k))
      }
    }
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
  }

  /** Assign each row to its `probes` nearest cells (L2 on the
    * broadcast-literal centroids). probes=1 for corpus build, >1 for
    * query-side multi-probe.
    */
  private[operators] def assignCells(df: DataFrame, centroids: Array[(Int, Seq[Double])],
      probes: Int): DataFrame = {
    // one native kernel holding the codebook as a reference object —
    // the equivalent sort(array(struct(dist, cell)...)) form is a
    // Cells×Dim-literal expression tree whose analysis/codegen
    // dominates the query (SURVEY §8 lesson 12)
    val cents: Array[Array[Double]] = centroids.sortBy(_._1).map(_._2.toArray)
    df.withColumn("cell",
      explode(graft.functions.nearest_cells(col("v"), cents, probes)))
  }

  /** D2b: IVF ANN — the other scale path. The corpus is bucketed by its
    * nearest centroid (one pass, stored that way in production); queries
    * probe their `Probes` nearest cells; cosine runs only within probed
    * cells via a shuffle join on the cell id.
    */
  def sAnnIvf(s: SparkSession, d: String): DataFrame = {
    val c = corpus(s, d)
    val centroids = trainCentroids(c)
    val bucketed = assignCells(c, centroids, probes = 1)
    val probedQueries = assignCells(
      queries(s, d).withColumnRenamed("qv", "v"), centroids, Probes)
      .withColumnRenamed("v", "qv")
    val candidates = bucketed.join(probedQueries, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "qv", "vec_id", "v")
      .dropDuplicates("query_id", "vec_id")
    ranked(candidates.withColumn("cos", vec_cosine(col("v"), col("qv"))))
  }

  private val KnnK = 5
  // the graph build probes wider than the point-query path: recall on
  // an isotropic corpus at 3/16 cells is ~0.5; 5/16 buys ~0.65 for a
  // 1.7× candidate volume — still cell-local, still ~N^1.5 when the
  // cell count scales with √N
  private val KnnProbes = 5

  /** D4: k-NN join — EVERY corpus vector finds its K nearest neighbors
    * (the kNN-graph primitive behind SemDeDup, kNN-LM and
    * retrieval-based data curation). IVF shape, corpus vs corpus: one
    * side is bucketed by its nearest cell (probes=1, how production
    * stores the collection anyway), the probe side visits its `Probes`
    * nearest cells, so cosine runs cell-locally — per-cell work is
    * (N/k)·(Probes·N/k) and the cell count k grows with the corpus
    * (k ≈ √N holds total work at ~N^1.5, the standard IVF curve, vs N²
    * for a brute-force self-join). True neighbors outside the probed
    * cells are missed — the documented IVF recall tradeoff; the spec
    * pins recall@K against brute force.
    */
  def sKnnJoin(s: SparkSession, d: String): DataFrame = {
    val c = corpus(s, d)
    // the cell count must GROW with the corpus for the corpus×corpus
    // graph build: fixed cells make per-cell verify (N/k)² → quadratic
    // total (measured 21× at the 10× probe with k=16). k ≈ √N holds
    // total work at the standard ~N^1.5 IVF curve; recall at fixed
    // probes is the documented tradeoff, still spec-pinned at build
    // scale.
    val n = c.count()
    // capped at 1024: driver Lloyd is O(sample × cells × dim × iters)
    // and the 8-per-cell sample grows with k — past ~1024 cells the
    // quantizer belongs offline/distributed (production trains it once
    // per collection anyway)
    val cells = math.max(Cells, math.min(1024, math.sqrt(n.toDouble).toInt))
    val centroids = trainCentroids(c, cells)
    // barrier both sides: the 16×64-literal distance expressions would
    // otherwise re-evaluate under the probe explode (Generate runs its
    // child per OUTPUT row) and again under the join's projections
    val bucketed = graft.Stage.barrier(assignCells(c, centroids, probes = 1)
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("v").as("nv")))
    val probing = graft.Stage.barrier(assignCells(c, centroids, KnnProbes))
    // no dropDuplicates: a (vec, neighbor) pair meets exactly once —
    // the neighbor side holds ONE cell per vector and the probe cells
    // are distinct, so candidate generation is already duplicate-free
    val candidates = probing.join(bucketed, Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", round(vec_cosine(col("v"), col("nv")), 4))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnK)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  // ---- PQ (product quantization) ANN: compressed codes + ADC ----

  private val PqM = 8          // subspaces (64 dims → 8 per subspace)
  private val PqK = 16         // centroids per subspace (4-bit codes)
  private val PqSub = Dim / PqM
  private val PqTopK = 10

  /** Driver-side Lloyd on a bounded sample — same rationale as
    * trainCentroids (quantizer training is offline in production, the
    * sample is tiny, and distributed iterations are planning-bound).
    */
  private def lloyd(train: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val dim = train.head.length
    var centroids = train.take(k).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      train.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          var dist = 0.0; var i = 0
          while (i < dim) { val dx = v(i) - centroids(c)(i); dist += dx * dx; i += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => sums(c)(i) / counts(c)))
    }
    centroids
  }

  /** D5: product-quantization ANN — the memory-bound scale path: each
    * vector is compressed to PqM 4-bit codes (64 dims × 8 bytes →
    * 4 bytes), and queries score candidates with ASYMMETRIC DISTANCE
    * (ADC): per query, one lookup table of query↔centroid distances
    * per subspace; a candidate's approximate distance is the sum of
    * PqM table lookups on its codes — no float vector is ever read at
    * query time. At 100 TB this is the difference between scanning
    * 100 TB of floats and ~6 TB of codes. Quantizers train driver-side
    * on the bounded deterministic sample (offline in production);
    * codes are computed once (stored with the corpus in production);
    * the scan is one broadcast of 8 queries × their LUTs against the
    * code table. The code scan produces a SHORTLIST (top-50 by ADC);
    * only shortlisted candidates have their true vectors read for the
    * exact re-rank — the standard two-stage retrieval: compressed
    * first pass over everything, exact math over shortlist/N ≈ 10%
    * here and a vanishing fraction at corpus scale. The spec pins
    * recall@10 of the re-ranked result against exact L2 brute force.
    */
  private val PqShortlist = 50

  def sAnnPq(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val c = corpus(s, d)
    val train: Array[Array[Double]] = c.orderBy("vec_id").limit(TrainSample)
      .select("v").as[Seq[Double]].collect().map(_.toArray)
    val books: Array[Array[Array[Double]]] =
      (0 until PqM).map(m => lloyd(train.map(_.slice(m * PqSub, (m + 1) * PqSub)), PqK, LloydIters)).toArray

    // encode the corpus: argmin centroid per subspace → PqM small codes
    // (native kernel over the codebook reference object — the
    // composable per-centroid-HOF form is 8×16 aggregate(zip_with)
    // trees and its analysis/codegen dominated the query)
    val codes = graft.Stage.barrier(
      c.select(col("vec_id"), graft.functions.pq_encode(col("v"), books).as("codes")))

    // queries carry their flattened ADC lookup tables (PqM*PqK doubles)
    val q = graft.Stage.barrier(
      queries(s, d).select(col("query_id"),
        graft.functions.pq_luts(col("qv"), books).as("luts")))

    val scored = codes.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.pq_adc(col("luts"), col("codes"), PqK), 6).as("approx_dist"))
    val wApprox = Window.partitionBy("query_id").orderBy(col("approx_dist"), col("vec_id"))
    val shortlist = scored.withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= PqShortlist)
      .select("query_id", "vec_id", "approx_dist")

    // exact re-rank: true vectors are read ONLY for the shortlist
    val exact = shortlist
      .join(c, Seq("vec_id"))
      .join(broadcast(queries(s, d)), Seq("query_id"))
      .withColumn("dist", round(
        aggregate(zip_with(col("v"), col("qv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x), 6))
    val w = Window.partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= PqTopK)
      .select("query_id", "rank", "vec_id", "dist", "approx_dist")
  }

  /** s_ann_brute oracle: DuckDB's list_cosine_similarity runs the same
    * sequential dot/norm accumulation as graft's fused vec_cosine
    * kernel; ranking ties break on vec_id in both, and 4-dp rounding
    * guards the last ulp.
    */
  val sAnnBruteSql: String =
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < $NumQueries)
       |SELECT query_id, rank, vec_id AS neighbor_id, cos FROM (
       |  SELECT q.query_id, c.vec_id,
       |    round(list_cosine_similarity(c.v, q.qv), 4) AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY q.query_id
       |      ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id) AS rank
       |  FROM c CROSS JOIN q WHERE c.vec_id != q.query_id)
       |WHERE rank <= $TopK""".stripMargin

  /** D6: kNN label classification — the inference pattern over a
    * labeled corpus: a BOUNDED batch of incoming vectors (vec_id % 97
    * == 0, standing in for new arrivals) is broadcast against the
    * corpus, each takes the majority label of its 5 nearest neighbors
    * (self excluded; ties → cosine then vec_id, label ties → smaller
    * label). Linear in the corpus — one streamed scan per batch, a
    * window over the per-query candidate set, a vote agg. The oracle
    * recomputes the identical vote with list_cosine_similarity.
    */
  private val KnnClassifyK = 5

  def sKnnClassify(s: SparkSession, d: String): DataFrame = {
    val c = Tables.embeddings(s, d)
      .select(col("vec_id"), vecCol.as("v"), col("label"))
    // BOUNDED means independent of corpus size: the residue alone
    // grows with the corpus (10x corpus -> 10x batch -> 100x scan work,
    // measured superlinear at the 10x probe), so the batch is also
    // capped by absolute id
    val batch = c.filter(col("vec_id") % 97 === 0 && col("vec_id") < 8000)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("label").as("true_label"))
    val scored = c.crossJoin(broadcast(batch))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", vec_cosine(col("v"), col("qv")))
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    val votes = scored.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= KnnClassifyK)
      .groupBy("query_id", "true_label", "label")
      .agg(count(lit(1)).as("votes"))
    val wVote = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("vrk", row_number().over(wVote))
      .filter(col("vrk") === 1)
      .select(col("query_id"), col("true_label"),
        col("label").as("predicted"), col("votes"),
        (col("label") === col("true_label")).as("hit"))
  }

  val sKnnClassifySql: String =
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, label AS true_label
       |  FROM c WHERE vec_id % 97 = 0 AND vec_id < 8000),
       |top AS (
       |  SELECT query_id, true_label, label FROM (
       |    SELECT q.query_id, q.true_label, c.label,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id) AS rk
       |    FROM c CROSS JOIN q WHERE c.vec_id != q.query_id)
       |  WHERE rk <= $KnnClassifyK),
       |votes AS (
       |  SELECT query_id, true_label, label, COUNT(*) AS votes
       |  FROM top GROUP BY 1, 2, 3)
       |SELECT query_id, true_label, label AS predicted, votes,
       |  label = true_label AS hit
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY votes DESC, label) AS vrk FROM votes)
       |WHERE vrk = 1""".stripMargin

  /** D7: radius (range) search — all corpus vectors within cosine ≥ τ
    * of each query in a bounded batch, the retrieval primitive when the
    * answer set size is data-dependent (dedup candidates, near-match
    * lookup) rather than a fixed top-k. Same scale shape as
    * s_ann_brute: broadcast the bounded batch, one streamed corpus
    * pass, no self-join; the production path swaps the scan for the
    * LSH/IVF bucketed candidates exactly as s_ann_lsh does.
    */
  private val RangeTau = 0.25

  def sRangeSearch(s: SparkSession, d: String): DataFrame = {
    val c = corpus(s, d)
    // capped by absolute id so the batch stays bounded at any corpus
    // size (same contract as s_knn_classify)
    val batch = c.filter(col("vec_id") % 89 === 0 && col("vec_id") < 8000)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    c.crossJoin(broadcast(batch))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(vec_cosine(col("v"), col("qv")), 4))
      .filter(col("cos") >= RangeTau)
      .select("query_id", "vec_id", "cos")
  }

  val sRangeSearchSql: String =
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id % 89 = 0 AND vec_id < 8000)
       |SELECT query_id, c.vec_id, round(list_cosine_similarity(c.v, q.qv), 4) AS cos
       |FROM c CROSS JOIN q
       |WHERE c.vec_id != q.query_id
       |  AND round(list_cosine_similarity(c.v, q.qv), 4) >= $RangeTau""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("s_ann_brute", sAnnBrute, Some(sAnnBruteSql)),
    QueryDef("s_range_search", sRangeSearch, Some(sRangeSearchSql)),
    QueryDef("s_ann_lsh", sAnnLsh, None),
    QueryDef("s_ann_ivf", sAnnIvf, None),
    QueryDef("s_ann_pq", sAnnPq, None),
    QueryDef("s_knn_join", sKnnJoin, None),
    QueryDef("s_knn_classify", sKnnClassify, Some(sKnnClassifySql)),
  )
}
