package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup}

/** Dedup (Block C) + ANN (Block D) specs at sf0.001, cross-checked
  * against brute-force ground truth computed in-test.
  */
class OperatorsSpec extends SparkSpec {

  test("d_exact: every re-inserted doc forms a group of 2 with min-id keeper") {
    val expectedDups = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0).count()
    val groups = Dedup.dExact(spark, sfDir).filter(col("cnt") > 1)
    assert(groups.count() === expectedDups)
    // keeper is always the original (< 1_000_000)
    assert(groups.filter(col("keeper") >= 1000000L).count() === 0)
  }

  /** brute-force word-3-gram-shingle jaccard over all pairs (tiny sf). */
  private def bruteJaccardPairs(threshold: Double) = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> {
        val w = r.getString(1).split("\\s+").filter(_.nonEmpty)
        w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      })
    for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      j = (sa & sb).size.toDouble / (sa | sb).size.max(1)
      if j >= threshold
    } yield (ia, ib, j)
  }

  test("d_minhash_lsh: finds every strong near-dup pair, reports only verified ones") {
    val found = Dedup.dMinhashLsh(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 bands × 4 rows → P(candidate | j=0.8) > 0.996: strong pairs must all surface
    val strong = bruteJaccardPairs(0.8).map(p => (p._1, p._2)).toSet
    assert(strong.subsetOf(found),
      s"missed strong pairs: ${strong -- found}")
    // and everything reported really clears the verify threshold
    val all = bruteJaccardPairs(0.5).map(p => (p._1, p._2)).toSet
    assert(found.subsetOf(all), s"unverified pairs reported: ${found -- all}")
  }

  test("d_simhash: near-identical docs collide within hamming budget") {
    val strong = bruteJaccardPairs(0.9).map(p => (p._1, p._2)).toSet
    val found = Dedup.dSimhash(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.subsetOf(found), s"missed: ${strong -- found}")
  }

  test("d_ngram_jaccard: symmetric, thresholded, within-block only") {
    val rows = Dedup.dNgramJaccard(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      // jaccard = inter/uni >= 0.6, kept exact in integers
      assert(r.getLong(2) * 5 >= r.getLong(3) * 3)
      assert(r.getLong(2) <= r.getLong(3))
    }
  }

  test("d_embed_cos: exactly the planted perturbed pairs") {
    val planted = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 11 === 0).select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    val found = Dedup.dEmbedCos(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === planted)
  }

  test("s_ann_brute: ranks are 1..k per query, self excluded, cos descending") {
    val rows = Ann.sAnnBrute(spark, sfDir)
      .orderBy("query_id", "rank").collect()
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq === (1 to rs.length))
      assert(!rs.exists(_.getLong(2) == q))
      val cs = rs.map(_.getDouble(3)).toSeq
      assert(cs === cs.sorted.reverse)
    }
  }

  test("s_ann_ivf: valid ranks, overlaps brute-force top-k") {
    val brute = Ann.sAnnBrute(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.sAnnIvf(spark, sfDir)
      .select("query_id", "rank", "neighbor_id").collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length))
    }
    val pairs = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert((pairs & brute).nonEmpty, "IVF shares no neighbors with brute force")
  }

  test("s_ann_lsh: candidates only, overlaps brute-force top-k") {
    val brute = Ann.sAnnBrute(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.sAnnLsh(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    // probabilistic structure, deterministic seed: some overlap must exist
    assert((lsh & brute).nonEmpty, "LSH shares no neighbors with brute force")
  }
}
