package graft

import org.apache.spark.sql.functions._

import graft.queries.Stats
import graft.queries.PipelineQueries
import graft.operators.{Ann, Text}

/** The round-13 statistics/insight additions: independent same-JVM
  * recomputation of the closed forms (regression, Gini, MAD, lift,
  * MAE), invariant checks (bounds, totals), and the specific engine
  * disagreements each operator was written to avoid (floor-vs-truncate
  * banding on real negative balances, fixed-point accumulators in the
  * k-means fold).
  */
class StatsSpec extends SparkSpec {

  test("q_regression: slope/intercept/r2 match an exact BigInt OLS recompute") {
    val out = Stats.qRegression(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // independent daily compression straight off the raw table
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d0 = daily.map(_._2).min
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.map(r => BigInt(r._2 - d0))
      val ys = rows.map(r => BigInt(r._3))
      val n = BigInt(rows.length)
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(b => b * b).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val (nDays, slope, intercept, r2) = out(et)
      assert(nDays === rows.length.toLong)
      assert(slope === num.toDouble / den.toDouble, s"slope($et)")
      assert(intercept ===
        (sy * den - num * sx).toDouble / (n * den).toDouble, s"intercept($et)")
      val r2d = (num.toDouble * num.toDouble) / (den.toDouble * (n * syy - sy * sy).toDouble)
      assert(r2 === r2d, s"r2($et)")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"r2 bound ($et): $r2")
    }
  }

  test("q_gini: closed form matches a sorted-sequence recompute; deciles account for everyone") {
    val rows = Stats.qGini(spark, sfDir).collect()
    val spend = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (x._2, x._1))
    val n = BigInt(spend.length)
    val s = spend.map(x => BigInt(x._2)).sum
    val w = spend.zipWithIndex.map { case ((_, c), i) => BigInt(i + 1) * BigInt(c) }.sum
    val expected = (2 * w - (n + 1) * s).toDouble / (n * s).toDouble
    rows.foreach { r =>
      assert(r.getAs[Double]("gini") === expected)
    }
    assert(rows.map(_.getAs[Long]("n_cust")).sum === spend.length.toLong)
    val last = rows.maxBy(_.getAs[Int]("decile"))
    assert(last.getAs[Long]("cum_cents") === s.toLong)
    assert(last.getAs[Double]("cum_share") === 1.0)
    assert(expected >= 0.0 && expected < 1.0)
  }

  test("q_outlier_mad: median/MAD match exact percentile recomputes; zero-MAD defines z=0") {
    def medianOf(v: Array[Double]): Double = {
      val s = v.sorted
      val h = (s.length - 1) * 0.5
      val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    val base = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    val out = Stats.qOutlierMad(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val seg = r.getAs[String]("segment")
      val vals = base.filter(_._1 == seg).map(_._2)
      val med = medianOf(vals)
      val mad = medianOf(vals.map(v => math.abs(v - med)))
      assert(r.getAs[Double]("median_cents") === med, s"median($seg)")
      assert(r.getAs[Double]("mad_cents") === mad, s"mad($seg)")
      val expectedOutliers = if (mad > 0)
        vals.count(v => math.abs(v - med) > 3.0 * 1.4826 * mad) else 0
      assert(r.getAs[Long]("n_outliers") === expectedOutliers.toLong, s"outliers($seg)")
      assert(r.getAs[Long]("n") === vals.length.toLong)
    }
  }

  test("q_assoc_rules: supports bound each other and lift recomputes; one pair brute-checked") {
    val rules = Stats.qAssocRules(spark, sfDir).collect()
    val baskets = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = baskets.map(_._1).distinct.length.toLong
    rules.foreach { r =>
      val (ab, s1, s2) = (r.getAs[Long]("sup_ab"), r.getAs[Long]("sup1"), r.getAs[Long]("sup2"))
      assert(ab <= math.min(s1, s2))
      assert(100L * ab >= nOrders, "min-support gate")
      assert(r.getAs[Double]("lift") ===
        ab.toDouble * nOrders.toDouble / (s1.toDouble * s2.toDouble))
      assert(r.getAs[Double]("conf_12") === ab.toDouble / s1.toDouble)
    }
    // brute-force the single highest-support pair
    val top = rules.maxBy(_.getAs[Long]("sup_ab"))
    val (i1, i2) = (top.getAs[String]("i1"), top.getAs[String]("i2"))
    val byOrder = baskets.groupBy(_._1)
    val brute = byOrder.count { case (_, items) =>
      val set = items.map(_._2).toSet; set.contains(i1) && set.contains(i2)
    }
    assert(top.getAs[Long]("sup_ab") === brute.toLong)
  }

  test("q_forecast_snaive: MAE recomputes from the daily table; gaps contribute no row") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val dmax = daily.keys.map(_._2).max
    val out = Stats.qForecastSnaive(spark, sfDir).collect()
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val scored = daily.collect {
        case ((t, d), y) if t == et && d > dmax - 28 && daily.contains((t, d - 7)) =>
          math.abs(y - daily((t, d - 7)))
      }
      assert(r.getAs[Long]("n_scored") === scored.size.toLong)
      assert(r.getAs[Long]("sae") === scored.sum)
      assert(r.getAs[Double]("mae") === scored.sum.toDouble / scored.size.toDouble)
    }
  }

  test("p_kanon: classes partition the table; banding floors (not truncates) negative balances") {
    val rows = PipelineQueries.pKanon(spark, sfDir).collect()
    val total = Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Int]("suppressed") === (if (r.getAs[Long]("n") < 5) 1 else 0))
    }
    // the real negative balances in the fixture must land in NEGATIVE
    // bands (floor), not band 0/-0 (truncate-toward-zero would merge
    // [-999.99, 999.99] into band 0 and weaken the audit)
    val negBalances = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") < -0.005).count()
    val negBandMembers = rows.filter(_.getAs[Long]("bal_band") < 0)
      .map(_.getAs[Long]("n")).sum
    assert(negBalances > 0, "fixture must exercise negative balances")
    assert(negBandMembers === negBalances)
  }

  test("t_jsd: contributions bounded by the JSD term maximum; one-sided terms positive") {
    val rows = Text.tJsd(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 200)
    rows.foreach { r =>
      val v = r.getAs[Double]("jsd_nats")
      // per-term JSD contribution is within [0, ln 2 · (p+q)/... ] —
      // loosely bounded by ln 2 since p,q ≤ 1
      assert(v >= -1e-9 && v <= math.log(2.0) + 1e-9, s"jsd bound: $v")
      if (r.getAs[Long]("cnt_a") == 0 ^ r.getAs[Long]("cnt_b") == 0)
        assert(v > 0.0, "a term on exactly one side must contribute positive divergence")
    }
  }

  test("t_lexical: per-doc invariants and one doc recomputed") {
    val rows = Text.tLexical(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, typ, hap) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("n_hapax"))
      assert(typ <= tok && hap <= typ && tok > 0)
      assert(r.getAs[Double]("ttr") === typ.toDouble / tok.toDouble)
    }
    val doc = Tables.documents(spark, sfDir).select("doc_id", "text")
      .filter(col("doc_id") === rows.head.getAs[Long]("doc_id"))
      .collect().head.getString(1)
    val words = doc.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val counts = words.groupBy(identity).map { case (_, v) => v.length }
    val r0 = rows.head
    assert(r0.getAs[Long]("n_tokens") === words.length.toLong)
    assert(r0.getAs[Long]("n_types") === counts.size.toLong)
    assert(r0.getAs[Long]("n_hapax") === counts.count(_ == 1).toLong)
  }

  test("t_readability: surface counts recompute for one doc; sentence floor holds") {
    val rows = Text.tReadability(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sentences") >= 1L)
      assert(r.getAs[Long]("n_syllables") >= r.getAs[Long]("n_words"))
    }
    val r0 = rows.head
    val doc = Tables.documents(spark, sfDir).select("doc_id", "text")
      .filter(col("doc_id") === r0.getAs[Long]("doc_id"))
      .collect().head.getString(1)
    val words = doc.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val syl = words.map(w => math.max(1, "[aeiouy]+".r.findAllIn(w).length)).sum
    val sent = math.max(1, "[.!?]+".r.findAllIn(doc).length)
    assert(r0.getAs[Long]("n_words") === words.length.toLong)
    assert(r0.getAs[Long]("n_syllables") === syl.toLong)
    assert(r0.getAs[Long]("n_sentences") === sent.toLong)
    val flesch = BigDecimal(206.835 - 1.015 * (words.length.toDouble / sent) -
      84.6 * (syl.toDouble / words.length))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getAs[Double]("flesch") === flesch)
  }

  test("q_holt: level/trend replay an exact floor-division recurrence; constant series has zero trend") {
    def fd(a: BigInt, n: Int): BigInt = {
      val m = ((a % n) + n) % n
      (a - m) / n
    }
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = Stats.qHolt(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val ys = rows.sortBy(_._2).map(r => BigInt(r._3))
      var l = ys.head; var b = BigInt(0)
      ys.tail.foreach { y =>
        val l2 = fd(y + l + b, 2)
        b = fd(l2 - l + 3 * b, 4)
        l = l2
      }
      val (nDays, level, trend, fc7) = out(et)
      assert(nDays === rows.length.toLong)
      assert(level === l.toLong, s"level($et)")
      assert(trend === b.toLong, s"trend($et)")
      assert(fc7 === (l + 7 * b).toLong)
    }
    // algebraic property: a constant series keeps level = the constant
    // and trend = 0 through every update (fd(3c,2)... ) — replay one
    val c = BigInt(42); var l = c; var b = BigInt(0)
    (1 to 50).foreach { _ =>
      val l2 = fd(c + l + b, 2); b = fd(l2 - l + 3 * b, 4); l = l2
    }
    assert(l === c && b === BigInt(0))
  }

  test("q_dau_mau: trailing-28 actives dominate daily actives; spot day recomputed") {
    val rows = Stats.qDauMau(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("mau") >= r.getAs[Long]("dau")))
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val dmax = ud.map(_._2).max
    val expDau = ud.filter(_._2 == dmax).map(_._1).distinct.length
    val expMau = ud.filter(x => x._2 > dmax - 28 && x._2 <= dmax).map(_._1).distinct.length
    val last = rows.filter(_.getAs[Long]("day") == dmax).head
    assert(last.getAs[Long]("dau") === expDau.toLong)
    assert(last.getAs[Long]("mau") === expMau.toLong)
  }

  test("s_silhouette: margins nonnegative, corpus partitioned, composes with s_kmeans counts") {
    val sil = Ann.sSilhouette(spark, sfDir).collect()
    val corpusN = Tables.embeddings(spark, sfDir).count()
    assert(sil.map(_.getAs[Long]("n")).sum === corpusN)
    sil.foreach { r =>
      assert(r.getAs[Long]("min_margin") >= 0L, "nearest minus second-nearest is nonnegative")
      assert(r.getAs[Double]("mean_margin") ===
        r.getAs[Long]("sum_margin").toDouble / r.getAs[Long]("n").toDouble)
    }
    // same seed universe as s_kmeans (quantized vs raw ranking can
    // move individual boundary vectors, so compare cluster SETS)
    val km = Ann.sKmeans(spark, sfDir).collect().map(_.getAs[Long]("cluster_id")).toSet
    assert(sil.map(_.getAs[Long]("cluster_id")).toSet.subsetOf(km ++ (0L until 8L)))
  }

  test("p_retention_sweep: expiry counts recompute; TTL classes assigned per policy") {
    val rows = PipelineQueries.pRetentionSweep(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val now = ev.map(_._2).max
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val ttl = if (et == "view" || et == "click") 90L else 365L
      assert(r.getAs[Long]("ttl_days") === ttl)
      val ages = ev.filter(_._1 == et).map(x => (now - x._2) / 86400000000L)
      assert(r.getAs[Long]("n_total") === ages.length.toLong)
      assert(r.getAs[Long]("n_expired") === ages.count(_ > ttl).toLong)
      assert(r.getAs[Long]("oldest_age_days") === ages.max)
      assert(r.getAs[Long]("newest_age_days") === ages.min)
    }
  }

  test("q_new_returning: first days are new, the rest return, and totals reconcile") {
    val rows = Stats.qNewReturning(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (_, dau, nu, ret) => assert(dau === nu + ret) }
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.map(_._3).sum === users, "every user is new exactly once")
    val firstDay = rows.map(_._1).min
    val f = rows.find(_._1 == firstDay).get
    assert(f._4 === 0L, "nobody can return on the corpus's first day")
  }

  test("q_inter_event: gap counts reconcile and percentiles are ordered") {
    val rows = Stats.qInterEvent(spark, sfDir).collect()
    val perUserType = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getString(1), r.getLong(2)))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val expected = perUserType.filter(_._1 == et).map(x => math.max(0L, x._2 - 1)).sum
      assert(r.getAs[Long]("n_gaps") === expected, s"n_gaps($et)")
      assert(r.getAs[Double]("p50_us") <= r.getAs[Double]("p90_us"))
      assert(r.getAs[Double]("p90_us") <= r.getAs[Double]("p99_us"))
      assert(r.getAs[Double]("p50_us") >= 0.0)
    }
  }

  test("t_fano: nonnegative (Cauchy-Schwarz), one term recomputed exactly") {
    val rows = graft.operators.Text.tFano(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 200)
    rows.foreach(r => assert(r.getAs[Double]("fano") >= 0.0))
    val top = rows.maxBy(_.getAs[Long]("total_cnt"))
    val term = top.getAs[String]("term")
    val perDoc = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(_.getString(1).toLowerCase.split("\\s+").count(_ == term))
    val d = BigInt(perDoc.length)
    val tot = perDoc.map(BigInt(_)).sum
    val sq = perDoc.map(c => BigInt(c) * BigInt(c)).sum
    assert(top.getAs[Long]("df") === perDoc.count(_ > 0).toLong)
    assert(top.getAs[Long]("total_cnt") === tot.toLong)
    assert(top.getAs[Double]("fano") === (d * sq - tot * tot).toDouble / (d * tot).toDouble)
  }

  test("d_kcore: triangles are core, rows cover the triple-planted corpus, core is nonempty") {
    val rows = graft.operators.Dedup.dKcore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val docs = Tables.documents(spark, sfDir)
    val corpusN = docs.count() + 2 * docs.filter(col("doc_id") % 7 === 0).count()
    assert(rows.length.toLong === corpusN)
    rows.foreach { case (_, inCore, coreDeg) =>
      if (inCore == 1) assert(coreDeg >= 1L, "core members keep at least one core edge")
      else assert(coreDeg === 0L)
    }
    // every triangle participant survives 2-core peeling (a triangle is
    // itself a 2-core), so d_triangles' support set ⊆ the core
    val inCore = rows.filter(_._2 == 1).map(_._1).toSet
    val triNodes = graft.operators.Dedup.dTriangles(spark, sfDir).collect()
      .filter(_.getLong(1) > 0).map(_.getLong(0)).toSet
    assert(triNodes.nonEmpty, "fixture must contain triangles")
    assert(triNodes.subsetOf(inCore),
      s"triangle nodes peeled out of the 2-core: ${triNodes -- inCore}")
  }

  test("q_acf: bounded by 1 in magnitude (Cauchy-Schwarz); lag-1 recomputed exactly") {
    val rows = Stats.qAcf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-12))
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val et = rows.head.getAs[String]("event_type")
    val series = daily.filter(_._1 == et)
    val n = BigInt(series.length); val s = series.map(x => BigInt(x._3)).sum
    val cy = series.map(x => (x._2, n * x._3 - s)).toMap
    val den = cy.values.map(v => v * v).sum
    val pairs = cy.collect { case (day, v) if cy.contains(day - 1) => v * cy(day - 1) }
    val r1 = rows.find(r => r.getAs[String]("event_type") == et && r.getAs[Int]("k") == 1).get
    assert(r1.getAs[Long]("n_pairs") === pairs.size.toLong)
    assert(r1.getAs[Double]("acf") === pairs.sum.toDouble / den.toDouble)
  }

  test("p_kanon_apply: masking follows the audit exactly and never touches the payload") {
    val audit = PipelineQueries.pKanon(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getInt(4)))).toMap
    val out = PipelineQueries.pKanonApply(spark, sfDir).collect()
    assert(out.length.toLong === Tables.customer(spark, sfDir).count())
    val suppressedRows = out.count(_.getAs[Int]("suppressed") == 1)
    val expectSuppressed = audit.values.collect { case (n, 1) => n }.sum
    assert(suppressedRows.toLong === expectSuppressed)
    out.foreach { r =>
      if (r.getAs[Int]("suppressed") == 1) {
        assert(r.getAs[String]("nation_out") === "*")
        assert(r.getAs[String]("segment_out") === "*")
        assert(r.getAs[String]("band_out") === "*")
      } else {
        assert(r.getAs[String]("nation_out") !== "*")
      }
      assert(r.getAs[String]("acctbal").nonEmpty, "payload must survive masking")
    }
  }

  test("s_kmeans_iter: migration readout partitions the corpus and reconciles with round 1") {
    val iter = Ann.sKmeansIter(spark, sfDir).collect()
    val corpusN = Tables.embeddings(spark, sfDir).count()
    assert(iter.map(_.getAs[Long]("n_round2")).sum === corpusN)
    iter.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_arrived") ===
        r.getAs[Long]("n_round2"))
    }
    // kept members were in this cluster in round 1, so kept ≤ round-1 size
    val r1 = Ann.sKmeans(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("n")).toMap
    iter.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r1.getOrElse(r.getAs[Long]("cluster_id"), 0L))
    }
  }

  test("q_chisq: margins reconcile and the statistic is the sum of its cells") {
    val rows = Stats.qChisq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("o")).sum
    // row margins: every cell in a segment carries that segment's total
    rows.groupBy(_.getAs[String]("segment")).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("o")).sum === cells.head.getAs[Long]("r"))
    }
    rows.groupBy(_.getAs[String]("priority")).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("o")).sum === cells.head.getAs[Long]("c"))
    }
    rows.foreach(r => assert(r.getAs[Double]("contrib") >= 0.0))
    val chi2 = rows.head.getAs[Double]("chi2")
    // fx quantization makes the statistic EXACTLY the sum of the
    // emitted per-cell terms
    assert(math.abs(rows.map(_.getAs[Double]("contrib")).sum - chi2) < 1e-6)
    assert(n > 0)
  }

  test("q_mwu: doubled-rank U equals the brute pairwise count with half-credit ties") {
    val out = Stats.qMwu(spark, sfDir).collect().head
    val spend = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
      .groupBy(col("c_custkey"), col("c_mktsegment").as("seg"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("c"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val a = spend.filter(_._1 == "AUTOMOBILE").map(_._2)
    val b = spend.filter(_._1 == "BUILDING").map(_._2)
    val u1Brute = (for (x <- a; y <- b) yield {
      if (x > y) 1.0 else if (x == y) 0.5 else 0.0
    }).sum
    assert(out.getAs[Long]("n1") === a.length.toLong)
    assert(out.getAs[Long]("n2") === b.length.toLong)
    assert(out.getAs[Double]("u1") === u1Brute)
    assert(out.getAs[Double]("u1") + out.getAs[Double]("u2") ===
      a.length.toDouble * b.length.toDouble)
    val eff = out.getAs[Double]("effect")
    assert(eff >= 0.0 && eff <= 1.0)
  }

  test("q_survival: the KM curve replays exactly and is non-increasing") {
    val rows = Stats.qSurvival(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // non-increasing survival; risk sets shrink as t grows
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 <= a._4 + 1e-12, "survival must not increase")
        assert(b._2 <= a._2, "risk set must shrink with t")
      case _ =>
    }
    // independent replay from raw spans
    val spans = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min(expr("unix_micros(ts) div 86400000000")).as("f"),
        max(expr("unix_micros(ts) div 86400000000")).as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val m = spans.map(_._2).max
    val lives = spans.map { case (f, l) => (l - f, if (l > m - 7) 0 else 1) }
    val byT = lives.groupBy(_._1).map { case (t, v) =>
      (t, v.size.toLong, v.map(_._2).sum.toLong)
    }.toSeq.sortBy(_._1)
    var surv = 1.0
    val expected = byT.map { case (t, c, dd) =>
      val n = byT.filter(_._1 >= t).map(_._2).sum
      surv *= (1.0 - dd.toDouble / n.toDouble)
      (t, n, dd, BigDecimal(surv).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(rows.toSeq === expected)
  }

  test("q_elasticity: one brand's quantized OLS recomputed in BigInt") {
    val out = Stats.qElasticity(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.nonEmpty)
    val base = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brand = out.keys.min
    val pts = base.filter(_._1 == brand).map { case (_, cents, qty) =>
      (BigInt(math.floor(math.log(cents.toDouble) * 1000 + 0.5).toLong) - 14000,
        BigInt(math.floor(math.log(qty.toDouble) * 1000 + 0.5).toLong))
    }
    val n = BigInt(pts.length)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val (nOut, slope) = out(brand)
    assert(nOut === pts.length.toLong)
    assert(slope === (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
  }

  test("q_runs: runs and moves recomputed for one event type") {
    val rows = Stats.qRuns(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      val moves = series.sliding(2).collect {
        case Array(a, b) if b != a => if (b > a) 1 else -1
      }.toSeq
      val runs = if (moves.isEmpty) 0
        else 1 + moves.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
      assert(r.getAs[Long]("n1") === moves.count(_ == 1).toLong)
      assert(r.getAs[Long]("n2") === moves.count(_ == -1).toLong)
      assert(r.getAs[Long]("runs") === runs.toLong)
    }
  }

  test("q_concentration: shares bounded, HHI recomputed from quantized shares") {
    val out = Stats.qConcentration(spark, sfDir).collect().head
    val spend = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = spend.map(_._2).sum
    val top10 = spend.sortBy(x => (-x._2, x._1)).take(10).map(_._2).sum
    assert(out.getAs[Long]("n_cust") === spend.length.toLong)
    assert(out.getAs[Long]("total_cents") === total)
    assert(out.getAs[Long]("top10_cents") === top10)
    val hhi = spend.map { case (_, c) =>
      val fx = c * 1000000L / total; fx * fx
    }.sum.toDouble / 1.0e12
    assert(out.getAs[Double]("hhi") === hhi)
    assert(out.getAs[Double]("top10_share") > 0.0 && out.getAs[Double]("top10_share") <= 1.0)
    assert(hhi > 0.0 && hhi <= 1.0)
  }

  test("q_session_stats: percentiles ordered and session count matches the sessionizer") {
    val out = Stats.qSessionStats(spark, sfDir).collect().head
    val nSessions = graft.streaming.Streaming.stSessionize(spark, sfDir).count()
    assert(out.getAs[Long]("n_sessions") === nSessions)
    assert(out.getAs[Double]("p50_events") <= out.getAs[Double]("p90_events"))
    assert(out.getAs[Double]("p50_duration_us") <= out.getAs[Double]("p90_duration_us"))
    assert(out.getAs[Double]("p50_events") >= 1.0)
  }

  test("t_langid_eval: confusion cells reconcile with the classifier's raw predictions") {
    val cells = graft.operators.Text.tLangidEval(spark, sfDir).collect()
    val preds = graft.operators.Text.tLangid(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(cells.map(_.getAs[Long]("n")).sum === preds.length.toLong)
    cells.foreach { c =>
      val (t, p) = (c.getAs[String]("lang"), c.getAs[String]("predicted"))
      assert(c.getAs[Long]("n") === preds.count(x => x._1 == t && x._2 == p).toLong)
      assert(c.getAs[Long]("support") === preds.count(_._1 == t).toLong)
      assert(c.getAs[Long]("pred_total") === preds.count(_._2 == p).toLong)
      assert(c.getAs[Double]("row_share") > 0.0 && c.getAs[Double]("row_share") <= 1.0)
    }
    // the classifier must beat chance on its own training corpus: the
    // diagonal mass exceeds any single off-diagonal cell
    val diag = cells.filter(c => c.getAs[String]("lang") == c.getAs[String]("predicted"))
      .map(_.getAs[Long]("n")).sum
    val offMax = cells.filter(c => c.getAs[String]("lang") != c.getAs[String]("predicted"))
      .map(_.getAs[Long]("n")).maxOption.getOrElse(0L)
    assert(diag > offMax, s"diagonal $diag vs worst confusion $offMax")
  }

  test("s_kmeans: clusters partition the corpus; every seed is its own nearest centroid") {
    val rows = Ann.sKmeans(spark, sfDir).collect()
    val corpusN = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum === corpusN)
    assert(rows.length <= 8)
    val seedIds = Tables.embeddings(spark, sfDir)
      .orderBy("vec_id").limit(8).collect().map(_.getAs[Long]("vec_id")).toSet
    // a seed has cosine exactly 1 with itself, so its cluster exists
    // and its mean quantized cosine can reach 1e6 only if every member
    // is a duplicate — bound, not equality
    val clusters = rows.map(_.getAs[Long]("cluster_id")).toSet
    assert(clusters.subsetOf(seedIds))
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_qcos")
      assert(mean <= 1000000.0 + 1e-6 && mean >= -1000000.0)
      assert(r.getAs[Double]("mean_qcos") ===
        r.getAs[Long]("sum_qcos").toDouble / r.getAs[Long]("n").toDouble)
    }
  }

  test("RangeRank tieSplit: exact row_number under a degenerate key (70% one value), ties split across buckets") {
    import spark.implicits._
    // 70% of the mass on key=500 — the round-15 heavy-tie residual:
    // the monotone-in-key path would funnel all of it into ONE bucket
    val n = 20000
    val df = (0 until n).map { i =>
      val key = if (i % 10 < 7) 500L else (i % 1000).toLong
      (key, i.toLong)
    }.toDF("k", "id")
    for (tieSplit <- Seq(false, true)) {
      val out = graft.operators.RangeRank.withRowNumber(
        df, "k", asc = true, tiebreak = Seq("id"),
        out = "i", nOut = "n_all", buckets = 16, tieSplit = tieSplit)
      val rows = out.select("k", "id", "i", "n_all").collect()
      assert(rows.length === n)
      assert(rows.forall(_.getLong(3) === n.toLong))
      // exact: rank i must equal the position in the (k, id) total order
      val expected = rows.map(r => (r.getLong(0), r.getLong(1))).sorted
        .zipWithIndex.map { case (kid, idx) => kid -> (idx + 1).toLong }.toMap
      rows.foreach { r =>
        assert(r.getLong(2) === expected((r.getLong(0), r.getLong(1))),
          s"tieSplit=$tieSplit rank mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
      }
    }
    // the degenerate extreme — EVERY row one key value — still ranks
    // exactly under tieSplit (boundaries come entirely from tiebreaks)
    val allTied = (0 until 5000).map(i => (42L, i.toLong)).toDF("k", "id")
    val tied = graft.operators.RangeRank.withRowNumber(
        allTied, "k", asc = true, tiebreak = Seq("id"),
        out = "i", nOut = "n_all", buckets = 16, tieSplit = true)
      .select("id", "i").collect()
    tied.foreach(r => assert(r.getLong(1) === r.getLong(0) + 1))
    // bucket-spread is measured (not just asserted): the distribution
    // evidence lives in RANK_PROBE.json's heavy-tie fixture
  }

  test("s_ann_lsh_tune: nested candidate sets, monotone recall, and the L=8 production point") {
    val rows = Ann.sAnnLshTune(spark, sfDir).collect()
      .map(r => r.getAs[Int]("tables") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("hits"),
          r.getAs[Long]("possible"), r.getAs[Long]("recall_pct")))
    val byL = rows.toMap
    assert(byL.keySet === Set(1, 2, 4, 8))
    // candidate sets are nested by construction → counts and hits are
    // monotone non-decreasing in L; recall_pct = hits*100 div possible
    val ls = Seq(1, 2, 4, 8)
    ls.sliding(2).foreach { case Seq(a, b) =>
      assert(byL(a)._1 <= byL(b)._1, s"candidates must grow with L ($a→$b)")
      assert(byL(a)._2 <= byL(b)._2, s"hits must grow with L ($a→$b)")
    }
    rows.foreach { case (_, (_, hits, possible, pct)) =>
      assert(pct === hits * 100 / possible)
      assert(hits <= possible)
    }
    // the lever is real on this corpus: L=8 strictly beats L=1
    assert(byL(8)._2 > byL(1)._2)
  }
}
