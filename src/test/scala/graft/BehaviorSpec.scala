package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Behavior

class BehaviorSpec extends SparkSpec {

  test("every behavior query runs and returns rows at sf0.001") {
    Behavior.all.foreach { q =>
      val n = q.fn(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  private val Day = 86400000000L

  private def evFrame(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "us", "event_id", "event_type", "value")
  }

  test("funnel doctored fixture: partial stages, expired window, order") {
    // u1: full conversion inside the window.
    // u2: view lands AFTER the 3-day anchor deadline -> stops at stage 1.
    // u3: click precedes view (wrong order) -> stops at stage 2 (view
    //     matched, no click after it).
    // u4: no signup at all -> contributes to no stage.
    // u5: full chain but purchase 1us past the deadline -> stage 3.
    val d0 = 1700000000000000L
    val rows = Seq(
      (1L, d0, 10L, "signup", 0.0),
      (1L, d0 + 1, 11L, "view", 0.0),
      (1L, d0 + 2, 12L, "click", 0.0),
      (1L, d0 + 3, 13L, "purchase", 5.0),
      (2L, d0, 20L, "signup", 0.0),
      (2L, d0 + 3 * Day + 1, 21L, "view", 0.0),
      (3L, d0, 30L, "signup", 0.0),
      (3L, d0 + 2, 31L, "click", 0.0),
      (3L, d0 + 3, 32L, "view", 0.0),
      (4L, d0, 40L, "view", 0.0),
      (4L, d0 + 1, 41L, "click", 0.0),
      (5L, d0, 50L, "signup", 0.0),
      (5L, d0 + 1, 51L, "view", 0.0),
      (5L, d0 + 2, 52L, "click", 0.0),
      (5L, d0 + 3 * Day + 1, 53L, "purchase", 9.0))
    val got = Behavior.funnelOf(evFrame(rows)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "1_signup" -> 4L, "2_view" -> 3L, "3_click" -> 2L, "4_purchase" -> 1L))
  }

  test("funnel tie on us is broken by event_id, not lost") {
    // view shares the signup's timestamp but has a larger event_id ->
    // strictly after in the walk's total order, so it counts.
    val d0 = 1700000000000000L
    val rows = Seq(
      (1L, d0, 1L, "signup", 0.0),
      (1L, d0, 2L, "view", 0.0))
    val got = Behavior.funnelOf(evFrame(rows)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("2_view") === 1L)
  }

  test("funnel stage counts are monotone non-increasing at sf0.001") {
    val r = Behavior.qFunnel(spark, sfDir).orderBy("step").collect()
      .map(_.getLong(1))
    assert(r.length === 4)
    assert(r.zip(r.tail).forall { case (a, b) => a >= b })
  }

  test("attribution: purchase accounting is total and 'direct' is first-touch") {
    val d0 = 1700000000000000L
    val rows = Seq(
      // u1: purchase right after a click -> credited to click
      (1L, d0, 10L, "click", 0.0),
      (1L, d0 + 1, 11L, "purchase", 10.0),
      // u2: purchase with NO prior event -> direct
      (2L, d0, 20L, "purchase", 7.0),
      // u2: second purchase after a view -> view (purchases never credit
      // purchases)
      (2L, d0 + 1, 21L, "view", 0.0),
      (2L, d0 + 2, 22L, "purchase", 3.0),
      // u3: purchase preceded only by another purchase -> still direct
      (3L, d0, 30L, "purchase", 1.0),
      (3L, d0 + 1, 31L, "purchase", 2.0))
    val got = Behavior.attributionOf(evFrame(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet === Set(
      ("click", 1L, 10.0), ("direct", 3L, 10.0), ("view", 1L, 3.0)))
  }

  test("attribution totals reconcile with raw purchase events at sf0.001") {
    val attr = Behavior.qAttribution(spark, sfDir)
    val totalPurchases = attr.agg(sum("purchases")).collect()(0).getLong(0)
    val raw = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(totalPurchases === raw)
  }

  test("retention: offset-0 row per cohort counts the cohort's users") {
    val ret = Behavior.qRetention(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohorts = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("wk"))
      .groupBy("user_id").agg(min("wk").as("c"))
      .groupBy("c").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val zero = ret.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    assert(zero === cohorts)
    // retained users at any offset never exceed the cohort size
    ret.foreach { case (c, _, u) => assert(u <= cohorts(c)) }
  }

  test("concurrency doctored fixture: ties, half-open ends, cross-bucket offsets") {
    import spark.implicits._
    val S = Behavior.SessUs
    val B = Behavior.BucketUs
    val d0 = 1700000000000000L
    // a: 3 overlapping sessions -> peak 3 at the third open;
    //    then one that starts EXACTLY when the first ends (half-open:
    //    the -1 sorts before the +1, so the peak stays 3).
    // b: peak is reached in a LATER hour bucket than the first open,
    //    so the cross-bucket offset carry must be exercised.
    // c: single session -> peak 1 at its own start.
    val rows = Seq(
      ("a", d0), ("a", d0 + 10), ("a", d0 + 20), ("a", d0 + S),
      ("b", d0), ("b", d0 + 2 * B), ("b", d0 + 2 * B + 1),
      ("c", d0))
    val got = Behavior.concurrencyOf(rows.toDF("event_type", "us")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "a" -> ((3L, d0 + 20, 4L)),
      "b" -> ((2L, d0 + 2 * B + 1, 3L)),
      "c" -> ((1L, d0, 1L))))
  }

  test("concurrency matches a brute sweep-line recount at sf0.001") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)").as("us")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val brute = ev.groupBy(_._1).map { case (k, xs) =>
      val deltas = xs.flatMap { case (_, us) =>
        Seq((us, 1), (us + Behavior.SessUs, -1)) }.sortBy(identity)
      var run = 0L; var best = Long.MinValue; var bestT = 0L
      deltas.foreach { case (t, d) =>
        run += d; if (run > best) { best = run; bestT = t } }
      k -> ((best, bestT, xs.length.toLong))
    }
    val got = Behavior.qConcurrency(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === brute)
    assert(brute.values.exists(_._1 > 1L), "fixture must actually overlap")
  }

  test("reservoir: exact-k, uniform-keyed, and the group limit is pushed below the exchange") {
    val df = Behavior.qReservoir(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val evCounts = Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = got.groupBy(_._1)
    assert(byUser.keySet === evCounts.keySet)
    byUser.foreach { case (u, xs) =>
      assert(xs.length === math.min(5L, evCounts(u)).toInt, s"user $u")
      assert(xs.map(_._2).sorted === (1 to xs.length), s"user $u ranks")
    }
    // determinism: a second run draws the identical sample
    assert(Behavior.qReservoir(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet === got.toSet)
    // scale contract: rank filter became a WindowGroupLimit with a
    // partial pass below the shuffle (map-side ≤k rows per group)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    assert(plan.contains("Partial"), "missing map-side partial group limit")
  }

  test("q_islands: streaks match a brute consecutive-run scan") {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted.toVector }
    val brute = days.map { case (u, ds) =>
      val runs = ds.foldLeft(Vector.empty[Vector[Long]]) { (acc, d) =>
        if (acc.nonEmpty && acc.last.last == d - 1) acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      val best = runs.map(r => (r.length.toLong, r.head))
        .sortBy { case (l, st) => (-l, st) }.head
      u -> ((runs.length.toLong, best._1, best._2))
    }
    val got = Behavior.qIslands(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === brute)
    assert(brute.values.exists(_._2 > 1L), "fixture must contain a multi-day streak")
    assert(brute.values.exists(_._1 > 1L), "fixture must contain gaps")
  }

  test("match_recognize doctored fixture: greedy runs, skip-past-last-row, no overlap") {
    val d0 = 1700000000000000L
    def seqOf(u: Long, syms: String): Seq[(Long, Long, Long, String, Double)] = {
      val full = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase",
        's' -> "signup", 'e' -> "error")
      syms.zipWithIndex.map { case (ch, i) =>
        (u, d0 + i, u * 100 + i, full(ch), 0.0)
      }
    }
    // u1 "vvcp": one match, the WHOLE view run is inside it (greedy V+).
    // u2 "vcpvcp": two disjoint matches (skip past last row).
    // u3 "vcvcp": the broken prefix vc does not anchor a match; the
    //            trailing vcp does.
    // u4 "vvc": no purchase -> no match -> user absent from output.
    // u5 "vcpcp": the second cp has no view run -> exactly one match
    //            (matches never overlap or reuse rows).
    // u6 "svvvcpe": symbols outside the pattern are inert; 3-view run.
    val rows = seqOf(1, "vvcp") ++ seqOf(2, "vcpvcp") ++ seqOf(3, "vcvcp") ++
      seqOf(4, "vvc") ++ seqOf(5, "vcpcp") ++ seqOf(6, "svvvcpe")
    val got = Behavior.matchRecognizeOf(evFrame(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((1L, 2L, 4L)),
      2L -> ((2L, 1L, 6L)),
      3L -> ((1L, 1L, 3L)),
      5L -> ((1L, 1L, 3L)),
      6L -> ((1L, 3L, 5L))))
  }

  test("match_recognize at sf0.001: matched rows never exceed the user's event count") {
    val got = Behavior.qMatchRecognize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.nonEmpty)
    val evCounts = Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (u, m) => assert(m <= evCounts(u)) }
  }
}
