package graft

import org.apache.spark.sql.functions._

import graft.queries.Temporal

/** As-of and range join: the composed shuffle-friendly plans must equal
  * brute-force ground truth computed row-at-a-time on the driver.
  */
class TemporalSpec extends SparkSpec {

  test("q_asof_join equals brute-force latest-purchase-at-or-before") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchasesByUser = ev.filter(_._3 == "purchase")
      .groupBy(_._2).map { case (u, rows) => u -> rows.map(_._4).sorted }
    val expected = ev.map { case (eid, u, _, us) =>
      val lp = purchasesByUser.get(u)
        .flatMap(ts => ts.takeWhile(_ <= us).lastOption)
      (eid, u, us, lp)
    }.toSet

    val got = Temporal.qAsofJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_range_join equals brute-force window membership counts") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hourUs = 3600L * 1000000
    val lo = (ev.map(_._2).min / hourUs) * hourUs
    val hi = ev.map(_._2).max
    val expected = (lo to hi by hourUs).flatMap { ws =>
      val in = ev.filter { case (_, us) => us >= ws && us < ws + hourUs / 2 }
      if (in.isEmpty) None
      else Some((ws, in.length.toLong, in.map(_._1).distinct.length.toLong))
    }.toSet

    val got = Temporal.qRangeJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("as-of join plan is one window sort, not a theta join") {
    val plan = Temporal.qAsofJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }

  test("range join is an equi-join on the bucket key") {
    val plan = Temporal.qRangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q_interval_join: matches brute overlap pairs exactly once; equi-join plan") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val S = 1800000000L
    val clicks = ev.filter(_._3 == "click")
    val purch = ev.filter(_._3 == "purchase")
    val brute = (for {
      (u, cid, _, cs) <- clicks
      (u2, pid, _, ps) <- purch
      if u == u2 && cs < ps + S && ps < cs + S
    } yield (u, cid, pid, math.min(cs + S, ps + S) - math.max(cs, ps))).toSeq
    val df = Temporal.qIntervalJoin(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.sorted === brute.sorted, "pairs must match exactly once (no bucket dupes)")
    assert(got.nonEmpty, "fixture must contain overlapping sessions")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q_pit_join: no leakage — features match a brute as-of recount, ties included") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    def cents(d: Double): Long = math.rint(d * 100).toLong
    val brute = ev.filter(_._3 == "purchase").map { case (u, eid, _, us, _) =>
      val clicks = ev.count(e => e._1 == u && e._3 == "click" && e._4 <= us).toLong
      val spend = ev.filter(e => e._1 == u && e._3 == "view" && e._4 <= us)
        .map(e => cents(e._5)).sum
      (eid, u, us, clicks, spend / 100.0)
    }.toSet
    val got = Temporal.qPitJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got === brute)
    assert(brute.exists(_._4 > 0L), "fixture must contain prior clicks")
    // single-sweep plan: exactly one user_id exchange, no joins at all
    val plan = Temporal.qPitJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "PIT sweep must not plan any join")
  }

  test("q_window_range: trailing-30min counts match a brute-force recount") {
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    val got = Temporal.qWindowRange(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    events.foreach { case (u, id, us) =>
      val expected = byUser(u).count(e => e._3 >= us - 1800000000L && e._3 <= us)
      assert(got(id) === expected.toLong, s"event $id user $u")
    }
  }

  test("p_scd2: one open version per customer, intervals chain without gaps") {
    val rows = Temporal.pScd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      assert(vs.count(_._5) === 1, s"customer $cust open versions")
      val sorted = vs.sortBy(v => (v._3, v._2))
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 === Some(b._3), s"customer $cust interval gap")
      }
      assert(sorted.last._4.isEmpty)
    }
    assert(rows.length === Tables.orders(spark, sfDir).count())
  }
}
