package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoin, AsOfJoinExec}

/** Native as-of join (plans/AsOfJoin.scala): semantics against
  * hand-computed cases, row parity with the union+window composition,
  * and the physical plan shape the operator exists to deliver.
  */
class AsOfJoinSpec extends SparkSpec {

  private def executed(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Every node, descending through AQE's QueryStageExec leaves (a
    * finalized stage hides its subtree behind `.plan`).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n } ++ p.collect {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
    }.flatten

  private def asof(l: DataFrame, r: DataFrame): DataFrame =
    AsOfJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")

  test("backward as-of semantics: latest right at-or-before, ties inclusive") {
    import spark.implicits._
    val l = Seq(("a", 10L, 1), ("a", 20L, 2), ("a", 5L, 3), ("b", 10L, 4))
      .toDF("k", "t", "id")
    val r = Seq(("a", 10L, "x"), ("a", 15L, "y"), ("b", 11L, "z"))
      .toDF("rk", "rt", "v")
    val got = asof(l, r).select("id", "v").as[(Int, Option[String])]
      .collect().toMap
    // id=1 at t=10: tie with ("a",10) included -> x; id=2 at t=20: y is
    // the latest <= 20; id=3 at t=5: nothing at-or-before; id=4 ("b",10):
    // z is later -> no match
    assert(got === Map(1 -> Some("x"), 2 -> Some("y"), 3 -> None, 4 -> None))
  }

  test("NULL keys/times never match; right NULLs are skipped, not matched") {
    import spark.implicits._
    val l = Seq((Some("a"), Some(10L), 1), (None, Some(10L), 2),
      (Some("a"), None, 3)).toDF("k", "t", "id")
    val r = Seq((Some("a"), Some(4L), "x"), (Some("a"), None, "bad"),
      (None, Some(1L), "bad2")).toDF("rk", "rt", "v")
    val got = asof(l, r).select("id", "v").as[(Int, Option[String])]
      .collect().toMap
    assert(got === Map(1 -> Some("x"), 2 -> None, 3 -> None))
  }

  test("empty right side leaves every left row unmatched") {
    import spark.implicits._
    val l = Seq(("a", 10L, 1)).toDF("k", "t", "id")
    val r = Seq.empty[(String, Long, String)].toDF("rk", "rt", "v")
    assert(asof(l, r).select("v").as[Option[String]].collect().toSeq
      === Seq(None))
  }

  test("multi-column keys partition matches correctly") {
    import spark.implicits._
    val l = Seq(("a", 1, 10L, 1), ("a", 2, 10L, 2)).toDF("k", "k2", "t", "id")
    val r = Seq(("a", 1, 5L, "x")).toDF("rk", "rk2", "rt", "v")
    val got = AsOfJoin.asofJoin(l, r, Seq("k", "k2"), Seq("rk", "rk2"), "t", "rt")
      .select("id", "v").as[(Int, Option[String])].collect().toMap
    assert(got === Map(1 -> Some("x"), 2 -> None))
  }

  test("q_asof_native row-matches the union+window composition") {
    val native = graft.queries.Temporal.qAsofNative(spark, sfDir)
    val composed = graft.queries.Temporal.qAsofJoin(spark, sfDir)
    assert(native.columns.toSeq === composed.columns.toSeq)
    val n = native.collect().map(_.toSeq).toSet
    val c = composed.collect().map(_.toSeq).toSet
    assert(n === c, "native as-of join disagrees with the composition")
    assert(n.nonEmpty)
  }

  test("plan shape: AsOfJoinExec merge — no window, no union, bounded shuffles") {
    val df = graft.queries.Temporal.qAsofNative(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    val plan = executed(df)
    val nodes = allNodes(plan)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]),
      s"expected the native operator in:\n$plan")
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      s"native as-of must not fall back to a window:\n$plan")
    // each side shuffles on its key once, plus the purchases distinct —
    // anything beyond 3 means EnsureRequirements stopped eliding
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles <= 3, s"as-of should shuffle each side once:\n$plan")
  }

  test("self-source as-of join resolves unambiguously (fresh right ExprIds)") {
    import spark.implicits._
    val ev = Seq(("a", 1L, "e"), ("a", 2L, "p"), ("a", 3L, "e"))
      .toDF("k", "t", "typ")
    val right = ev.filter(col("typ") === "p")
      .select(col("k").as("rk"), col("t").as("rt"), lit("m").as("v"))
    val got = AsOfJoin.asofJoin(ev, right, Seq("k"), Seq("rk"), "t", "rt")
      .select("t", "v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(1L -> None, 2L -> Some("m"), 3L -> Some("m")))
  }
}
