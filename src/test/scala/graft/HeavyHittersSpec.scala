package graft

import org.apache.spark.sql.functions._

import graft.operators.Text

class HeavyHittersSpec extends SparkSpec {

  test("threshold-derived capacity: output still exactly the true hitters") {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "[ ]+")).as("word"))
      .filter(col("word") =!= "").as[String]
    val got = Text.heavyHittersOf(spark, toks, 500L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = toks.count()
    val exact = toks.toDF("word").groupBy("word").count()
      .filter(col("count") * 500L > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
    assert(got.nonEmpty)
  }

  test("the capacity certificate is exactly tight at C = invThreshold - 1") {
    import spark.implicits._
    // boundary-exact fixture: the hitter qualifies by ONE occurrence
    // (500·k = 250000 > N = 249900), arrives first, then a distinct
    // filler tail long enough that every decrement-all cycle at the
    // sub-certified capacity erodes the hitter to zero
    val k = 500
    val fillers = 249400
    val seq = Seq.fill(k)("hit") ++ (0 until fillers).map(i => s"f$i")
    val n = seq.size.toLong
    assert(k * 500L > n && k * 500L <= n + 500L) // qualifies, barely
    val toks = spark.createDataset(spark.sparkContext.parallelize(seq, 1))

    // certified minimum C = invThreshold - 1 = 499: retention bound
    // n/(C+1) = 249900/500 = 499.8 < 500 — the hitter MUST survive any
    // arrival order
    val atMin = Text.heavyHittersOf(spark, toks, 500L, capacityOverride = 499)
      .collect().map(_.getString(0)).toSet
    assert(atMin === Set("hit"))

    // one below: n/(C+1) = 249900/499 ≈ 500.8 > 500 — the guarantee is
    // gone and this adversarial order demonstrably loses the hitter
    val below = Text.heavyHittersOf(spark, toks, 500L, capacityOverride = 498)
      .collect().map(_.getString(0)).toSet
    assert(!below.contains("hit"),
      "sub-certified capacity unexpectedly retained the hitter — " +
        "the adversarial order no longer erodes it")
  }
}
