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

  test("the capacity certificate is tight: minimum holds, below it loses a hitter") {
    import spark.implicits._
    // adversarial single-partition order: the hitter's occurrences all
    // arrive FIRST, then a long tail of distinct fillers whose
    // decrement-all cycles erode the hitter's counter
    val k = 101
    val fillers = 49899
    val seq = Seq.fill(k)("hit") ++ (0 until fillers).map(i => s"f$i")
    assert(k * 500L > seq.size.toLong) // a true hitter by the threshold
    val toks = spark.createDataset(spark.sparkContext.parallelize(seq, 1))

    // certified minimum capacity (= invThreshold): hitter survives
    val atMin = Text.heavyHittersOf(spark, toks, 500L, capacityOverride = 500)
      .collect().map(_.getString(0)).toSet
    assert(atMin === Set("hit"))

    // sub-certified capacity: the SAME stream demonstrably loses it —
    // the bound is tight, not conservative
    val below = Text.heavyHittersOf(spark, toks, 500L, capacityOverride = 100)
      .collect().map(_.getString(0)).toSet
    assert(!below.contains("hit"),
      "sub-certified capacity unexpectedly retained the hitter — " +
        "the adversarial order no longer erodes it")
  }
}
