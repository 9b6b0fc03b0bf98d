package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew-mitigation evidence harness (SURVEY §20): on a HOSTILE corpus
  * (tools/gen_sf.py mode=skew — the top user receives ~40% of ALL
  * events, one viral document is 10% of the corpus) measure each
  * mitigation against its naive twin in the same JVM and session:
  *
  *  - `join`: the salted hot-key join ([[Skew.saltedJoin]]) vs the
  *    plain shuffle join, AQE and broadcast disabled on both so the
  *    naive twin faces the raw single-reducer hot partition;
  *  - `aqe`: the same plain join with Spark's OptimizeSkewedJoin
  *    enabled (query-scoped thresholds, mapper-granularity
  *    repartition — the q_skew_aqe recipe) vs disabled;
  *  - `topk`: per-language bigram top-K as a single global window
  *    (every distinct bigram of a language through ONE reducer) vs
  *    the two-phase local-top-K-then-global shape t_ngram_counts
  *    ships.
  *
  * Row-equality of each mitigated twin against its naive result is
  * asserted inline — a fast path that returns different rows is a bug,
  * not a win. Prints ONE JSON line:
  * {"metric":"skew","sf":...,"pairs":{"join":{"naive":s,"mitigated":s},...}}
  *
  * This is timing evidence, not the oracle gate: the uniform-mode
  * corpus can never produce a genuinely hot key (every replica is a
  * closed join subgraph), so the sweep's q_skew_* rows prove the
  * MECHANISM and this harness proves the WIN.
  */
object SkewBench {

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = body
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the naive twins must face the raw shuffle: no broadcast escape
    // hatch, no adaptive re-plan unless the pair is ABOUT adaptive
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    // ---- fixture: fact = events (hot user ≈40%), dim = one row per
    // user (the profile-join shape). Both persisted and materialized
    // so every timed leg measures ONLY its join strategy.
    val fact = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .persist()
    val dim = fact.select("user_id").distinct()
      .withColumn("segment", pmod(col("user_id"), lit(7L)))
      .persist()
    val nFact = fact.count()
    val nDim = dim.count()
    val hotShare = fact.groupBy("user_id").count()
      .agg(max("count")).head().getLong(0).toDouble / nFact

    def aggOf(joined: DataFrame): Array[org.apache.spark.sql.Row] =
      joined.groupBy("segment")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("cents"))
        .collect()

    // warmup: run the plain join once so codegen/shuffle machinery is
    // primed before any timed leg
    aggOf(fact.join(dim, "user_id"))

    // ---- pair 1: plain shuffle join vs salted join ----
    val (tNaive, rNaive) = timed(aggOf(fact.join(dim, "user_id")))
    val (tSalted, rSalted) = timed(aggOf(
      Skew.saltedJoin(fact, dim, Seq("user_id"), salts = 32)))
    require(canon(rSalted) == canon(rNaive),
      "salted join diverged from the plain join on the skewed corpus")

    // ---- pair 2: the same plain join under AQE skew-split ----
    // (mapper-granularity repartition first: a reduce partition splits
    // at mapper-output granularity — the q_skew_aqe recipe)
    val factM = fact.repartition(64).persist()
    factM.count()
    val (tAqeOff, rAqeOff) = timed(aggOf(factM.join(dim, "user_id")))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val (tAqeOn, rAqeOn) = timed(aggOf(factM.join(dim, "user_id")))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    require(canon(rAqeOn) == canon(rAqeOff),
      "AQE skew-split changed the join result")

    // ---- pair 3: per-lang bigram top-K, global window vs two-phase ----
    val ws = "[ \t\n\f\r]+"
    val counts = Tables.documents(spark, sfDir)
      .select(col("lang"),
        split(lower(col("text")), ws).as("w"))
      .select(col("lang"),
        explode(when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1),
            i => concat(element_at(col("w"), i), lit(" "),
              element_at(col("w"), i + 1))))
          .otherwise(array())).as("bg"))
      .groupBy("lang", "bg").agg(count(lit(1)).as("cnt"))
      .persist()
    counts.count()
    val k = 10
    def globalTopk(in: DataFrame): DataFrame = in
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("cnt").desc, col("bg"))))
      .filter(col("rk") <= k)
      .select("lang", "rk", "bg", "cnt")
    val (tWin, rWin) = timed(globalTopk(counts).collect())
    val (tTwo, rTwo) = timed {
      globalTopk(counts
        .withColumn("rk0", row_number().over(
          Window.partitionBy(col("lang"), pmod(xxhash64(col("bg")), lit(64)))
            .orderBy(col("cnt").desc, col("bg"))))
        .filter(col("rk0") <= k).drop("rk0")).collect()
    }
    require(canon(rTwo) == canon(rWin),
      "two-phase top-K diverged from the global window")

    def f(d: Double) = f"$d%.3f"
    println(
      s"""{"metric":"skew","sf":"$sfDir","n_events":$nFact,"n_users":$nDim,""" +
      s""""hot_user_share":${f(hotShare)},"pairs":{""" +
      s""""join":{"naive":${f(tNaive)},"mitigated":${f(tSalted)}},""" +
      s""""aqe":{"naive":${f(tAqeOff)},"mitigated":${f(tAqeOn)}},""" +
      s""""topk":{"naive":${f(tWin)},"mitigated":${f(tTwo)}}}}""")
    spark.stop()
  }
}
