package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew-mitigation evidence harness (SURVEY §20): on a HOSTILE corpus
  * (tools/gen_sf.py mode=skew — the top user receives ~70% of ALL
  * events, the null-key shape; one viral document is 10% of the
  * corpus) measure each mitigation against its naive twin in the same
  * JVM and session:
  *
  *  - `join`: the salted hot-key join ([[Skew.saltedJoin]]) vs the
  *    plain shuffle join, AQE and broadcast disabled on both so the
  *    naive twin faces the raw single-reducer hot partition;
  *  - `aqe`: the same plain join with Spark's OptimizeSkewedJoin
  *    enabled (query-scoped thresholds, mapper-granularity
  *    repartition — the q_skew_aqe recipe) vs disabled;
  *  - `window`: per-user sessionization as one-window-per-key (the
  *    hot user's millions of rows sort in ONE task) vs the segmented
  *    bucket-and-stitch plan (the q_concurrency discipline);
  *  - `topk`: per-language bigram top-K as a single global window vs
  *    the two-phase local-top-K-then-global shape t_ngram_counts
  *    ships.
  *
  * Row-equality of each mitigated twin against its naive result is
  * asserted inline — a fast path that returns different rows is a bug,
  * not a win. Prints ONE JSON line:
  * {"metric":"skew","sf":...,"pairs":{"join":{"naive":s,"mitigated":s},...}}
  *
  * HONEST READING at local[32]: the WINDOW pair is where mitigation
  * wins on this host (the single-task sort is the bottleneck class a
  * real cluster hits), and AQE wins modestly. The plain JOIN pairs
  * sit at parity: an 8-byte-row sort-merge through a page-cache
  * "shuffle" costs ~2 s even at 7M hot rows, so there is no skew
  * penalty for salting to recover — the penalty that matters at
  * 1000-executor scale (one reducer receiving 70% of the table over
  * the network, then spilling it) does not exist in a single JVM.
  * The harness records both shapes rather than tuning the fixture
  * until the answer flatters the mitigation.
  *
  * This is timing evidence, not the oracle gate: the uniform-mode
  * corpus can never produce a genuinely hot key (every replica is a
  * closed join subgraph), so the sweep's q_skew_* rows prove the
  * MECHANISM and this harness records the behavior on hostile data.
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
    // SPILL MODE (round 14): a single 8 GB JVM absorbs a 70%-hot
    // reducer partition in memory, so the penalty salting mitigates on
    // a real cluster (one reducer sorting the hot key's rows THROUGH
    // SPILL) never materializes and the join pair reads as parity. Run
    // with SPARK_GRAFT_SKEW_SPILL=1 (and SPARK_DRIVER_MEM=1g) to
    // spill-constrain the executors — spark.memory.fraction shrinks
    // execution memory until the naive join's hot sort demonstrably
    // spills (reported per leg from stage task metrics) — and record
    // whether the mitigation wins WHEN SPILL IS REAL, either way.
    val spillMode = sys.env.get("SPARK_GRAFT_SKEW_SPILL").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (spillMode) {
      builder.config("spark.memory.fraction",
        sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.1"))
      builder.config("spark.memory.storageFraction", "0.2")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // per-leg spill accounting off the stage task metrics (listener
    // delivery is async — legs snapshot after a short drain pause)
    val spillBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null)
          spillBytes.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        ()
      }
    })
    def spillOf[A](body: => A): (Double, Long, A) = {
      Thread.sleep(300)
      val s0 = spillBytes.get()
      val (t, a) = timed(body)
      Thread.sleep(300) // let straggler stage-completed events land
      (t, spillBytes.get() - s0, a)
    }

    // the naive twins must face the raw shuffle: no broadcast escape
    // hatch, no adaptive re-plan unless the pair is ABOUT adaptive
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    // ---- fixture: fact = events (hot user ≈70%), dim = one row per
    // user (the profile-join shape). Both persisted and materialized
    // so every timed leg measures ONLY its join strategy.
    // spill mode pins the inputs to DISK_ONLY: execution memory is the
    // scarce resource under test, and cached input blocks must not
    // compete for it (nor vary between legs)
    val level =
      if (spillMode) org.apache.spark.storage.StorageLevel.DISK_ONLY
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val fact = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .persist(level)
    val dim = fact.select("user_id").distinct()
      .withColumn("segment", pmod(col("user_id"), lit(7L)))
      .persist(level)
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

    if (spillMode) {
      // join pair only, two samples each (best-of reported), with
      // per-leg spill bytes — the verdict is recorded whether or not
      // the mitigation wins
      def naive() = spillOf(aggOf(fact.join(dim, "user_id")))
      def salted() = spillOf(aggOf(
        Skew.saltedJoin(fact, dim, Seq("user_id"), salts = 8)))
      val (tN1, spN1, rN) = naive()
      val (tS1, spS1, rS) = salted()
      require(canon(rS) == canon(rN),
        "salted join diverged from the plain join under spill constraints")
      val (tN2, spN2, _) = naive()
      val (tS2, spS2, _) = salted()
      val heap = Runtime.getRuntime.maxMemory()
      def f(d: Double) = f"$d%.3f"
      println(
        s"""{"metric":"skew_spill","sf":"$sfDir","n_events":$nFact,""" +
        s""""n_users":$nDim,"hot_user_share":${f(hotShare)},""" +
        s""""heap_bytes":$heap,"memory_fraction":${
          spark.conf.get("spark.memory.fraction")},"pairs":{""" +
        s""""join_spill":{"naive":${f(math.min(tN1, tN2))},""" +
        s""""mitigated":${f(math.min(tS1, tS2))},""" +
        s""""naive_spill_bytes":${math.max(spN1, spN2)},""" +
        s""""mitigated_spill_bytes":${math.max(spS1, spS2)}}}}""")
      spark.stop()
      return
    }

    // ---- pair 1: plain shuffle join vs salted join ----
    val (tNaive, rNaive) = timed(aggOf(fact.join(dim, "user_id")))
    // salts = 8: enough to spread a 70% hot key across a third of the
    // cores while keeping the dim replication (|dim|·salts) well under
    // the fact size — salts=32 measured slower than naive here because
    // the replicated dim shuffle dominated the win
    val (tSalted, rSalted) = timed(aggOf(
      Skew.saltedJoin(fact, dim, Seq("user_id"), salts = 8)))
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
    // 16 MB advisory: the ~110 MB hot partition splits into ~7 tasks
    // while healthy partitions stay whole (a 1 MB advisory measured
    // slower than naive — everything shattered into tiny tasks)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16777216")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16777216")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val (tAqeOn, rAqeOn) = timed(aggOf(factM.join(dim, "user_id")))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    require(canon(rAqeOn) == canon(rAqeOff),
      "AQE skew-split changed the join result")

    // ---- pair 3: per-user sessionization, one-window-per-key vs
    // segmented ---- The naive plan sorts EVERY row of the hot user in
    // ONE window task (the single-task serialization that kills
    // per-key windows at scale); the segmented twin buckets each user
    // by hour, walks each bucket's sorted list in an aggregate HOF, and
    // stitches bucket boundaries with a tiny per-user window over
    // bucket SUMMARIES — the q_concurrency discipline. Output: total
    // session count (30-min gap) — asserted equal.
    val gapUs = 30L * 60 * 1000000
    val ev2 = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .persist()
    ev2.count()
    def naiveSessions(): Long = {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev2.withColumn("prev", lag(col("us"), 1).over(w))
        .select(when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
          .otherwise(0L).as("start"))
        .agg(sum("start")).head().getLong(0)
    }
    def segmentedSessions(): Long = {
      val buckets = ev2
        .groupBy(col("user_id"), expr("us div 3600000000").as("day"))
        .agg(sort_array(collect_list(struct(col("us"), col("event_id")))).as("evs"))
        .select(col("user_id"), col("day"),
          element_at(col("evs"), 1).getField("us").as("first_us"),
          element_at(col("evs"), -1).getField("us").as("last_us"),
          expr(
            s"""aggregate(slice(evs, 2, size(evs) - 1),
               |  named_struct('prev', evs[0].us, 'n', CAST(0 AS BIGINT)),
               |  (acc, e) -> named_struct('prev', e.us,
               |    'n', acc.n + IF(e.us - acc.prev > ${gapUs}L, 1L, 0L)),
               |  acc -> acc.n)""".stripMargin).as("inner_starts"))
      val wd = Window.partitionBy("user_id").orderBy("day")
      buckets
        .withColumn("prev_last", lag(col("last_us"), 1).over(wd))
        .select((col("inner_starts") +
          when(col("prev_last").isNull || col("first_us") - col("prev_last") > gapUs,
            1L).otherwise(0L)).as("starts"))
        .agg(sum("starts")).head().getLong(0)
    }
    naiveSessions() // warmup
    val (tWinNaive, nNaive) = timed(naiveSessions())
    val (tWinSeg, nSeg) = timed(segmentedSessions())
    require(nSeg == nNaive,
      s"segmented sessionization diverged: $nSeg != $nNaive")

    // ---- pair 4: per-lang bigram top-K, global window vs two-phase ----
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
      s""""window":{"naive":${f(tWinNaive)},"mitigated":${f(tWinSeg)}},""" +
      s""""topk":{"naive":${f(tWin)},"mitigated":${f(tTwo)}}}}""")
    spark.stop()
  }
}
