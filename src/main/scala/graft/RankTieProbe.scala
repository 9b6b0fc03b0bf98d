package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial heavy-tie probe for the two-phase range rank (round-16
  * ask #3): a synthetic entity-scale aggregate whose key distribution
  * is DEGENERATE — one value carries ≥50% of all rows — which is the
  * residual the round-15 monotone-in-key bucketing could not split
  * (all equal keys land in one bucket → one fat single-task sort).
  *
  * For the same relation the probe runs [[operators.RangeRank]] both
  * ways and reports, per mode:
  *
  *  - wall seconds to materialize every rank into one checksum;
  *  - the max single-bucket row count from the phase-3 exact grid
  *    (the fattest per-task sort the plan will run) — tieSplit=false
  *    shows ~heavyFrac·N in one bucket, tieSplit=true shows ~N/buckets;
  *  - the rank checksum Σ i·(k mod 97 + 1) — identical across modes,
  *    proving the split only repartitions the work.
  *
  * Prints one JSON line:
  * {"metric":"rank_tie_probe","rows":N,"heavy_frac":0.5,"buckets":B,
  *  "modes":{"monotone":{...},"tie_split":{...}},"checksum_equal":true}
  */
object RankTieProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ROWS", "15000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = cpus.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 50% of all rows share key 500000; the rest spread over ~1M keys
    // (the shape of a spend aggregate where half the entities share one
    // flat fee). Tiebreak = unique id. Materialized to parquet first —
    // the probe must model the real callers (entity aggregates off
    // storage), and a file-backed scan is what both legs re-read.
    val fixture = s"/tmp/graft_rank_tie_$n"
    if (!new java.io.File(fixture, "_SUCCESS").exists()) {
      spark.range(n).select(
          when(col("id") % 2 === 0, lit(500000L))
            .otherwise(col("id") % 1000000L).as("k"),
          col("id"))
        .write.mode("overwrite").parquet(fixture)
    }
    val df = spark.read.parquet(fixture)

    def leg(tieSplit: Boolean): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val ranked = operators.RangeRank.withRowNumber(
        df, "k", asc = true, tiebreak = Seq("id"),
        out = "i", nOut = "n_all", buckets = buckets, tieSplit = tieSplit)
      val checksum = ranked
        .agg(sum(col("i") * (col("k") % 97L + 1L))).collect()(0).getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      (wall, operators.RangeRank.lastMaxBucketRows, checksum)
    }

    // warm the input once so neither leg pays first-touch parquet/JIT
    df.count()
    val mode = sys.env.getOrElse("SPARK_GRAFT_MODE", "both")
    val (wMono, fatMono, csMono) =
      if (mode != "split") leg(tieSplit = false) else (0.0, 0L, 0L)
    val (wSplit, fatSplit, csSplit) =
      if (mode != "mono") leg(tieSplit = true) else (0.0, 0L, 0L)
    def j(w: Double, fat: Long): String =
      f"""{"wall_sec":$w%.2f,"max_bucket_rows":$fat}"""
    println(
      s"""{"metric":"rank_tie_probe","rows":$n,"heavy_frac":0.5,""" +
        s""""buckets":$buckets,"modes":{"monotone":${j(wMono, fatMono)},""" +
        s""""tie_split":${j(wSplit, fatSplit)}},""" +
        s""""checksum_equal":${csMono == csSplit}}""")
    spark.stop()
  }
}
