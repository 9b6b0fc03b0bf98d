package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Stage, Tables}
import graft.queries.QueryDef
import graft.queries.QueryDef._

/** File-level Bloom-filter index for point lookups on a HIGH-cardinality
  * key — the data-skipping case min/max footprints cannot serve.
  *
  * The z-order manifest (Layout.scala) prunes RANGE predicates: it works
  * because the layout clusters the indexed dimensions, so each file's
  * [min,max] footprint is narrow. A point lookup on a key the layout is
  * NOT clustered by (a UUID-ish record id, the reference's `_id` landing
  * uniformly across `id_part` files, ingesters.py:505-539) sees the
  * opposite shape: every file's min/max range covers essentially the
  * whole key space, and footprint pruning admits everything. A per-file
  * Bloom filter keeps working there: membership, not order, so a key
  * that lands in one file probes positive in ~1 (+fpp·files) of them.
  * This is exactly Delta/Iceberg's bloom-filter file index and Parquet's
  * column-level bloom, materialized as a manifest TABLE the planner
  * probes — build once in ONE scan (`groupBy(input_file_name())` over a
  * [[graft.functions.BloomBuildAgg]] partial aggregate), probe as a
  * distributed manifest scan collecting only survivors, then hand Spark
  * the surviving file list.
  *
  * Scale: the manifest is one row (a few KB of filter) per FILE; the
  * probe deserializes each filter once and tests all K keys
  * ([[graft.functions.BloomMightContainAny]]), so planning is
  * O(files · K) hash probes distributed over the cluster, and the
  * driver holds only the survivor names. At 10⁶ files × 20 keys that
  * is seconds; the saved I/O is the other ~99% of the table.
  */
object BloomIndex {

  /** File count of the demo layout. Fixed (not rows-scaled) so the
    * fixture keeps one file ≈ 1.5% of the key space at every SF; a real
    * deployment gets file count from its size-targeted writer and the
    * index's effectiveness IMPROVES as files multiply (keys-per-file
    * shrinks relative to the key space).
    */
  val Files = 64
  val Fpp = 0.001

  /** (l_orderkey, l_linenumber) is lineitem's natural unique key;
    * l_linenumber ≤ 7 makes ok·8+ln a collision-free BIGINT. Uniform
    * over the table and UNCORRELATED with the l_partkey ranges the
    * files are laid out by — the adversarial case for min/max.
    */
  private def lookupKey(ok: Column, ln: Column): Column = ok * lit(8L) + ln

  private def indexDir(d: String): java.io.File =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_bloomidx_${Stage.sourceFingerprint(d, "lineitem")}_v1")

  /** Build-once (source-fingerprinted): 64 files range-laid-out by
    * l_partkey (so the lookup key spreads uniformly across files), plus
    * a manifest of (file, bloom bytes, min/max key, rows) built in one
    * scan. Returns (dataPath, manifest).
    */
  def ensureIndex(s: SparkSession, d: String): (String, DataFrame) = {
    val base = indexDir(d)
    if (!Stage.published(base, "_DONE")) {
      // seam-provided staging name: unique under the object-store impl
      // (the staging tree becomes the physical home — a fixed name
      // would let a lost publish race delete the winner's live tree)
      val tmp = graft.Stage.stagingDir(base, "build")
      tmp.mkdirs()
      val li = Tables.lineitem(s, d)
        .withColumn("k", lookupKey(col("l_orderkey"), col("l_linenumber")))
      li.repartitionByRange(Files, col("l_partkey"), col("k"))
        .write.parquet(s"$tmp/data")
      val back = s.read.parquet(s"$tmp/data")
      val rows = back.count()
      // size filters for the actual rows-per-file (2x headroom keeps
      // the realized fpp at or under the nominal one)
      val expected = math.max(1024L, rows / Files * 2)
      // store the relative name — the build dir is renamed into place,
      // so absolute paths captured here would dangle after publish
      back.groupBy(regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"))
        .agg(graft.functions.bloom_build(col("k"), expected, Fpp).as("bloom"),
          min("k").as("mn_k"), max("k").as("mx_k"),
          count(lit(1)).as("n"))
        .coalesce(1).write.parquet(s"$tmp/manifest")
      // marker written INSIDE tmp: the rename publishes data+marker
      // atomically, so no reader ever sees an index dir without _DONE
      new java.io.File(tmp, "_DONE").createNewFile()
      // only pre-marker debris (a crashed earlier build) is cleared; a
      // CONCURRENTLY published index carries its marker and is kept —
      // publishDir detects the lost race and cleans this staging tree
      if (!Stage.published(base, "_DONE")) Stage.deletePublished(base)
      Stage.publishDir(tmp, base, "_DONE")
      Stage.refreshArtifact(s, Stage.resolved(base))
    }
    val phys = Stage.resolved(base)
    (s"$phys/data", s.read.parquet(s"$phys/manifest"))
  }

  /** The deterministic probe batch: for the 8 smallest orderkeys
    * divisible by 251 (bounded at every SF), the lookup key of each
    * order's LOWEST linenumber — the synthetic lineitem neither starts
    * linenumbers at 1 nor keeps (orderkey, linenumber) unique, so the
    * probe anchors on min(linenumber) and the lookup aggregates per
    * key. Restated verbatim by the oracle.
    */
  private[graft] def probeKeys(s: SparkSession, d: String): Seq[Long] =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 251 === 0)
      .groupBy("l_orderkey").agg(min("l_linenumber").as("ln"))
      .orderBy("l_orderkey").limit(8)
      .select(lookupKey(col("l_orderkey"), col("ln")))
      .collect().map(_.getLong(0)).toSeq

  /** Files the index admits for ANY of the hashes (relative survivors of
    * a distributed manifest scan — only names are collected).
    */
  private[graft] def admittedFiles(manifest: DataFrame, keys: Seq[Long]): Seq[String] =
    manifest
      .filter(graft.functions.bloom_might_contain_any(col("bloom"), keys))
      .select("file").collect().map(_.getString(0)).sorted.toSeq

  /** B24: indexed point-lookup batch. Probes 8 present keys plus 2
    * ABSENT ones (the negative lookup a Bloom index answers without
    * touching any file), reads ONLY the admitted files, and returns the
    * matched rows. Contractually identical to a full scan (the oracle
    * scans everything); the skipping economics are spec-asserted
    * (BloomIndexSpec): min/max admits ~every file, the bloom admits
    * ~one per present key.
    */
  def pBloomIndex(s: SparkSession, d: String): DataFrame = {
    val (dataPath, manifest) = ensureIndex(s, d)
    val present = probeKeys(s, d)
    val maxK = manifest.agg(max("mx_k")).head().getLong(0)
    val keys = present ++ Seq(maxK + 101L, maxK + 202L)
    val files = admittedFiles(manifest, keys)
    val hits =
      if (files.isEmpty) s.read.parquet(dataPath).limit(0)
      else s.read.option("basePath", dataPath)
        .parquet(files.map(f => s"$dataPath/$f"): _*)
        .filter(col("k").isInCollection(keys))
    hits.groupBy("k")
      .agg(count(lit(1)).as("n"),
        moneySum(col("l_quantity")).as("qty"),
        moneySum(col("l_extendedprice")).as("price"))
      .orderBy("k")
  }

  val pBloomIndexSql: String =
    """WITH pk AS (SELECT l_orderkey, l_orderkey * 8 + min(l_linenumber) AS k
      |            FROM lineitem WHERE l_orderkey % 251 = 0
      |            GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 8)
      |SELECT pk.k, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
      |FROM lineitem li JOIN pk ON li.l_orderkey = pk.l_orderkey
      |  AND li.l_orderkey * 8 + li.l_linenumber = pk.k
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("p_bloom_index", pBloomIndex, Some(pBloomIndexSql)))
}
