package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef
import graft.queries.QueryDef.moneySum

/** Z-order clustered data layout + file-level min/max data skipping
  * (SURVEY §2B additions p_zorder / q_zorder_prune).
  *
  * The 100 TB story: partitioning prunes on ONE directory column;
  * z-ordering interleaves the bits of TWO (or more) quantized sort keys
  * so that files hold spatially-local rectangles of the (user, time)
  * plane — per-file min/max footprints become TIGHT on BOTH columns at
  * once, and a predicate on either column (or both) skips most files
  * before a byte is read. This is the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, re-expressed with nothing but
  * parquet, a deterministic bit-interleave expression, and a per-file
  * stats manifest (the reference's ingestion also repartitions by a
  * computed key before landing files — see
  * /root/reference/steps/corporate_data_ingestion.py's partitioned
  * writes — but has no multi-column locality story; this is the
  * Spark-native generalization).
  *
  * Everything is integer arithmetic — quantization is
  * `(x-min)*65535 div (max-min)` over BIGINTs and the interleave is a
  * 32-term shift/mask sum — so the DuckDB oracle re-derives z-values
  * bit-for-bit and the layout invariants sit under the hash gate.
  */
object Layout {

  val Bits = 16 // quantization bits per dimension
  val BucketShift = 27 // bucket = zval >> 27 → 32 contiguous z-ranges

  /** 16-bit quantization into [0, 65535] — all-BIGINT (`div` keeps it
    * exact; a double division would lose bits past 2^53: ts spans
    * ~2.6e12 µs and *65535 is ~1.7e17). SQL-string form because `div`
    * (integral divide) has no Column-API surface.
    */
  private def q16Sql(x: String, mn: String, mx: String): String =
    s"CASE WHEN $mx = $mn THEN 0L ELSE ($x - $mn) * 65535L div ($mx - $mn) END"

  /** Clamped variant for layout builds against FROZEN bounds: rows
    * arriving after the first build may exceed the recorded min/max —
    * they clamp to the edge cells (their z-locality degrades
    * gracefully; correctness never depends on quantization because the
    * manifest stats are real row min/max).
    */
  private def q16ClampSql(x: String, mn: Long, mx: Long): String =
    if (mx == mn) "0L"
    else s"(greatest(least($x, ${mx}L), ${mn}L) - ${mn}L) * 65535L div ${mx - mn}L"

  /** Bit-interleave two 16-bit quantized keys: dimension-a bits land in
    * odd positions, dimension-b bits in even, so a z-range prefix fixes
    * leading bits of BOTH keys — the locality property the layout rides.
    * Plain shift/mask arithmetic (codegen'd, no UDF), identical in SQL.
    */
  def zvalue(qa: Column, qb: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(qa, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(qb, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** The same interleave as a SQL fragment over columns `qa`/`qb` (for
    * the DuckDB oracles — generated from the same constants so the two
    * can't drift).
    */
  private[graft] val zvalueSql: String =
    (0 until Bits).map { i =>
      s"(((qa >> $i) & 1) << ${2 * i + 1}) + (((qb >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** events with the layout columns: epoch-µs ts, quantized keys, zval,
    * bucket. Global min/max enter as a broadcast 1-row crossJoin (the
    * scalar-subquery shape — no driver collect on the data path).
    */
  private def zEvents(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
    val stats = ev.agg(
      min("user_id").as("mnu"), max("user_id").as("mxu"),
      min("us").as("mnt"), max("us").as("mxt"))
    ev.crossJoin(broadcast(stats))
      .withColumn("qa", expr(q16Sql("user_id", "mnu", "mxu")))
      .withColumn("qb", expr(q16Sql("us", "mnt", "mxt")))
      .withColumn("zval", zvalue(col("qa"), col("qb")))
      .withColumn("bucket", shiftright(col("zval"), BucketShift))
      .drop("mnu", "mxu", "mnt", "mxt", "qa", "qb")
  }

  private val LayoutSemantics =
    s"zorder-v2;dims=user_id,us;bits=$Bits;bucketShift=$BucketShift;cols=event_id,user_id,us,event_type,value,zval"

  private def fp(x: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(x.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
  }

  /** Source state as one line per file — the fingerprint input AND the
    * record an incremental build diffs against.
    */
  private def sourceEntries(d: String): Seq[String] = {
    val src = new java.io.File(s"$d/events.parquet")
    if (src.isDirectory)
      Option(src.listFiles()).map(_.sortBy(_.getName).toSeq
        .filterNot(_.getName.startsWith("_"))
        .map(c => s"${c.getName}:${c.length}:${c.lastModified}"))
        .getOrElse(Seq.empty)
    else Seq(s"${src.getName}:${src.length}:${src.lastModified}")
  }

  private def familyPrefix(d: String): String = s"graft_zorder_${fp(d)}_"

  private def layoutDir(d: String): java.io.File =
    new java.io.File("/tmp/" + familyPrefix(d) +
      fp(s"$LayoutSemantics;${sourceEntries(d).mkString("|")}"))

  /** Remove every layout-family artifact (dirs, pointer commits,
    * clones, staging debris) for source dir `d` — spec cleanup for
    * tests that build layouts against temp sources.
    */
  private[graft] def wipeFamily(d: String): Unit =
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(familyPrefix(d)))
      .foreach { f =>
        if (f.isDirectory) graft.Stage.deleteRecursively(f) else f.delete()
      }

  /** events restricted to `onlyFiles` (by file NAME), with layout
    * columns computed against FROZEN bounds (clamped) — the build-side
    * twin of zEvents. Frozen bounds are what make maintenance
    * incremental: re-deriving min/max from the grown table would shift
    * every row's quantization and force a full re-cluster on every
    * append.
    */
  private def zEventsFrozen(s: SparkSession, d: String,
      b: (Long, Long, Long, Long), onlyFiles: Option[Set[String]]): DataFrame = {
    val (mnu, mxu, mnt, mxt) = b
    val ev0 = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
    val ev = onlyFiles match {
      case Some(names) => ev0
        .withColumn("_f", element_at(split(input_file_name(), "/"), -1))
        .filter(col("_f").isin(names.toSeq: _*)).drop("_f")
      case None => ev0
    }
    ev.withColumn("qa", expr(q16ClampSql("user_id", mnu, mxu)))
      .withColumn("qb", expr(q16ClampSql("us", mnt, mxt)))
      .withColumn("zval", zvalue(col("qa"), col("qb")))
      .withColumn("bucket", shiftright(col("zval"), BucketShift))
      .drop("qa", "qb")
  }

  private def manifestOf(s: SparkSession, dataPath: String): DataFrame =
    s.read.parquet(dataPath)
      .withColumn("file",
        regexp_extract(input_file_name(), "(bucket=[^/]+/[^/]+)$", 1))
      .groupBy("file")
      .agg(count(lit(1)).as("n"),
        min("user_id").as("mn_u"), max("user_id").as("mx_u"),
        min("us").as("mn_t"), max("us").as("mx_t"))

  private def writeLines(f: java.io.File, lines: Seq[String]): Unit = {
    val w = new java.io.PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  private def readLines(f: java.io.File): Seq[String] = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().toList finally src.close()
  }

  /** Build (or re-attach) the z-clustered layout: data files one per
    * z-bucket (rows sorted by zval within each), plus a per-file
    * min/max stats MANIFEST — the data-skipping index. Manifest paths
    * are stored RELATIVE to the data root so the atomic build-dir
    * rename can't orphan them. Write-once/fingerprint/rename idiom as
    * every other layout artifact (Bucketing/ensureComponents).
    *
    * INCREMENTAL MAINTENANCE (day-over-day ingestion): each layout
    * records its quantization bounds (_BOUNDS) and the exact source
    * files it covers (_SOURCES). When the source changes by APPENDING
    * files only — the ingest shape: yesterday's files untouched, new
    * day landed — the build finds the prior layout of the same source
    * dir, z-maps ONLY the new files against the frozen bounds, lands
    * them as extra z-sorted files in the buckets they touch, and
    * HARD-LINKS every prior bucket file into the new layout —
    * byte-identical, same inode, same mtime — carrying all prior
    * manifest rows over verbatim. Cost is O(new data), not O(table)
    * or even O(touched buckets); the small-file debt this defers is
    * paid by [[compactLayout]] (OPTIMIZE). Any non-append change (a
    * file modified or removed) falls back to a full build.
    */
  def ensureZorderLayout(s: SparkSession, d: String): (String, DataFrame) = {
    val base = layoutDir(d)
    if (!graft.Stage.published(base, "_MANIFEST_DONE")) {
      graft.Stage.deletePublished(base) // unmarked partial only
      val tmp = graft.Stage.stagingDir(base, "build")
      val current = sourceEntries(d)
      // prior layouts of this source FAMILY (older fingerprints) are
      // the incremental-build ancestors; discovery runs over LOGICAL
      // names (a pointer-published layout is found by its commit, not
      // its physical home) and marker checks on the resolved tree
      val famRe = ("^" + java.util.regex.Pattern.quote(familyPrefix(d))
        + "[0-9a-f]{16}$").r
      val prev = graft.Stage.logicalNames(new java.io.File("/tmp"))
        .filter(n => famRe.findFirstIn(n).isDefined && n != base.getName)
        .map(n => graft.Stage.resolved(new java.io.File("/tmp", n)))
        .filter(f => new java.io.File(f, "_MANIFEST_DONE").exists()
          && new java.io.File(f, "_SOURCES").exists()
          && new java.io.File(f, "_BOUNDS").exists())
        .sortBy(-_.lastModified()).headOption
        .filter { p =>
          val prevSrc = readLines(new java.io.File(p, "_SOURCES")).toSet
          prevSrc.subsetOf(current.toSet) && (current.toSet -- prevSrc).nonEmpty
        }
      prev match {
        case Some(p) => incrementalBuild(s, d, p, tmp, current)
        case None => fullBuild(s, d, tmp, current)
      }
      // marker INSIDE tmp: publish (rename or pointer commit) makes
      // data+marker visible in one atomic step
      new java.io.File(tmp, "_MANIFEST_DONE").createNewFile()
      graft.Stage.publishDir(tmp, base, "_MANIFEST_DONE")
      graft.Stage.refreshArtifact(s, graft.Stage.resolved(base))
      // a same-path rebuild (wiped artifact, unchanged fingerprint)
      // must also drop memoized table resolutions — their snapshotted
      // file lists name the pre-wipe part files
      tableCache.keySet.removeIf(_._2.startsWith(base.getPath))
    }
    val phys = graft.Stage.resolved(base)
    (s"$phys/data", s.read.parquet(s"$phys/manifest"))
  }

  private def fullBuild(s: SparkSession, d: String, tmp: java.io.File,
      current: Seq[String]): Unit = {
    // bounds computed once, recorded for later incremental builds
    val r = Tables.events(s, d)
      .agg(min("user_id"), max("user_id"),
        min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head()
    val b = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    zEventsFrozen(s, d, b, None)
      .repartition(col("bucket"))
      .sortWithinPartitions("zval")
      .write.partitionBy("bucket").parquet(s"$tmp/data")
    // the index: one row per landed file, min/max on BOTH z dims —
    // built from the files themselves, so stats can never disagree
    // with contents
    manifestOf(s, s"$tmp/data").write.parquet(s"$tmp/manifest")
    writeLines(new java.io.File(tmp, "_BOUNDS"),
      Seq(s"${b._1},${b._2},${b._3},${b._4}"))
    writeLines(new java.io.File(tmp, "_SOURCES"), current)
  }

  private def incrementalBuild(s: SparkSession, d: String, prev: java.io.File,
      tmp: java.io.File, current: Seq[String]): Unit = {
    val prevSrc = readLines(new java.io.File(prev, "_SOURCES")).toSet
    val newNames = (current.toSet -- prevSrc).map(_.split(":")(0))
    val Array(mnu, mxu, mnt, mxt) =
      readLines(new java.io.File(prev, "_BOUNDS")).head.split(",").map(_.toLong)
    val fresh = graft.Stage.barrier(
      zEventsFrozen(s, d, (mnu, mxu, mnt, mxt), Some(newNames)))
    // which z-buckets do the new rows land in? (≤ 2^(32-27) = 32 values)
    val touched = fresh.select("bucket").distinct().collect()
      .map(_.getLong(0)).toSet
    // an appended file can be empty (a writer's zero-row part): nothing
    // to re-cluster — carry every bucket and the full prior manifest
    // (the rebuilt-write path would emit only _SUCCESS and break
    // manifest schema inference)
    if (touched.isEmpty) {
      new java.io.File(tmp, "data").mkdirs()
      val dataDir0 = new java.io.File(prev, "data")
      Option(dataDir0.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .foreach { bdir =>
          val target = new java.io.File(s"$tmp/data/${bdir.getName}")
          target.mkdirs()
          bdir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { pf =>
            graft.Stage.carryFile(pf, new java.io.File(target, pf.getName))
          }
        }
      s.read.parquet(s"$prev/manifest").write.parquet(s"$tmp/manifest")
      writeLines(new java.io.File(tmp, "_BOUNDS"), Seq(s"$mnu,$mxu,$mnt,$mxt"))
      writeLines(new java.io.File(tmp, "_SOURCES"), current)
      new java.io.File(tmp, "_INCREMENTAL").createNewFile()
      return
    }
    // APPEND-MODE maintenance (since r9): the new rows land as EXTRA
    // z-sorted files inside the buckets they touch, and EVERY prior
    // bucket file is hard-linked across verbatim — per-append cost is
    // O(new data) only, never O(touched buckets). (The previous design
    // re-read and rewrote each touched bucket whole, which charges
    // every append for the bucket history it lands next to.) The
    // deferred merge debt — buckets accumulating small files — is paid
    // by [[compactLayout]] (OPTIMIZE), amortized across many appends:
    // exactly the Delta/Iceberg append + OPTIMIZE bin-pack contract.
    // Per-file manifest stats stay TIGHT (a narrow append's file has a
    // narrow footprint), so pruning is unaffected by fragmentation.
    fresh
      .repartition(col("bucket"))
      .sortWithinPartitions("zval")
      .write.partitionBy("bucket").parquet(s"$tmp/fresh")
    // materialize the fresh-file stats NOW — the plan must not be
    // re-evaluated after the moves/links below (≤ new-data rows;
    // driver-safe: one row per landed file)
    val freshManifest = {
      val m = manifestOf(s, s"$tmp/fresh")
      val rows = m.collect().toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), m.schema)
    }
    new java.io.File(tmp, "data").mkdirs()
    Option(new java.io.File(tmp, "fresh").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .foreach { bdir =>
        val target = new java.io.File(s"$tmp/data/${bdir.getName}")
        target.mkdirs()
        bdir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { pf =>
          java.nio.file.Files.move(pf.toPath, target.toPath.resolve(pf.getName))
        }
      }
    graft.Stage.deleteRecursively(new java.io.File(tmp, "fresh"))
    // hard-link every prior bucket file in: byte-identical, same inode
    // and mtime, zero IO
    val dataDir = new java.io.File(prev, "data")
    Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .foreach { bdir =>
        val target = new java.io.File(s"$tmp/data/${bdir.getName}")
        target.mkdirs()
        bdir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { pf =>
          graft.Stage.carryFile(pf, new java.io.File(target, pf.getName))
        }
      }
    // manifest: fresh-file rows ∪ ALL carried rows (prior files are
    // bit-identical, so are their stats)
    val carried = s.read.parquet(s"$prev/manifest")
    freshManifest.unionByName(carried).write.parquet(s"$tmp/manifest")
    writeLines(new java.io.File(tmp, "_BOUNDS"), Seq(s"$mnu,$mxu,$mnt,$mxt"))
    writeLines(new java.io.File(tmp, "_SOURCES"), current)
    new java.io.File(tmp, "_INCREMENTAL").createNewFile()
  }

  /** OPTIMIZE — bin-pack the append-mode maintenance debt. Buckets
    * accumulate small files as appends land ([[incrementalBuild]]);
    * this pass rewrites each bucket's under-sized files into
    * target-sized bins (re-sorted by zval, restoring full per-bucket
    * z-order), HARD-LINKS every full-sized file and every single-file
    * bucket untouched, rewrites exactly the merged files' manifest
    * rows, and atomically swaps the compacted layout into place.
    * Cost is O(small files), amortized over the appends that created
    * them — never O(table). Correctness contract (BucketingSpec): the
    * compacted layout is an exact row union of the old one, file count
    * drops on fragmented fixtures, pruning answers are unchanged, and
    * untouched files keep their inodes.
    */
  def compactLayout(s: SparkSession, d: String,
      targetBytes: Long = 128L << 20): (String, DataFrame) = {
    val (dataPath, _) = ensureZorderLayout(s, d)
    // base = the PHYSICAL tree being compacted; the swap targets the
    // LOGICAL fingerprint-addressed name (identity survives republish)
    val base = new java.io.File(dataPath).getParentFile
    val logical = layoutDir(d)
    val tmp = graft.Stage.stagingDir(logical, "compacting")
    new java.io.File(tmp, "data").mkdirs()
    val buckets = Option(new java.io.File(base, "data").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    var linkedRels = List.empty[String]
    var mergeFiles = List.empty[java.io.File]
    buckets.foreach { bdir =>
      val files = bdir.listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).toSeq
      val (big, small) = files.partition(_.length >= targetBytes)
      // a lone small file has nothing to merge with — carry it
      val (carry, merge) =
        if (small.length >= 2) (big, small) else (files, Seq.empty[java.io.File])
      val target = new java.io.File(s"$tmp/data/${bdir.getName}")
      target.mkdirs()
      carry.foreach { pf =>
        graft.Stage.carryFile(pf, new java.io.File(target, pf.getName))
        linkedRels ::= s"${bdir.getName}/${pf.getName}"
      }
      mergeFiles :::= merge.toList
    }
    if (mergeFiles.nonEmpty) {
      // ONE distributed job over just the small files: re-bucket,
      // re-sort by zval, land bin-packed replacements
      val mergedDir = new java.io.File(tmp, "merged")
      s.read.option("basePath", s"$base/data")
        .parquet(mergeFiles.map(_.getPath): _*)
        .repartition(col("bucket"))
        .sortWithinPartitions("zval")
        .write.partitionBy("bucket").parquet(mergedDir.getPath)
      val mergedManifest = {
        val m = manifestOf(s, mergedDir.getPath)
        val rows = m.collect().toSeq
        s.createDataFrame(s.sparkContext.parallelize(rows, 1), m.schema)
      }
      Option(mergedDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .foreach { bdir =>
          val target = new java.io.File(s"$tmp/data/${bdir.getName}")
          target.mkdirs()
          bdir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { pf =>
            java.nio.file.Files.move(pf.toPath, target.toPath.resolve(pf.getName))
          }
        }
      graft.Stage.deleteRecursively(mergedDir)
      val linkedDf = {
        import s.implicits._
        s.createDataset(linkedRels).toDF("file")
      }
      val carried = s.read.parquet(s"$base/manifest")
        .join(broadcast(linkedDf), Seq("file"), "left_semi")
      mergedManifest.unionByName(carried).write.parquet(s"$tmp/manifest")
    } else {
      s.read.parquet(s"$base/manifest").write.parquet(s"$tmp/manifest")
    }
    Seq("_BOUNDS", "_SOURCES").foreach { n =>
      java.nio.file.Files.copy(new java.io.File(base, n).toPath,
        new java.io.File(tmp, n).toPath)
    }
    new java.io.File(tmp, "_COMPACTED").createNewFile()
    new java.io.File(tmp, "_MANIFEST_DONE").createNewFile()
    // atomic swap through the seam: the fingerprint-addressed name
    // must survive (it IS the layout's identity). POSIX = stage-out
    // double rename, carried bytes stay alive through the old dir's
    // deletion because carry = hard link; object store = one atomic
    // pointer replace, carried bytes were copied into the new tree.
    graft.Stage.republishDir(tmp, logical, "_MANIFEST_DONE")
    val phys = graft.Stage.resolved(logical)
    graft.Stage.refreshArtifact(s, phys)
    // drop memoized table resolutions for the swapped path (same string
    // key possible, new files underneath)
    tableCache.keySet.removeIf(k =>
      k._2 == s"$base/data" || k._2 == s"$phys/data")
    (s"$phys/data", s.read.parquet(s"$phys/manifest"))
  }

  /** B16: the layout's locality contract as a query — per-z-bucket row
    * counts and min/max footprints on both dimensions. Fully
    * re-derivable by the oracle (quantize → interleave → bucket in
    * SQL), so the hash gate pins the exact bit-interleave AND the
    * locality assignment; PlanShapeSpec separately asserts the files
    * realize it.
    */
  def pZorder(s: SparkSession, d: String): DataFrame =
    zEvents(s, d)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("user_id").as("mn_u"), max("user_id").as("mx_u"),
        min("us").as("mn_t"), max("us").as("mx_t"))

  val pZorderSql: String =
    s"""WITH st AS (
       |  SELECT min(user_id) AS mnu, max(user_id) AS mxu,
       |         min(epoch_us(ts)) AS mnt, max(epoch_us(ts)) AS mxt
       |  FROM events),
       |q AS (
       |  SELECT user_id, epoch_us(ts) AS us,
       |    CASE WHEN mxu = mnu THEN 0 ELSE (user_id - mnu) * 65535 // (mxu - mnu) END AS qa,
       |    CASE WHEN mxt = mnt THEN 0 ELSE (epoch_us(ts) - mnt) * 65535 // (mxt - mnt) END AS qb
       |  FROM events, st),
       |z AS (SELECT user_id, us, $zvalueSql AS zval FROM q)
       |SELECT zval >> $BucketShift AS bucket, CAST(count(*) AS BIGINT) AS n,
       |  min(user_id) AS mn_u, max(user_id) AS mx_u,
       |  min(us) AS mn_t, max(us) AS mx_t
       |FROM z GROUP BY 1""".stripMargin

  /** The demo predicate: a ~10% user band × the 30-60% slice of the
    * time range — selective on BOTH z dimensions, the case directory
    * partitioning can only serve for one. All bounds derive from
    * global min/max by integer arithmetic so they hold at ANY scale
    * factor and the oracle restates them exactly.
    */
  private[graft] def predicateBounds(s: SparkSession, d: String): (Long, Long, Long, Long) = {
    val r = Tables.events(s, d)
      .select(min("user_id").as("mnu"), max("user_id").as("mxu"),
        min(unix_micros(col("ts"))).as("mn"), max(unix_micros(col("ts"))).as("mx"))
      .head()
    val (mnu, mxu, mn, mx) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    (mnu + (mxu - mnu) / 10 * 3, mnu + (mxu - mnu) / 10 * 4,
      mn + (mx - mn) / 10 * 3, mn + (mx - mn) / 10 * 6)
  }

  /** Files the manifest admits for the predicate (relative paths).
    * Driver-side by design: this is the planning step — a Delta/Iceberg
    * reader does exactly this against its stats before handing Spark a
    * file list. The manifest is ~1 row per FILE (not per row); at
    * 100 TB that is 10⁵-10⁶ rows, and only the matching subset is
    * collected.
    */
  private[graft] def pruneFiles(manifest: DataFrame,
      uLo: Long, uHi: Long, tsLo: Long, tsHi: Long): Seq[String] =
    manifest.filter(
        !(col("mx_u") < uLo || col("mn_u") > uHi ||
          col("mx_t") < tsLo || col("mn_t") > tsHi))
      .select("file").collect().map(_.getString(0)).sorted.toSeq

  /** The z-layout as a plain DataFrame whose SCAN skips files through
    * the manifest-backed native FileIndex (plans/ZorderFileIndex.scala)
    * — pruning composes with Catalyst: any filter on user_id/us that
    * the optimizer pushes into the scan prunes files at
    * listFiles(partitionFilters, dataFilters) time, exactly where a
    * Delta/Iceberg reader does it. No hand-threaded file lists.
    */
  /** (stats, FileStatus) resolution + schema per layout dir, memoized:
    * layouts are write-once behind a source+semantics fingerprint, so
    * re-collecting the manifest and re-walking the data directory per
    * invocation is pure driver overhead — O(files) per QUERY on an
    * unchanged layout. Keyed by (session, dataPath) so a fresh session
    * (new warehouse, new FS conf) resolves its own.
    */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  def zorderTable(s: SparkSession, d: String): DataFrame = {
    val (dataPath, manifest) = ensureZorderLayout(s, d)
    tableCache.computeIfAbsent((s, dataPath), _ => {
      val stats = manifest.select("file", "mn_u", "mx_u", "mn_t", "mx_t")
        .collect()
        .map(r => graft.plans.ZFileStats(r.getString(0), Map(
          "user_id" -> (r.getLong(1), r.getLong(2)),
          "us" -> (r.getLong(3), r.getLong(4)))))
        .toSeq
      if (stats.isEmpty) {
        // an empty source table yields an empty layout — surface an
        // empty relation with the layout's schema (derived from the
        // build projection) instead of a head-of-empty crash
        zEventsFrozen(s, d, (0L, 0L, 0L, 0L), None).drop("bucket").limit(0)
      } else {
        // FILE schema, not directory-inferred (the z-bucket dir column
        // is a layout detail, not a query column)
        val dataSchema = s.read
          .parquet(s"$dataPath/${stats.head.rel}").schema
        graft.plans.ZorderFileIndex.table(s, dataPath, stats, dataSchema)
      }
    })
  }

  /** B17: manifest-pruned scan over the z-clustered layout — the full
    * data-skipping path, now a PLAIN scan + filter + aggregate: the
    * filter below is ordinary Catalyst; it reaches the scan as
    * dataFilters and the native FileIndex skips every file whose
    * footprint is disjoint from it. The answer is contractually
    * identical to scanning everything (the oracle aggregates the raw
    * table); the SKIPPING is asserted by BucketingSpec (scan file
    * count a small fraction of the layout, skipped footprints provably
    * disjoint from the predicate).
    */
  def qZorderPrune(s: SparkSession, d: String): DataFrame = {
    val (uLo, uHi, tsLo, tsHi) = predicateBounds(s, d)
    zorderTable(s, d)
      .filter(col("user_id").between(uLo, uHi)
        && col("us").between(tsLo, tsHi))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
  }

  val qZorderPruneSql: String =
    s"""WITH st AS (
       |  SELECT min(user_id) AS mnu, max(user_id) AS mxu,
       |         min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
       |b AS (
       |  SELECT mnu + (mxu - mnu) // 10 * 3 AS ulo, mnu + (mxu - mnu) // 10 * 4 AS uhi,
       |         mn + (mx - mn) // 10 * 3 AS lo, mn + (mx - mn) // 10 * 6 AS hi FROM st)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
       |FROM events, b
       |WHERE user_id BETWEEN ulo AND uhi
       |  AND epoch_us(ts) BETWEEN lo AND hi
       |GROUP BY event_type""".stripMargin

  /** B26: SHALLOW CLONE of the z-layout — Delta's zero-copy table
    * clone on plain files: every data and manifest parquet is
    * HARD-LINKED into the clone (the bytes exist once; the clone is a
    * new name graph over the same inodes), markers copied. Safe by the
    * same argument as vacuum/compaction carry-over: links only add
    * references, and a later rewrite of either side lands NEW files
    * (the layouts are append/swap-only), so clone and source can
    * diverge without ever copying the shared history. The gate query
    * answers the q_zorder_prune aggregate FROM THE CLONE and must
    * hash-match the same full-scan oracle; the spec asserts the
    * zero-copy (every cloned file shares its source's file key) and
    * divergence safety (deleting the clone leaves the source serving
    * identical answers).
    */
  def ensureClone(s: SparkSession, d: String): String = {
    val (dataPath, _) = ensureZorderLayout(s, d)
    val src = new java.io.File(dataPath).getParentFile
    // clone identity = the LOGICAL layout name + _clone (a clone of a
    // pointer-published layout must not inherit the physical suffix)
    val clone = new java.io.File(layoutDir(d).getPath + "_clone")
    if (!graft.Stage.published(clone, "_CLONED")) {
      val tmp = graft.Stage.stagingDir(clone, "build")
      graft.Stage.linkTree(new java.io.File(src, "data"), new java.io.File(tmp, "data"))
      graft.Stage.linkTree(new java.io.File(src, "manifest"), new java.io.File(tmp, "manifest"))
      Seq("_BOUNDS", "_SOURCES").foreach { n =>
        val f = new java.io.File(src, n)
        if (f.exists())
          java.nio.file.Files.copy(f.toPath, new java.io.File(tmp, n).toPath)
      }
      // marker INSIDE tmp: the publish (rename or pointer commit) is
      // atomic — no window where a visible clone lacks its marker
      new java.io.File(tmp, "_CLONED").createNewFile()
      if (!graft.Stage.published(clone, "_CLONED"))
        graft.Stage.deletePublished(clone) // unmarked partial only
      graft.Stage.publishDir(tmp, clone, "_CLONED")
      graft.Stage.refreshArtifact(s, graft.Stage.resolved(clone))
    }
    graft.Stage.resolved(clone).getPath
  }

  def pClone(s: SparkSession, d: String): DataFrame = {
    val clone = ensureClone(s, d)
    val (uLo, uHi, tsLo, tsHi) = predicateBounds(s, d)
    s.read.parquet(s"$clone/data")
      .filter(col("user_id").between(uLo, uHi)
        && col("us").between(tsLo, tsHi))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
  }

  /** B30: OPTIMIZE under the oracle gate — compaction was spec-only
    * (BucketingSpec pins bin-packing, inode carry-over, file-count
    * drop); this registers the full verb as a query: ensure the layout
    * is COMPACTED (skip if this source's layout already republished —
    * idempotent per fingerprint, so sweeps don't recompact every run)
    * and answer the pruning aggregate FROM the compacted layout. Same
    * full-scan oracle as q_zorder_prune: OPTIMIZE must be invisible to
    * answers, visible only to file counts.
    */
  def pOptimize(s: SparkSession, d: String): DataFrame = {
    val (dataPath0, _) = ensureZorderLayout(s, d)
    val compacted =
      new java.io.File(new java.io.File(dataPath0).getParentFile, "_COMPACTED")
    if (!compacted.exists()) compactLayout(s, d)
    qZorderPrune(s, d)
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("p_zorder", pZorder, Some(pZorderSql)),
    QueryDef("q_zorder_prune", qZorderPrune, Some(qZorderPruneSql)),
    QueryDef("p_clone", pClone, Some(qZorderPruneSql)),
    QueryDef("p_optimize", pOptimize, Some(qZorderPruneSql)))
}
