package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL orchestration — the reference's HiveService (steps/hive.py):
  * skip-blank query execution, CREATE DATABASE IF NOT EXISTS, and
  * `#{hivevar:...}`-style interpolation with multi-statement split.
  * The publication DDL below is dual-dialect: on a Hive-catalog
  * session (the reference's EMR shape) it runs the reference's exact
  * `STORED AS orc` / `CREATE EXTERNAL TABLE … STORED AS TEXTFILE` /
  * `ADD PARTITION` statements (HiveChainMain proves the chain against
  * a real Hive metastore); on the native in-memory catalog it runs the
  * equivalent `USING` dialect.
  */
final class SqlRunner(spark: SparkSession) {
  def executeQueries(queries: Seq[String]): Unit =
    queries.foreach { q => if (q != null && q.trim.nonEmpty) spark.sql(q) }

  def createDatabaseIfNotExist(db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

  /** SQL-scripting execution (BEGIN … END with DECLARE/SET/WHILE/IF —
    * Spark 4's procedural surface): the control flow the reference
    * runs OUTSIDE the engine (ingesters.py's python loops around
    * per-statement hive calls) expressed inside one scripted
    * submission, so a deployment can ship orchestration logic as SQL.
    * Returns the script's final result set. Conf-scoped enable,
    * restored after.
    */
  def executeScript(script: String): DataFrame = {
    val key = "spark.sql.scripting.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try spark.sql(script)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Interpolate `#{key}` placeholders then execute (splitting on ';'
    * when the text holds multiple statements — hive.py:33-50).
    */
  def executeWithInterpolation(sql: String, interpolation: Map[String, String] = Map.empty): Unit = {
    val content = interpolation.foldLeft(sql) { case (acc, (k, v)) => acc.replace(k, v) }
    if (content.count(_ == ';') > 1) executeQueries(content.split(";").toSeq)
    else spark.sql(content)
  }

  /** File-based overload — the reference reads statement files off the
    * image and interpolates before execution
    * (hive.py:34-50 `execute_sql_statement_with_interpolation(file=…)`).
    */
  def executeFileWithInterpolation(file: String,
      interpolation: Map[String, String] = Map.empty): Unit =
    executeWithInterpolation(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
        java.nio.charset.StandardCharsets.UTF_8),
      interpolation)
}

/** Run-status bookkeeping — the reference's DynamoDBHelper
  * (steps/dynamodb.py): one row per (correlation_id, data_product) with
  * IN_PROGRESS/COMPLETED/FAILED transitions, created on first write and
  * updated in place afterwards. The store is pluggable (the deployment
  * would back it with a KV service); the in-memory impl keeps the same
  * create-then-update semantics and field shape for specs.
  */
object StatusStore {
  val InProgress = "IN_PROGRESS"
  val Completed = "COMPLETED"
  val Failed = "FAILED"

  /** One scanned row — the relauncher's working unit (the reference's
    * DynamoDB table scan shape: key attributes + Status/Date + extras).
    */
  final case class ScanRow(correlationId: String, dataProduct: String,
      status: String, exportDate: String, extra: Map[String, String])
}

trait StatusStore {
  def getStatus(correlationId: String, dataProduct: String): Option[String]
  def updateStatus(correlationId: String, dataProduct: String, status: String,
      exportDate: String, extra: Map[String, String] = Map.empty): Unit

  /** Conditional transition — the reference's DynamoDB conditional
    * write (dynamodb.py:42-60: a second driver must NOT flip an
    * IN_PROGRESS row it does not own). Atomically set the status to
    * `status` ONLY IF the current status equals `expected` (None =
    * the row must not exist yet). Returns true iff THIS caller's
    * write landed; a false means another updater got there first and
    * the row was left untouched. Extras merge exactly as in
    * [[updateStatus]] when the write lands.
    */
  def compareAndSetStatus(correlationId: String, dataProduct: String,
      expected: Option[String], status: String, exportDate: String,
      extra: Map[String, String] = Map.empty): Boolean

  /** Accumulated extra fields for a run — the reference scans the
    * status table for the latest export's S3 prefix/date
    * (ingesters.py:343-367); here the merged extras carry them.
    */
  def getExtras(correlationId: String, dataProduct: String): Map[String, String] = Map.empty

  /** All rows whose status equals `status` — the relauncher's scan
    * (the reference's emr-relauncher scans the status table for FAILED
    * runs). Bounded: status rows are per-(collection, correlation),
    * not per-record, so a full scan is metadata-sized at any fleet
    * scale.
    */
  def scanByStatus(status: String): Seq[StatusStore.ScanRow]
}

object InMemoryStatusStore {
  final case class Entry(status: String, exportDate: String, extra: Map[String, String])
}

final class InMemoryStatusStore extends StatusStore {
  import InMemoryStatusStore.Entry
  val rows: mutable.LinkedHashMap[(String, String), Entry] = mutable.LinkedHashMap.empty
  val history: mutable.ArrayBuffer[(String, String, String)] = mutable.ArrayBuffer.empty

  // synchronized: Main.run drives one Runner per collection from a
  // --concurrency-sized pool, so transitions for different collections
  // can arrive from different threads
  override def getStatus(correlationId: String, dataProduct: String): Option[String] =
    synchronized {
      rows.get((correlationId, dataProduct)).map(_.status)
        .filter(Set(StatusStore.InProgress, StatusStore.Completed, StatusStore.Failed))
    }

  override def updateStatus(correlationId: String, dataProduct: String, status: String,
      exportDate: String, extra: Map[String, String] = Map.empty): Unit = synchronized {
    val key = (correlationId, dataProduct)
    val merged = rows.get(key) match {
      case Some(e) => e.copy(status = status, extra = e.extra ++ extra)
      case None => Entry(status, exportDate, extra)
    }
    rows.update(key, merged)
    history += ((dataProduct, exportDate, status))
  }

  override def getExtras(correlationId: String, dataProduct: String): Map[String, String] =
    synchronized { rows.get((correlationId, dataProduct)).map(_.extra).getOrElse(Map.empty) }

  override def compareAndSetStatus(correlationId: String, dataProduct: String,
      expected: Option[String], status: String, exportDate: String,
      extra: Map[String, String] = Map.empty): Boolean = synchronized {
    val key = (correlationId, dataProduct)
    if (rows.get(key).map(_.status) != expected) false
    else { updateStatus(correlationId, dataProduct, status, exportDate, extra); true }
  }

  override def scanByStatus(status: String): Seq[StatusStore.ScanRow] = synchronized {
    rows.iterator.collect { case ((cid, dp), e) if e.status == status =>
      StatusStore.ScanRow(cid, dp, e.status, e.exportDate, e.extra)
    }.toSeq
  }
}

/** File-backed StatusStore — the cross-DRIVER shape of the contract:
  * two JVMs pointed at the same directory see each other's rows and
  * their conditional writes adjudicate through an OS-level file lock
  * (the sandbox stand-in for the KV service's conditional put; swap
  * this class for the service-backed client at deploy time, the
  * Runner never knows). One properties file per (correlation_id,
  * data_product); every mutation is read-merge-write-rename under the
  * store-wide lock file, so a torn row is impossible and CAS is
  * linearizable across processes. Status rows are tiny and transitions
  * are per-collection-per-date — a single lock file is nowhere near
  * contention at any fleet size that shares one status root.
  */
final class FileStatusStore(dir: java.io.File) extends StatusStore {
  import java.nio.file.{Files, Paths, StandardCopyOption}
  dir.mkdirs()
  private val lockFile = new java.io.File(dir, ".lock")

  // JVM-level monitor + OS-level FileLock: FileLock alone throws on
  // overlap WITHIN a JVM, the monitor alone is invisible ACROSS JVMs
  private def locked[A](body: => A): A = FileStatusStore.synchronized {
    val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try { val l = ch.lock(); try body finally l.release() } finally ch.close()
  }

  private def fileOf(correlationId: String, dataProduct: String): java.io.File = {
    val safe = (correlationId + "__" + dataProduct).map {
      case c if c.isLetterOrDigit || c == '-' || c == '_' => c
      case _ => '+'
    }
    new java.io.File(dir, s"$safe.properties")
  }

  private def read(f: java.io.File): Option[java.util.Properties] =
    if (!f.exists()) None
    else {
      val p = new java.util.Properties()
      val in = Files.newInputStream(f.toPath)
      try p.load(in) finally in.close()
      Some(p)
    }

  private def write(f: java.io.File, p: java.util.Properties): Unit = {
    val tmp = new java.io.File(dir, f.getName + ".tmp")
    val out = Files.newOutputStream(tmp.toPath)
    try p.store(out, null) finally out.close()
    Files.move(tmp.toPath, f.toPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def merged(f: java.io.File, correlationId: String, dataProduct: String,
      status: String, exportDate: String,
      extra: Map[String, String]): java.util.Properties = {
    val p = read(f).getOrElse {
      val fresh = new java.util.Properties()
      fresh.setProperty("exportDate", exportDate)
      fresh
    }
    // the UNsanitized key rides inside the row (file names are lossy),
    // so scanByStatus can recover it exactly
    p.setProperty("correlationId", correlationId)
    p.setProperty("dataProduct", dataProduct)
    p.setProperty("status", status)
    extra.foreach { case (k, v) => p.setProperty(s"extra.$k", v) }
    p
  }

  override def getStatus(correlationId: String, dataProduct: String): Option[String] =
    locked {
      read(fileOf(correlationId, dataProduct)).flatMap(p => Option(p.getProperty("status")))
        .filter(Set(StatusStore.InProgress, StatusStore.Completed, StatusStore.Failed))
    }

  override def updateStatus(correlationId: String, dataProduct: String, status: String,
      exportDate: String, extra: Map[String, String] = Map.empty): Unit = locked {
    val f = fileOf(correlationId, dataProduct)
    write(f, merged(f, correlationId, dataProduct, status, exportDate, extra))
  }

  override def getExtras(correlationId: String, dataProduct: String): Map[String, String] =
    locked {
      read(fileOf(correlationId, dataProduct)).map { p =>
        import scala.jdk.CollectionConverters._
        p.stringPropertyNames().asScala.filter(_.startsWith("extra."))
          .map(k => k.stripPrefix("extra.") -> p.getProperty(k)).toMap
      }.getOrElse(Map.empty)
    }

  override def compareAndSetStatus(correlationId: String, dataProduct: String,
      expected: Option[String], status: String, exportDate: String,
      extra: Map[String, String] = Map.empty): Boolean = locked {
    val f = fileOf(correlationId, dataProduct)
    val cur = read(f).flatMap(p => Option(p.getProperty("status")))
    if (cur != expected) false
    else { write(f, merged(f, correlationId, dataProduct, status, exportDate, extra)); true }
  }

  override def scanByStatus(status: String): Seq[StatusStore.ScanRow] = locked {
    import scala.jdk.CollectionConverters._
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(_.getName.endsWith(".properties")).sortBy(_.getName)
      .flatMap(read)
      .filter(p => p.getProperty("status") == status)
      .flatMap { p =>
        // rows written before the key attributes rode inside the file
        // are unscannable (file names are lossy) — skip, don't guess
        (Option(p.getProperty("correlationId")), Option(p.getProperty("dataProduct"))) match {
          case (Some(cid), Some(dp)) =>
            Some(StatusStore.ScanRow(cid, dp, status,
              Option(p.getProperty("exportDate")).getOrElse(""),
              p.stringPropertyNames().asScala.filter(_.startsWith("extra."))
                .map(k => k.stripPrefix("extra.") -> p.getProperty(k)).toMap))
          case _ => None
        }
      }
  }
}

object FileStatusStore

/** The reference's driver loop (corporate_data_ingestion.py:80-117):
  * iterate the export-date range; per date mark IN_PROGRESS, read the
  * layout-addressed source prefix
  * `<root>/<YYYY>/<MM>/<DD>/<db>/<collection>/` (for export date D the
  * data prefix is D-1 — ingesters.py:63-72), run the pipeline, mark
  * COMPLETED, or mark FAILED and rethrow.
  */
final class Runner(
    spark: SparkSession,
    status: StatusStore,
    keys: KeyService = KeyService.identity,
    correlationId: String = "local",
    forceCollectionUpdate: Boolean = false,
    forceExportToHive: Boolean = false) {

  /** corporate_storage layout prefix for one export date's data. */
  def sourcePrefix(root: String, exportDate: String, db: String, collection: String): String = {
    val prev = java.time.LocalDate.parse(exportDate).minusDays(1)
    f"$root/${prev.getYear}%04d/${prev.getMonthValue}%02d/${prev.getDayOfMonth}%02d/$db/$collection"
  }

  /** Process one export date end-to-end: envelope JSONL → processed
    * records with daily-increment columns.
    */
  def runDate(root: String, exportDate: String, db: String, collection: String): DataFrame = {
    val lines = spark.read.text(sourcePrefix(root, exportDate, db, collection))
    Ingest.dailyIncrement(Ingest.pipeline(lines, keys), exportDate)
  }

  /** Date-range loop with status transitions; failures mark FAILED for
    * the failing date and propagate (same contract as the reference).
    */
  def runRange(root: String, startDate: String, endDate: String,
      db: String, collection: String, outRoot: String): Unit = {
    val dataProduct = s"CDI-$db:$collection"
    val start = java.time.LocalDate.parse(startDate)
    val end = java.time.LocalDate.parse(endDate)
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end)).foreach { d =>
      val exportDate = d.toString
      // conditional ENTRY (the reference's DynamoDB conditional put,
      // dynamodb.py:42-60): a collection already IN_PROGRESS belongs to
      // another live driver — refuse to double-enter rather than flip
      // its row. COMPLETED/FAILED rows are re-enterable (the reference
      // reruns dates under the force flags); the CAS adjudicates the
      // two-drivers-race-one-date case, where exactly one must win.
      val cur = status.getStatus(correlationId, dataProduct)
      val entered = cur match {
        case Some(StatusStore.InProgress) => false
        case other => status.compareAndSetStatus(
          correlationId, dataProduct, other, StatusStore.InProgress, exportDate)
      }
      if (!entered)
        throw new IllegalStateException(
          s"$dataProduct is IN_PROGRESS under another driver — refusing to double-enter $exportDate")
      try {
        Ingest.writeDaily(runDate(root, exportDate, db, collection), outRoot)
        // CalculationPartsIngester.run (ingesters.py:274-281): the force
        // flags gate snapshot update and staging publication per date
        if (forceCollectionUpdate) {
          update(outRoot, exportDate, db, collection)
          exportToHive(outRoot, exportDate, db, collection)
        }
        if (forceExportToHive)
          exportToHive(outRoot, exportDate, db, collection)
        status.updateStatus(correlationId, dataProduct, StatusStore.Completed, exportDate)
      } catch {
        case e: Throwable =>
          status.updateStatus(correlationId, dataProduct, StatusStore.Failed, exportDate)
          throw e
      }
    }
  }

  /** New-export location for one date. The leading underscore keeps the
    * export tree invisible to Spark's file index when the daily root is
    * read as one partitioned dataset.
    */
  def exportPrefix(outRoot: String, db: String, collection: String, exportDate: String): String =
    s"$outRoot/_exports/$db/$collection/$exportDate"

  /** Forced collection update (ingesters.py:341-460): locate the latest
    * export via the status store's extras, read the dailies written
    * SINCE it (partition-pruned on the export y/m/d columns), union with
    * that export, keep one record per (id_part, id) — DELETE outranks
    * INSERT, the reference's `row_number over orderBy("db_type")` asc —
    * and write the new export partitioned by id_part, recording its
    * prefix+date in the status extras for the next run.
    */
  def update(outRoot: String, exportDate: String, db: String, collection: String): Unit = {
    val dataProduct = s"CDI-$db:$collection"
    val extras = status.getExtras(correlationId, dataProduct)
    val prevPrefix = extras.get("S3_Prefix_CDI_Export")
    val prevDate = extras.get("CDI_Export_Date")
    val newPrefix = exportPrefix(outRoot, db, collection, exportDate)
    status.updateStatus(correlationId, dataProduct, StatusStore.InProgress, exportDate,
      Map("S3_Prefix_CDI_Export" -> newPrefix, "CDI_Export_Date" -> exportDate))
    val outCols = Seq("id", "db_type", "val", "id_part")
    val dailiesAll = spark.read.parquet(outRoot)
    val dailies = prevDate.fold(dailiesAll) { prev =>
      val Array(y, m, dd) = prev.split("-").map(_.toInt)
      dailiesAll.filter(
        col("export_year") > y ||
          (col("export_year") === y && col("export_month") > m) ||
          (col("export_year") === y && col("export_month") === m && col("export_day") > dd))
    }.select(outCols.map(col): _*)
    val export = prevPrefix
      .map(p => spark.read.orc(p).select(outCols.map(col): _*))
      .getOrElse(dailies.limit(0))
    val merged = Snapshot.merge(export, dailies, Seq("id_part", "id"),
      when(col("db_type") === "DELETE", 1).otherwise(0))
    Snapshot.writeSnapshot(merged.select(outCols.map(col): _*), newPrefix)
  }

  /** Staging publication (ingesters.py:283-339): drop and re-publish
    * the collection's staging table from the latest export. The
    * reference's typed per-table DDLs are files bundled on its EMR
    * image (deployment detail); the published shape here is the
    * export's canonical (id, db_type, val, id_part) rows.
    */
  def exportToHive(outRoot: String, exportDate: String, db: String, collection: String): Unit = {
    val dataProduct = s"CDI-$db:$collection"
    val prefix = status.getExtras(correlationId, dataProduct)
      .getOrElse("S3_Prefix_CDI_Export", exportPrefix(outRoot, db, collection, exportDate))
    val stagingDb = s"${db}_staging"
    val table = s"$stagingDb.src_${collection.toLowerCase}"
    val sql = new SqlRunner(spark)
    sql.createDatabaseIfNotExist(stagingDb)
    sql.executeQueries(Seq(s"DROP TABLE IF EXISTS $table"))
    // the staging table is ORC like the export it publishes — the
    // reference's Hive staging format (ingesters.py:283-339)
    spark.read.orc(prefix).write.format("orc").saveAsTable(table)
  }
}

object Relauncher {
  /** Attribute carrying the per-row retry count (the reference's
    * relauncher reads/writes a retry counter against
    * MAX_RETRY_COUNT before re-submitting a cluster).
    */
  val RetryCountAttr = "Retry_Count"

  /** One sweep's accounting, per (correlationId, dataProduct). */
  final case class Report(
      relaunched: Seq[(String, String)],
      recovered: Seq[(String, String)],
      failedAgain: Seq[(String, String)],
      lostRace: Seq[(String, String)],
      exhausted: Seq[(String, String)])
}

/** Failure-retry relauncher — the reference's emr-relauncher
  * (emr-relauncher.tf:26-33 + its lambda's dynamodb status scan):
  * sweep the status store for FAILED rows and re-enter each with
  * bounded retries. Safe to run from many schedulers at once: the
  * re-entry is the SAME conditional write the Runner uses
  * (FAILED → IN_PROGRESS CAS), adjudicated server-side, so two racing
  * relaunchers elect exactly one winner per row — the loser sees the
  * row already flipped and walks away. The winner's CAS also carries
  * the incremented retry count, so the counter moves exactly once per
  * re-entry no matter how many sweepers race.
  *
  * A row whose retry count has reached `maxRetryCount` is TERMINAL:
  * it stays FAILED, the action is never invoked, and a
  * `relauncher.terminal` counter goes to the [[MetricsSink]] (the
  * reference's SNS alarm topic stand-in — [[AlertRules.standard]]
  * turns it into a deduplicated alert). Each successful re-entry
  * emits `relauncher.relaunch`; an action that fails again emits
  * `relauncher.failed` and re-marks FAILED for the next sweep.
  */
final class Relauncher(
    status: StatusStore,
    maxRetryCount: Int = 3,
    metrics: () => MetricsSink = () => MetricsSink.global) {
  import Relauncher._

  private def tags(row: StatusStore.ScanRow): Map[String, String] =
    Map("correlation_id" -> row.correlationId, "data_product" -> row.dataProduct)

  /** One sweep. `run` is the re-submission (re-running the Runner's
    * date, re-launching the cluster); it executes only for rows this
    * sweeper's CAS won.
    */
  def relaunch(run: StatusStore.ScanRow => Unit): Report = {
    val relaunched = Seq.newBuilder[(String, String)]
    val recovered = Seq.newBuilder[(String, String)]
    val failedAgain = Seq.newBuilder[(String, String)]
    val lostRace = Seq.newBuilder[(String, String)]
    val exhausted = Seq.newBuilder[(String, String)]
    status.scanByStatus(StatusStore.Failed).foreach { row =>
      val key = (row.correlationId, row.dataProduct)
      val retries = row.extra.get(RetryCountAttr)
        .flatMap(_.toIntOption).getOrElse(0)
      if (retries >= maxRetryCount) {
        metrics().counter("relauncher.terminal", 1,
          tags(row) + ("retries" -> retries.toString))
        exhausted += key
      } else {
        val entered = status.compareAndSetStatus(
          row.correlationId, row.dataProduct,
          Some(StatusStore.Failed), StatusStore.InProgress, row.exportDate,
          Map(RetryCountAttr -> (retries + 1).toString))
        if (!entered) lostRace += key
        else {
          metrics().counter("relauncher.relaunch", 1,
            tags(row) + ("attempt" -> (retries + 1).toString))
          relaunched += key
          try {
            run(row.copy(status = StatusStore.InProgress,
              extra = row.extra + (RetryCountAttr -> (retries + 1).toString)))
            status.updateStatus(row.correlationId, row.dataProduct,
              StatusStore.Completed, row.exportDate)
            recovered += key
          } catch {
            case e: Exception =>
              // FAILED again — the NEXT sweep retries (or exhausts);
              // the sweep itself never dies to one bad row
              metrics().counter("relauncher.failed", 1, tags(row))
              System.err.println(
                s"[relauncher] ${row.dataProduct} failed again: ${e.getMessage}")
              status.updateStatus(row.correlationId, row.dataProduct,
                StatusStore.Failed, row.exportDate)
              failedAgain += key
          }
        }
      }
    }
    Report(relaunched.result(), recovered.result(), failedAgain.result(),
      lostRace.result(), exhausted.result())
  }
}

/** businessAudit Hive publication (ingesters.py:140-205 distilled):
  * daily JSONL lands as text; a raw external table is declared over it,
  * INSERT OVERWRITE copies the partition into the managed raw table,
  * and the external table is dropped — re-expressed against the native
  * catalog.
  */
object AuditPublish {
  def writeAuditDaily(processed: DataFrame, path: String): Unit =
    processed.select(col("val")).write.mode("overwrite").text(path)

  /** Which catalog the session runs — the reference's EMR sessions are
    * Hive-catalog (`STORED AS` DDL); local test sessions default to
    * the native in-memory catalog (`USING` DDL). Both dialects are
    * implemented below and pick themselves by this switch; the Hive
    * dialect is exercised end-to-end by HiveChainMain in a forked
    * Hive-enabled JVM (catalogImplementation is a per-JVM static
    * conf, so it cannot be flipped inside the shared test session).
    */
  private[pipeline] def hiveCatalog(spark: SparkSession): Boolean =
    scala.util.Try(spark.conf.get("spark.sql.catalogImplementation"))
      .getOrElse("in-memory") == "hive"

  def publishRaw(spark: SparkSession, db: String, dailyPath: String, exportDate: String): Unit = {
    val sql = new SqlRunner(spark)
    sql.createDatabaseIfNotExist(db)
    val ext = s"auditlog_raw_${exportDate.replace("-", "_")}"
    if (hiveCatalog(spark)) {
      // the reference's EXACT dialect (ingesters.py:162-192): managed
      // ORC+ZLIB raw table; dated EXTERNAL TEXTFILE table declared
      // over the landed prefix with an explicit ADD PARTITION; the
      // whole external table INSERT OVERWRITE'd into the managed one
      // (dynamic partition on date_str); external table dropped.
      sql.executeWithInterpolation(
        s"""CREATE TABLE IF NOT EXISTS $db.auditlog_raw (val STRING)
           |PARTITIONED BY (date_str STRING) STORED
           |AS orc TBLPROPERTIES ('orc.compress'='ZLIB')""".stripMargin)
      // dynamic-partition mode scoped to this publish: leaking
      // nonstrict session-wide would let a later typo'd static INSERT
      // scatter rows strict mode exists to reject
      val dpKey = "hive.exec.dynamic.partition.mode"
      val dpPrev = spark.conf.getOption(dpKey)
      spark.conf.set(dpKey, "nonstrict")
      try sql.executeWithInterpolation(
        s"""DROP TABLE IF EXISTS $db.$ext;
           |CREATE EXTERNAL TABLE $db.$ext (val STRING) PARTITIONED BY (date_str STRING) STORED AS TEXTFILE LOCATION '#{location}';
           |ALTER TABLE $db.$ext ADD IF NOT EXISTS PARTITION(date_str='#{date}') LOCATION '#{location}';
           |INSERT OVERWRITE TABLE $db.auditlog_raw SELECT * FROM $db.$ext;
           |DROP TABLE IF EXISTS $db.$ext""".stripMargin,
        Map("#{location}" -> dailyPath, "#{date}" -> exportDate))
      finally dpPrev match {
        case Some(v) => spark.conf.set(dpKey, v)
        case None => spark.conf.unset(dpKey)
      }
    } else {
      sql.executeWithInterpolation(
        s"""CREATE TABLE IF NOT EXISTS $db.auditlog_raw (val STRING, date_str STRING)
           |USING PARQUET PARTITIONED BY (date_str)""".stripMargin)
      sql.executeWithInterpolation(
        s"""DROP TABLE IF EXISTS $db.$ext;
           |CREATE TABLE $db.$ext (val STRING) USING TEXT LOCATION '#{location}';
           |INSERT OVERWRITE TABLE $db.auditlog_raw PARTITION (date_str = '#{date}')
           |  SELECT val FROM $db.$ext;
           |DROP TABLE IF EXISTS $db.$ext""".stripMargin,
        Map("#{location}" -> dailyPath, "#{date}" -> exportDate))
    }
  }

  /** The reference's EXPANDED (multi-column) audit publication — the
    * one step of its chain that rides a third-party serde: a dated
    * EXTERNAL table is declared with `ROW FORMAT SERDE
    * 'org.openx.data.jsonserde.JsonSerDe'` over the landed JSONL
    * prefix (the serde expands JSON fields into columns AT SCAN; the
    * jar is bundled on the reference's EMR image, not in its repo —
    * ingesters.py:195-206) and INSERT OVERWRITE'd into a managed
    * multi-column table. Re-expressed without the jar as a
    * from_json-backed shim: a dated single-column TEXTFILE external
    * table over the SAME location, expanded in the INSERT with the
    * managed table's schema. from_json implements the serde's contract
    * (JSON text → named columns by schema, null for absent/malformed
    * fields), so the managed rows are identical; HiveChainMain proves
    * the shim-published rows equal the chain's other from_json path
    * (sec_v) on the audit fixtures, idempotently.
    *
    * The serde DDL itself is a FORMAL DESCOPE, pinned by a negative
    * probe in HiveChainMain: Hive's metastore instantiates the serde
    * class at CREATE TABLE (initSerDe derives the storage schema), so
    * the openx declaration requires the jar on ANY engine, ours
    * included — the gap is a third-party jar deployment, not a dialect
    * or semantics difference, and the shim is the jarless equivalent
    * of what that jar computes.
    */
  def publishExpanded(spark: SparkSession, db: String, dailyPath: String,
      exportDate: String, ddl: String): Unit = {
    val sql = new SqlRunner(spark)
    sql.createDatabaseIfNotExist(db)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val cols = schema.fields.map(_.name).toSeq
    val colsDdl = schema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
    val u = exportDate.replace("-", "_")
    // the reference's name shape ("expended", ingesters.py:198)
    val shimExt = s"auditlog_raw_expended_$u"
    // only the two CREATE statements are dialect-specific; the shim →
    // expand → INSERT OVERWRITE → drop tail is shared so a future fix
    // to the expansion can never diverge between catalogs
    val (managedDdl, shimDdl) =
      if (hiveCatalog(spark))
        (s"""CREATE TABLE IF NOT EXISTS $db.auditlog_expanded ($colsDdl)
            |PARTITIONED BY (date_str STRING) STORED
            |AS orc TBLPROPERTIES ('orc.compress'='ZLIB')""".stripMargin,
          s"""CREATE EXTERNAL TABLE $db.$shimExt (val STRING)
             |STORED AS TEXTFILE LOCATION '#{location}'""".stripMargin)
      else
        (s"""CREATE TABLE IF NOT EXISTS $db.auditlog_expanded
            |($colsDdl, date_str STRING) USING PARQUET PARTITIONED BY (date_str)""".stripMargin,
          s"CREATE TABLE $db.$shimExt (val STRING) USING TEXT LOCATION '#{location}'")
    sql.executeWithInterpolation(managedDdl)
    // the single-column TEXTFILE shim over the landed location,
    // expanded by from_json in the INSERT (the serde's jarless twin)
    sql.executeWithInterpolation(s"DROP TABLE IF EXISTS $db.$shimExt")
    sql.executeWithInterpolation(shimDdl, Map("#{location}" -> dailyPath))
    spark.table(s"$db.$shimExt")
      .select(from_json(col("val"), schema).as("j"))
      .select(cols.map(c => col(s"j.$c").as(c)): _*)
      .createOrReplaceTempView("graft_audit_expanded_shim")
    sql.executeWithInterpolation(
      s"""INSERT OVERWRITE TABLE $db.auditlog_expanded
         |PARTITION (date_str = '$exportDate')
         |SELECT ${cols.mkString(", ")} FROM graft_audit_expanded_shim""".stripMargin)
    sql.executeWithInterpolation(s"DROP TABLE IF EXISTS $db.$shimExt")
  }

  /** Secured/redacted "view-like" publication (ingesters.py:209-266
    * distilled): the raw JSONL partition is EXPANDED via from_json
    * over the audit DDL — the reference declares a JsonSerDe external
    * table and interpolates sec/red column lists from files bundled on
    * the EMR image (not in its repo), so what is re-expressed here is
    * the SHAPE: the same expanded rows published twice, auditlog_sec_v
    * with the full column list and auditlog_red_v with the redacted
    * subset, each a partitioned managed table with per-export-date
    * dynamic partition overwrite (idempotent re-publication).
    */
  def publishViews(spark: SparkSession, db: String, exportDate: String,
      ddl: String, secCols: Seq[String], redCols: Seq[String]): Unit = {
    new SqlRunner(spark).createDatabaseIfNotExist(db)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val expanded = spark.table(s"$db.auditlog_raw")
      .filter(col("date_str") === exportDate)
      .select(from_json(col("val"), schema).as("j"))
    if (hiveCatalog(spark)) {
      // Hive dialect: sec/red as PARTITIONED ORC+ZLIB tables (the
      // reference's view-like tables, ingesters.py:209-266; its openx
      // JsonSerDe expansion is a third-party jar bundled on the EMR
      // image — the expansion here is from_json, the DDL is Hive),
      // populated by static-partition INSERT OVERWRITE (idempotent
      // per-export re-publication).
      Seq(("auditlog_sec_v", secCols), ("auditlog_red_v", redCols)).foreach {
        case (table, cols) =>
          val colsDdl = cols.map { c =>
            val t = schema.fields.find(_.name == c)
              .map(_.dataType.sql).getOrElse("STRING")
            s"$c $t"
          }.mkString(", ")
          spark.sql(
            s"""CREATE TABLE IF NOT EXISTS $db.$table ($colsDdl)
               |PARTITIONED BY (date_str STRING) STORED
               |AS orc TBLPROPERTIES ('orc.compress'='ZLIB')""".stripMargin)
          expanded.select(cols.map(c => col(s"j.$c").as(c)): _*)
            .createOrReplaceTempView("graft_audit_expanded")
          spark.sql(
            s"""INSERT OVERWRITE TABLE $db.$table
               |PARTITION (date_str = '$exportDate')
               |SELECT ${cols.mkString(", ")} FROM graft_audit_expanded""".stripMargin)
      }
    } else {
      val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try Seq(("auditlog_sec_v", secCols), ("auditlog_red_v", redCols)).foreach {
        case (table, cols) =>
          val out = expanded.select(
            cols.map(c => col(s"j.$c").as(c)) :+ lit(exportDate).as("date_str"): _*)
          if (!spark.catalog.tableExists(s"$db.$table"))
            out.write.partitionBy("date_str").format("parquet")
              .saveAsTable(s"$db.$table")
          else out.write.mode("overwrite").insertInto(s"$db.$table")
      } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    }
  }
}
