package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline._

/** Driver-loop, status-store and audit-publication specs (reference:
  * corporate_data_ingestion.py:80-117, dynamodb.py, hive.py,
  * ingesters.py:140-205).
  */
class OrchestrationSpec extends SparkSpec {

  /** Write envelope fixtures into the corporate_storage layout for the
    * data date PRECEDING each export date.
    */
  private def layoutFixtures(root: String, exportDates: Seq[String]): Unit =
    exportDates.foreach { ed =>
      val prev = java.time.LocalDate.parse(ed).minusDays(1)
      val dir = f"$root/${prev.getYear}%04d/${prev.getMonthValue}%02d/${prev.getDayOfMonth}%02d/corp/documents"
      Envelope.synthesize(spark, sfDir).write.mode("overwrite").text(dir)
    }

  test("runRange processes each date, tracks IN_PROGRESS→COMPLETED, writes daily layout") {
    val root = Files.createTempDirectory("graft_corp").toString
    val out = Files.createTempDirectory("graft_daily_out").toString
    layoutFixtures(root, Seq("2021-06-15", "2021-06-16"))

    val store = new InMemoryStatusStore
    new Runner(spark, store).runRange(root, "2021-06-15", "2021-06-16",
      "corp", "documents", out)

    assert(store.getStatus("local", "CDI-corp:documents") === Some(StatusStore.Completed))
    assert(store.history.toSeq === Seq(
      ("CDI-corp:documents", "2021-06-15", StatusStore.InProgress),
      ("CDI-corp:documents", "2021-06-15", StatusStore.Completed),
      ("CDI-corp:documents", "2021-06-16", StatusStore.InProgress),
      ("CDI-corp:documents", "2021-06-16", StatusStore.Completed)))

    // dynamic-partition layout holds both dates
    val back = spark.read.parquet(out)
    val days = back.select("export_day").distinct().collect().map(_.getInt(0)).toSet
    assert(days === Set(15, 16))
    assert(back.count() === Tables.documents(spark, sfDir).count() * 2)
  }

  test("Main CLI path runs a 2-date range end-to-end with reference flag names") {
    val root = Files.createTempDirectory("graft_cli_corp").toString
    val out = Files.createTempDirectory("graft_cli_out").toString
    layoutFixtures(root, Seq("2021-06-15", "2021-06-16"))

    val args = Main.parseArgs(Array(
      "--correlation_id", "cli-spec",
      "--source_s3_prefix", root,
      "--destination_s3_prefix", out,
      "--start_date", "2021-06-15", "--end_date", "2021-06-16",
      "--db", "corp", "--collection", "documents",
      "--force_collection_update",
      "--not_a_flag", "ignored"))
    assert(args.correlationId === "cli-spec")
    assert(args.forceCollectionUpdate)
    assert(!args.forceExportToHive)
    assert(args.unrecognized === Seq("--not_a_flag", "ignored")) // parse_known_args
    assert(Main.collections(args) === Seq(("corp", "documents")))

    val store = new InMemoryStatusStore
    Main.run(spark, args, store)
    assert(store.getStatus("cli-spec", "CDI-corp:documents") === Some(StatusStore.Completed))
    val back = spark.read.parquet(out)
    assert(back.count() === Tables.documents(spark, sfDir).count() * 2)

    // --force_collection_update ran: per-date snapshot exports exist (the
    // _exports tree is hidden from the daily read above), the status
    // extras carry the latest prefix/date, and the staging table holds
    // one merged record per id
    val extras = store.getExtras("cli-spec", "CDI-corp:documents")
    assert(extras("CDI_Export_Date") === "2021-06-16")
    assert(extras("S3_Prefix_CDI_Export") === s"$out/_exports/corp/documents/2021-06-16")
    val export = spark.read.orc(extras("S3_Prefix_CDI_Export"))
    assert(export.count() === Tables.documents(spark, sfDir).count())
    assert(spark.catalog.tableExists("corp_staging.src_documents"))
    assert(spark.table("corp_staging.src_documents").count() ===
      Tables.documents(spark, sfDir).count())
    spark.sql("DROP DATABASE IF EXISTS corp_staging CASCADE")

    // no --db/--collection and no config file → the reference's default
    val defArgs = Main.parseArgs(Array("--source_s3_prefix", root))
    assert(Main.collections(defArgs) === Seq(("calculator", "calculationParts")))

    // argparse parity: --flag=value form, missing value, half a pair
    val eq = Main.parseArgs(Array("--start_date=2021-06-15", "--db=corp"))
    assert(eq.startDate === Some("2021-06-15") && eq.db === Some("corp"))
    intercept[IllegalArgumentException] { Main.parseArgs(Array("--collection")) }
    // argparse: inline value on a store_true flag is an error, and a
    // value-taking flag never consumes a following --flag as its value
    intercept[IllegalArgumentException] {
      Main.parseArgs(Array("--force_collection_update=yes"))
    }
    intercept[IllegalArgumentException] {
      Main.parseArgs(Array("--collection", "--db", "corp"))
    }
    intercept[RuntimeException] {
      Main.collections(Main.parseArgs(Array("--collection", "documents")))
    }

    // config-file collections map (collections_all shape)
    val cfg = Files.createTempFile("graft_cfg", ".json")
    Files.write(cfg,
      """{"collections_all": {
        |  "db.corp.documents": {"db": "corp", "table": "documents"},
        |  "db.corp.events": {"db": "corp", "table": "events"}}}""".stripMargin.getBytes)
    val cfgArgs = Main.parseArgs(Array("--configuration_file", cfg.toString))
    assert(Main.collections(cfgArgs) ===
      Seq(("corp", "documents"), ("corp", "events")))
  }

  test("SqlRunner executes a statement file with interpolation") {
    val f = Files.createTempFile("graft_sql", ".sql")
    Files.write(f,
      """CREATE DATABASE IF NOT EXISTS sql_file_spec;
        |DROP TABLE IF EXISTS sql_file_spec.t1;
        |CREATE TABLE sql_file_spec.t1 USING PARQUET AS SELECT #{n} AS n;
        |""".stripMargin.getBytes)
    new SqlRunner(spark).executeFileWithInterpolation(f.toString, Map("#{n}" -> "7"))
    assert(spark.table("sql_file_spec.t1").collect().map(_.getInt(0)).toSeq === Seq(7))
    spark.sql("DROP DATABASE IF EXISTS sql_file_spec CASCADE")
  }

  test("runRange marks FAILED and rethrows when a date's data is missing") {
    val root = Files.createTempDirectory("graft_corp_fail").toString
    val out = Files.createTempDirectory("graft_daily_fail").toString
    layoutFixtures(root, Seq("2021-06-15")) // 16th missing

    val store = new InMemoryStatusStore
    intercept[Exception] {
      new Runner(spark, store).runRange(root, "2021-06-15", "2021-06-16",
        "corp", "documents", out)
    }
    assert(store.history.last === ("CDI-corp:documents", "2021-06-16", StatusStore.Failed))
    assert(store.getStatus("local", "CDI-corp:documents") === Some(StatusStore.Failed))
  }

  test("status store keeps create-then-update semantics with extra fields") {
    val store = new InMemoryStatusStore
    assert(store.getStatus("c", "p") === None)
    store.updateStatus("c", "p", StatusStore.InProgress, "2021-01-01",
      Map("S3_Prefix_CDI_Export" -> "exports/x"))
    store.updateStatus("c", "p", StatusStore.Completed, "2021-01-01")
    val entry = store.rows(("c", "p"))
    assert(entry.status === StatusStore.Completed)
    // extras survive later updates (dynamodb.py AttributeUpdates semantics)
    assert(entry.extra("S3_Prefix_CDI_Export") === "exports/x")
    assert(entry.exportDate === "2021-01-01")
  }

  test("audit publish: external-over-text → INSERT OVERWRITE managed raw → drop") {
    // fresh session + leftover warehouse dir from a prior JVM → clean both
    spark.sql("DROP DATABASE IF EXISTS uc_dw_auditlog_test CASCADE")
    val leftover = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        + "/uc_dw_auditlog_test.db")
    if (leftover.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(leftover)
    }
    val daily = Files.createTempDirectory("graft_audit_daily").toString
    val processed = Ingest.pipeline(Envelope.synthesizeAudit(spark, sfDir))
    AuditPublish.writeAuditDaily(processed, daily)

    AuditPublish.publishRaw(spark, "uc_dw_auditlog_test", daily, "2021-06-15")
    val raw = spark.table("uc_dw_auditlog_test.auditlog_raw")
    assert(raw.filter(col("date_str") === "2021-06-15").count() === processed.count())
    // the dated external table was dropped after the copy
    assert(!spark.catalog.tableExists("uc_dw_auditlog_test.auditlog_raw_2021_06_15"))
    // publish is idempotent per partition (INSERT OVERWRITE)
    AuditPublish.publishRaw(spark, "uc_dw_auditlog_test", daily, "2021-06-15")
    assert(spark.table("uc_dw_auditlog_test.auditlog_raw")
      .filter(col("date_str") === "2021-06-15").count() === processed.count())

    // sec/red view-like publication: full columns vs redacted subset
    val ddl = "AUDIT_ID STRING, AUDIT_EVENT STRING, TIME_STAMP STRING, TIME_STAMP_ORIG STRING"
    val secCols = Seq("AUDIT_ID", "AUDIT_EVENT", "TIME_STAMP", "TIME_STAMP_ORIG")
    val redCols = Seq("AUDIT_EVENT", "TIME_STAMP", "TIME_STAMP_ORIG")
    AuditPublish.publishViews(spark, "uc_dw_auditlog_test", "2021-06-15",
      ddl, secCols, redCols)
    val sec = spark.table("uc_dw_auditlog_test.auditlog_sec_v")
    val red = spark.table("uc_dw_auditlog_test.auditlog_red_v")
    assert(sec.columns.toSeq === secCols :+ "date_str")
    assert(red.columns.toSeq === redCols :+ "date_str")
    assert(sec.count() === processed.count())
    assert(red.count() === processed.count())
    // the identifying column is genuinely absent from red, present in sec
    assert(sec.filter(col("AUDIT_ID").isNotNull).count() === processed.count())
    assert(!red.columns.contains("AUDIT_ID"))
    // re-publication overwrites the partition, not duplicates it
    AuditPublish.publishViews(spark, "uc_dw_auditlog_test", "2021-06-15",
      ddl, secCols, redCols)
    assert(spark.table("uc_dw_auditlog_test.auditlog_sec_v").count() === processed.count())
  }

  test("SqlRunner.executeScript: procedural SQL control flow equals the set-based answer") {
    // the reference drives per-class work with PYTHON loops around
    // hive calls; SQL scripting moves that control flow into the
    // engine. A WHILE loop accumulating per-priority-class counts
    // must equal the one-shot aggregate exactly.
    Tables.orders(spark, sfDir).createOrReplaceTempView("script_orders")
    val confBefore = spark.conf.getOption("spark.sql.scripting.enabled")
    val got = new SqlRunner(spark).executeScript(
      """BEGIN
        |  DECLARE i INT = 1;
        |  DECLARE total BIGINT = 0;
        |  WHILE i <= 5 DO
        |    SET total = total + (
        |      SELECT COUNT(*) FROM script_orders
        |      WHERE o_orderpriority LIKE CAST(i AS STRING) || '-%');
        |    SET i = i + 1;
        |  END WHILE;
        |  SELECT total AS n;
        |END""".stripMargin).head.getLong(0)
    val direct = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").rlike("^[1-5]-")).count()
    assert(got === direct)
    assert(got > 0)
    // the conf scope was restored to whatever it was before the call
    // (scripting defaults ON in this Spark line — the scope exists for
    // deployments that pin it off)
    assert(spark.conf.getOption("spark.sql.scripting.enabled") === confBefore)
  }

  test("reference Hive DDL dialect (STORED AS ORC + external TEXTFILE + partition DDL) in a Hive-catalog JVM") {
    // catalogImplementation is a per-JVM STATIC conf — the shared spec
    // session is in-memory-catalog, so the Hive dialect runs in a
    // forked JVM against a real Hive catalog (derby metastore in a
    // temp dir); HiveChainMain does the asserting and prints a verdict
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val cmd = new java.util.ArrayList[String]()
    cmd.add(javaBin)
    jvmArgs.forEach(a => cmd.add(a))
    cmd.add("-cp"); cmd.add(sys.props("java.class.path"))
    cmd.add("graft.pipeline.HiveChainMain"); cmd.add(sfDir)
    val pb = new ProcessBuilder(cmd)
    // derby writes derby.log into user.dir — keep it out of the repo
    val cwd = Files.createTempDirectory("graft_hive_cwd").toFile
    pb.directory(cwd)
    pb.redirectErrorStream(true)
    // output to a FILE, not a pipe read before waitFor: a wedged child
    // keeps its stream open forever and an inline readAllBytes would
    // block past the timeout this guard exists to enforce
    val outFile = new java.io.File(cwd, "hivechain.out")
    pb.redirectOutput(ProcessBuilder.Redirect.to(outFile))
    val p = pb.start()
    val finished = p.waitFor(5, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    val out = if (outFile.exists())
      new String(Files.readAllBytes(outFile.toPath), "UTF-8") else ""
    assert(finished, s"hive chain JVM timed out:\n${out.takeRight(4000)}")
    assert(p.exitValue() === 0, s"hive chain failed:\n${out.takeRight(4000)}")
    assert(out.contains("HIVECHAIN OK"), s"no verdict in:\n${out.takeRight(4000)}")
    // openx JsonSerDe resolution (SURVEY §2B): the from_json shim
    // published the expanded table row-equal to the chain's other
    // expansion path, and the serde DDL's jar dependency is pinned as
    // a formal descope (ClassNotFound naming exactly the openx class)
    assert(out.contains("openx_ddl=requires-jar")
        || out.contains("openx_ddl=registered"),
      s"openx resolution missing from verdict:\n${out.takeRight(1000)}")
    assert("expanded=(\\d+)".r.findFirstMatchIn(out).exists(_.group(1).toInt > 0),
      s"expanded table empty or unreported:\n${out.takeRight(1000)}")
  }
}
