package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{InMemoryStatusStore, Runner, StatusStore}

/** Job entrypoint — the runnable-job surface of the reference
  * (steps/corporate_data_ingestion.py:120-189): the same spark-submit
  * flag names (`--correlation_id --source_s3_prefix
  * --destination_s3_prefix --start_date --end_date --collection --db
  * --concurrency --force_collection_update --force_export_to_hive`),
  * unknown flags warn-and-continue (parse_known_args semantics),
  * missing dates default to today, an optional collections
  * configuration JSON, and the per-collection date-range driver loop
  * with status bookkeeping. Deployment-specific pieces stay behind
  * seams: the session master/config comes from spark-submit, the
  * storage roots are any Hadoop-FS paths, and the status store is the
  * pluggable StatusStore.
  */
object Main {

  final case class Args(
      correlationId: String,
      sourcePrefix: Option[String],
      destinationPrefix: Option[String],
      startDate: Option[String],
      endDate: Option[String],
      collection: Option[String],
      db: Option[String],
      concurrency: Int,
      forceCollectionUpdate: Boolean,
      forceExportToHive: Boolean,
      configurationFile: Option[String],
      unrecognized: Seq[String])

  /** Mirror of get_arguments (corporate_data_ingestion.py:149-178):
    * `--flag value` pairs, two boolean store_true flags, unrecognized
    * args collected rather than fatal.
    */
  def parseArgs(argv: Array[String]): Args = {
    var a = Args(java.util.UUID.randomUUID().toString, None, None, None, None,
      None, None, concurrency = 5, forceCollectionUpdate = false,
      forceExportToHive = false, None, Nil)
    var i = 0
    val unknown = Seq.newBuilder[String]
    def value(): String = { i += 1; argv(i) }
    while (i < argv.length) {
      argv(i) match {
        case "--correlation_id" => a = a.copy(correlationId = value())
        case "--source_s3_prefix" => a = a.copy(sourcePrefix = Some(value()))
        case "--destination_s3_prefix" => a = a.copy(destinationPrefix = Some(value()))
        case "--start_date" => a = a.copy(startDate = Some(value()))
        case "--end_date" => a = a.copy(endDate = Some(value()))
        case "--collection" => a = a.copy(collection = Some(value()))
        case "--db" => a = a.copy(db = Some(value()))
        case "--concurrency" => a = a.copy(concurrency = value().toInt)
        case "--force_collection_update" => a = a.copy(forceCollectionUpdate = true)
        case "--force_export_to_hive" => a = a.copy(forceExportToHive = true)
        case "--configuration_file" => a = a.copy(configurationFile = Some(value()))
        case other => unknown += other
      }
      i += 1
    }
    a.copy(unrecognized = unknown.result())
  }

  /** Collections to process: an explicit --db/--collection pair wins;
    * otherwise the configuration file's `collections_all` map
    * (`{"db.x.y": {"db": "x", "table": "y"}}` — same shape the
    * reference inlines at corporate_data_ingestion.py:155-166);
    * otherwise the reference's built-in default collection.
    */
  def collections(a: Args): Seq[(String, String)] =
    (a.db, a.collection) match {
      case (Some(db), Some(c)) => Seq((db, c))
      case _ =>
        a.configurationFile.map { path =>
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          val root = mapper.readTree(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(path)))
          val all = root.path("collections_all")
          val out = Seq.newBuilder[(String, String)]
          val it = all.fields()
          while (it.hasNext) {
            val e = it.next()
            out += ((e.getValue.path("db").asText(), e.getValue.path("table").asText()))
          }
          out.result()
        }.getOrElse(Seq(("calculator", "calculationParts")))
    }

  /** The process_collection loop: per collection, run the date range
    * with IN_PROGRESS/COMPLETED/FAILED transitions (Runner.runRange).
    * Dates default to today (same as the reference's today_str).
    */
  def run(spark: SparkSession, a: Args, status: StatusStore): Unit = {
    val today = java.time.LocalDate.now().toString
    val start = a.startDate.getOrElse(today)
    val end = a.endDate.getOrElse(today)
    val source = a.sourcePrefix.getOrElse(
      sys.error("--source_s3_prefix is required to run an ingestion"))
    val dest = a.destinationPrefix.getOrElse(
      sys.error("--destination_s3_prefix is required to run an ingestion"))
    collections(a).foreach { case (db, table) =>
      new Runner(spark, status, correlationId = a.correlationId)
        .runRange(source, start, end, db, table, dest)
    }
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    if (a.unrecognized.nonEmpty)
      Console.err.println(s"WARN unrecognized args ${a.unrecognized.mkString(", ")} " +
        s"for correlation id ${a.correlationId}")
    val spark = SparkSession.builder()
      .appName("graft-corporate-data-ingestion")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    try run(spark, a, new InMemoryStatusStore)
    finally spark.stop()
  }
}
