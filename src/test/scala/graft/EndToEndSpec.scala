package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline._

/** The reference's full day-in-the-life, chained end to end
  * (ingesters.py decrypt_and_process → update → export_to_hive_table):
  * two daily ingests land partitioned increments; the merge unions a
  * prior export with date-pruned dailies and keeps one latest record
  * per (id_part, id); the hive export reshapes `val` through a DDL
  * schema. DELETE records win over INSERT at merge (reference orderBy
  * db_type ascending picks DELETE first — mirrored here).
  */
class EndToEndSpec extends SparkSpec {

  test("ingest two days → merge into snapshot → hive export shape") {
    val out = Files.createTempDirectory("graft_e2e_daily").toString
    val snapDir = Files.createTempDirectory("graft_e2e_snap").toString

    // day 1 + day 2 ingests (same doc corpus → same ids, day 2 wins)
    val day1 = Ingest.dailyIncrement(
      Ingest.pipeline(Envelope.synthesize(spark, sfDir)), "2021-06-15")
    val day2 = Ingest.dailyIncrement(
      Ingest.pipeline(Envelope.synthesize(spark, sfDir)), "2021-06-16")
    Ingest.writeDaily(day1, out)
    Ingest.writeDaily(day2.filter(col("id_part") =!= "1"), out) // partial day 2

    // "prior export" = day-1 snapshot; dailies = partition-pruned to day 2
    val export = day1.select("id", "id_part", "db_type", "val")
    val dailies = spark.read.parquet(out)
      .filter(col("export_year") === 2021 && col("export_month") === 6
        && col("export_day") > 15)
      .select("id", "id_part", "db_type", "val")

    // latest per key: day-2 rows shadow the export where present;
    // order by export day proxy via db_type is the reference's contract —
    // here both days have identical db_type per id, so dedupe to one row
    val merged = Snapshot.merge(export, dailies, Seq("id_part", "id"), col("db_type"))
    assert(merged.groupBy("id_part", "id").count().filter(col("count") > 1).count() === 0)
    assert(merged.count() === export.count()) // every id survives exactly once

    Snapshot.writeSnapshot(merged, snapDir)
    // the snapshot lands in the reference's ORC export format; the
    // hive reshape below reads it back through from_json(ddl)
    val snap = spark.read.orc(snapDir)
    assert(snap.count() === merged.count())

    // hive export: typed reshape of the snapshot's val column
    val typed = HiveExport.exportShape(snap, "lang STRING, n_chars BIGINT")
    assert(typed.columns.toSeq === Seq("lang", "n_chars"))
    assert(typed.count() === merged.count())
    // spot-check against the source table
    val srcChars = Tables.documents(spark, sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    assert(typed.agg(sum("n_chars")).collect()(0).getLong(0) === srcChars)
  }

  test("daily layout enables partition pruning on the date predicate") {
    val out = Files.createTempDirectory("graft_prune").toString
    Ingest.writeDaily(Ingest.dailyIncrement(
      Ingest.pipeline(Envelope.synthesize(spark, sfDir)), "2021-06-15"), out)
    Ingest.writeDaily(Ingest.dailyIncrement(
      Ingest.pipeline(Envelope.synthesize(spark, sfDir)), "2021-06-16")
      .filter(col("id_part") =!= "9"), out)

    val pruned = spark.read.parquet(out)
      .filter(col("export_day") === 16)
    // the physical scan must carry the date as a PartitionFilter (no
    // data files of day 15 are touched)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("export_day"),
      s"no partition filter in scan:\n$scan")
    val expected = Tables.documents(spark, sfDir)
      .filter(substring(col("doc_id").cast("string"), 1, 2) =!= "9").count()
    assert(pruned.count() === expected)
  }

  test("merge prefers DELETE over INSERT per the reference's db_type ordering") {
    import spark.implicits._
    val export = Seq(("a", "aa", "INSERT", "v1")).toDF("id", "id_part", "db_type", "val")
    val dailies = Seq(("a", "aa", "DELETE", "v2")).toDF("id", "id_part", "db_type", "val")
    // reference: row_number over orderBy(db_type) ascending == DELETE first;
    // our max_by picks the MAX order key, so the order column flips the sign
    val merged = Snapshot.merge(export, dailies, Seq("id_part", "id"),
      when(col("db_type") === "DELETE", 1).otherwise(0))
    val row = merged.collect()(0)
    assert(row.getAs[String]("db_type") === "DELETE")
    assert(row.getAs[String]("val") === "v2")
  }
}
