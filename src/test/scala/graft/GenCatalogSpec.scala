package graft

import org.apache.spark.sql.functions._

/** The DSv2 generation catalog (graft.catalog.GenCatalog): standard
  * SQL history addressing over the generational layouts.
  */
class GenCatalogSpec extends SparkSpec {

  private def setup(): String = {
    val base = graft.queries.PipelineQueries.ensureTimeTravelState(spark, sfDir)
    spark.conf.set("spark.sql.catalog.gen",
      classOf[graft.catalog.GenCatalog].getName)
    spark.conf.set("spark.sql.catalog.gen.root",
      new java.io.File(base).getParent)
    new java.io.File(base).getName
  }

  test("VERSION AS OF addresses generations; bare name is the newest") {
    val name = setup()
    // v1 holds only even event_ids (batch 0's slice); the newest
    // generation holds the full latest-per-key state
    val v1 = spark.sql(s"SELECT * FROM gen.`$name` VERSION AS OF 1")
    assert(v1.count() > 0)
    assert(v1.filter(col("event_id") % 2 =!= 0).count() === 0,
      "generation 1 must predate the odd-id batches")
    val newest = spark.sql(s"SELECT * FROM gen.`$name`")
    val v3 = spark.sql(s"SELECT * FROM gen.`$name` VERSION AS OF 3")
    assert(newest.count() >= v3.count())
    assert(v3.count() > v1.filter(col("event_id") % 2 === 0).count() / 2,
      "newest generation lost state")
    // versioned scans stay on the builtin parquet path: pushdown works
    val pushed = spark.sql(
      s"SELECT user_id FROM gen.`$name` VERSION AS OF 3 WHERE user_id = 7")
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      s"versioned scan lost parquet pushdown:\n$plan")
  }

  test("TIMESTAMP AS OF picks the newest generation committed at or before ts") {
    val name = setup()
    val base = new java.io.File(
      spark.conf.get("spark.sql.catalog.gen.root"), name)
    def mtime(g: Int) =
      Stage.resolved(new java.io.File(base, s"gen$g")).lastModified
    // exactly at gen1's commit: gen1 is visible, later generations are
    // not necessarily — compare against the direct read of the picked
    // generation. DSv2 passes micros; mtimes are millis.
    val atG1 = spark.sql(
      s"SELECT * FROM gen.`$name` TIMESTAMP AS OF ${mtime(1) * 1000L}")
    val g1 = spark.read.parquet(
      Stage.resolved(new java.io.File(base, "gen1")).getPath)
    // gen1..gen3 may share a second-granularity mtime; the contract is
    // "newest generation with mtime <= ts", so compute it explicitly
    val expected = (1 to 3).filter(g => mtime(g) <= mtime(1)).max
    val expectedDf = spark.read.parquet(
      Stage.resolved(new java.io.File(base, s"gen$expected")).getPath)
    assert(atG1.count() === expectedDf.count())
    assert(g1.count() > 0)
    // far future: newest generation
    val atEnd = spark.sql(
      s"SELECT * FROM gen.`$name` TIMESTAMP AS OF ${(mtime(3) + 60000L) * 1000L}")
    val g3 = spark.read.parquet(
      Stage.resolved(new java.io.File(base, "gen3")).getPath)
    assert(atEnd.count() >= g3.count() ||
      atEnd.count() === spark.sql(s"SELECT * FROM gen.`$name`").count())
  }

  test("catalog lists generation tables, refuses DDL, rejects missing versions") {
    val name = setup()
    val listed = spark.sql("SHOW TABLES IN gen").collect().map(_.getString(1))
    assert(listed.contains(name), s"$name missing from ${listed.mkString(",")}")
    val noVersion = intercept[Exception] {
      spark.sql(s"SELECT * FROM gen.`$name` VERSION AS OF 99").collect()
    }
    assert(noVersion.getMessage != null)
    val readOnly = intercept[Exception] {
      spark.sql(s"DROP TABLE gen.`$name`")
    }
    assert(Option(readOnly.getMessage).exists(_.contains("read-only")))
  }
}
