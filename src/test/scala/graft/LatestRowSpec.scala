package graft

import org.apache.spark.sql.functions._

/** Exactness + tie-semantics spec for graft.functions.latest_row, the
  * ObjectHashAggregate form of struct-buffered max_by (r17). The
  * VERDICT r16 ask required an explicit tie-semantics contract before
  * any conversion — this is it. The conversion itself was measured
  * SLOWER and not shipped (see LatestRow's scaladoc); the aggregate
  * stays available and exact.
  */
class LatestRowSpec extends SparkSpec {
  import spark.implicits._

  test("latest_row == max_by == window twin on the events table (unique order keys)") {
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val ord = struct(col("ts"), col("event_id"))
    val viaLatest = ev.groupBy("user_id")
      .agg(graft.functions.latest_row(struct(col("event_id"), col("ts"),
        col("event_type"), col("value")), ord).as("l"))
      .select(col("user_id"), col("l.*"))
    val viaMaxBy = ev.groupBy("user_id")
      .agg(max_by(struct(col("event_id"), col("ts"), col("event_type"),
        col("value")), ord).as("l"))
      .select(col("user_id"), col("l.*"))
    val viaWindow = graft.pipeline.Snapshot
      .latestByKeyWindow(ev, Seq("user_id"), ord)
      .select(viaLatest.columns.map(col).toSeq: _*)
    assert(viaLatest.exceptAll(viaMaxBy).count() === 0)
    assert(viaMaxBy.exceptAll(viaLatest).count() === 0)
    assert(viaLatest.exceptAll(viaWindow).count() === 0)
    assert(viaLatest.count() === viaWindow.count())
  }

  test("strict-greater: an equal-order later row never replaces the held one") {
    // single partition → deterministic update order; max_by contract
    // is first-seen-wins on ties and latest_row must match it
    val df = Seq((1L, 10L, "first"), (1L, 10L, "second"), (1L, 9L, "earlier"))
      .toDF("k", "ord", "tag").coalesce(1)
    val got = df.groupBy("k")
      .agg(graft.functions.latest_row(struct(col("tag")), col("ord")).as("l"))
      .select(col("l.tag")).as[String].collect()
    assert(got.toSeq === Seq("first"))
  }

  test("null order keys are skipped; all-null group yields null") {
    val df = Seq((1L, Some(5L), "kept"), (1L, None, "null-ord"),
      (2L, None, "only-null")).toDF("k", "ord", "tag")
    val got = df.groupBy("k")
      .agg(graft.functions.latest_row(struct(col("tag")), col("ord")).as("l"))
      .select(col("k"), col("l.tag").as("tag"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got(1L) === Some("kept"))
    assert(got(2L) === None)
  }

  test("plans as ObjectHashAggregate with a map-side partial, never a sort") {
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val out = ev.groupBy("user_id")
      .agg(graft.functions.latest_row(
        struct(col("event_id"), col("ts"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("latest"))
      .select(col("user_id"), col("latest.*"))
    out.write.format("noop").mode("overwrite").save()
    val full = out.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_latest_row"), plan.take(2000))
    assert(!plan.contains("SortAggregate"), plan.take(2000))
  }

  test("survives serialize/merge across many partitions (shuffle exactness)") {
    // 40 partitions force real partial buffers + serde on the exchange
    val df = spark.range(0, 10000).repartition(40)
      .select((col("id") % 100).as("k"), col("id").as("ord"),
        concat(lit("v"), col("id")).as("tag"))
    val got = df.groupBy("k")
      .agg(graft.functions.latest_row(struct(col("tag"), col("ord")), col("ord")).as("l"))
      .select(col("k"), col("l.ord").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 100L).foreach { k =>
      assert(got(k) === 9900L + k, s"key $k")
    }
  }
}
