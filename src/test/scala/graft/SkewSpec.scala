package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join and spreads a hot key across salts") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "event_type")
    val dim = Tables.events(spark, sfDir).select("user_id").distinct()
      .withColumn("segment", concat(lit("seg_"), col("user_id") % 3))

    val plain = ev.join(dim, Seq("user_id"))
      .select("user_id", "event_id", "event_type", "segment")
    val salted = Skew.saltedJoin(ev, dim, Seq("user_id"), salts = 8)
      .select("user_id", "event_id", "event_type", "segment")

    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)

    // the salt really spreads one key's rows across buckets
    val hot = ev.groupBy("user_id").count().orderBy(desc("count"))
      .limit(1).collect()(0).getLong(0)
    val spread = ev.filter(col("user_id") === hot)
      .withColumn("s", Skew.rowSalt(ev.filter(col("user_id") === hot), 8))
      .select("s").distinct().count()
    assert(spread > 1)
  }
}
