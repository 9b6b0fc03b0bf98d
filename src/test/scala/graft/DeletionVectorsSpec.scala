package graft

import org.apache.spark.sql.functions._

import graft.pipeline.DeletionVectors

class DeletionVectorsSpec extends SparkSpec {

  test("vector holds exactly one unique position per deleted row") {
    val dv = DeletionVectors.buildVector(spark, sfDir).cache()
    try {
      val n = dv.count()
      assert(n > 0, "delete batch resolved to no positions")
      assert(dv.distinct().count() === n, "duplicate (file, position) rows")
      // position count == rows the keyed delete names (resolve is total)
      val keyed = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir)
            .filter(col("o_orderkey") % 97 === 0)
            .select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_semi")
        .count()
      assert(n === keyed)
    } finally dv.unpersist()
  }

  test("positional apply removes the same ROWS as the key anti-join") {
    // the vector carries no keys — if _metadata.row_index were not
    // stable across scans, positions would strike the wrong rows and
    // the surviving multiset would diverge from the key-based truth
    val byKey = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_live"),
        graft.queries.QueryDef.moneySum(col("l_quantity")).as("sum_qty"))
    val byPos = DeletionVectors.pDeletionVectors(spark, sfDir)
    val diff = byPos.exceptAll(byKey).count() + byKey.exceptAll(byPos).count()
    assert(diff === 0L, "positional apply diverged from the key anti-join")
  }
}
