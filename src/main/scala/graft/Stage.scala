package graft

import org.apache.spark.sql.DataFrame

/** Hard optimizer boundary for staged expensive projections.
  *
  * Catalyst defeats softer barriers in two ways, both measured here:
  *  - CollapseProject / projection pushdown moves aliased expressions
  *    through `repartition()` exchanges and re-inlines them into every
  *    downstream reference (and `Generate` re-evaluates its child per
  *    OUTPUT row);
  *  - join-key null filters (`isnotnull(bucket)`) are pushed below the
  *    exchange with alias substitution, so the full signature
  *    expression lands in a scan-side Filter and is evaluated twice
  *    per row.
  *
  * An RDD roundtrip pins the projection: everything above it sees only
  * materialized attributes. Use it AFTER computing a column that is
  * (a) expensive and (b) referenced by joins, explodes, or multiple
  * downstream expressions. The staged payload should be narrow (ids +
  * signatures).
  */
object Stage {
  def barrier(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Recursive delete for fixture/layout directories (the one shared
    * copy — null-guarded: listFiles() returns null on IO error or
    * non-directories racing deletion).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }
}
