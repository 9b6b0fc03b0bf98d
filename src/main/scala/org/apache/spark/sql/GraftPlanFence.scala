package org.apache.spark.sql

/** InternalRow-level optimizer fence (r17, guide §4 "eliminate
  * non-codegen work in the hot path").
  *
  * graft.Stage.barrier pins expensive projections behind an RDD leaf so
  * Catalyst cannot re-inline them per consumer (see Stage.scala). Its
  * original implementation — `createDataFrame(df.rdd, df.schema)` —
  * paid a DOUBLE per-row conversion for that fence: `df.rdd` plans a
  * DeserializeToObject (UnsafeRow → external Row with boxed fields and
  * java.lang.String payloads), and `createDataFrame` immediately maps
  * each external Row back through a Catalyst converter. Both legs are
  * interpreted, per-row, non-codegen work, multiplied by every
  * consuming stage of the barrier.
  *
  * `internalCreateDataFrame(queryExecution.toRdd, schema)` builds the
  * SAME LogicalRDD leaf (same plan shape: `Scan ExistingRDD`, same
  * recompute-per-consumer semantics, same optimizer opacity) directly
  * over the InternalRow output of the child plan — zero row
  * conversions. It is `private[sql]`, hence this one-object shim in
  * the org.apache.spark.sql package; the API is public Spark source
  * (SparkSession.internalCreateDataFrame has carried this signature
  * since 2.x, and Dataset.ofRows-based plan fences are the same
  * mechanism Spark itself uses for checkpoint/localCheckpoint
  * truncation).
  *
  * Row-reuse note: `toRdd` iterators may reuse row buffers, exactly as
  * every physical operator's input iterator may; RDDScanExec re-projects
  * each row through an UnsafeProjection before handing it downstream,
  * so buffering consumers see stable rows — the same contract as any
  * exchange boundary. Nothing here stores the rows.
  */
object GraftPlanFence {
  def internalRowBarrier(df: DataFrame): DataFrame = df match {
    case c: classic.Dataset[Row] @unchecked =>
      c.sparkSession.internalCreateDataFrame(
        c.queryExecution.toRdd, c.schema, isStreaming = false)
    case other =>
      // non-classic Dataset (e.g. a Connect client): fall back to the
      // public external-Row roundtrip — correct, just slower
      other.sparkSession.createDataFrame(other.rdd, other.schema)
  }
}
