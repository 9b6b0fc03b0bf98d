package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Layout

class CloneSpec extends SparkSpec {

  private def parquets(f: java.io.File): Seq[java.io.File] = {
    val kids = Option(f.listFiles()).getOrElse(Array.empty).toSeq
    kids.filter(_.isDirectory).flatMap(parquets) ++
      kids.filter(_.getName.endsWith(".parquet"))
  }

  private def fileKey(f: java.io.File) =
    java.nio.file.Files.readAttributes(f.toPath,
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()

  test("p_clone: zero bytes copied — every cloned parquet shares its source inode") {
    val clonePath = Layout.ensureClone(spark, sfDir)
    val srcData = new java.io.File(
      new java.io.File(clonePath.stripSuffix("_clone")), "data")
    val cloneData = new java.io.File(clonePath, "data")
    // key by path RELATIVE to the data root — bucket dirs reuse part
    // file names, so bare names collide across buckets
    def rel(root: java.io.File, f: java.io.File) =
      root.toPath.relativize(f.toPath).toString
    val srcKeys = parquets(srcData).map(f => rel(srcData, f) -> fileKey(f)).toMap
    val cloned = parquets(cloneData)
    assert(cloned.nonEmpty)
    cloned.foreach { f =>
      assert(srcKeys.get(rel(cloneData, f)).contains(fileKey(f)),
        s"${rel(cloneData, f)} was copied, not linked")
    }
  }

  test("p_restore: zero-copy rollback, history preserved underneath") {
    import graft.queries.PipelineQueries
    val out = PipelineQueries.pRestore(spark, sfDir).collect()
    assert(out.nonEmpty)
    val base = PipelineQueries.ensureTimeTravelState(spark, sfDir)
    // zero-copy: every restored parquet shares its gen1 source inode
    val g1 = new java.io.File(s"$base/gen1")
    val g4 = new java.io.File(s"$base/gen4")
    def rel(root: java.io.File, f: java.io.File) =
      root.toPath.relativize(f.toPath).toString
    val srcKeys = parquets(g1).map(f => rel(g1, f) -> fileKey(f)).toMap
    val restored = parquets(g4)
    assert(restored.nonEmpty)
    restored.foreach { f =>
      assert(srcKeys.get(rel(g4, f)).contains(fileKey(f)),
        s"${rel(g4, f)} was copied, not linked")
    }
    // history preserved: the rolled-back-over gen3 still answers
    assert(new java.io.File(s"$base/gen3").exists())
    assert(spark.read.parquet(s"$base/gen3").count() > 0)
    // and the restored state equals gen1's content exactly
    val v1 = spark.read.parquet(s"$base/gen1")
      .select("user_id", "event_id", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === v1)
  }

  test("p_clone answers match the source layout exactly; source survives clone deletion") {
    val viaClone = Layout.pClone(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val viaSource = Layout.qZorderPrune(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaClone === viaSource)
    // divergence safety: dropping the clone must not disturb the source
    val clonePath = Layout.ensureClone(spark, sfDir)
    graft.Stage.deleteRecursively(new java.io.File(clonePath))
    graft.Stage.refreshArtifact(spark, new java.io.File(clonePath))
    val after = Layout.qZorderPrune(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after === viaSource, "source layout damaged by clone deletion")
  }
}
