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
