package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftx.PlanBridge
import org.apache.spark.sql.types.StructType

/** Per-file min/max footprint from a stats manifest: path relative to
  * the data root, plus [min, max] per indexed column — any integral
  * column a manifest carries stats for can prune, not just the two
  * z-order demo dimensions.
  */
final case class ZFileStats(rel: String, footprint: Map[String, (Long, Long)])

/** A manifest-backed `FileIndex` for the z-order layout
  * (pipeline/Layout.scala): file skipping happens where a table
  * format's reader does it — at `listFiles(partitionFilters,
  * dataFilters)` time, from the predicates Catalyst pushed into the
  * scan — so pruning COMPOSES with the optimizer (any `.filter` on the
  * layout's columns prunes; nothing threads bounds by hand, and the
  * query reads as a plain scan + filter).
  *
  * The replaced shape (r6 verdict ask #4): collect the manifest, build
  * a path list, hand `spark.read.parquet(paths: _*)` the survivors —
  * correct, but pruning lived OUTSIDE the plan, so it applied only to
  * the one hand-plumbed query. Here the index holds (footprint,
  * FileStatus) pairs — resolved once from ONE recursive listing — and
  * each scan's `dataFilters` are folded into per-column [lo, hi]
  * bounds; a file survives unless its footprint is provably disjoint
  * on some dimension (the same conservative rule as
  * Layout.pruneFiles, and the one Delta/Iceberg stats skipping uses).
  * Unrecognized predicates simply contribute no bounds — never
  * incorrect, only less pruning.
  *
  * At 100 TB the index is the driver-side planning structure every
  * lakehouse reader keeps: one row per FILE (10⁵-10⁶ entries), built
  * from the manifest parquet, with no per-row work on the data path.
  */
class ZorderFileIndex(root: Path, stats: Seq[(ZFileStats, FileStatus)])
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def inputFiles: Array[String] =
    stats.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = stats.map(_._2.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // one [lo, hi] interval per indexed column, from whatever
    // predicates Catalyst pushed down; a file is skipped when provably
    // disjoint on ANY indexed dimension. The column set is the UNION
    // across all files' footprints — manifests with heterogeneous
    // per-file stats (the generalized indexed-column surface) must not
    // key off whichever file happens to sort first.
    val cols = stats.iterator.flatMap(_._1.footprint.keySet).toSet
    val wanted = cols.map(c => c -> ZorderFileIndex.bounds(dataFilters, c)).toMap
    val kept = stats.collect {
      case (st, fs) if st.footprint.forall { case (c, (mn, mx)) =>
        val (lo, hi) = wanted.getOrElse(c, (Long.MinValue, Long.MaxValue))
        !(mx < lo || mn > hi)
      } => fs
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}

object ZorderFileIndex {

  /** Fold a scan's pushed data filters into a conservative [lo, hi]
    * interval for one column: only conjuncts that are simple
    * comparisons between that attribute and a literal tighten the
    * interval; everything else is ignored (safe — the residual filter
    * still runs on the rows).
    */
  private[graft] def bounds(filters: Seq[Expression], name: String): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Int, _) => Some(v.toLong)
      case _ => None
    }
    def at(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == name
      case _ => false
    }
    filters.flatMap(conjuncts).foreach {
      case EqualTo(a, l) if at(a) => lit(l).foreach { v =>
        lo = math.max(lo, v); hi = math.min(hi, v) }
      case EqualTo(l, a) if at(a) => lit(l).foreach { v =>
        lo = math.max(lo, v); hi = math.min(hi, v) }
      // exclusive bounds kept inclusive: never skips a file it shouldn't
      case GreaterThanOrEqual(a, l) if at(a) => lit(l).foreach(v => lo = math.max(lo, v))
      case GreaterThan(a, l) if at(a) => lit(l).foreach(v => lo = math.max(lo, v))
      case LessThanOrEqual(a, l) if at(a) => lit(l).foreach(v => hi = math.min(hi, v))
      case LessThan(a, l) if at(a) => lit(l).foreach(v => hi = math.min(hi, v))
      case GreaterThanOrEqual(l, a) if at(a) => lit(l).foreach(v => hi = math.min(hi, v))
      case GreaterThan(l, a) if at(a) => lit(l).foreach(v => hi = math.min(hi, v))
      case LessThanOrEqual(l, a) if at(a) => lit(l).foreach(v => lo = math.max(lo, v))
      case LessThan(l, a) if at(a) => lit(l).foreach(v => lo = math.max(lo, v))
      case _ => ()
    }
    (lo, hi)
  }

  /** The z-layout as a DataFrame whose scan prunes through the
    * manifest-backed index. `dataSchema` is the FILE schema (the
    * layout's directory partition column is not exposed — the z-bucket
    * is a layout detail, not a query column).
    */
  def table(s: SparkSession, dataRoot: String, manifest: Seq[ZFileStats],
      dataSchema: StructType): DataFrame = {
    val rootPath = new Path(dataRoot)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val rootStr = fs.makeQualified(rootPath).toString
    val byRel = scala.collection.mutable.Map.empty[String, FileStatus]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) walk(st.getPath)
      else {
        val full = st.getPath.toString
        if (full.startsWith(rootStr))
          byRel(full.stripPrefix(rootStr).stripPrefix("/")) = st
      }
    }
    walk(rootPath)
    val resolved = manifest.map { m =>
      m -> byRel.getOrElse(m.rel,
        throw new IllegalStateException(s"manifest names missing file ${m.rel}"))
    }
    val index = new ZorderFileIndex(fs.makeQualified(rootPath), resolved)
    val relation = HadoopFsRelation(index, StructType(Nil), dataSchema, None,
      new ParquetFileFormat, Map.empty[String, String])(s)
    PlanBridge.ofRows(s, LogicalRelation(relation))
  }
}
