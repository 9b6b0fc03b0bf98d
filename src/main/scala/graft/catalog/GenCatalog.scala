package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 [[TableCatalog]] over the generational state layouts — the
  * catalog face of the repo's time-travel machinery: every
  * generation-versioned artifact (`<root>/<name>/gen<N>` with the
  * publish discipline of graft.fs.FsOps) becomes a SQL table whose
  * history is addressable with the STANDARD syntax
  *
  * {{{
  *   SELECT ... FROM gen.`<name>`                         -- newest
  *   SELECT ... FROM gen.`<name>` VERSION AS OF 1         -- generation 1
  *   SELECT ... FROM gen.`<name>` TIMESTAMP AS OF <ts>    -- Delta semantics:
  *                                     newest generation committed <= ts
  * }}}
  *
  * after `spark.sql.catalog.gen = graft.catalog.GenCatalog` (and
  * optionally `spark.sql.catalog.gen.root`, default /tmp). The
  * reference reaches version history by constructing S3 prefixes in
  * driver code (ingesters.py's dated `corporate_storage/` prefixes);
  * Spark-first, history is a catalog concern: Catalyst resolves
  * `VERSION AS OF` through `TableCatalog.loadTable(ident, version)`,
  * and the returned table is the builtin parquet DSv2 table, so scans
  * keep every pushdown/pruning/vectorization path of a plain parquet
  * read. Generation discovery and resolution go through the
  * filesystem seam — pointer-published generations (the object-store
  * impls) are first-class versions.
  *
  * Read-only by design: writes into history happen through the
  * generational publish protocol (stUpsert/stScd2/OPTIMIZE/RESTORE),
  * never through the catalog.
  */
class GenCatalog extends CatalogPlugin with TableCatalog {
  private var catalogName: String = _
  private var root: java.io.File = new java.io.File("/tmp")

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = new java.io.File(Option(options.get("root")).getOrElse("/tmp"))
  }

  override def name(): String = catalogName

  private def baseDir(ident: Identifier): java.io.File =
    new java.io.File(root, ident.name)

  /** Committed generation numbers of `base`, seam-listed (pointer
    * commits included), torn/unmarked dirs excluded.
    */
  private def gens(base: java.io.File): Seq[Int] =
    graft.Stage.logicalNames(base).filter(_.matches("gen\\d+"))
      .filter { n =>
        val d = new java.io.File(base, n)
        graft.Stage.published(d, graft.streaming.Streaming.GenMarker) ||
          graft.Stage.published(d, "_SUCCESS") ||
          graft.Stage.published(d, "_RESTORED")
      }
      .map(_.stripPrefix("gen").toInt).sorted

  private def tableAt(base: java.io.File, gen: Int): Table = {
    val phys = graft.Stage.resolved(new java.io.File(base, s"gen$gen"))
    ParquetTable(s"${base.getName}@gen$gen", SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(phys.getPath), None,
      classOf[ParquetFileFormat])
  }

  private def gensOrThrow(ident: Identifier): (java.io.File, Seq[Int]) = {
    val base = baseDir(ident)
    val gs = gens(base)
    if (gs.isEmpty) throw new NoSuchTableException(ident)
    (base, gs)
  }

  override def loadTable(ident: Identifier): Table = {
    val (base, gs) = gensOrThrow(ident)
    tableAt(base, gs.last)
  }

  /** `VERSION AS OF <v>`: the generation number (optionally written
    * `genN` — the on-disk name).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val (base, gs) = gensOrThrow(ident)
    val v = version.stripPrefix("gen").toInt
    if (!gs.contains(v)) throw new NoSuchTableException(ident)
    tableAt(base, v)
  }

  /** `TIMESTAMP AS OF <ts>` (micros since epoch): the newest
    * generation whose commit is at or before ts — Delta's semantics.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val (base, gs) = gensOrThrow(ident)
    val tsMillis = timestamp / 1000L
    val visible = gs.filter { g =>
      graft.Stage.resolved(new java.io.File(base, s"gen$g"))
        .lastModified <= tsMillis
    }
    if (visible.isEmpty) throw new NoSuchTableException(ident)
    tableAt(base, visible.last)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && gens(d).nonEmpty)
      .map(d => Identifier.of(namespace, d.getName))

  // history is written by the generational publish protocol, not DDL
  override def createTable(ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException("GenCatalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("GenCatalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("GenCatalog is read-only")
  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("GenCatalog is read-only")
}
