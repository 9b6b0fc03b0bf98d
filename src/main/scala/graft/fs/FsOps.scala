package graft.fs

import java.io.File

/** Filesystem seam for the generational layout/state machinery.
  *
  * Every Delta-parity verb in this repo — z-order layouts, incremental
  * OPTIMIZE, time travel/CDF, clone, restore, vacuum, bloom-index
  * publish, and the streaming generational state — needs exactly three
  * filesystem capabilities beyond what Spark's own writers provide:
  *
  *  1. '''carry''' a data file from one generation into the next
  *     without rewriting its bytes;
  *  2. '''publish''' a fully-built staging tree atomically under a
  *     well-known name, first-writer-wins under races;
  *  3. '''resolve''' a published name back to the directory Spark
  *     should read.
  *
  * On POSIX these are hard link, dir rename, and identity. On the
  * object stores the reference actually targets (its production home
  * is S3 — processed_bucket.tf / published_bucket.tf; the ingesters
  * read `corporate_storage/...` S3 prefixes, ingesters.py:468-487)
  * NONE of the POSIX forms exist: there are no hard links, and
  * "renaming" a prefix is a non-atomic per-object copy+delete. What an
  * object store DOES give you is (a) server-side single-object COPY
  * and (b) atomic single-object PUT (conditional PUT-if-absent since
  * S3's 2024 If-None-Match support) — which is precisely the primitive
  * Delta/Iceberg commit protocols are built on.
  *
  * [[ObjectStoreFsOps]] therefore re-expresses the three capabilities
  * the way a transactional table format does:
  *
  *  - carry   = object COPY (no data moves through the client; bytes
  *              are duplicated service-side, so generation GC needs no
  *              inode refcounting — each generation owns its objects);
  *  - publish = the staging PREFIX becomes the physical home (nothing
  *              is ever renamed); commit is one atomic PUT-if-absent
  *              of a tiny pointer object `<name>.ptr` whose content
  *              names the physical prefix. Losing the conditional PUT
  *              = lost race: delete your staging tree, the winner's
  *              commit stands (exactly Delta's
  *              `_delta_log/N.json`-mutual-exclusion contract);
  *  - resolve = read the pointer object.
  *
  * The local-disk emulation below maps PUT-if-absent onto a
  * createLink of the one-line pointer file (atomic fail-if-exists —
  * no check-then-act window) and commit REPLACE onto an ATOMIC_MOVE;
  * atomicity of a single small object write is the modeled
  * capability. What this impl NEVER does is rename or link a DATA
  * file or directory. Spark's own
  * task-commit renames inside `df.write.parquet(dir)` are out of this
  * seam's scope: on a real deployment that layer is the S3A magic /
  * zero-rename committer, a solved problem orthogonal to the repo's
  * publish machinery.
  *
  * The active implementation is a process-wide `@volatile` var (not a
  * ThreadLocal: streaming foreachBatch bodies run on the stream
  * execution thread, which must see the same seam as the spec thread
  * that scoped it).
  */
trait FsOps {
  def name: String

  /** Place `src`'s bytes at `dst` without rewriting them through
    * Spark: POSIX = hard link (same inode, zero IO); object store =
    * server-side copy.
    */
  def carryFile(src: File, dst: File): Unit

  /** Atomically publish staging tree `tmp` as `target`; the done
    * `marker` file was already written INSIDE tmp, so no reader can
    * observe a published directory without its marker. First writer
    * wins: a lost race deletes the loser's staging tree; any other
    * failure throws.
    */
  def publishDir(tmp: File, target: File, marker: String): Unit

  /** The physical directory to read for published name `target`
    * (identity when no pointer exists — generation dirs written
    * directly by Spark resolve to themselves).
    */
  def resolveDir(target: File): File

  /** Logical child names under `parent`: real directories plus
    * pointer-published names. Generation discovery (restore, vacuum)
    * must use this, not File.listFiles, to see pointer-published
    * generations.
    */
  def logicalNames(parent: File): Seq[String]

  /** Remove a published artifact entirely: the commit record first
    * (so no reader can resolve to a half-deleted tree), then the
    * physical tree. POSIX = recursive delete; object store = delete
    * the pointer object, then the physical prefix. Rebuild-in-place
    * paths (stale-layout upgrades, vacuum) must use this, never a
    * bare recursive delete of the logical name.
    */
  def deletePublished(target: File): Unit

  /** REPLACE an already-published `target` with staging tree `tmp`
    * (OPTIMIZE/compaction: the fingerprint-addressed name IS the
    * layout's identity and must survive the swap). POSIX = the
    * stage-out double rename; object store = one atomic pointer-object
    * replace (a plain PUT — readers see the old commit or the new one,
    * never an intermediate), after which the superseded physical tree
    * is deleted (carried files were COPIED into the new tree, so the
    * old one owns nothing the new one needs).
    */
  def republishDir(tmp: File, target: File, marker: String): Unit

  /** A staging directory for building the next version of `target`.
    * POSIX renames staging into place, so a FIXED name (pre-cleaned
    * crash debris) is right; an object store never moves the staging
    * tree — it BECOMES the physical home — so the name must be UNIQUE
    * per build or a rebuild would delete the live generation it is
    * about to replace. Crash debris under unique names is vacuum's
    * job, exactly as uncommitted Delta/Iceberg data files are.
    */
  def stagingDir(target: File, suffix: String): File
}

object FsOps {
  @volatile var current: FsOps = PosixFsOps

  /** Scope `ops` as the process-wide seam for `body` (specs only —
    * production picks one impl at deploy time). Serialized because the
    * seam is process-wide state.
    */
  def withFs[A](ops: FsOps)(body: => A): A = synchronized {
    val prev = current
    current = ops
    try body finally current = prev
  }
}

/** The POSIX implementation: hard links + atomic dir rename. */
object PosixFsOps extends FsOps {
  val name = "posix"

  def carryFile(src: File, dst: File): Unit =
    java.nio.file.Files.createLink(dst.toPath, src.toPath)

  def publishDir(tmp: File, target: File, marker: String): Unit = {
    if (!tmp.renameTo(target)) {
      if (new File(target, marker).exists()) deleteTree(tmp)
      else throw new IllegalStateException(
        s"cannot publish ${tmp.getName} as $target")
    }
  }

  def resolveDir(target: File): File = target

  def logicalNames(parent: File): Seq[String] =
    Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSeq

  def deletePublished(target: File): Unit = deleteTree(target)

  def republishDir(tmp: File, target: File, marker: String): Unit = {
    val pre = new File(target.getPath + ".pre_swap")
    deleteTree(pre)
    if (!target.renameTo(pre))
      throw new IllegalStateException(s"cannot stage out $target for swap")
    if (!tmp.renameTo(target)) {
      pre.renameTo(target)
      throw new IllegalStateException(s"swap failed for $target")
    }
    deleteTree(pre)
  }

  def stagingDir(target: File, suffix: String): File = {
    val f = new File(target.getPath + "." + suffix)
    deleteTree(f) // fixed name: pre-clean crash debris
    f
  }

  // one shared recursive delete for the whole codebase
  private def deleteTree(f: File): Unit = graft.Stage.deleteRecursively(f)
}

/** The object-store implementation: copies + pointer-object commits.
  * Data files and directories are NEVER renamed or linked; the only
  * atomic operation used is the single-object pointer put.
  */
object ObjectStoreFsOps extends FsOps {
  val name = "objectstore"

  def carryFile(src: File, dst: File): Unit = {
    java.nio.file.Files.copy(src.toPath, dst.toPath)
    ()
  }

  private def ptrFile(target: File): File =
    new File(target.getParentFile, target.getName + ".ptr")

  def publishDir(tmp: File, target: File, marker: String): Unit = {
    require(new File(tmp, marker).exists(),
      s"staging tree $tmp lacks its $marker marker")
    // commit = atomic put-if-absent of the pointer object; the staging
    // tree IS the physical home and never moves. The local emulation
    // of conditional PUT (S3 If-None-Match) is createLink, which
    // FAILS ATOMICALLY if the pointer already exists — no
    // check-then-act window where two publishers could both commit
    // (a plain exists()+move would let the second REPLACE the first).
    val ptr = ptrFile(target)
    val stage = new File(ptr.getPath + s".put.${java.util.UUID.randomUUID}")
    java.nio.file.Files.write(stage.toPath,
      tmp.getName.getBytes("UTF-8"))
    try {
      java.nio.file.Files.createLink(ptr.toPath, stage.toPath)
      stage.delete()
      ()
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        // lost the conditional put: first writer wins, retire ours
        stage.delete(); deleteTree(tmp)
    }
  }

  def resolveDir(target: File): File = {
    val ptr = ptrFile(target)
    if (ptr.isFile) {
      val phys = new String(
        java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
      new File(target.getParentFile, phys)
    } else target
  }

  def logicalNames(parent: File): Seq[String] = {
    val kids = Option(parent.listFiles()).getOrElse(Array.empty)
    val dirs = kids.filter(_.isDirectory).map(_.getName)
    val ptrs = kids.filter(f => f.isFile && f.getName.endsWith(".ptr"))
      .map(_.getName.stripSuffix(".ptr"))
    // a pointer-published name shadows any same-named debris dir
    (dirs.filterNot(ptrs.contains) ++ ptrs).toSeq
  }

  def deletePublished(target: File): Unit = {
    val phys = resolveDir(target)
    // pointer first: readers stop resolving before bytes disappear
    ptrFile(target).delete()
    deleteTree(phys)
    if (phys != target) deleteTree(target) // same-named debris dir
  }

  def republishDir(tmp: File, target: File, marker: String): Unit = {
    require(new File(tmp, marker).exists(),
      s"staging tree $tmp lacks its $marker marker")
    val old = resolveDir(target)
    val ptr = ptrFile(target)
    val stage = new File(ptr.getPath + s".put.${java.util.UUID.randomUUID}")
    java.nio.file.Files.write(stage.toPath, tmp.getName.getBytes("UTF-8"))
    // atomic pointer replace = plain object PUT: readers resolve the
    // old commit or the new one, never a torn state
    java.nio.file.Files.move(stage.toPath, ptr.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the superseded physical tree owns nothing the new commit needs
    // (carried files were copied, not linked) — retire it
    if (old.getCanonicalPath != tmp.getCanonicalPath) deleteTree(old)
  }

  def stagingDir(target: File, suffix: String): File =
    // unique per build: the staging tree becomes the physical home and
    // must never collide with the live one it is replacing
    new File(target.getPath + "." + suffix + "." +
      java.util.UUID.randomUUID.toString.take(8))

  private def deleteTree(f: File): Unit = graft.Stage.deleteRecursively(f)
}
