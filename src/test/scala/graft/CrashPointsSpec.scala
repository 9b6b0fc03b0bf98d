package graft

import java.io.File

import graft.fs.{FsOps, HadoopFsOps, ObjectStoreFsOps, PosixFsOps}

/** Crash-point walk of the artifact publish protocols: for EVERY cut
  * between steps of stage-write → marker → pointer-put (and the
  * republish/retire paths), construct the exact on-disk state that cut
  * leaves behind and assert the three reader/recovery invariants:
  *
  *  1. NEVER-TORN — a reader at the cut either sees "unpublished" or
  *     resolves a COMPLETE committed tree (marker present, full
  *     payload); never a partial tree, never a garbage path.
  *  2. RECOVERABLE — a retried publish/republish (the ensureArtifact
  *     shape) from the cut state lands a committed artifact whose
  *     payload readers then see.
  *  3. SWEEPABLE — everything the crash stranded is listed by
  *     stagingDebris and removed by the age-gated GC WITHOUT touching
  *     the live commit.
  *
  * Simulated-state walks are exact here because each cut's post-crash
  * disk state is fully determined by the protocol step sequence (the
  * verbs are linear; there is no background work) — FsOpsSpec covers
  * the concurrency races, this spec covers the crash cuts. Runs over
  * both object-store bindings (RawLocalFileSystem and the checksummed
  * LocalFileSystem) plus the POSIX rename protocol's own cuts.
  */
class CrashPointsSpec extends SparkSpec {

  private val Marker = "_SUCCESS"

  private def write(f: File, content: String): Unit = {
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    ()
  }

  /** A complete artifact tree: payload + marker (the publishable unit). */
  private def mkTree(dir: File, tag: String, withMarker: Boolean = true): File = {
    dir.mkdirs()
    write(new File(dir, "data.txt"), s"payload-$tag")
    if (withMarker) write(new File(dir, Marker), "")
    dir
  }

  private def payload(dir: File): String =
    new String(java.nio.file.Files.readAllBytes(
      new File(dir, "data.txt").toPath), "UTF-8")

  /** Invariant 1 probe: what a reader sees at this instant — Left when
    * unpublished, Right(payload) when it resolves a committed tree. A
    * resolved-but-incomplete tree fails the assertion inside.
    */
  private def readerView(target: File): Either[String, String] =
    if (!Stage.published(target, Marker)) Left("unpublished")
    else {
      val phys = Stage.resolved(target)
      assert(new File(phys, Marker).exists(), s"resolved torn tree $phys")
      assert(new File(phys, "data.txt").exists(), s"resolved partial tree $phys")
      Right(payload(phys))
    }

  /** Invariant 2 probe: the ensureArtifact retry shape — rebuild and
    * publish `tag` if the target is not currently published.
    */
  private def retryPublish(target: File, tag: String): Unit =
    if (!Stage.published(target, Marker)) {
      Stage.deletePublished(target)
      val tmp = Stage.stagingDir(target, "build")
      mkTree(tmp, tag)
      Stage.publishDir(tmp, target, Marker)
    }

  /** Invariant 3 probe: GC everything staged before `cutoff`, assert
    * the live payload survives untouched.
    */
  private def sweepAndCheck(parent: File, target: File, live: String): Unit = {
    Stage.gcStagingDebris(parent, System.currentTimeMillis() + 60000)
    assert(readerView(target) === Right(live),
      "debris sweep touched the live commit")
  }

  private def freshParent(tag: String): File = {
    val p = new File(s"/tmp/graft_crashwalk_$tag")
    Stage.deleteRecursively(p)
    p.mkdirs()
    p
  }

  test("object-store publish/republish: every cut is never-torn, recoverable, sweepable") {
    Seq[FsOps](ObjectStoreFsOps, HadoopFsOps).foreach { impl =>
      FsOps.withFs(impl) {
        val parent = freshParent(impl.name)
        def target(n: String) = new File(parent, n)
        def ptr(t: File) = new File(parent, t.getName + ".ptr")

        // -- cut A: died mid-stage-write (data partial, no marker) --
        val a = target("a")
        mkTree(Stage.stagingDir(a, "build"), "a-partial", withMarker = false)
        assert(readerView(a) === Left("unpublished"))
        retryPublish(a, "a-v1")
        assert(readerView(a) === Right("payload-a-v1"))
        sweepAndCheck(parent, a, "payload-a-v1")

        // -- cut B: staged tree complete (marker written), died before
        //    the pointer put --
        val b = target("b")
        mkTree(Stage.stagingDir(b, "build"), "b-built")
        assert(readerView(b) === Left("unpublished"))
        retryPublish(b, "b-v1")
        assert(readerView(b) === Right("payload-b-v1"))
        sweepAndCheck(parent, b, "payload-b-v1")

        // -- cut C: died MID-pointer-put — the pointer object exists
        //    but is empty (torn commit record). Readers must see
        //    unpublished (never a garbage resolve), the torn record is
        //    cleared, and a retry commits fresh. --
        val c = target("c")
        mkTree(Stage.stagingDir(c, "build"), "c-built")
        write(ptr(c), "")
        assert(readerView(c) === Left("unpublished"),
          "torn pointer must read as unpublished, not resolve garbage")
        retryPublish(c, "c-v1")
        assert(readerView(c) === Right("payload-c-v1"))
        sweepAndCheck(parent, c, "payload-c-v1")

        // -- cut C': pointer names a tree that no longer exists (crash
        //    interleaved with an external sweep) --
        val c2 = target("c2")
        write(ptr(c2), "c2.build.deadbeef")
        assert(readerView(c2) === Left("unpublished"))
        retryPublish(c2, "c2-v1")
        assert(readerView(c2) === Right("payload-c2-v1"))

        // -- cut D: pointer committed to tree A, died before the
        //    losing racer's tree was retired --
        val d = target("d")
        retryPublish(d, "d-v1")
        val loser = mkTree(Stage.stagingDir(d, "build"), "d-loser")
        assert(readerView(d) === Right("payload-d-v1"))
        val names = Stage.gcStagingDebris(parent, System.currentTimeMillis() + 60000)
        assert(names.contains(loser.getName), "loser tree not swept")
        assert(readerView(d) === Right("payload-d-v1"))
        assert(!loser.exists(), "loser tree survived the sweep")

        // -- cut E: republish died after writing its stage-put record,
        //    before the pointer swap — old commit stays live --
        val e = target("e")
        retryPublish(e, "e-v1")
        write(new File(parent, e.getName + ".ptr.put.deadbeef"), "e.build.xyz")
        assert(readerView(e) === Right("payload-e-v1"),
          "stage-put debris must not affect the live resolve")
        sweepAndCheck(parent, e, "payload-e-v1")
        assert(!new File(parent, e.getName + ".ptr.put.deadbeef").exists())

        // -- cut F: the local-FS fallback window — republish deleted
        //    the pointer and died before the re-put. Reader sees
        //    unpublished (the documented non-atomic window of the
        //    local binding; real stores rename-over in one PUT) but
        //    NEVER a partial tree, and a retried republish commits. --
        val fT = target("f")
        retryPublish(fT, "f-v1")
        val oldPhys = Stage.resolved(fT)
        val fNew = mkTree(Stage.stagingDir(fT, "opt"), "f-v2")
        assert(ptr(fT).delete(), "setup: simulate the deleted pointer")
        assert(readerView(fT) === Left("unpublished"))
        Stage.republishDir(fNew, fT, Marker)
        assert(readerView(fT) === Right("payload-f-v2"))
        // the stranded v1 tree is unreferenced debris now
        Stage.gcStagingDebris(parent, System.currentTimeMillis() + 60000)
        assert(!oldPhys.exists(), "superseded tree not swept")
        assert(readerView(fT) === Right("payload-f-v2"))

        // -- cut G: republish swapped the pointer, died before
        //    retiring the superseded tree --
        val g = target("g")
        retryPublish(g, "g-v1")
        val gOld = Stage.resolved(g)
        val gNew = mkTree(Stage.stagingDir(g, "opt"), "g-v2")
        // pointer swap landed... (written through the Hadoop FS so the
        // checksummed binding sees a consistent crc — a raw overwrite
        // would SIMULATE a torn record instead of a landed swap)
        locally {
          val p = new org.apache.hadoop.fs.Path(ptr(g).getPath)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(p, false)
          val out = fs.create(p, true)
          try out.write(gNew.getName.getBytes("UTF-8")) finally out.close()
        }
        assert(readerView(g) === Right("payload-g-v2")) // ...old tree still on disk
        assert(gOld.exists())
        sweepAndCheck(parent, g, "payload-g-v2")
        assert(!gOld.exists(), "superseded tree not swept")

        Stage.deleteRecursively(parent)
      }
    }
  }

  test("torn-record repair is narrow: only a STILL-empty pointer is cleared; a completed racing commit survives") {
    Seq[FsOps](ObjectStoreFsOps, HadoopFsOps).foreach { impl =>
      FsOps.withFs(impl) {
        val parent = freshParent(s"tornguard_${impl.name}")
        def ptr(t: File) = new File(parent, t.getName + ".ptr")

        // (a) genuinely torn: a zero-length record → the published()
        // gate repairs it (reads unpublished AND deletes the record)
        val t1 = new File(parent, "t1")
        write(ptr(t1), "")
        assert(!Stage.published(t1, Marker))
        assert(!ptr(t1).exists(), "torn (empty) record must be cleared")

        // (b) the race ADVICE r12 flagged: a publisher completes its
        // pointer-put between a reader's failed resolve and the
        // repair. clearTornCommit re-checks emptiness at delete time,
        // so the now-valid record must survive verbatim.
        val t2 = new File(parent, "t2")
        mkTree(new File(parent, "t2.build.aaaaaaaa"), "t2-live")
        write(ptr(t2), "t2.build.aaaaaaaa")
        FsOps.current.clearTornCommit(
          new org.apache.hadoop.fs.Path(t2.getAbsolutePath))
        assert(ptr(t2).exists(), "non-empty commit record lost to repair")
        assert(readerView(t2) === Right("payload-t2-live"))

        Stage.deleteRecursively(parent)
      }
    }
  }

  test("POSIX publish/republish: rename cuts are never-torn, the pre_swap window heals") {
    assert(FsOps.current eq PosixFsOps)
    val parent = freshParent("posix")
    def target(n: String) = new File(parent, n)

    // -- cut P1: staged tree, died before the atomic rename --
    val p1 = target("p1")
    mkTree(Stage.stagingDir(p1, "build"), "p1-stranded")
    assert(readerView(p1) === Left("unpublished"))
    retryPublish(p1, "p1-v1")
    assert(readerView(p1) === Right("payload-p1-v1"))
    sweepAndCheck(parent, p1, "payload-p1-v1")

    // -- cut P2: republish died between its two renames — the live
    //    data exists ONLY in .pre_swap. Reader sees unpublished (the
    //    documented POSIX swap window); the retried republish must
    //    RESTORE pre_swap before staging out (the old code deleted it
    //    — destroying the only copy) and then land the new build. --
    val p2 = target("p2")
    retryPublish(p2, "p2-v1")
    assert(p2.renameTo(new File(p2.getPath + ".pre_swap")),
      "setup: simulate the crashed swap")
    assert(readerView(p2) === Left("unpublished"))
    val v2 = mkTree(Stage.stagingDir(p2, "opt"), "p2-v2")
    Stage.republishDir(v2, p2, Marker)
    assert(readerView(p2) === Right("payload-p2-v2"))
    assert(!new File(p2.getPath + ".pre_swap").exists(), "pre_swap not retired")

    // -- cut P2b: same crash state, but the NEXT writer is a plain
    //    rebuild (ensureArtifact shape) rather than a republish: the
    //    restored-or-rebuilt rule still ends committed --
    val p3 = target("p3")
    retryPublish(p3, "p3-v1")
    assert(p3.renameTo(new File(p3.getPath + ".pre_swap")))
    retryPublish(p3, "p3-v2")
    assert(readerView(p3) === Right("payload-p3-v2"))
    // the stranded pre_swap copy is retired by the next republish; a
    // later republish over the rebuilt artifact must not resurrect it
    val v3 = mkTree(Stage.stagingDir(p3, "opt"), "p3-v3")
    Stage.republishDir(v3, p3, Marker)
    assert(readerView(p3) === Right("payload-p3-v3"))
    assert(!new File(p3.getPath + ".pre_swap").exists())

    Stage.deleteRecursively(parent)
  }
}
