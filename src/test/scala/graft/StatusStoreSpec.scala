package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.pipeline.{FileStatusStore, InMemoryStatusStore, Runner, StatusStore}

/** The StatusStore conditional-write guard — the reference's DynamoDB
  * conditional put (dynamodb.py:42-60: a second driver must not flip a
  * row it does not own) as a compare-and-set contract on the trait,
  * proven under concurrent updaters for both the in-memory impl and
  * the file-backed one (two stores on one directory = two drivers on
  * one status table), plus the driver loop refusing to double-enter a
  * collection that is IN_PROGRESS under another driver.
  */
class StatusStoreSpec extends SparkSpec {

  private def freshDir(tag: String): java.io.File = {
    val d = new java.io.File(s"/tmp/graft_statusstore_$tag")
    Stage.deleteRecursively(d)
    d
  }

  /** Race `n` concurrent entry attempts; return how many CAS wins. */
  private def raceEntry(stores: Seq[StatusStore], corr: String, product: String): Int = {
    val n = stores.length
    val pool = Executors.newFixedThreadPool(n)
    val gate = new CountDownLatch(1)
    try {
      val futures = stores.map { st =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            st.compareAndSetStatus(corr, product, None,
              StatusStore.InProgress, "2021-06-15")
          }
        })
      }
      gate.countDown()
      futures.count(_.get(30, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("CAS contract: N racing None→IN_PROGRESS entries produce exactly one winner (both impls)") {
    val mem = new InMemoryStatusStore
    assert(raceEntry(Seq.fill(16)(mem), "c1", "CDI-db:coll") === 1)

    // file-backed: SIXTEEN SEPARATE STORE INSTANCES on one directory —
    // the two-drivers shape (in-JVM the companion monitor serializes,
    // across JVMs the OS file lock does; both paths funnel every
    // mutation through the same read-adjudicate-write critical section)
    val dir = freshDir("race")
    val stores = Seq.fill(16)(new FileStatusStore(dir))
    assert(raceEntry(stores, "c1", "CDI-db:coll") === 1)
    assert(stores.head.getStatus("c1", "CDI-db:coll") === Some(StatusStore.InProgress))
    Stage.deleteRecursively(dir)
  }

  test("CAS mismatch leaves the row untouched; matched transition lands and merges extras") {
    Seq[StatusStore](new InMemoryStatusStore,
        new FileStatusStore(freshDir("cas"))).foreach { st =>
      // wrong expectation on a missing row
      assert(!st.compareAndSetStatus("c", "p", Some(StatusStore.Completed),
        StatusStore.InProgress, "2021-06-15"))
      assert(st.getStatus("c", "p") === None)
      // entry, then a stale CAS (still expecting None) must lose
      assert(st.compareAndSetStatus("c", "p", None, StatusStore.InProgress, "2021-06-15"))
      assert(!st.compareAndSetStatus("c", "p", None, StatusStore.InProgress, "2021-06-15"))
      assert(st.getStatus("c", "p") === Some(StatusStore.InProgress))
      // matched transition with extras merge
      assert(st.compareAndSetStatus("c", "p", Some(StatusStore.InProgress),
        StatusStore.Completed, "2021-06-15", Map("S3_Prefix_CDI_Export" -> "/x")))
      assert(st.getStatus("c", "p") === Some(StatusStore.Completed))
      assert(st.getExtras("c", "p") === Map("S3_Prefix_CDI_Export" -> "/x"))
    }
  }

  test("FileStatusStore: rows and extras survive a driver restart (new instance, same dir)") {
    val dir = freshDir("restart")
    val a = new FileStatusStore(dir)
    a.updateStatus("c", "CDI-db:coll", StatusStore.Completed, "2021-06-15",
      Map("CDI_Export_Date" -> "2021-06-15"))
    a.updateStatus("c", "CDI-db:coll", StatusStore.Completed, "2021-06-15",
      Map("S3_Prefix_CDI_Export" -> "/exports/x"))
    val b = new FileStatusStore(dir)
    assert(b.getStatus("c", "CDI-db:coll") === Some(StatusStore.Completed))
    assert(b.getExtras("c", "CDI-db:coll") ===
      Map("CDI_Export_Date" -> "2021-06-15", "S3_Prefix_CDI_Export" -> "/exports/x"))
    Stage.deleteRecursively(dir)
  }

  test("runRange refuses to double-enter a collection another driver holds IN_PROGRESS") {
    val store = new InMemoryStatusStore
    store.updateStatus("local", "CDI-db:coll", StatusStore.InProgress, "2021-06-15")
    val e = intercept[IllegalStateException] {
      new Runner(spark, store).runRange("/nonexistent", "2021-06-15", "2021-06-15",
        "db", "coll", "/tmp/never_written")
    }
    assert(e.getMessage.contains("refusing to double-enter"))
    // the loser wrote NOTHING: status untouched, no output tree
    assert(store.getStatus("local", "CDI-db:coll") === Some(StatusStore.InProgress))
    assert(store.history.count(_._3 == StatusStore.Failed) === 0)
    assert(!new java.io.File("/tmp/never_written").exists())
  }

  test("runRange re-enters COMPLETED and FAILED rows (rerun semantics preserved)") {
    // a prior COMPLETED run must not block a rerun — only a LIVE
    // IN_PROGRESS does
    val store = new InMemoryStatusStore
    store.updateStatus("local", "CDI-db:coll", StatusStore.Completed, "2021-06-14")
    val e = intercept[Exception] {
      // missing source data: the run ENTERS (flips to IN_PROGRESS),
      // then fails on the read and marks FAILED — proving entry was
      // granted for a COMPLETED row
      new Runner(spark, store).runRange("/nonexistent", "2021-06-15", "2021-06-15",
        "db", "coll", "/tmp/never_written2")
    }
    assert(!e.isInstanceOf[IllegalStateException] ||
      !e.getMessage.contains("refusing to double-enter"))
    assert(store.getStatus("local", "CDI-db:coll") === Some(StatusStore.Failed))
  }
}
