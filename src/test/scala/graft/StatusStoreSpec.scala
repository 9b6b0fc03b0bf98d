package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.pipeline.{FileStatusStore, HttpStatusStore, InMemoryStatusStore, Runner, StatusStore}

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

  /** Loopback conditional-put KV service — the server half of
    * [[HttpStatusStore]]'s DynamoDB-shaped contract. The condition is
    * adjudicated HERE, atomically under the rows monitor (DynamoDB's
    * server-side ConditionExpression), so racing clients on separate
    * connections serialize exactly as racing drivers on one table.
    */
  private def withStatusServer(body: String => Unit): Unit = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val server =
      try HttpServer.create(new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, 0), 0)
      catch {
        case e: java.io.IOException =>
          cancel(s"loopback bind unavailable: ${e.getMessage}")
      }
    // (cid, product) -> (status, exportDate, extras)
    val rows = scala.collection.mutable.Map.empty[(String, String),
      (String, String, Map[String, String])]
    def respond(ex: HttpExchange, code: Int, bodyStr: String): Unit = {
      val bytes = bodyStr.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) {
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }
    def rowJson(r: (String, String, Map[String, String])): String = {
      val n = om.createObjectNode()
      n.put("status", r._1); n.put("exportDate", r._2)
      val e = n.putObject("extra")
      r._3.foreach { case (k, v) => e.put(k, v) }
      om.writeValueAsString(n)
    }
    server.createContext("/status/", (ex: HttpExchange) => {
      try {
        val parts = ex.getRequestURI.getPath.stripPrefix("/status/").split("/")
        val key = (java.net.URLDecoder.decode(parts(0), "UTF-8"),
          java.net.URLDecoder.decode(parts(1), "UTF-8"))
        ex.getRequestMethod match {
          case "GET" => rows.synchronized(rows.get(key)) match {
            case Some(r) => respond(ex, 200, rowJson(r))
            case None => respond(ex, 404, "")
          }
          case "POST" =>
            val b = om.readTree(ex.getRequestBody.readAllBytes())
            val conditional = b.get("conditional").asBoolean()
            val expected = Option(b.get("expected"))
              .filter(!_.isNull).map(_.asText())
            val status = b.get("status").asText()
            val exportDate = b.get("exportDate").asText()
            var extra = Map.empty[String, String]
            b.get("extra").properties().forEach(kv =>
              extra += kv.getKey -> kv.getValue.asText())
            // the atomic server-side adjudication — condition check and
            // write are ONE critical section, nothing between them
            val landed = rows.synchronized {
              val cur = rows.get(key)
              if (conditional && cur.map(_._1) != expected) false
              else {
                rows(key) = cur match {
                  case Some((_, ed, ex0)) => (status, ed, ex0 ++ extra)
                  case None => (status, exportDate, extra)
                }
                true
              }
            }
            respond(ex, if (landed) 200 else 412, "")
          case _ => respond(ex, 405, "")
        }
      } finally ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
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

  test("CAS contract over REAL HTTP: 16 racing clients, one winner, server adjudicates") {
    withStatusServer { base =>
      // sixteen independent clients (sixteen drivers, separate
      // connections) racing the same None→IN_PROGRESS entry — the
      // service's atomic conditional put must admit exactly one
      val clients = Seq.fill(16)(new HttpStatusStore(base))
      assert(raceEntry(clients, "c1", "CDI-db:coll") === 1)
      assert(clients.head.getStatus("c1", "CDI-db:coll") === Some(StatusStore.InProgress))
      // and the full contract-harness leg the other impls run
      val st = new HttpStatusStore(base)
      assert(!st.compareAndSetStatus("c", "p", Some(StatusStore.Completed),
        StatusStore.InProgress, "2021-06-15"))
      assert(st.getStatus("c", "p") === None)
      assert(st.compareAndSetStatus("c", "p", None, StatusStore.InProgress, "2021-06-15"))
      assert(!st.compareAndSetStatus("c", "p", None, StatusStore.InProgress, "2021-06-15"))
      assert(st.compareAndSetStatus("c", "p", Some(StatusStore.InProgress),
        StatusStore.Completed, "2021-06-15", Map("S3_Prefix_CDI_Export" -> "/x")))
      assert(st.getStatus("c", "p") === Some(StatusStore.Completed))
      assert(st.getExtras("c", "p") === Map("S3_Prefix_CDI_Export" -> "/x"))
    }
  }

  test("HttpStatusStore: the Runner's double-enter guard holds across the service") {
    withStatusServer { base =>
      val store = new HttpStatusStore(base)
      store.updateStatus("local", "CDI-db:coll", StatusStore.InProgress, "2021-06-15")
      val e = intercept[IllegalStateException] {
        new Runner(spark, store).runRange("/nonexistent", "2021-06-15", "2021-06-15",
          "db", "coll", "/tmp/never_written_http")
      }
      assert(e.getMessage.contains("refusing to double-enter"))
      assert(store.getStatus("local", "CDI-db:coll") === Some(StatusStore.InProgress))
      assert(!new java.io.File("/tmp/never_written_http").exists())
    }
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
