package graft

import java.net.{InetAddress, InetSocketAddress}
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.pipeline.KeyService

/** KeyService over REAL HTTP against an in-process localhost stub —
  * the reference's key-service contract (steps/dks.py:34-96: a session
  * with mounted retries calling the decrypt endpoint) exercised
  * end-to-end: happy path, transient-5xx retry, timeout retry, and
  * eventual failure, with the broadcast-distinct resolution contract
  * (one HTTP call per DISTINCT encrypted key, never per record)
  * asserted against the stub's own request counter.
  *
  * The stub binds an ephemeral loopback port (zero egress; JDK
  * HttpServer, no dependencies). If the sandbox forbids even loopback
  * binds, the suite cancels rather than fails — the spec is opt-in on
  * environment capability.
  */
class KeyServiceHttpSpec extends SparkSpec {

  /** One stub server per behavior; returns (endpoint, requestCounter). */
  private def withStub(behavior: (HttpExchange, Int) => Unit)(
      body: (String, AtomicInteger) => Unit): Unit = {
    val server =
      try HttpServer.create(
        new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
      catch {
        case e: java.io.IOException =>
          cancel(s"loopback bind unavailable in this sandbox: ${e.getMessage}")
      }
    val hits = new AtomicInteger(0)
    server.createContext("/datakey/actions/decrypt", (ex: HttpExchange) => {
      val n = hits.incrementAndGet()
      try behavior(ex, n) finally ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, bodyStr: String): Unit = {
    val bytes = bodyStr.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }

  private def readKey(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  test("happy path: withDataKeys resolves over real HTTP, one call per DISTINCT key") {
    withStub((ex, _) => respond(ex, 200, readKey(ex).reverse)) { (endpoint, hits) =>
      import spark.implicits._
      val svc = new KeyService(KeyService.http(endpoint))
      // 300 records over 3 distinct envelope keys — the distinct pass
      // must hit the service exactly 3 times, never 300
      val parsed = (1 to 300)
        .map(i => (s"rec$i", s"ek${i % 3}"))
        .toDF("payload", "key_enc")
      val out = svc.withDataKeys(parsed).collect()
      assert(out.length === 300)
      out.foreach { r =>
        val ek = r.getAs[String]("key_enc")
        assert(r.getAs[String]("data_key") === ek.reverse,
          "plaintext must be the stub's decrypt of THIS record's key")
      }
      assert(svc.lastResolvedCount === 3)
      assert(hits.get() === 3,
        s"broadcast-distinct contract violated: ${hits.get()} HTTP calls for 3 distinct keys")
    }
  }

  test("transient 5xx: withRetry resolves after the outage, attempts visible at the stub") {
    // first two attempts per key fail with 503 (the reference's retried
    // status set), the third succeeds
    val perKey = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    withStub { (ex, _) =>
      val key = readKey(ex)
      val n = perKey.computeIfAbsent(key, _ => new AtomicInteger(0)).incrementAndGet()
      if (n <= 2) respond(ex, 503, "") else respond(ex, 200, key.toUpperCase)
    } { (endpoint, hits) =>
      val resolve = KeyService.withRetry(maxRetries = 3, backoffMs = 1)(
        KeyService.http(endpoint))
      assert(resolve("abc") === "ABC")
      assert(perKey.get("abc").get() === 3, "two 503s then the success")
      assert(hits.get() === 3)
    }
  }

  test("timeout: a hung service trips the client timeout and is retried") {
    withStub { (ex, n) =>
      if (n == 1) { Thread.sleep(1500); respond(ex, 200, "too-late") }
      else respond(ex, 200, readKey(ex) + "-decrypted")
    } { (endpoint, hits) =>
      val resolve = KeyService.withRetry(maxRetries = 2, backoffMs = 1)(
        KeyService.http(endpoint, timeoutMs = 200))
      // the reference's "-decrypted" mock shape (steps/tests.py:64-76)
      assert(resolve("k1") === "k1-decrypted")
      assert(hits.get() >= 2, "first attempt must have timed out and retried")
    }
  }

  test("eventual failure: a dead service exhausts retries with a diagnosable error") {
    withStub((ex, _) => respond(ex, 503, "")) { (endpoint, hits) =>
      val resolve = KeyService.withRetry(maxRetries = 2, backoffMs = 1)(
        KeyService.http(endpoint))
      val e = intercept[RuntimeException](resolve("k9"))
      assert(e.getMessage.contains("after 3 attempts"))
      assert(e.getCause.isInstanceOf[java.io.IOException])
      assert(hits.get() === 3, "maxRetries=2 means exactly 3 attempts")
    }
  }
}
