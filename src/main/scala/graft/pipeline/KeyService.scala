package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-key resolution.
  *
  * The reference calls an external key service per record with a
  * per-executor dict cache (reference: steps/dks.py:96-134 — HTTP decrypt
  * of `encryptedEncryptionKey`, cache keyed on the encrypted key). The
  * Spark-first re-expression exploits that distinct data keys are few
  * (hundreds, not billions): resolve the DISTINCT encrypted keys once on
  * the driver, then broadcast-join the tiny plaintext map onto the
  * stream. One bounded collect, zero per-record RPC, no mutable executor
  * state, and the join stays in whole-stage codegen.
  *
  * `resolve` is pluggable (the real deployment would call its KMS; tests
  * mirror the reference's "no datakey encryption" and "-decrypted" mocks,
  * steps/tests.py:64-76).
  */
final class KeyService(resolve: String => String) extends Serializable {

  /** Number of distinct keys resolved by the last resolveKeys call (spec
    * hook mirroring the reference's hit/miss accumulators).
    */
  @volatile var lastResolvedCount: Int = 0

  /** parsed envelope (column `key_enc`) → same rows + `data_key` column. */
  def withDataKeys(parsed: DataFrame): DataFrame = {
    val spark = parsed.sparkSession
    import spark.implicits._
    // bounded driver-side collect: distinct encrypted keys only
    val distinctKeys = parsed.select("key_enc").distinct()
      .as[String].collect().toSeq
    lastResolvedCount = distinctKeys.length
    // the reference's dks_miss accumulator (dks.py:96-116): each
    // distinct key is one real decrypt call; every other record is by
    // construction a cache hit of the broadcast map
    MetricsSink.global.counter("dks.decrypt_calls", distinctKeys.length)
    val keyMap = distinctKeys.map(k => k -> resolve(k)).toDF("key_enc", "data_key")
    parsed.join(broadcast(keyMap), Seq("key_enc"))
  }
}

object KeyService {
  /** The reference test fixture's "no datakey encryption" service:
    * decrypted key == encrypted key (steps/tests.py:64-76).
    */
  val identity: KeyService = new KeyService(k => k)

  /** HTTP resolver — the reference's key-service client re-expressed
    * over the JDK HttpClient (reference: steps/dks.py:34-96 — a
    * requests.Session with mounted retries and cert paths; TLS/cert
    * material is deploy-time client-builder config, not code). POSTs
    * the encrypted key to `<endpoint>/datakey/actions/decrypt` and
    * returns the plaintext body; non-200 and timeouts throw, so retry
    * policy composes via [[withRetry]] exactly like any resolver.
    *
    * Driver-side only by construction: resolution is the bounded
    * distinct-key pass in [[KeyService.withDataKeys]], so the client
    * never ships to executors and per-record RPC storms are
    * impossible regardless of data scale.
    */
  def http(endpoint: String, timeoutMs: Long = 2000,
      ssl: Option[javax.net.ssl.SSLContext] = None): String => String = {
    val builder = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    // mutual TLS: the reference mounts client cert + private key on its
    // requests.Session (dks.py:34-60 cert/verify paths); here the same
    // material arrives as an SSLContext whose KeyManager holds the
    // client identity and whose TrustManager pins the service CA. The
    // JDK client presents the cert during the handshake when the server
    // requests client auth — a wrong or missing cert fails the
    // HANDSHAKE (an IOException), so it retries/fails through the same
    // withRetry path as any transport error.
    ssl.foreach(builder.sslContext)
    val client = builder.build()
    key => {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$endpoint/datakey/actions/decrypt"))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/octet-stream")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(key))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new java.io.IOException(
          s"key service returned ${resp.statusCode()} for decrypt")
      resp.body()
    }
  }

  /** Build the mutual-TLS SSLContext from deployment cert material —
    * the reference's cert configuration (dks.py:34-60: client cert +
    * key and a CA bundle on the session) as PKCS12 stores: `keyStore`
    * holds THIS client's certificate + private key (presented to the
    * service), `trustStore` holds the service CA (what this client
    * accepts). Pure JDK — javax.net.ssl over java.security.KeyStore —
    * so the same helper serves any deployment that can mint PKCS12.
    */
  def mtlsContext(keyStorePath: String, keyStorePass: Array[Char],
      trustStorePath: String, trustStorePass: Array[Char]): javax.net.ssl.SSLContext = {
    def load(path: String, pass: Array[Char]): java.security.KeyStore = {
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
      try ks.load(in, pass) finally in.close()
      ks
    }
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(load(keyStorePath, keyStorePass), keyStorePass)
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(load(trustStorePath, trustStorePass))
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  /** A server SSLContext whose IDENTITY can be swapped under a live
    * listener — the certificate-rotation runbook case (reference:
    * bootstrap config_hcs.sh re-mints the HCS cert material; dks.py
    * just points at cert paths that ops rotate). The context's
    * KeyManager delegates through a volatile reference: calling the
    * returned rotate function with a new PKCS12 path (same store
    * password) makes every SUBSEQUENT handshake present the new leaf
    * — no listener restart, no dropped service. Clients anchored on
    * the issuing CA keep working across the swap; clients that pinned
    * the old LEAF fail their next handshake, which is exactly the
    * operational signal that a pin (not a CA anchor) is in use.
    */
  def rotatableServerContext(keyStorePath: String, pass: Array[Char])
      : (javax.net.ssl.SSLContext, String => Unit) = {
    import javax.net.ssl.{SSLEngine, X509ExtendedKeyManager}
    def kmOf(path: String): X509ExtendedKeyManager = {
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
      try ks.load(in, pass) finally in.close()
      val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
        javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, pass)
      kmf.getKeyManagers.collectFirst { case m: X509ExtendedKeyManager => m }
        .getOrElse(throw new IllegalStateException(s"no key manager in $path"))
    }
    // GENERATION-QUALIFIED aliases: a handshake in flight when rotate()
    // lands must complete against the keystore that CHOSE its alias —
    // choose* returns "g<N>:<alias>" and the key/chain lookups route
    // through generation N, so the delegate swap can never mix one
    // store's alias with another store's keys (the race that would
    // abort a handshake mid-rotation). The previous generation is kept
    // alive for exactly that window; older ones are dropped.
    object rotatable extends X509ExtendedKeyManager {
      @volatile private var gens: List[(Int, X509ExtendedKeyManager)] =
        List((0, kmOf(keyStorePath)))
      def rotateTo(path: String): Unit = synchronized {
        val next = gens.head._1 + 1
        gens = ((next, kmOf(path)) :: gens).take(2)
      }
      private def cur = gens.head
      private def qualify(gen: Int, alias: String): String =
        if (alias == null) null else s"g$gen:$alias"
      private def route(q: String): (X509ExtendedKeyManager, String) = {
        val i = q.indexOf(':')
        val gen = q.take(i).stripPrefix("g").toInt
        val km = gens.find(_._1 == gen).map(_._2).getOrElse(cur._2)
        (km, q.drop(i + 1))
      }
      override def getClientAliases(k: String, i: Array[java.security.Principal]) =
        cur._2.getClientAliases(k, i)
      override def chooseClientAlias(k: Array[String],
          i: Array[java.security.Principal], s: java.net.Socket) = {
        val (g, km) = cur; qualify(g, km.chooseClientAlias(k, i, s))
      }
      override def getServerAliases(k: String, i: Array[java.security.Principal]) =
        cur._2.getServerAliases(k, i)
      override def chooseServerAlias(k: String,
          i: Array[java.security.Principal], s: java.net.Socket) = {
        val (g, km) = cur; qualify(g, km.chooseServerAlias(k, i, s))
      }
      override def getCertificateChain(a: String) = {
        val (km, alias) = route(a); km.getCertificateChain(alias)
      }
      override def getPrivateKey(a: String) = {
        val (km, alias) = route(a); km.getPrivateKey(alias)
      }
      override def chooseEngineClientAlias(k: Array[String],
          i: Array[java.security.Principal], e: SSLEngine) = {
        val (g, km) = cur; qualify(g, km.chooseEngineClientAlias(k, i, e))
      }
      override def chooseEngineServerAlias(k: String,
          i: Array[java.security.Principal], e: SSLEngine) = {
        val (g, km) = cur; qualify(g, km.chooseEngineServerAlias(k, i, e))
      }
    }
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(Array(rotatable), null, null)
    (ctx, path => rotatable.rotateTo(path))
  }

  /** Retry wrapper for the resolver — the reference's RetryConfig
    * (dks.py:23-40: bounded retries with backoff on the DKS call).
    * Because resolution is a bounded driver-side pass over DISTINCT
    * keys, retrying is per-key and cheap — no per-record retry storms.
    */
  def withRetry(maxRetries: Int, backoffMs: Long = 50)(resolve: String => String): String => String =
    key => {
      var attempt = 0
      var result: Option[String] = None
      var last: Throwable = null
      while (result.isEmpty && attempt <= maxRetries) {
        try result = Some(resolve(key))
        catch {
          case e: Throwable =>
            last = e
            attempt += 1
            if (attempt <= maxRetries) Thread.sleep(backoffMs * attempt)
        }
      }
      result.getOrElse(throw new RuntimeException(
        s"key resolution failed after ${maxRetries + 1} attempts", last))
    }
}
