package graft.fs

import java.io.{File, IOException}
import java.net.{InetAddress, InetSocketAddress}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** An S3-protocol OBJECT-STORE GATEWAY over real HTTP — the sandbox's
  * closest honest stand-in for the s3a:// binding the reference
  * deploys against (corporate_bucket.tf / processed_bucket.tf;
  * ingesters.py:468-487 reads s3:// prefixes). No hadoop-aws or AWS
  * SDK jar exists in this environment, so instead of linking a
  * connector the repo implements BOTH halves of the wire contract:
  *
  *  - [[S3GatewayServer]]: a loopback HTTP server speaking the S3 REST
  *    verbs the seam's protocol rides — GET (with RFC-7233 Range),
  *    HEAD, DELETE, conditional PUT (`If-None-Match: *` adjudicated
  *    ATOMICALLY server-side via link(2), exactly S3's 2024
  *    conditional-put), server-side COPY (`x-amz-copy-source`),
  *    ListObjectsV2 (prefix + delimiter → Contents/CommonPrefixes,
  *    implicit directories only — an empty prefix does not exist,
  *    S3-true), and multipart upload (initiate / UploadPart /
  *    CompleteMultipartUpload / abort). The object namespace is the
  *    local filesystem (key = absolute path), so Spark's own data IO
  *    and the gateway see one consistent store — the same layering a
  *    MinIO-on-local-disk deployment has.
  *
  *  - [[GraftS3FileSystem]]: a Hadoop `FileSystem` CLIENT over that
  *    wire — every seam verb becomes a real network round trip:
  *    `create(overwrite=false)` is a conditional PUT (412 ⇒
  *    FileAlreadyExists), `open` reads through ranged GETs, `rename`
  *    is per-object COPY+DELETE (the real store's non-atomic prefix
  *    "rename" — the exact hazard [[FsOps]]'s pointer-commit protocol
  *    exists to avoid), uploads ≥ the part threshold go multipart.
  *
  * [[S3GatewayFsOps]] binds the object-store protocol over this
  * client (`SPARK_GRAFT_FS=s3gw`), upgrading `carryFile` to a
  * server-side COPY.
  *
  * Round 15: the gateway now speaks production S3's AUTH surface too —
  * HTTPS (a keytool-minted per-JVM server identity; clients trust it
  * via [[S3Gateway.clientSslContext]]) and AWS SigV4 verification on
  * EVERY request ([[SigV4]]): bad signature → 403
  * SignatureDoesNotMatch, > 15-min clock skew → 403
  * RequestTimeTooSkewed, missing auth → 403 AccessDenied — the
  * failure modes of expired credentials mid-job, surfaced through the
  * same FileSystem IOException path any s3a deployment sees. What
  * this still does NOT exercise vs production S3: IAM policy
  * evaluation, cross-region latency, and eventual-consistency windows
  * older than list-after-write (modern S3 is strongly consistent,
  * which the gateway matches). If keytool is unavailable the gateway
  * falls back to plaintext HTTP (signing still enforced).
  */
object S3Gateway {
  /** Ops counters for specs (per-verb totals since JVM start). */
  val ops = new ConcurrentHashMap[String, AtomicLong]()
  private def bump(verb: String): Unit =
    ops.computeIfAbsent(verb, _ => new AtomicLong()).incrementAndGet()
  def opCount(verb: String): Long =
    Option(ops.get(verb)).map(_.get()).getOrElse(0L)

  @volatile private var server: HttpServer = null
  @volatile private var port: Int = -1
  @volatile private var scheme: String = "http"
  @volatile private var clientCtx: Option[javax.net.ssl.SSLContext] = None

  /** The trust context a client needs to speak TLS to this JVM's
    * gateway (None when the gateway fell back to plaintext).
    */
  def clientSslContext: Option[javax.net.ssl.SSLContext] = clientCtx

  /** Mint a per-JVM server identity with keytool (SAN=ip:127.0.0.1 so
    * JDK hostname verification passes against loopback) and build the
    * (server, client-trust) SSLContext pair. None when keytool is
    * absent — the caller falls back to plaintext HTTP.
    */
  private def mintTls(): Option[(javax.net.ssl.SSLContext, javax.net.ssl.SSLContext)] =
    {
      val keytool = new File(new File(sys.props("java.home"), "bin"), "keytool")
      if (!keytool.isFile) return None
      val dir = Files.createTempDirectory("graft_s3gw_tls").toFile
      def scrub(): Unit = {
        Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
        dir.delete(); ()
      }
      try {
      val pass = "changeit"
      def run(args: String*): Unit = {
        val cmd = new java.util.ArrayList[String]()
        cmd.add(keytool.getPath)
        args.foreach(cmd.add)
        val p = new ProcessBuilder(cmd).redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        if (p.waitFor() != 0) throw new IOException(s"keytool: $out")
      }
      run("-genkeypair", "-alias", "s3gw", "-keyalg", "RSA", "-keysize", "2048",
        "-dname", "CN=s3gw", "-validity", "1", "-ext", "SAN=ip:127.0.0.1",
        "-storetype", "PKCS12", "-keystore", s"$dir/server.p12", "-storepass", pass)
      run("-exportcert", "-alias", "s3gw", "-keystore", s"$dir/server.p12",
        "-storepass", pass, "-file", s"$dir/server.cer")
      run("-importcert", "-noprompt", "-alias", "s3gw",
        "-file", s"$dir/server.cer", "-storetype", "PKCS12",
        "-keystore", s"$dir/trust.p12", "-storepass", pass)
      def load(path: String): java.security.KeyStore = {
        val ks = java.security.KeyStore.getInstance("PKCS12")
        val in = Files.newInputStream(Paths.get(path))
        try ks.load(in, pass.toCharArray) finally in.close()
        ks
      }
      val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
        javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(load(s"$dir/server.p12"), pass.toCharArray)
      val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
      serverCtx.init(kmf.getKeyManagers, null, null)
      val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(load(s"$dir/trust.p12"))
      val trustCtx = javax.net.ssl.SSLContext.getInstance("TLS")
      trustCtx.init(null, tmf.getTrustManagers, null)
      Some((serverCtx, trustCtx))
      } catch { case _: Exception => None }
      // the key material lives in the initialized contexts (or minting
      // failed) — the on-disk PKCS12 (a PRIVATE KEY under a fixed
      // password) must never accumulate in /tmp across JVMs
      finally scrub()
    }

  /** Start (once per JVM) and return the endpoint. */
  def ensureStarted(): String = synchronized {
    if (server == null) {
      val addr = new InetSocketAddress(InetAddress.getLoopbackAddress, 0)
      val s = mintTls() match {
        case Some((serverCtx, trustCtx)) =>
          val hs = com.sun.net.httpserver.HttpsServer.create(addr, 0)
          hs.setHttpsConfigurator(
            new com.sun.net.httpserver.HttpsConfigurator(serverCtx))
          scheme = "https"
          clientCtx = Some(trustCtx)
          hs
        case None =>
          scheme = "http"
          HttpServer.create(addr, 0)
      }
      s.createContext("/", (ex: HttpExchange) => {
        try authThenHandle(ex)
        catch {
          case e: Throwable =>
            try respond(ex, 500, e.toString.getBytes("UTF-8"))
            catch { case _: IOException => () }
        } finally ex.close()
      })
      // daemon threads: the gateway must never keep a finished JVM
      // alive (Verify hung after completing its dump without this)
      s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16,
        (r: Runnable) => {
          val t = new Thread(r, "s3gw-worker")
          t.setDaemon(true)
          t
        }))
      // start() from a daemon thread: HttpServer's internal
      // HTTP-Dispatcher thread inherits daemon status from its creator,
      // and a NON-daemon dispatcher keeps a finished JVM alive forever
      // (measured: Verify completed its dump, then hung at
      // DestroyJavaVM behind the dispatcher)
      val starter = new Thread(() => s.start(), "s3gw-starter")
      starter.setDaemon(true)
      starter.start()
      starter.join()
      server = s
      port = s.getAddress.getPort
    }
    s"$scheme://127.0.0.1:$port"
  }

  /** SigV4 gate in front of every verb — the production auth surface:
    * a request that is unsigned, mis-signed, from an unknown access
    * key, or clock-skewed past 15 minutes never reaches a handler.
    */
  private def authThenHandle(ex: HttpExchange): Unit =
    SigV4.verify(ex.getRequestMethod, ex.getRequestURI.getRawPath,
      ex.getRequestURI.getRawQuery,
      n => Option(ex.getRequestHeaders.getFirst(n)),
      headerNames = {
        import scala.jdk.CollectionConverters._
        ex.getRequestHeaders.keySet().asScala
      }) match {
      case Left((code, detail)) =>
        bump("auth_fail")
        respond(ex, 403,
          (s"""<?xml version="1.0"?><Error><Code>$code</Code>""" +
            s"<Message>${xmlEscape(detail)}</Message></Error>").getBytes("UTF-8"),
          Map("Content-Type" -> "application/xml"))
      case Right(_) =>
        handle(ex)
    }

  private val uploadsRoot = new File("/tmp/.s3gw_uploads")

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    }
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq).getOrElse(Seq.empty)
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (java.net.URLDecoder.decode(kv, "UTF-8"), "")
        else (java.net.URLDecoder.decode(kv.take(i), "UTF-8"),
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8"))
      }.toMap

  /** Write request body to a temp sibling of `target` (same dir ⇒
    * same filesystem ⇒ atomic move/link possible).
    */
  private def bodyToTemp(ex: HttpExchange, target: File): File = {
    target.getParentFile.mkdirs()
    val tmp = new File(target.getParentFile,
      "." + target.getName + ".s3gwput." + java.util.UUID.randomUUID.toString.take(8))
    val in = ex.getRequestBody
    // delete the temp if the body copy dies mid-stream (client gone,
    // disk full) — a failed upload must never leak a visible object
    try Files.copy(in, tmp.toPath)
    catch { case e: Throwable => Files.deleteIfExists(tmp.toPath); throw e }
    tmp
  }

  /** Body-integrity gate (round 16): when the SIGNED
    * x-amz-content-sha256 header carries a concrete hash (the client
    * signs sha256(body) for every upload — bodies are disk-buffered
    * anyway), re-compute it over the bytes actually received; a
    * mismatch deletes the spooled temp and answers S3's
    * 400 XAmzContentSHA256Mismatch. UNSIGNED-PAYLOAD (integrity
    * delegated to TLS) skips the check. Returns true when the
    * request may proceed.
    */
  private def payloadHashOk(ex: HttpExchange, tmp: File): Boolean = {
    val claimed = Option(ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
      .map(_.toLowerCase)
      .filter(h => h.length == 64 && h.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
    claimed match {
      case Some(h) if SigV4.sha256HexOfFile(tmp) != h =>
        Files.deleteIfExists(tmp.toPath)
        bump("payload_mismatch")
        respond(ex, 400,
          ("""<?xml version="1.0"?><Error><Code>XAmzContentSHA256Mismatch</Code>""" +
            "<Message>The provided x-amz-content-sha256 does not match what was computed</Message></Error>")
            .getBytes("UTF-8"),
          Map("Content-Type" -> "application/xml"))
        false
      case _ => true
    }
  }

  /** Temp names are ".<target>.s3gw{put,copy,mpu}.<uuid>" — match the
    * infix, not a prefix, so in-flight (or crash-leaked) temporaries
    * stay invisible to LIST whatever the target was named.
    */
  private def isGatewayTemp(name: String): Boolean =
    name.startsWith(".") && (name.contains(".s3gwput.") ||
      name.contains(".s3gwcopy.") || name.contains(".s3gwmpu."))

  /** Recursive file walk for LIST — implicit-directory semantics: only
    * real FILES are objects; a "directory" exists iff some object key
    * extends it. The gateway's own temporaries are invisible.
    */
  private def walkFiles(dir: File): Seq[File] = {
    if (!dir.isDirectory) return Seq.empty
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      if (f.getName.startsWith(".s3gw") || isGatewayTemp(f.getName)) Seq.empty
      else if (f.isDirectory) walkFiles(f)
      else Seq(f)
    }
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def handle(ex: HttpExchange): Unit = {
    val key = java.net.URLDecoder.decode(ex.getRequestURI.getRawPath, "UTF-8")
    require(!key.contains(".."), "path traversal")
    val q = query(ex)
    val target = new File(key)
    (ex.getRequestMethod, key) match {
      case ("GET", "/") if q.get("list-type").contains("2") =>
        bump("list")
        val prefix = q.getOrElse("prefix", "/")
        val delimited = q.get("delimiter").contains("/")
        // PAGINATION (S3-true): results are lexicographic, capped at
        // max-keys (default 1000, keys + common prefixes combined);
        // a truncated page carries IsTruncated + NextContinuationToken
        // (opaque base64 of the last emitted sort key) and the client
        // MUST loop — the wire behavior every 1000+-object prefix
        // exercises in production. start-after is honored too.
        val maxKeys = q.get("max-keys").flatMap(_.toIntOption)
          .getOrElse(1000).max(1)
        val after = q.get("continuation-token")
          .map(t => new String(java.util.Base64.getDecoder.decode(t), "UTF-8"))
          .orElse(q.get("start-after")).getOrElse("")
        // deepest directory at or above the prefix
        val scanRoot =
          if (prefix.endsWith("/")) new File(prefix)
          else new File(prefix).getParentFile
        val files = walkFiles(scanRoot).filter(_.getPath.startsWith(prefix))
        val (contents, prefixes) =
          if (!delimited) (files, Seq.empty[String])
          else {
            val base = if (prefix.endsWith("/")) prefix else prefix
            val (direct, nested) = files.partition(
              f => !f.getPath.drop(base.length).contains('/'))
            val ps = nested.map(f =>
              base + f.getPath.drop(base.length).takeWhile(_ != '/') + "/")
              .distinct.sorted
            (direct, ps)
          }
        // one lexicographic stream of (sortKey, entry), paged together
        // the way S3 counts keys and prefixes against max-keys
        val entries: Seq[(String, Either[File, String])] =
          (contents.map(f => (f.getPath, Left(f): Either[File, String])) ++
            prefixes.map(p => (p, Right(p): Either[File, String])))
            .sortBy(_._1).filter(_._1 > after)
        val page = entries.take(maxKeys)
        val truncated = entries.size > maxKeys
        val xml = new StringBuilder("<?xml version=\"1.0\"?><ListBucketResult>")
        page.foreach {
          case (_, Left(f)) =>
            xml.append("<Contents><Key>").append(xmlEscape(f.getPath))
              .append("</Key><Size>").append(f.length())
              .append("</Size><LastModified>")
              .append(java.time.Instant.ofEpochMilli(f.lastModified()).toString)
              .append("</LastModified></Contents>")
          case (_, Right(p)) =>
            xml.append("<CommonPrefixes><Prefix>")
              .append(xmlEscape(p)).append("</Prefix></CommonPrefixes>")
        }
        xml.append("<IsTruncated>").append(truncated).append("</IsTruncated>")
        if (truncated)
          xml.append("<NextContinuationToken>")
            .append(java.util.Base64.getEncoder.encodeToString(
              page.last._1.getBytes("UTF-8")))
            .append("</NextContinuationToken>")
        xml.append("</ListBucketResult>")
        respond(ex, 200, xml.toString.getBytes("UTF-8"),
          Map("Content-Type" -> "application/xml"))

      case ("GET", _) =>
        bump("get")
        if (!target.isFile) { respond(ex, 404, Array.empty); return }
        val len = target.length()
        Option(ex.getRequestHeaders.getFirst("Range")) match {
          case Some(r) if r.startsWith("bytes=") =>
            val spec = r.stripPrefix("bytes=")
            val dash = spec.indexOf('-')
            // RFC-7233 forms: "from-", "from-to", and the suffix
            // "-N" (last N bytes) — a malformed spec is 416, not a 500
            val (from, to) =
              try {
                if (dash == 0) {
                  val n = spec.drop(1).toLong
                  if (n <= 0) { respond(ex, 416, Array.empty); return }
                  (math.max(0L, len - n), len - 1)
                } else {
                  val f = spec.take(dash).toLong
                  (f, if (dash == spec.length - 1) len - 1
                  else math.min(spec.drop(dash + 1).toLong, len - 1))
                }
              } catch { case _: NumberFormatException =>
                respond(ex, 416, Array.empty); return
              }
            if (from >= len || from > to) { respond(ex, 416, Array.empty); return }
            val n = (to - from + 1).toInt
            val buf = new Array[Byte](n)
            val ch = java.nio.channels.FileChannel.open(target.toPath,
              java.nio.file.StandardOpenOption.READ)
            try {
              val bb = java.nio.ByteBuffer.wrap(buf)
              var pos = from
              while (bb.hasRemaining) {
                val r2 = ch.read(bb, pos)
                if (r2 < 0) throw new IOException(s"EOF at $pos reading $key")
                pos += r2
              }
            } finally ch.close()
            respond(ex, 206, buf,
              Map("Content-Range" -> s"bytes $from-$to/$len"))
          case _ =>
            respond(ex, 200, Files.readAllBytes(target.toPath))
        }

      case ("HEAD", _) =>
        bump("head")
        if (target.isFile)
          respond(ex, 200, Array.empty, Map(
            "Content-Length-Hint" -> target.length().toString,
            "Last-Modified-Millis" -> target.lastModified().toString))
        else respond(ex, 404, Array.empty)

      case ("PUT", _) if q.contains("partNumber") =>
        bump("mpu_part")
        val dir = new File(uploadsRoot, q("uploadId"))
        if (!dir.isDirectory) { respond(ex, 404, Array.empty); return }
        val tmp = bodyToTemp(ex, new File(dir, "part"))
        if (!payloadHashOk(ex, tmp)) return
        Files.move(tmp.toPath, new File(dir, f"part${q("partNumber").toInt}%05d").toPath,
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        respond(ex, 200, Array.empty)

      case ("PUT", _) =>
        Option(ex.getRequestHeaders.getFirst("x-amz-copy-source")) match {
          case Some(src) =>
            bump("copy")
            val srcFile = new File(java.net.URLDecoder.decode(src, "UTF-8"))
            if (!srcFile.isFile) { respond(ex, 404, Array.empty); return }
            target.getParentFile.mkdirs()
            val tmp = new File(target.getParentFile,
              "." + target.getName + ".s3gwcopy." +
                java.util.UUID.randomUUID.toString.take(8))
            Files.copy(srcFile.toPath, tmp.toPath)
            Files.move(tmp.toPath, target.toPath,
              StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
            respond(ex, 200, "<CopyObjectResult/>".getBytes("UTF-8"))
          case None =>
            bump("put")
            val conditional =
              Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
            val tmp = bodyToTemp(ex, target)
            if (!payloadHashOk(ex, tmp)) return
            if (conditional) {
              // link(2): atomic fail-if-exists — S3's If-None-Match PUT
              try { Files.createLink(target.toPath, tmp.toPath); () }
              catch {
                case _: java.nio.file.FileAlreadyExistsException =>
                  Files.deleteIfExists(tmp.toPath)
                  respond(ex, 412, Array.empty)
                  return
              } finally Files.deleteIfExists(tmp.toPath)
            } else
              Files.move(tmp.toPath, target.toPath,
                StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
            respond(ex, 200, Array.empty)
        }

      case ("POST", _) if q.contains("uploads") =>
        bump("mpu_initiate")
        val id = java.util.UUID.randomUUID.toString
        val dir = new File(uploadsRoot, id)
        dir.mkdirs()
        Files.writeString(new File(dir, ".key").toPath, key)
        respond(ex, 200,
          s"<InitiateMultipartUploadResult><UploadId>$id</UploadId></InitiateMultipartUploadResult>"
            .getBytes("UTF-8"))

      case ("POST", _) if q.contains("uploadId") =>
        bump("mpu_complete")
        val dir = new File(uploadsRoot, q("uploadId"))
        if (!dir.isDirectory) { respond(ex, 404, Array.empty); return }
        val parts = Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("part")).sortBy(_.getName)
        target.getParentFile.mkdirs()
        val tmp = new File(target.getParentFile,
          "." + target.getName + ".s3gwmpu." +
            java.util.UUID.randomUUID.toString.take(8))
        val out = Files.newOutputStream(tmp.toPath)
        try parts.foreach(p => Files.copy(p.toPath, out)) finally out.close()
        def cleanup(): Unit = {
          parts.foreach(_.delete())
          new File(dir, ".key").delete()
          dir.delete()
          ()
        }
        // CONDITIONAL complete (S3 2024: If-None-Match on
        // CompleteMultipartUpload) — same link(2) atomicity as the
        // single-object conditional PUT, so large objects can commit
        // first-writer-wins too
        if (Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")) {
          try { Files.createLink(target.toPath, tmp.toPath); () }
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(tmp.toPath)
              cleanup()
              respond(ex, 412, Array.empty)
              return
          } finally Files.deleteIfExists(tmp.toPath)
        } else
          Files.move(tmp.toPath, target.toPath,
            StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        cleanup()
        respond(ex, 200, "<CompleteMultipartUploadResult/>".getBytes("UTF-8"))

      case ("DELETE", _) if q.contains("uploadId") =>
        bump("mpu_abort")
        val dir = new File(uploadsRoot, q("uploadId"))
        Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
        dir.delete()
        respond(ex, 204, Array.empty)

      case ("DELETE", _) =>
        bump("delete")
        Files.deleteIfExists(target.toPath) // idempotent, S3-true
        // S3-true implicit directories: a prefix with no objects does
        // not exist — prune the now-empty local dir skeleton upward
        // (File.delete refuses non-empty dirs, so this can only remove
        // genuinely empty ancestors; /tmp and / are depth-guarded)
        var p = target.getParentFile
        while (p != null && p.toPath.getNameCount > 1 && p.delete())
          p = p.getParentFile
        respond(ex, 204, Array.empty)

      case _ => respond(ex, 405, Array.empty)
    }
  }
}

/** Hadoop `FileSystem` client over the S3 gateway wire — every verb a
  * real HTTP round trip (see [[S3Gateway]]). `partSizeBytes` sets the
  * multipart threshold AND part size for uploads. Every request is
  * SigV4-signed ([[SigV4]]); `secret`/`signClock` are injectable so
  * specs can manufacture the bad-signature and expired-credential
  * failure paths a production job hits. An https endpoint picks up
  * the in-JVM gateway's trust context by default.
  */
class GraftS3FileSystem(endpoint: String, partSizeBytes: Int = 5 * 1024 * 1024,
    ssl: Option[javax.net.ssl.SSLContext] = None,
    secret: String = SigV4.secretKey,
    signClock: () => java.time.Instant = () => java.time.Instant.now(),
    listMaxKeys: Int = 1000)
    extends FileSystem {

  private val client = {
    val b = java.net.http.HttpClient.newBuilder()
    if (endpoint.startsWith("https"))
      ssl.orElse(S3Gateway.clientSslContext).foreach(b.sslContext)
    b.build()
  }
  private var cwd = new Path("/")
  setConf(new org.apache.hadoop.conf.Configuration())

  /** SigV4-signed request builder: auth headers attached; extra
    * x-amz-* headers (which AWS requires signed) ride through
    * `amzHeaders`; unsigned standard headers (Range, If-None-Match)
    * are added by the caller afterward. Bodied requests pass
    * sha256(body) as `payloadHash` (bodies are disk-buffered, so the
    * hash is one extra local read) — the gateway re-computes it over
    * the received bytes, closing the body-integrity gap
    * UNSIGNED-PAYLOAD leaves on the plaintext-HTTP fallback.
    */
  private def signed(method: String, uri: java.net.URI,
      amzHeaders: Map[String, String] = Map.empty,
      payloadHash: String = SigV4.UnsignedPayload)
      : java.net.http.HttpRequest.Builder = {
    val b = java.net.http.HttpRequest.newBuilder(uri)
    SigV4.signHeaders(method, uri, amzHeaders,
      secret = secret, clock = signClock(), payloadHash = payloadHash)
      .foreach { case (k, v) => b.header(k, v) }
    b
  }

  override def getUri: java.net.URI = java.net.URI.create("s3gw:///")
  override def getWorkingDirectory: Path = cwd
  override def setWorkingDirectory(p: Path): Unit = cwd = p
  override def getScheme: String = "s3gw"

  private def keyOf(f: Path): String = f.toUri.getPath
  private def uriOf(key: String, q: String = ""): java.net.URI = {
    val enc = key.split("/", -1).map(
      java.net.URLEncoder.encode(_, "UTF-8").replace("+", "%20")).mkString("/")
    java.net.URI.create(endpoint + enc + q)
  }

  private def send(b: java.net.http.HttpRequest.Builder)
      : java.net.http.HttpResponse[Array[Byte]] =
    client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofByteArray())

  private def head(key: String): Option[(Long, Long)] = {
    val resp = send(signed("HEAD", uriOf(key))
      .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody()))
    if (resp.statusCode() == 404) None
    else if (resp.statusCode() == 200)
      Some((resp.headers().firstValue("Content-Length-Hint").orElse("0").toLong,
        resp.headers().firstValue("Last-Modified-Millis").orElse("0").toLong))
    else throw new IOException(s"HEAD $key -> ${resp.statusCode()}")
  }

  /** ListObjectsV2 → (files: (key, size, mtimeMillis), commonPrefixes).
    * Follows IsTruncated/NextContinuationToken across pages — the loop
    * every real S3 client runs once a prefix passes max-keys (1000 on
    * the real service; `listMaxKeys` is spec-injectable to drive the
    * pagination with small corpora).
    */
  private[graft] def listObjects(prefix: String, delimited: Boolean)
      : (Seq[(String, Long, Long)], Seq[String]) = {
    def unescape(s: String): String =
      s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    val contents = Seq.newBuilder[(String, Long, Long)]
    val prefixes = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = "/?list-type=2&prefix=" +
        java.net.URLEncoder.encode(prefix, "UTF-8") +
        (if (delimited) "&delimiter=%2F" else "") +
        (if (listMaxKeys != 1000) s"&max-keys=$listMaxKeys" else "") +
        token.map(t => "&continuation-token=" +
          java.net.URLEncoder.encode(t, "UTF-8")).getOrElse("")
      val resp = send(signed("GET", java.net.URI.create(endpoint + q)).GET())
      if (resp.statusCode() != 200)
        throw new IOException(s"LIST $prefix -> ${resp.statusCode()}")
      val xml = new String(resp.body(), "UTF-8")
      "<Contents><Key>(.*?)</Key><Size>(\\d+)</Size><LastModified>(.*?)</LastModified></Contents>".r
        .findAllMatchIn(xml).foreach(m => contents += ((unescape(m.group(1)),
          m.group(2).toLong, java.time.Instant.parse(m.group(3)).toEpochMilli)))
      "<CommonPrefixes><Prefix>(.*?)</Prefix></CommonPrefixes>".r
        .findAllMatchIn(xml).foreach(m => prefixes += unescape(m.group(1)))
      token = "<NextContinuationToken>(.*?)</NextContinuationToken>".r
        .findFirstMatchIn(xml).map(_.group(1))
      more = xml.contains("<IsTruncated>true</IsTruncated>") && token.isDefined
    }
    (contents.result(), prefixes.result())
  }

  override def getFileStatus(f: Path): FileStatus =
    head(keyOf(f)) match {
      case Some((len, mtime)) =>
        new FileStatus(len, false, 1, partSizeBytes.toLong, mtime, qualify(f))
      case None =>
        val (files, prefixes) = listObjects(keyOf(f) + "/", delimited = true)
        if (files.nonEmpty || prefixes.nonEmpty)
          new FileStatus(0, true, 1, partSizeBytes.toLong, 0, qualify(f))
        else throw new java.io.FileNotFoundException(keyOf(f))
    }

  private def qualify(f: Path): Path =
    new Path("s3gw", "", keyOf(f))

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    if (head(key).isDefined) return Array(getFileStatus(f))
    val (files, prefixes) = listObjects(key + "/", delimited = true)
    if (files.isEmpty && prefixes.isEmpty)
      throw new java.io.FileNotFoundException(key)
    (files.map { case (k, len, mtime) =>
      new FileStatus(len, false, 1, partSizeBytes.toLong, mtime,
        new Path("s3gw", "", k))
    } ++ prefixes.map(p =>
      new FileStatus(0, true, 1, partSizeBytes.toLong, 0,
        new Path("s3gw", "", p.stripSuffix("/"))))).toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = true

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    val (len, _) = head(key).getOrElse(
      throw new java.io.FileNotFoundException(key))
    new FSDataInputStream(new S3GatewayInput(key, len))
  }

  /** Seekable ranged-GET input: positioned reads map 1:1 to RFC-7233
    * Range requests — the wire shape of every parquet footer read an
    * s3a deployment does.
    */
  private class S3GatewayInput(key: String, len: Long)
      extends java.io.InputStream with Seekable with PositionedReadable {
    private var pos = 0L

    private def ranged(position: Long, n: Int): Array[Byte] = {
      if (n == 0) return Array.empty
      val resp = send(signed("GET", uriOf(key))
        .header("Range", s"bytes=$position-${position + n - 1}").GET())
      if (resp.statusCode() == 416) return Array.empty
      if (resp.statusCode() != 206 && resp.statusCode() != 200)
        throw new IOException(s"GET $key range -> ${resp.statusCode()}")
      resp.body()
    }

    override def read(): Int = {
      if (pos >= len) return -1
      val b = ranged(pos, 1)
      if (b.isEmpty) -1 else { pos += 1; b(0) & 0xff }
    }
    override def read(buf: Array[Byte], off: Int, n: Int): Int = {
      if (n == 0) return 0 // InputStream contract: zero-length read is 0, never EOF
      if (pos >= len) return -1
      val b = ranged(pos, math.min(n.toLong, len - pos).toInt)
      if (b.isEmpty) return -1
      System.arraycopy(b, 0, buf, off, b.length)
      pos += b.length
      b.length
    }
    override def read(position: Long, buf: Array[Byte], off: Int, n: Int): Int = {
      if (n == 0) return 0
      if (position >= len) return -1
      val b = ranged(position, math.min(n.toLong, len - position).toInt)
      if (b.isEmpty) return -1
      System.arraycopy(b, 0, buf, off, b.length)
      b.length
    }
    override def readFully(position: Long, buf: Array[Byte], off: Int, n: Int): Unit = {
      var done = 0
      while (done < n) {
        val r = read(position + done, buf, off + done, n - done)
        if (r < 0) throw new java.io.EOFException(s"$key at ${position + done}")
        done += r
      }
    }
    override def readFully(position: Long, buf: Array[Byte]): Unit =
      readFully(position, buf, 0, buf.length)
    override def seek(p: Long): Unit = { pos = p }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    // disk-buffered upload (the s3a block-output shape): bytes spool to
    // a local temp file, the PUT/multipart happens at close
    val tmp = File.createTempFile("s3gwout", ".bin")
    val out = Files.newOutputStream(tmp.toPath)
    val wrapped = new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, n: Int): Unit =
        this.out.write(b, off, n)
      override def close(): Unit = {
        super.close()
        try upload(key, tmp, conditional = !overwrite)
        finally { tmp.delete(); () }
      }
    }
    new FSDataOutputStream(wrapped, null)
  }

  private def upload(key: String, src: File, conditional: Boolean): Unit = {
    if (src.length() > partSizeBytes) { multipart(key, src, conditional); return }
    val b = signed("PUT", uriOf(key), payloadHash = SigV4.sha256HexOfFile(src))
      .PUT(java.net.http.HttpRequest.BodyPublishers.ofFile(src.toPath))
    if (conditional) b.header("If-None-Match", "*")
    val resp = send(b)
    if (resp.statusCode() == 412)
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"conditional PUT lost: $key exists")
    if (resp.statusCode() != 200)
      throw new IOException(s"PUT $key -> ${resp.statusCode()}")
  }

  private def multipart(key: String, src: File, conditional: Boolean = false): Unit = {
    val init = send(signed("POST", uriOf(key, "?uploads"))
      .POST(java.net.http.HttpRequest.BodyPublishers.noBody()))
    if (init.statusCode() != 200)
      throw new IOException(s"MPU initiate $key -> ${init.statusCode()}")
    val id = "<UploadId>(.*?)</UploadId>".r
      .findFirstMatchIn(new String(init.body(), "UTF-8"))
      .map(_.group(1)).getOrElse(throw new IOException("no UploadId"))
    try {
      val total = src.length()
      var part = 1
      var off = 0L
      val in = java.nio.channels.FileChannel.open(src.toPath,
        java.nio.file.StandardOpenOption.READ)
      try {
        while (off < total) {
          val n = math.min(partSizeBytes.toLong, total - off).toInt
          val buf = java.nio.ByteBuffer.allocate(n)
          while (buf.hasRemaining) {
            if (in.read(buf, off + buf.position()) < 0)
              throw new IOException("EOF mid-part")
          }
          val resp = send(signed("PUT",
            uriOf(key, s"?partNumber=$part&uploadId=$id"),
            payloadHash = SigV4.sha256HexOfBytes(buf.array()))
            .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(buf.array())))
          if (resp.statusCode() != 200)
            throw new IOException(s"MPU part $part -> ${resp.statusCode()}")
          off += n
          part += 1
        }
      } finally in.close()
      val doneReq = signed("POST", uriOf(key, s"?uploadId=$id"))
        .POST(java.net.http.HttpRequest.BodyPublishers.noBody())
      if (conditional) doneReq.header("If-None-Match", "*")
      val done = send(doneReq)
      if (done.statusCode() == 412)
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"conditional multipart complete lost: $key exists")
      if (done.statusCode() != 200)
        throw new IOException(s"MPU complete -> ${done.statusCode()}")
    } catch {
      case e: Throwable =>
        send(signed("DELETE", uriOf(key, s"?uploadId=$id")).DELETE())
        throw e
    }
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append (objects are immutable)")

  private[fs] def copyObject(src: String, dst: String): Unit = {
    // x-amz-copy-source is an x-amz-* header, so it rides SIGNED — a
    // middlebox can't silently redirect the copy source
    val resp = send(signed("PUT", uriOf(dst),
      amzHeaders = Map("x-amz-copy-source" -> src))
      .PUT(java.net.http.HttpRequest.BodyPublishers.noBody()))
    if (resp.statusCode() != 200)
      throw new IOException(s"COPY $src -> $dst: ${resp.statusCode()}")
  }

  private def deleteObject(key: String): Unit = {
    val resp = send(signed("DELETE", uriOf(key)).DELETE())
    if (resp.statusCode() != 204 && resp.statusCode() != 200)
      throw new IOException(s"DELETE $key -> ${resp.statusCode()}")
  }

  /** The real store's "rename": per-object COPY + DELETE — visibly
    * non-atomic across a prefix, which is exactly why [[FsOps]] only
    * ever renames SINGLE pointer objects through this verb.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = keyOf(src)
    val dk = keyOf(dst)
    if (head(sk).isDefined) {
      copyObject(sk, dk); deleteObject(sk); true
    } else {
      val (files, _) = listObjects(sk + "/", delimited = false)
      if (files.isEmpty) return false
      files.foreach { case (k, _, _) =>
        copyObject(k, dk + k.stripPrefix(sk)); deleteObject(k)
      }
      true
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    if (head(key).isDefined) { deleteObject(key); return true }
    val (files, prefixes) = listObjects(key + "/", delimited = false)
    if (files.isEmpty && prefixes.isEmpty) return false
    if (!recursive) throw new IOException(s"$key is a non-empty prefix")
    files.foreach { case (k, _, _) => deleteObject(k) }
    true
  }
}

/** The `SPARK_GRAFT_FS=s3gw` seam binding: the object-store pointer
  * protocol over the gateway wire, with `carryFile` upgraded to a
  * SERVER-SIDE COPY (zero data bytes over the wire — what S3A's
  * `copyFile` does for same-bucket copies).
  */
class S3GatewayFsOps(fs: GraftS3FileSystem)
    extends ObjectStoreFsOps(_ => fs, "s3gw") {
  override def carryFile(src: Path, dst: Path): Unit =
    fs.copyObject(src.toUri.getPath, dst.toUri.getPath)

  /** Implicit directories carry NO mtime on a real store, so a staging
    * TREE's age must derive from its objects: use the NEWEST object —
    * an in-flight build keeps writing, so its newest object is recent
    * and the caller's age gate spares it, while true crash debris only
    * ever gets older. (The base impl reads directory mtimes, which the
    * gateway's implicit dirs report as 0 — that would classify every
    * fresh in-flight tree as ancient debris.)
    */
  override def stagingDebris(parent: Path): Seq[(Path, Long)] = {
    val base = parent.toUri.getPath
    val (all, _) = fs.listObjects(base + "/", delimited = false)
    val byChild = all.groupBy { case (k, _, _) =>
      k.drop(base.length + 1).takeWhile(_ != '/') }
    val committed = byChild.keys.filter(_.endsWith(".ptr")).map { p =>
      resolveDir(new Path(parent, p.stripSuffix(".ptr"))).getName
    }.toSet
    byChild.toSeq.collect {
      case (name, objs) if FsOps.isStagingName(name) && !committed.contains(name) =>
        (new Path(parent, name), objs.map(_._3).max)
    }
  }
}

object S3GatewayFsOps {
  /** Start the gateway (once) and bind the seam over it. */
  def bound(): S3GatewayFsOps =
    new S3GatewayFsOps(new GraftS3FileSystem(S3Gateway.ensureStarted()))
}
