package graft

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.hadoop.fs.Path

import graft.fs.{GraftS3FileSystem, S3Gateway}

/** The S3 wire protocol itself (graft.fs.S3Gateway): the capabilities
  * the seam's object-store binding rides, each exercised over REAL
  * HTTP against the loopback gateway — conditional PUT atomicity under
  * a 16-wide race, multipart upload, ranged GETs, per-object
  * COPY+DELETE "rename" with list-after-rename visibility, and
  * S3-true implicit directories. FsOpsSpec separately proves the full
  * seam parity (every covered operator, identical answers) under the
  * `s3gw` binding.
  */
class S3GatewaySpec extends SparkSpec {

  private lazy val endpoint: String =
    try S3Gateway.ensureStarted()
    catch {
      case e: java.io.IOException =>
        cancel(s"loopback bind unavailable: ${e.getMessage}")
    }

  private def freshRoot(tag: String): java.io.File = {
    val d = new java.io.File(s"/tmp/graft_s3gw_spec_$tag")
    Stage.deleteRecursively(d)
    d.mkdirs()
    d
  }

  test("conditional PUT: 16 racing create(overwrite=false) admit exactly one winner") {
    val fs = new GraftS3FileSystem(endpoint)
    val root = freshRoot("cas")
    try {
      val target = new Path(new java.io.File(root, "commit.ptr").getPath)
      val pool = Executors.newFixedThreadPool(16)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val futures = (0 until 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            try {
              val out = fs.create(target, false)
              out.write(s"writer-$i".getBytes("UTF-8"))
              out.close() // the conditional PUT happens here
              true
            } catch {
              case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            }
          }
        })
      }
      gate.countDown()
      val wins = futures.count(_.get(30, TimeUnit.SECONDS))
      pool.shutdownNow()
      assert(wins === 1, s"conditional PUT must admit exactly one writer, got $wins")
      val body = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(root, "commit.ptr").toPath), "UTF-8")
      assert(body.matches("writer-\\d+"), s"torn commit body: $body")
    } finally Stage.deleteRecursively(root)
  }

  test("multipart upload: a large create goes initiate/parts/complete and reads back intact") {
    // 64 KiB parts so a ~200 KiB object takes 4 parts
    val fs = new GraftS3FileSystem(endpoint, partSizeBytes = 64 * 1024)
    val root = freshRoot("mpu")
    try {
      val bytes = Array.tabulate[Byte](200 * 1024 + 17)(i => (i * 31 + 7).toByte)
      val target = new Path(new java.io.File(root, "blob.bin").getPath)
      val (i0, p0, c0) = (S3Gateway.opCount("mpu_initiate"),
        S3Gateway.opCount("mpu_part"), S3Gateway.opCount("mpu_complete"))
      val out = fs.create(target, true)
      out.write(bytes)
      out.close()
      assert(S3Gateway.opCount("mpu_initiate") === i0 + 1, "must initiate one upload")
      assert(S3Gateway.opCount("mpu_part") === p0 + 4, "200KiB+17 at 64KiB parts = 4 parts")
      assert(S3Gateway.opCount("mpu_complete") === c0 + 1, "must complete the upload")
      val got = java.nio.file.Files.readAllBytes(
        new java.io.File(root, "blob.bin").toPath)
      assert(java.util.Arrays.equals(got, bytes), "multipart reassembly corrupted bytes")
      // and the ranged-GET read path sees the same bytes at arbitrary offsets
      val in = fs.open(target, 4096)
      val mid = new Array[Byte](1000)
      in.readFully(65536 - 500, mid) // spans the part-1/part-2 seam
      assert(java.util.Arrays.equals(mid,
        java.util.Arrays.copyOfRange(bytes, 65536 - 500, 65536 + 500)),
        "ranged read across a part boundary diverged")
      in.seek(bytes.length - 3)
      val tail = new Array[Byte](3)
      in.readFully(bytes.length - 3L, tail)
      assert(java.util.Arrays.equals(tail,
        java.util.Arrays.copyOfRange(bytes, bytes.length - 3, bytes.length)))
      in.close()
    } finally Stage.deleteRecursively(root)
  }

  test("conditional MULTIPART complete: racing large creates admit exactly one winner") {
    // S3's 2024 capability set allows If-None-Match on
    // CompleteMultipartUpload — so first-writer-wins holds at ANY
    // object size, not just single-PUT-sized commits
    val fs = new GraftS3FileSystem(endpoint, partSizeBytes = 64 * 1024)
    val root = freshRoot("mpucas")
    try {
      val target = new Path(new java.io.File(root, "big.bin").getPath)
      val pool = Executors.newFixedThreadPool(4)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val futures = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            try {
              val out = fs.create(target, false)
              // > 2 parts, writer-tagged bytes so a torn mix is detectable
              out.write(Array.fill[Byte](150 * 1024)(i.toByte))
              out.close()
              true
            } catch {
              case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            }
          }
        })
      }
      gate.countDown()
      val wins = futures.count(_.get(30, TimeUnit.SECONDS))
      pool.shutdownNow()
      assert(wins === 1, s"conditional multipart must admit exactly one writer, got $wins")
      val got = java.nio.file.Files.readAllBytes(
        new java.io.File(root, "big.bin").toPath)
      assert(got.length === 150 * 1024)
      assert(got.toSet.size === 1, "winner's object mixes bytes from two writers")
    } finally Stage.deleteRecursively(root)
  }

  test("rename is per-object COPY+DELETE; listing immediately after sees the move complete") {
    val fs = new GraftS3FileSystem(endpoint)
    val root = freshRoot("rename")
    try {
      val src = new java.io.File(root, "src")
      (0 until 5).foreach { i =>
        val f = new java.io.File(src, s"part-$i.parquet")
        f.getParentFile.mkdirs()
        java.nio.file.Files.write(f.toPath, s"data-$i".getBytes("UTF-8"))
      }
      val (cp0, del0) = (S3Gateway.opCount("copy"), S3Gateway.opCount("delete"))
      assert(fs.rename(new Path(src.getPath),
        new Path(new java.io.File(root, "dst").getPath)))
      // the real store's "rename" shape: one server-side COPY and one
      // DELETE per object — never an atomic namespace operation
      assert(S3Gateway.opCount("copy") === cp0 + 5)
      assert(S3Gateway.opCount("delete") === del0 + 5)
      // list-after-rename visibility (modern S3 strong consistency):
      // the destination lists complete, the source prefix is GONE
      val dstList = fs.listStatus(new Path(new java.io.File(root, "dst").getPath))
      assert(dstList.map(_.getPath.getName).sorted.toSeq ===
        (0 until 5).map(i => s"part-$i.parquet"))
      intercept[java.io.FileNotFoundException] {
        fs.listStatus(new Path(src.getPath))
      }
      (0 until 5).foreach { i =>
        val got = new String(java.nio.file.Files.readAllBytes(
          new java.io.File(root, s"dst/part-$i.parquet").toPath), "UTF-8")
        assert(got === s"data-$i")
      }
    } finally Stage.deleteRecursively(root)
  }

  test("TLS + SigV4: signed requests pass; bad signature, expired date and unsigned all 403 without touching a handler") {
    val fs = new GraftS3FileSystem(endpoint)
    val root = freshRoot("auth")
    try {
      assert(endpoint.startsWith("https://"),
        "gateway must serve TLS when keytool is present")
      val obj = new java.io.File(root, "x.bin")
      java.nio.file.Files.write(obj.toPath, Array.tabulate[Byte](1000)(_.toByte))
      val target = new Path(obj.getPath)
      // properly signed: every verb already exercised by the other
      // tests; here just pin one read works over TLS
      val in = fs.open(target, 4096)
      assert(in.read() === 0)
      // zero-length read obeys the InputStream contract (returns 0,
      // never a spurious EOF)
      assert(in.read(new Array[Byte](8), 0, 0) === 0)
      in.close()
      val fails0 = S3Gateway.opCount("auth_fail")
      // wrong secret: the HEAD inside getFileStatus sees the 403 and
      // surfaces it as the transport failure a production job gets on
      // bad credentials
      val rogue = new GraftS3FileSystem(endpoint, secret = "wrong-secret")
      val e1 = intercept[java.io.IOException](rogue.getFileStatus(target))
      assert(e1.getMessage.contains("403"), s"got: ${e1.getMessage}")
      // expired signature (clock 20 min behind): RequestTimeTooSkewed
      val stale = new GraftS3FileSystem(endpoint,
        signClock = () => java.time.Instant.now().minusSeconds(20 * 60))
      val e2 = intercept[java.io.IOException](stale.getFileStatus(target))
      assert(e2.getMessage.contains("403"), s"got: ${e2.getMessage}")
      // raw unsigned request: 403 AccessDenied on the wire
      val client = {
        val b = java.net.http.HttpClient.newBuilder()
        S3Gateway.clientSslContext.foreach(b.sslContext)
        b.build()
      }
      val bare = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(endpoint + obj.getPath)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bare.statusCode() === 403)
      assert(bare.body().contains("<Code>AccessDenied</Code>"))
      // tampered signature: SignatureDoesNotMatch
      val sigHdrs = graft.fs.SigV4.signHeaders(
        "GET", java.net.URI.create(endpoint + obj.getPath))
      val tampered = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(endpoint + obj.getPath))
      sigHdrs.foreach { case (k, v) =>
        tampered.header(k,
          if (k == "Authorization") v.dropRight(4) + "dead" else v)
      }
      val bad = client.send(tampered.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() === 403)
      assert(bad.body().contains("<Code>SignatureDoesNotMatch</Code>"))
      assert(S3Gateway.opCount("auth_fail") >= fails0 + 4)
      // RFC-7233 suffix range over a signed raw request: last 16 bytes
      val sufUri = java.net.URI.create(endpoint + obj.getPath)
      val suf = java.net.http.HttpRequest.newBuilder(sufUri)
      graft.fs.SigV4.signHeaders("GET", sufUri)
        .foreach { case (k, v) => suf.header(k, v) }
      val sufResp = client.send(suf.header("Range", "bytes=-16").GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      assert(sufResp.statusCode() === 206)
      assert(java.util.Arrays.equals(sufResp.body(),
        Array.tabulate[Byte](1000)(_.toByte).takeRight(16)))
    } finally Stage.deleteRecursively(root)
  }

  test("unsigned x-amz-* splice is 403 AccessDenied; tampered PUT body is 400 XAmzContentSHA256Mismatch") {
    import graft.fs.SigV4
    val fs = new GraftS3FileSystem(endpoint)
    val root = freshRoot("integrity")
    try {
      val attacker = new java.io.File(root, "attacker.bin")
      java.nio.file.Files.write(attacker.toPath, "attacker-chosen".getBytes("UTF-8"))
      val victim = new java.io.File(root, "victim.bin")
      val client = {
        val b = java.net.http.HttpClient.newBuilder()
        S3Gateway.clientSslContext.foreach(b.sslContext)
        b.build()
      }
      val uri = java.net.URI.create(endpoint + victim.getPath)
      // a VALID signed PUT (copy-source NOT in SignedHeaders), then an
      // attacker splices an unsigned x-amz-copy-source onto the replay
      // — the middlebox redirect ADVICE r15 called out. Must 403, and
      // the server-side COPY must never happen.
      val body = "legit".getBytes("UTF-8")
      val spliced = java.net.http.HttpRequest.newBuilder(uri)
      SigV4.signHeaders("PUT", uri,
          payloadHash = SigV4.sha256HexOfBytes(body))
        .foreach { case (k, v) => spliced.header(k, v) }
      spliced.header("x-amz-copy-source", attacker.getPath)
      val r1 = client.send(
        spliced.PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r1.statusCode() === 403, s"got ${r1.statusCode()}: ${r1.body()}")
      assert(r1.body().contains("<Code>AccessDenied</Code>"))
      assert(r1.body().contains("x-amz-copy-source"))
      assert(!victim.exists(), "the spliced COPY must never execute")
      // signed concrete payload hash + tampered body: the gateway
      // recomputes sha256 over the received bytes and refuses — body
      // integrity holds even without TLS
      val tampered = java.net.http.HttpRequest.newBuilder(uri)
      SigV4.signHeaders("PUT", uri,
          payloadHash = SigV4.sha256HexOfBytes("original-bytes".getBytes("UTF-8")))
        .foreach { case (k, v) => tampered.header(k, v) }
      val r2 = client.send(
        tampered.PUT(java.net.http.HttpRequest.BodyPublishers
          .ofByteArray("tampered-bytes".getBytes("UTF-8"))).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r2.statusCode() === 400, s"got ${r2.statusCode()}: ${r2.body()}")
      assert(r2.body().contains("<Code>XAmzContentSHA256Mismatch</Code>"))
      assert(!victim.exists(), "a tampered upload must never become visible")
      assert(S3Gateway.opCount("payload_mismatch") >= 1)
      // the honest client path signs real body hashes and round-trips
      val out = fs.create(new Path(victim.getPath), true)
      out.write("legit".getBytes("UTF-8"))
      out.close()
      assert(new String(
        java.nio.file.Files.readAllBytes(victim.toPath), "UTF-8") === "legit")
    } finally Stage.deleteRecursively(root)
  }

  test("in-flight/leaked gateway temporaries are invisible to LIST") {
    val fs = new GraftS3FileSystem(endpoint)
    val root = freshRoot("temps")
    try {
      val obj = new java.io.File(root, "data.parquet")
      java.nio.file.Files.write(obj.toPath, "real".getBytes("UTF-8"))
      // simulate a crash-leaked PUT temp (the names bodyToTemp mints):
      // a client that died mid-body-copy leaves exactly this file
      java.nio.file.Files.write(
        new java.io.File(root, ".data.parquet.s3gwput.deadbeef").toPath,
        "partial".getBytes("UTF-8"))
      java.nio.file.Files.write(
        new java.io.File(root, ".other.s3gwcopy.cafebabe").toPath,
        "partial".getBytes("UTF-8"))
      val names = fs.listStatus(new Path(root.getPath)).map(_.getPath.getName)
      assert(names.toSeq === Seq("data.parquet"),
        s"gateway temporaries leaked into LIST: ${names.mkString(",")}")
    } finally Stage.deleteRecursively(root)
  }

  test("ListObjectsV2 pagination: max-keys pages with IsTruncated/NextContinuationToken; the client walks every page") {
    // real S3 truncates at 1000 keys and every client must loop; the
    // gateway implements the same wire (keys + common prefixes counted
    // together, lexicographic, opaque continuation token), driven here
    // with max-keys=10 over 25 objects + 3 implicit directories
    val fs = new GraftS3FileSystem(endpoint, listMaxKeys = 10)
    val root = freshRoot("paging")
    try {
      (0 until 25).foreach { i =>
        val f = new java.io.File(root, f"obj-$i%03d.bin")
        java.nio.file.Files.write(f.toPath, s"v$i".getBytes("UTF-8"))
      }
      (0 until 3).foreach { d =>
        val f = new java.io.File(root, s"sub$d/part.bin")
        f.getParentFile.mkdirs()
        java.nio.file.Files.write(f.toPath, "x".getBytes("UTF-8"))
      }
      val lists0 = S3Gateway.opCount("list")
      val (files, prefixes) = fs.listObjects(root.getPath + "/", delimited = true)
      // 25 keys + 3 prefixes at 10 per page = 3 pages
      assert(S3Gateway.opCount("list") === lists0 + 3,
        "client must walk exactly ceil(28/10) pages")
      assert(files.map(_._1).toSet ===
        (0 until 25).map(i => f"${root.getPath}/obj-$i%03d.bin").toSet)
      assert(prefixes.toSet === (0 until 3).map(d => s"${root.getPath}/sub$d/").toSet)
      // non-delimited recursive walk pages too and sees every object
      val (all, _) = fs.listObjects(root.getPath + "/", delimited = false)
      assert(all.size === 28)
      // the raw wire: a truncated page says so and carries the token
      val client = {
        val b = java.net.http.HttpClient.newBuilder()
        S3Gateway.clientSslContext.foreach(b.sslContext)
        b.build()
      }
      val uri = java.net.URI.create(endpoint + "/?list-type=2&max-keys=5&prefix=" +
        java.net.URLEncoder.encode(root.getPath + "/", "UTF-8"))
      val req = java.net.http.HttpRequest.newBuilder(uri)
      graft.fs.SigV4.signHeaders("GET", uri).foreach { case (k, v) => req.header(k, v) }
      val body = client.send(req.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      assert(body.contains("<IsTruncated>true</IsTruncated>"))
      assert(body.contains("<NextContinuationToken>"))
      assert("<Contents>".r.findAllIn(body).size === 5)
    } finally Stage.deleteRecursively(root)
  }

  test("implicit directories: a prefix exists iff an object extends it") {
    val fs = new GraftS3FileSystem(endpoint)
    val root = freshRoot("dirs")
    try {
      val f = new java.io.File(root, "a/b/obj")
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, "x".getBytes("UTF-8"))
      val a = new Path(new java.io.File(root, "a").getPath)
      assert(fs.getFileStatus(a).isDirectory)
      assert(fs.listStatus(a).map(_.getPath.getName).toSeq === Seq("b"))
      // delete the only object: the whole implicit chain vanishes
      assert(fs.delete(new Path(f.getPath), false))
      intercept[java.io.FileNotFoundException](fs.getFileStatus(a))
      assert(!fs.exists(new Path(f.getParent.toString)))
    } finally Stage.deleteRecursively(root)
  }
}
