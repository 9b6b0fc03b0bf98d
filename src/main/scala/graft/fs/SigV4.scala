package graft.fs

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 for the S3 gateway — BOTH halves of the
  * auth contract the reference's deployment inherits from EMR
  * instance roles (corporate_bucket.tf bucket policies; every
  * ingesters.py S3 read rides a SigV4-signed request under the hood).
  * No AWS SDK exists in this sandbox, so the signer and the verifier
  * are implemented from the published algorithm (pure JDK crypto):
  *
  *   signing key = HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date),
  *                 region), service), "aws4_request")
  *   signature   = HMAC(signingKey, stringToSign)
  *   stringToSign = "AWS4-HMAC-SHA256" \n amzDate \n scope \n
  *                  hex(sha256(canonicalRequest))
  *
  * Bodied requests sign the REAL payload hash (round 16): the client
  * buffers every PUT body to disk anyway (the s3a block-output
  * shape), so x-amz-content-sha256 carries sha256(body) — signed, and
  * re-computed server-side over the received bytes — giving uploads
  * end-to-end integrity even on the plaintext-HTTP fallback.
  * UNSIGNED-PAYLOAD (s3a's streaming mode, integrity delegated to
  * TLS) remains accepted for bodyless verbs and external clients; the
  * header itself is ALWAYS signed, so a stripped or altered
  * payload-hash header still breaks the signature. SignedHeaders
  * cover host, x-amz-date, x-amz-content-sha256 and every x-amz-*
  * header present — and verification REJECTS a request carrying any
  * x-amz-* header absent from SignedHeaders (AWS behavior; without
  * this, a middlebox could splice an unsigned x-amz-copy-source onto
  * a replayed signed PUT and redirect the copy).
  *
  * Verification failures map to S3's wire shapes: missing header →
  * 403 AccessDenied, stale clock (> 15 min skew) → 403
  * RequestTimeTooSkewed, bad MAC → 403 SignatureDoesNotMatch — the
  * exact failure modes a production job sees on expired credentials
  * or clock drift. (Payload-hash mismatch over the received body is
  * the gateway's 400 XAmzContentSHA256Mismatch, checked where the
  * body is buffered.)
  */
object SigV4 {
  val Region = "graft-local"
  val Service = "s3"
  private val Algo = "AWS4-HMAC-SHA256"
  val MaxSkewMillis: Long = 15 * 60 * 1000L

  /** Dev-gateway credentials (env-overridable, MinIO-style defaults). */
  def accessKey: String = sys.env.getOrElse("GRAFT_S3_ACCESS_KEY", "graft-access")
  def secretKey: String = sys.env.getOrElse("GRAFT_S3_SECRET_KEY", "graft-secret")

  private val AmzDateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  def amzDate(now: Instant): String = AmzDateFmt.format(now)

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8"))
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** RFC-3986-strict percent encoding (the AWS canonical form: encode
    * everything but unreserved; space is %20, never '+').
    */
  private def awsEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Canonical query string from the RAW query (both halves decode the
    * sent pairs and re-encode them strictly, so the strings agree
    * regardless of how the sender encoded them).
    */
  private def canonicalQuery(rawQuery: String): String =
    if (rawQuery == null || rawQuery.isEmpty) ""
    else rawQuery.split("&").toSeq.map { kv =>
      val i = kv.indexOf('=')
      val (k, v) =
        if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      (awsEncode(java.net.URLDecoder.decode(k, "UTF-8")),
        awsEncode(java.net.URLDecoder.decode(v, "UTF-8")))
    }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  private def canonicalRequest(method: String, rawPath: String,
      rawQuery: String, signedHeaders: Seq[(String, String)],
      payloadHash: String): String = {
    val names = signedHeaders.map(_._1).mkString(";")
    val headerBlock = signedHeaders
      .map { case (k, v) => s"$k:${v.trim}\n" }.mkString
    s"$method\n$rawPath\n${canonicalQuery(rawQuery)}\n$headerBlock\n$names\n$payloadHash"
  }

  private def scope(dateStamp: String): String =
    s"$dateStamp/$Region/$Service/aws4_request"

  private def signature(secret: String, dateStamp: String,
      stringToSign: String): String = {
    val kDate = hmac(("AWS4" + secret).getBytes("UTF-8"), dateStamp)
    val kRegion = hmac(kDate, Region)
    val kService = hmac(kRegion, Service)
    val kSigning = hmac(kService, "aws4_request")
    hmac(kSigning, stringToSign).map(b => f"$b%02x").mkString
  }

  private def computeSig(method: String, rawPath: String, rawQuery: String,
      signedHeaders: Seq[(String, String)], payloadHash: String,
      date: String, secret: String): String = {
    val cr = canonicalRequest(method, rawPath, rawQuery, signedHeaders, payloadHash)
    val sts = s"$Algo\n$date\n${scope(date.take(8))}\n${sha256Hex(cr)}"
    signature(secret, date.take(8), sts)
  }

  /** The x-amz-content-sha256 value for a request with no meaningful
    * body integrity claim — s3a's streaming mode.
    */
  val UnsignedPayload = "UNSIGNED-PAYLOAD"

  /** Hex sha256 of a local file — the payload hash a disk-buffered
    * upload signs (one extra sequential read of bytes already local).
    */
  def sha256HexOfFile(f: java.io.File): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = java.nio.file.Files.newInputStream(f.toPath)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map(b => f"$b%02x").mkString
  }

  def sha256HexOfBytes(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map(b => f"$b%02x").mkString

  /** Sign: returns the headers to attach (x-amz-date,
    * x-amz-content-sha256, Authorization). `amzHeaders` are extra
    * x-amz-* request headers (lowercase names) that must ride signed.
    * `payloadHash` is sha256(body) for bodied requests (the client
    * buffers bodies locally, so hashing is one extra read) or
    * [[UnsignedPayload]]. `clock` is injectable so the spec can
    * manufacture an expired signature.
    */
  def signHeaders(method: String, uri: java.net.URI,
      amzHeaders: Map[String, String] = Map.empty,
      access: String = accessKey, secret: String = secretKey,
      clock: Instant = null,
      payloadHash: String = UnsignedPayload): Map[String, String] = {
    val date = amzDate(if (clock == null) Instant.now() else clock)
    val host = uri.getAuthority
    val signed = (Map(
      "host" -> host,
      "x-amz-content-sha256" -> payloadHash,
      "x-amz-date" -> date) ++ amzHeaders).toSeq.sortBy(_._1)
    val sig = computeSig(method, uri.getRawPath, uri.getRawQuery,
      signed, payloadHash, date, secret)
    val names = signed.map(_._1).mkString(";")
    Map(
      "x-amz-date" -> date,
      "x-amz-content-sha256" -> payloadHash,
      "Authorization" ->
        s"$Algo Credential=$access/${scope(date.take(8))}, SignedHeaders=$names, Signature=$sig"
    ) ++ amzHeaders
  }

  /** Verification outcome: Right(accessKey) or Left((s3ErrorCode,
    * detail)) — the caller maps codes onto 403 XML bodies.
    *
    * `headerNames` is the full set of header names present on the
    * request: every x-amz-* header present MUST appear in
    * SignedHeaders (AWS rejects unsigned x-amz-* headers — otherwise
    * a replayed valid request could carry an attacker-spliced
    * unsigned x-amz-copy-source and verify clean).
    */
  def verify(method: String, rawPath: String, rawQuery: String,
      header: String => Option[String],
      now: Instant = Instant.now(),
      headerNames: Iterable[String] = Nil): Either[(String, String), String] = {
    val auth = header("Authorization").getOrElse("")
    if (auth.isEmpty) return Left(("AccessDenied", "missing Authorization"))
    if (!auth.startsWith(Algo + " "))
      return Left(("AccessDenied", s"unsupported auth scheme"))
    val fields = auth.drop(Algo.length + 1).split(",").map(_.trim)
      .flatMap { f =>
        val i = f.indexOf('=')
        if (i < 0) None else Some(f.take(i) -> f.drop(i + 1))
      }.toMap
    val cred = fields.getOrElse("Credential", "")
    val access = cred.takeWhile(_ != '/')
    if (access != accessKey)
      return Left(("InvalidAccessKeyId", access))
    val date = header("x-amz-date").getOrElse("")
    if (date.isEmpty) return Left(("AccessDenied", "missing x-amz-date"))
    val sent =
      try Instant.from(AmzDateFmt.parse(date))
      catch { case _: Exception =>
        return Left(("AccessDenied", s"malformed x-amz-date $date")) }
    if (math.abs(now.toEpochMilli - sent.toEpochMilli) > MaxSkewMillis)
      return Left(("RequestTimeTooSkewed", date))
    val names = fields.getOrElse("SignedHeaders", "").split(";").toSeq
      .filter(_.nonEmpty)
    if (!Set("host", "x-amz-date", "x-amz-content-sha256")
        .subsetOf(names.toSet))
      return Left(("AccessDenied", "host/x-amz-date/x-amz-content-sha256 must be signed"))
    // every x-amz-* header PRESENT on the request must be signed —
    // an unsigned one slipped in post-signature (middlebox splice /
    // replay+extend) is a 403, exactly as AWS answers it
    val unsignedAmz = headerNames.map(_.toLowerCase)
      .filter(_.startsWith("x-amz-")).filterNot(names.toSet)
    if (unsignedAmz.nonEmpty)
      return Left(("AccessDenied",
        s"x-amz headers present but unsigned: ${unsignedAmz.toSeq.sorted.mkString(",")}"))
    val signedHeaders = names.sorted.map { n =>
      n -> header(n).getOrElse(
        return Left(("AccessDenied", s"signed header $n absent")))
    }
    val payloadHash = header("x-amz-content-sha256").get
    val expect = computeSig(method, rawPath, rawQuery, signedHeaders,
      payloadHash, date, secretKey)
    val got = fields.getOrElse("Signature", "")
    if (java.security.MessageDigest.isEqual(
        expect.getBytes("UTF-8"), got.getBytes("UTF-8"))) Right(access)
    else Left(("SignatureDoesNotMatch", "signature mismatch"))
  }
}
