package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef

/** Block F — multimodal plumbing (SURVEY.md §2.F): media payloads
  * travel as opaque `binary` columns with typed metadata alongside, and
  * decode/feature-extraction runs batched per partition.
  *
  * The binary fixtures are the documents' UTF-8 bytes (this container
  * has no image/audio codecs); the DECODE step is a clearly-marked
  * deterministic stub. Everything Spark-side is real: schema, typed
  * Dataset encoders, partition-preserving mapPartitions, and the
  * batch-at-a-time shape a vectorized decoder (ONNX session, JNI codec)
  * needs — `decodeBatch` is the single seam where a real model drops in.
  */
object Multimodal {

  /** F1: binary columns + typed metadata — byte length and sha256 digest
    * computed on the binary payload (codegen'd, SQL-oracled).
    */
  def mBinaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"))
      .select(
        col("doc_id"),
        length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("sha"),
        col("source"))

  val mBinaryMetaSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |  sha256(text) AS sha, source
      |FROM documents""".stripMargin

  final case class BinaryRow(doc_id: Long, payload: Array[Byte])
  final case class FeatureRow(doc_id: Long, n_bytes: Long, features: Array[Double])

  /** STUB decode/feature-extract for one batch of payloads. A real
    * implementation would hand `batch.map(_.payload)` to a vectorized
    * decoder in one call; this fake derives 4 deterministic features
    * from the bytes so the plumbing is testable end-to-end.
    */
  def decodeBatch(batch: Seq[BinaryRow]): Seq[FeatureRow] =
    batch.map { r =>
      val b = r.payload
      FeatureRow(r.doc_id, b.length.toLong, Array(
        b.length.toDouble,
        if (b.nonEmpty) (b.head & 0xFF).toDouble else 0.0,
        if (b.nonEmpty) (b.last & 0xFF).toDouble else 0.0,
        b.foldLeft(0L)((a, x) => a + (x & 0xFF)).toDouble % 997))
    }

  val BatchSize = 64

  /** F2: batched feature extraction over binary payloads — typed
    * mapPartitions, `BatchSize` rows per decoder call, no shuffle
    * (partition-preserving; parallelism = input partitioning).
    */
  def mFeatureStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[BinaryRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => decodeBatch(g.toSeq)))
      .toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 4), 1).as("f_checksum"))
  }

  /** m_feature_stub oracle: the stub's byte-sum-mod-997 feature
    * re-derived in SQL from the hex expansion of the payload (the
    * strpos table maps a hex digit to its value, '0' → 0 via not-found).
    */
  val mFeatureStubSql: String =
    """WITH h AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes, hex(encode(text)) AS hx
      |  FROM documents)
      |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
      |  round(CAST(COALESCE(list_sum(list_transform(range(1, n_bytes + 1),
      |    i -> strpos('123456789ABCDEF', hx[2*i-1]) * 16
      |       + strpos('123456789ABCDEF', hx[2*i]))), 0) % 997 AS DOUBLE), 1) AS f_checksum
      |FROM h""".stripMargin

  /** The stub-digest convention shared by the sampling/resize stubs:
    * md5-hex of the bytes' UPPERCASE-hex rendering — reproducible from
    * DuckDB's hex(payload).
    */
  private def md5OfUpperHex(bytes: Iterator[Byte]): String = {
    val hexUpper = "0123456789ABCDEF"
    val sb = new StringBuilder
    bytes.foreach { x =>
      sb.append(hexUpper((x >> 4) & 0xF)); sb.append(hexUpper(x & 0xF))
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sb.toString.getBytes("US-ASCII")).map(x => f"$x%02x").mkString
  }

  final case class FrameSampleRow(doc_id: Long, n_frames: Long, n_sampled: Long,
      sample_digest: String)

  val FrameBytes = 256
  val SampleEvery = 4

  /** STUB frame extraction: treat the payload as fixed-size frames and
    * keep every `SampleEvery`-th — the temporal-sampling shape for
    * video/audio payloads (a real decoder would produce frames from the
    * container format; the chunking/sampling/digest plumbing is what's
    * under test). Digest is the md5-hex of the sampled frames'
    * uppercase-hex concatenation — order-sensitive, and cross-engine
    * reproducible so the oracle recomputes it from hex(payload).
    */
  def sampleFrames(r: BinaryRow): FrameSampleRow = {
    val frames = r.payload.grouped(FrameBytes).toArray
    val sampled = frames.zipWithIndex.collect {
      case (f, i) if i % SampleEvery == 0 => f
    }
    val digest = md5OfUpperHex(sampled.iterator.flatten)
    FrameSampleRow(r.doc_id, frames.length.toLong, sampled.length.toLong, digest)
  }

  /** F3: frame sampling over binary payloads — typed mapPartitions,
    * batched like mFeatureStub, partition-preserving.
    */
  def mFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[BinaryRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map(sampleFrames)))
      .toDF()
  }

  /** m_frame_sample oracle: frames are 512-hex-char windows of
    * hex(payload); every 4th is sampled; the digest is md5 of their
    * concatenation.
    */
  val mFrameSampleSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n,
       |    hex(encode(text)) AS hx
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, (n + ${FrameBytes - 1}) // $FrameBytes AS nf, hx FROM h)
       |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
       |  CAST(len(list_filter(range(0, nf), i -> i % $SampleEvery = 0)) AS BIGINT) AS n_sampled,
       |  md5(array_to_string(list_transform(
       |    list_filter(range(0, nf), i -> i % $SampleEvery = 0),
       |    i -> substr(hx, CAST(i * ${FrameBytes * 2} + 1 AS INTEGER), ${FrameBytes * 2})), '')) AS sample_digest
       |FROM f""".stripMargin

  final case class ResizeRow(doc_id: Long, n_bytes: Long, n_resized: Long,
      resized_digest: String)

  val ResizeStride = 4

  /** STUB resize: keep every `ResizeStride`-th byte — the
    * downsample-by-stride shape of an image resize (a real
    * implementation hands the batch to a vectorized image library; the
    * batching, output schema and digest plumbing are what's under
    * test). Digest follows the frame-sample convention: md5 of the
    * resized bytes' uppercase-hex, reproducible from hex(payload) in
    * the oracle.
    */
  def resizePayload(r: BinaryRow): ResizeRow = {
    val b = r.payload
    val resized = Range(0, b.length, ResizeStride).map(b(_))
    val digest = md5OfUpperHex(resized.iterator)
    ResizeRow(r.doc_id, b.length.toLong, resized.length.toLong, digest)
  }

  /** F6: batched resize over binary payloads — typed mapPartitions,
    * `BatchSize` rows per (stub) resizer call, partition-preserving.
    */
  def mResizeStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[BinaryRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map(resizePayload)))
      .toDF()
  }

  val mResizeStubSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx
       |  FROM documents)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
       |  CAST(len(list_filter(range(0, n), i -> i % $ResizeStride = 0)) AS BIGINT) AS n_resized,
       |  md5(array_to_string(list_transform(
       |    list_filter(range(0, n), i -> i % $ResizeStride = 0),
       |    i -> substr(hx, CAST(i * 2 + 1 AS INTEGER), 2)), '')) AS resized_digest
       |FROM h""".stripMargin

  /** F4: modality routing by magic bytes — mixed binary payloads
    * dispatched by their file-signature prefix (PNG/JPEG/RIFF/other),
    * the gateway step before any modality-specific decoder. Detection
    * reads the BYTES (hex prefix compare on the binary column, one
    * codegen'd pass), not metadata; the fixture plants real magic
    * headers deterministically so the DuckDB oracle reconstructs the
    * same mixed corpus and routes it with the same prefix tests.
    */
  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
  private val JpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
  private val RiffMagic = "RIFF".getBytes("UTF-8")

  def mMagicRoute(s: SparkSession, d: String): DataFrame = {
    val magic = when(col("doc_id") % 4 === 0, lit(PngMagic))
      .when(col("doc_id") % 4 === 1, lit(JpegMagic))
      .when(col("doc_id") % 4 === 2, lit(RiffMagic))
      .otherwise(lit(Array.empty[Byte]))
    val payload = concat(magic, col("text").cast("binary"))
    val prefix = hex(substring(col("payload"), 1, 4))
    Tables.documents(s, d)
      .select(col("doc_id"), payload.as("payload"))
      .select(col("payload"),
        when(substring(prefix, 1, 8) === "89504E47", "image/png")
          .when(substring(prefix, 1, 6) === "FFD8FF", "image/jpeg")
          .when(substring(prefix, 1, 8) === "52494646", "audio/riff")
          .otherwise("text/plain").as("modality"))
      .groupBy("modality")
      .agg(count(lit(1)).as("cnt"),
        sum(length(col("payload"))).as("total_bytes"))
  }

  val mMagicRouteSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    (CASE CAST(doc_id % 4 AS INTEGER)
      |       WHEN 0 THEN '\x89PNG'::BLOB
      |       WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
      |       WHEN 2 THEN 'RIFF'::BLOB
      |       ELSE ''::BLOB END) || encode(text) AS payload
      |  FROM documents)
      |SELECT CASE
      |    WHEN hex(payload)[1:8] = '89504E47' THEN 'image/png'
      |    WHEN hex(payload)[1:6] = 'FFD8FF' THEN 'image/jpeg'
      |    WHEN hex(payload)[1:8] = '52494646' THEN 'audio/riff'
      |    ELSE 'text/plain' END AS modality,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes
      |FROM p GROUP BY 1""".stripMargin

  /** F5: shard manifest (WebDataset-style) — samples are packed into
    * byte-budgeted shard files and the manifest records where each
    * payload lands: (shard, file_idx, offset, byte_len). This is the
    * bookkeeping a training dataloader seeks by. Deterministic AND
    * distributed: shard = hash of the stable id (so packing
    * parallelizes — a global byte cumsum would serialize the corpus
    * through one partition), order by id within shard, running byte
    * count, file/offset derived from the bytes-before-this-sample.
    * A sample larger than the budget starts in its computed file and
    * overflows it — same contract as t_pack's token bins.
    */
  private val ShardBudget = 16384L

  def mShardPack(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        length(col("text").cast("binary")).as("byte_len"))
      .withColumn("cum", sum(col("byte_len")).over(w))
      .withColumn("file_idx", expr(s"(cum - byte_len) div ${ShardBudget}L"))
      .withColumn("offset",
        col("cum") - col("byte_len") - col("file_idx") * ShardBudget)
      .select("doc_id", "shard", "file_idx", "offset", "byte_len")
  }

  val mShardPackSql: String =
    s"""SELECT doc_id, shard,
       |  CAST((cum - byte_len) // $ShardBudget AS BIGINT) AS file_idx,
       |  CAST(cum - byte_len - ((cum - byte_len) // $ShardBudget) * $ShardBudget AS BIGINT) AS offset,
       |  byte_len
       |FROM (
       |  SELECT doc_id, doc_id % 8 AS shard,
       |    octet_length(encode(text)) AS byte_len,
       |    SUM(octet_length(encode(text))) OVER (PARTITION BY doc_id % 8
       |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM documents)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("m_binary_meta", mBinaryMeta, Some(mBinaryMetaSql)),
    QueryDef("m_shard_pack", mShardPack, Some(mShardPackSql)),
    QueryDef("m_feature_stub", mFeatureStub, Some(mFeatureStubSql)),
    QueryDef("m_frame_sample", mFrameSample, Some(mFrameSampleSql)),
    QueryDef("m_resize_stub", mResizeStub, Some(mResizeStubSql)),
    QueryDef("m_magic_route", mMagicRoute, Some(mMagicRouteSql)),
  )
}
