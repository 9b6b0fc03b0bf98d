package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef

/** Block F — multimodal plumbing (SURVEY.md §2.F): media payloads
  * travel as opaque `binary` columns with typed metadata alongside, and
  * decode/feature-extraction runs batched per partition.
  *
  * The image path is REAL: payloads are genuine PNGs (synthesized
  * deterministically, encoded and decoded with javax.imageio — pure
  * JDK, no external codec), and m_decode_features / m_resize read
  * actual decoded rasters. Because the fixture pixels are closed-form
  * in doc_id and PNG is lossless, the DuckDB oracle re-derives the
  * pixel stats without a codec — so the decode is hash-verified
  * end-to-end. The frame-sample path keeps opaque byte chunking (the
  * temporal-sampling shape for container formats this JDK can't parse).
  * Everything Spark-side is the production shape: typed Dataset
  * encoders, partition-preserving mapPartitions, and the
  * batch-at-a-time seam a vectorized decoder (ONNX session, JNI codec)
  * takes over at scale.
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

  val BatchSize = 64

  // ---- real image decode over the binary column ----
  //
  // The payload is a REAL PNG (encoded with javax.imageio — pure JDK,
  // no external codec), synthesized deterministically per doc: an
  // 8..16 × 8..14 grayscale image whose pixel (x, y) is
  // (doc_id·31 + 7x + 13y) mod 256. Because the pixel function is
  // closed-form in doc_id, the DuckDB oracle re-derives the pixel
  // stats WITHOUT a PNG codec — and because PNG is lossless, the
  // Spark side's encode → ImageIO.read round-trip must be pixel-exact
  // for the hash to match. The decode is therefore real, and the
  // oracle checks it end-to-end.

  def pngDims(docId: Long): (Int, Int) =
    (8 + (docId % 9).toInt, 8 + (docId % 7).toInt)

  def pngPixel(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + 7L * x + 13L * y) % 256).toInt

  /** Deterministic tiny grayscale PNG for one doc id. */
  def pngFixture(docId: Long): Array[Byte] =
    withPngWriter(writer => encodePng(writer, docId))

  /** The same fixture as a baseline JPEG (lossy twin of pngFixture —
    * same closed-form source raster, second codec through the shared
    * batch seam). Pure-JDK javax.imageio, default quality.
    */
  def jpegFixture(docId: Long): Array[Byte] =
    withImageWriter("jpeg")(writer => encodePng(writer, docId))

  private def encodePng(writer: javax.imageio.ImageWriter, docId: Long): Array[Byte] = {
    val (w, h) = pngDims(docId)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pngPixel(docId, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally ios.close()
    bos.toByteArray
  }

  /** One writer per FORMAT per batch — the seam is codec-generic: any
    * javax.imageio format name ("png", "jpeg", …) plugs in without
    * touching the batching.
    */
  private def withImageWriter[T](format: String)(f: javax.imageio.ImageWriter => T): T = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName(format).next()
    try f(writer) finally writer.dispose()
  }

  private def withPngWriter[T](f: javax.imageio.ImageWriter => T): T =
    withImageWriter("png")(f)

  /** Encode a whole partition's fixtures through ONE shared writer —
    * same amortization story as the batch decode seam (ImageIO.write's
    * per-call plugin lookup + writer construction dominated the actual
    * deflate work for these tiny images).
    */
  def pngFixturePartition(ids: Iterator[Long]): Iterator[BinaryRow] =
    ids.grouped(BatchSize).flatMap { g =>
      withPngWriter(writer => g.map(id => BinaryRow(id, encodePng(writer, id))))
    }

  final case class ImgFeatures(doc_id: Long, width: Int, height: Int,
      px_sum: Long, px_min: Int, px_max: Int)

  /** One PNG reader serving a whole batch — this is what the batch
    * seam buys: `ImageIO.read` pays plugin lookup + reader construction
    * PER IMAGE, while a reusable reader amortizes it the way a
    * vectorized decoder (ONNX session, JNI codec) amortizes model/init
    * cost over its input batch.
    */
  private def withImageReader[T](format: String)(f: javax.imageio.ImageReader => T): T = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName(format).next()
    try f(reader) finally reader.dispose()
  }

  private def withPngReader[T](f: javax.imageio.ImageReader => T): T =
    withImageReader("png")(f)

  private def readPng(reader: javax.imageio.ImageReader,
      payload: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally iis.close()
  }

  /** REAL decode/feature-extract for one batch of image payloads:
    * decode each with the shared per-batch reader for `format`, then
    * (width, height, gray-channel sum/min/max) off the decoded raster.
    */
  def decodeImageBatch(batch: Seq[BinaryRow]): Seq[ImgFeatures] =
    decodeImageBatch(batch, "png")

  def decodeImageBatch(batch: Seq[BinaryRow], format: String): Seq[ImgFeatures] =
    withImageReader(format) { reader =>
      batch.map { r =>
        val img = readPng(reader, r.payload)
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var mn = 255
        var mx = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        ImgFeatures(r.doc_id, w, h, sum, mn, mx)
      }
    }

  /** F2: batched image decode + feature extraction — PNG payloads
    * synthesized per partition, decoded with javax.imageio in
    * `BatchSize` batches via typed mapPartitions, no shuffle
    * (partition-preserving; parallelism = input partitioning).
    */
  def mDecodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(pngFixturePartition)
      .mapPartitions(_.grouped(BatchSize).flatMap(g => decodeImageBatch(g.toSeq)))
      .toDF()
  }

  /** m_decode_features oracle: pixel stats re-derived from the closed-form
    * pixel function — row-major index k ↦ (x = k mod w, y = k div w).
    * Matches only if the Spark side's PNG encode→decode round-trip is
    * pixel-exact.
    */
  val mDecodeFeaturesSql: String =
    """WITH dims AS (
      |  SELECT doc_id, CAST(8 + doc_id % 9 AS INTEGER) AS w,
      |         CAST(8 + doc_id % 7 AS INTEGER) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, unnest(range(0, CAST(w * h AS BIGINT))) AS k
      |  FROM dims)
      |SELECT doc_id, MAX(w) AS width, MAX(h) AS height,
      |  CAST(SUM((doc_id * 31 + 7 * (k % w) + 13 * (k // w)) % 256) AS BIGINT) AS px_sum,
      |  CAST(MIN((doc_id * 31 + 7 * (k % w) + 13 * (k // w)) % 256) AS INTEGER) AS px_min,
      |  CAST(MAX((doc_id * 31 + 7 * (k % w) + 13 * (k // w)) % 256) AS INTEGER) AS px_max
      |FROM px GROUP BY doc_id""".stripMargin

  final case class PatchRow(doc_id: Long, pr: Int, pc: Int,
      px_sum: Long, px_min: Int, px_max: Int)

  val PatchSize = 4

  /** ViT-style patchify for one decoded batch: the image splits into
    * non-overlapping PatchSize×PatchSize tiles (remainder rows/cols
    * dropped — the ViT convention), one output row per tile with its
    * gray-channel stats standing in for the patch embedding a
    * projection layer would compute. Shared per-batch reader, same
    * amortization seam as decodeImageBatch.
    */
  def patchifyBatch(batch: Seq[BinaryRow]): Seq[PatchRow] =
    withPngReader { reader =>
      batch.flatMap { r =>
        val img = readPng(reader, r.payload)
        val raster = img.getRaster
        val rows = img.getHeight / PatchSize
        val cols = img.getWidth / PatchSize
        for {
          pr <- 0 until rows
          pc <- 0 until cols
        } yield {
          var sum = 0L
          var mn = 255
          var mx = 0
          var y = pr * PatchSize
          while (y < (pr + 1) * PatchSize) {
            var x = pc * PatchSize
            while (x < (pc + 1) * PatchSize) {
              val v = raster.getSample(x, y, 0)
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              x += 1
            }
            y += 1
          }
          PatchRow(r.doc_id, pr, pc, sum, mn, mx)
        }
      }
    }

  /** F11: patch extraction (the ViT tokenizer step — image → fixed-size
    * patch grid, the input shape every vision-transformer training
    * pipeline materializes): real PNG decode through the batch seam,
    * then per-tile stats. Partition-preserving mapPartitions, no
    * shuffle, output volume = rows × (w/P)·(h/P) — at 100 TB the patch
    * stream is a constant factor of the decoded raster volume and
    * flows straight to the shard writer (m_shard_pack's input shape).
    * The oracle re-derives every tile from the closed-form pixel
    * function, so decode + tiling must be pixel-exact end-to-end.
    */
  def mPatchify(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(pngFixturePartition)
      .mapPartitions(_.grouped(BatchSize).flatMap(g => patchifyBatch(g.toSeq)))
      .toDF()
  }

  val mPatchifySql: String =
    """WITH dims AS (
      |  SELECT doc_id, CAST(8 + doc_id % 9 AS INTEGER) AS w,
      |         CAST(8 + doc_id % 7 AS INTEGER) AS h
      |  FROM documents),
      |g AS (SELECT doc_id, w, h,
      |        unnest(range(0, CAST((h // 4) * (w // 4) AS BIGINT))) AS t
      |      FROM dims),
      |tiles AS (SELECT doc_id, CAST(t // (w // 4) AS INTEGER) AS pr,
      |            CAST(t % (w // 4) AS INTEGER) AS pc
      |          FROM g),
      |px AS (SELECT doc_id, pr, pc,
      |         (doc_id * 31 + 7 * (pc * 4 + k % 4) + 13 * (pr * 4 + k // 4)) % 256 AS v
      |       FROM (SELECT doc_id, pr, pc, unnest(range(0, 16)) AS k FROM tiles))
      |SELECT doc_id, pr, pc, CAST(SUM(v) AS BIGINT) AS px_sum,
      |  CAST(MIN(v) AS INTEGER) AS px_min, CAST(MAX(v) AS INTEGER) AS px_max
      |FROM px GROUP BY doc_id, pr, pc""".stripMargin

  /** Route a MIXED image batch by magic bytes and decode each modality
    * through its own shared per-batch reader — m_magic_route's dispatch
    * feeding the decode seam. One reader per (format × batch), so a
    * third codec is one more format name, not new plumbing. Output is
    * grouped by format (order within a format preserved).
    */
  def decodeRoutedBatch(batch: Seq[BinaryRow]): Seq[ImgFeatures] = {
    def fmt(p: Array[Byte]): String =
      if (p.length >= 4 && p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte) "png"
      else if (p.length >= 3 && p(0) == 0xFF.toByte && p(1) == 0xD8.toByte &&
        p(2) == 0xFF.toByte) "jpeg"
      else throw new IllegalArgumentException("unroutable payload magic")
    batch.groupBy(r => fmt(r.payload)).toSeq.sortBy(_._1)
      .flatMap { case (f, g) => decodeImageBatch(g, f) }
  }

  /** The digest convention for opaque byte slices (frame sampling):
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
    * batched like mDecodeFeatures, partition-preserving.
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

  final case class ResizedImg(doc_id: Long, width: Int, height: Int,
      rw: Int, rh: Int, r_sum: Long, r_digest: String)

  val ResizeStride = 2

  /** REAL resize: decode the PNG (ImageIO.read), nearest-neighbor
    * stride-`ResizeStride` downsample OF THE DECODED RASTER —
    * out(x, y) = in(Sx, Sy), output dims ceil(w/S) × ceil(h/S). The
    * digest is md5 of the resized gray bytes' uppercase-hex in
    * row-major order (the frame-sample convention), so the oracle
    * reconstructs it from the closed-form pixel function without a
    * codec.
    */
  def resizeImageBatch(batch: Seq[BinaryRow]): Seq[ResizedImg] =
    withPngReader { reader => batch.map { r =>
      val img = readPng(reader, r.payload)
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val rw = (w + ResizeStride - 1) / ResizeStride
      val rh = (h + ResizeStride - 1) / ResizeStride
      val out = new Array[Byte](rw * rh)
      var sum = 0L
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) {
          val v = raster.getSample(x * ResizeStride, y * ResizeStride, 0)
          out(y * rw + x) = v.toByte
          sum += v
          x += 1
        }
        y += 1
      }
      ResizedImg(r.doc_id, w, h, rw, rh, sum, md5OfUpperHex(out.iterator))
    } }

  /** F6: batched real image resize — PNG fixture per partition, decode
    * + stride resample in `BatchSize` batches via typed mapPartitions,
    * partition-preserving.
    */
  def mResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(pngFixturePartition)
      .mapPartitions(_.grouped(BatchSize).flatMap(g => resizeImageBatch(g.toSeq)))
      .toDF()
  }

  final case class AugImg(doc_id: Long, aug: String, width: Int, height: Int,
      px_sum: Long, a_digest: String)

  /** Augmentations over the DECODED raster — horizontal flip
    * (out(x,y) = in(w−1−x, y)) and 1-pixel center crop
    * (out(x,y) = in(x+1, y+1), dims (w−2)×(h−2)); both pixel-exact
    * transforms of the lossless decode, so the oracle replays them
    * from the closed-form pixel function without a codec.
    */
  def augmentImageBatch(batch: Seq[BinaryRow]): Seq[AugImg] =
    withPngReader { reader => batch.flatMap { r =>
      val img = readPng(reader, r.payload)
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      def render(name: String, ow: Int, oh: Int,
          src: (Int, Int) => (Int, Int)): AugImg = {
        val out = new Array[Byte](ow * oh)
        var sum = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val (sx, sy) = src(x, y)
            val v = raster.getSample(sx, sy, 0)
            out(y * ow + x) = v.toByte
            sum += v
            x += 1
          }
          y += 1
        }
        AugImg(r.doc_id, name, ow, oh, sum, md5OfUpperHex(out.iterator))
      }
      Seq(
        render("hflip", w, h, (x, y) => (w - 1 - x, y)),
        render("crop", w - 2, h - 2, (x, y) => (x + 1, y + 1)))
    } }

  /** F11: deterministic augmentation fan-out — the 1→N expansion every
    * vision training pipeline runs between storage and the data loader
    * (RandAugment et al. with a KEYED seed, so every epoch and every
    * re-run sees the identical augmented corpus — the reproducibility
    * property the deterministic shard shuffle (m_shard_shuffle) gives
    * batches, extended to pixels). Real decode → two pixel-exact
    * variants per image (hflip + center crop) through the same batched
    * reader seam as m_resize; output rows carry the variant's dims,
    * pixel sum and row-major digest.
    *
    * Scale shape: per-partition decode+transform, partition-preserving,
    * zero shuffle — the fan-out multiplies ROWS, not tasks, and the
    * augmented bytes never leave the executor that decoded them (the
    * shard-pack step downstream is where they'd be written). 100 TB of
    * images augment at scan speed; nothing here is quadratic or keyed.
    */
  def mAugment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(pngFixturePartition)
      .mapPartitions(_.grouped(BatchSize).flatMap(g => augmentImageBatch(g.toSeq)))
      .toDF()
  }

  val mAugmentSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(8 + doc_id % 9 AS INTEGER) AS w,
       |         CAST(8 + doc_id % 7 AS INTEGER) AS h
       |  FROM documents),
       |v AS (
       |  SELECT doc_id, 'hflip' AS aug, w AS ow, h AS oh,
       |         unnest(range(0, CAST(w * h AS BIGINT))) AS k
       |  FROM dims
       |  UNION ALL
       |  SELECT doc_id, 'crop' AS aug, w - 2 AS ow, h - 2 AS oh,
       |         unnest(range(0, CAST((w - 2) * (h - 2) AS BIGINT))) AS k
       |  FROM dims),
       |px AS (
       |  SELECT v.doc_id, aug, ow, oh, k,
       |    CASE WHEN aug = 'hflip'
       |      THEN (v.doc_id * 31 + 7 * (ow - 1 - (k % ow)) + 13 * (k // ow)) % 256
       |      ELSE (v.doc_id * 31 + 7 * ((k % ow) + 1) + 13 * ((k // ow) + 1)) % 256
       |    END AS val
       |  FROM v)
       |SELECT doc_id, aug, MAX(ow) AS width, MAX(oh) AS height,
       |  CAST(SUM(val) AS BIGINT) AS px_sum,
       |  md5(string_agg(printf('%02X', val), '' ORDER BY k)) AS a_digest
       |FROM px GROUP BY doc_id, aug""".stripMargin

  final case class LossyStats(doc_id: Long, width: Int, height: Int,
      max_err_ok: Boolean, mean_err_ok: Boolean)

  private val LossyMaxErr = 64
  private val LossyMeanErrX100 = 1600 // mean abs err ≤ 16.00 gray levels

  /** Encode the closed-form raster as JPEG, decode it back, and compare
    * pixel-by-pixel against the lossless source — per image the max and
    * mean absolute error, gated against fixed tolerances.
    */
  def lossyRoundtripBatch(batch: Seq[Long]): Seq[LossyStats] =
    withImageReader("jpeg") { reader =>
      val encoded = withImageWriter("jpeg")(w => batch.map(id => id -> encodePng(w, id)))
      encoded.map { case (id, payload) =>
        val img = readPng(reader, payload)
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        var maxErr = 0
        var sumErr = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val e = math.abs(raster.getSample(x, y, 0) - pngPixel(id, x, y))
            if (e > maxErr) maxErr = e
            sumErr += e
            x += 1
          }
          y += 1
        }
        LossyStats(id, w, h, maxErr <= LossyMaxErr,
          sumErr * 100L <= LossyMeanErrX100.toLong * (w * h))
      }
    }

  /** F12: LOSSY-codec plumbing — the JPEG encode→decode roundtrip with
    * quantified degradation (the ingestion-QA step before accepting a
    * lossy transcode into a training corpus: dims must survive exactly,
    * error must stay inside tolerance). Same batched writer/reader seam
    * as the lossless path; dims are oracle-exact from the closed form,
    * and the error gates ride the q_distinct_approx convention — the
    * operator emits the measured booleans, the oracle the contract
    * (TRUE), so any codec drift past tolerance fails the hash gate.
    * Deterministic: fixed rasters through a fixed JDK codec.
    */
  def mLossyRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => lossyRoundtripBatch(g.toSeq)))
      .toDF()
  }

  val mLossyRoundtripSql: String =
    """SELECT doc_id, CAST(8 + doc_id % 9 AS INTEGER) AS width,
      |  CAST(8 + doc_id % 7 AS INTEGER) AS height,
      |  TRUE AS max_err_ok, TRUE AS mean_err_ok
      |FROM documents""".stripMargin

  /** m_resize oracle: resampled pixel (x, y) reads source pixel
    * (2x, 2y) of the closed-form image; digest re-built with
    * printf('%02X') + ordered string_agg.
    */
  val mResizeSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(8 + doc_id % 9 AS INTEGER) AS w,
       |         CAST(8 + doc_id % 7 AS INTEGER) AS h
       |  FROM documents),
       |rd AS (
       |  SELECT doc_id, w, h,
       |    CAST((w + ${ResizeStride - 1}) // $ResizeStride AS INTEGER) AS rw,
       |    CAST((h + ${ResizeStride - 1}) // $ResizeStride AS INTEGER) AS rh
       |  FROM dims),
       |rk AS (
       |  SELECT doc_id, w, h, rw, rh, unnest(range(0, CAST(rw * rh AS BIGINT))) AS k
       |  FROM rd),
       |rv AS (
       |  SELECT doc_id, w, h, rw, rh, k,
       |    (doc_id * 31 + 7 * ($ResizeStride * (k % rw)) + 13 * ($ResizeStride * (k // rw))) % 256 AS val
       |  FROM rk)
       |SELECT doc_id, MAX(w) AS width, MAX(h) AS height,
       |  MAX(rw) AS rw, MAX(rh) AS rh,
       |  CAST(SUM(val) AS BIGINT) AS r_sum,
       |  md5(string_agg(printf('%02X', val), '' ORDER BY k)) AS r_digest
       |FROM rv GROUP BY doc_id""".stripMargin

  /** F4: modality routing by magic bytes — mixed binary payloads
    * dispatched by their file-signature prefix (PNG/JPEG/RIFF/other),
    * the gateway step before any modality-specific decoder. Detection
    * reads the BYTES (hex prefix compare on the binary column, one
    * codegen'd pass), not metadata; the fixture plants real magic
    * headers deterministically so the DuckDB oracle reconstructs the
    * same mixed corpus and routes it with the same prefix tests.
    */
  // ---- real audio decode over the binary column ----
  //
  // The payload is a REAL RIFF/WAVE file (PCM s16le mono @ 8 kHz),
  // synthesized deterministically per doc and decoded with
  // javax.sound.sampled (pure JDK, no external codec) — the audio twin
  // of the PNG path: the sample function is closed-form in doc_id, so
  // the DuckDB oracle re-derives the amplitude stats WITHOUT an audio
  // codec, and because PCM is lossless the AudioSystem parse →
  // frame-read round-trip must be sample-exact for the hash to match.
  // This closes the m_magic_route story: the audio/riff modality it
  // dispatches now has a real decoder behind the seam.

  private val WavRate = 8000

  def wavSamples(docId: Long): Int = 64 + (docId % 65).toInt

  /** Closed-form 16-bit signed sample k for doc `docId` — exercises the
    * full signed range (negative amplitudes catch endianness/sign bugs
    * a non-negative function would miss).
    */
  def wavSample(docId: Long, k: Int): Int =
    (((docId * 37 + 11L * k) % 65536) - 32768).toInt

  /** Deterministic PCM WAV (RIFF + fmt + data, s16le mono 8 kHz). */
  def wavFixture(docId: Long): Array[Byte] = {
    val n = wavSamples(docId)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(WavRate)
      .putInt(WavRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < n) { bb.putShort(wavSample(docId, k).toShort); k += 1 }
    bb.array()
  }

  final case class AudioFeatures(doc_id: Long, n_samples: Long,
      sample_rate: Int, amp_sum: Long, amp_min: Int, amp_max: Int)

  /** REAL decode/feature-extract for one batch of WAV payloads: every
    * field below comes from the DECODER — frame count and rate from the
    * parsed fmt chunk, amplitudes from the decoded little-endian
    * frames — never from the synthesis constants, so a parse bug cannot
    * cancel out. (AudioSystem's provider lookup is JDK-static-cached;
    * the batch seam here amortizes the read buffer, and is where an
    * ffmpeg/JNI decoder would amortize real session init.)
    */
  def decodeAudioBatch(batch: Seq[BinaryRow]): Seq[AudioFeatures] = {
    val buf = new Array[Byte](8192)
    batch.map { r =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = in.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"unexpected decoded format: $fmt")
        var sum = 0L
        var mn = Int.MaxValue
        var mx = Int.MinValue
        var count = 0L
        var read = in.read(buf)
        var carry = -1 // low byte of a sample split across read()s
        while (read > 0) {
          var i = 0
          if (carry >= 0 && read > 0) {
            val v = (carry | (buf(0) << 8)).toShort.toInt
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v; count += 1
            carry = -1; i = 1
          }
          while (i + 1 < read) {
            val v = ((buf(i) & 0xFF) | (buf(i + 1) << 8)).toShort.toInt
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v; count += 1
            i += 2
          }
          if (i < read) carry = buf(i) & 0xFF
          read = in.read(buf)
        }
        AudioFeatures(r.doc_id, count, fmt.getSampleRate.toInt, sum, mn, mx)
      } finally in.close()
    }
  }

  /** F7: batched audio decode + amplitude stats — WAV payloads
    * synthesized per partition, decoded with javax.sound in `BatchSize`
    * batches via typed mapPartitions, no shuffle (same partition-
    * preserving shape as m_decode_features).
    */
  def mAudioFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => BinaryRow(id, wavFixture(id))))
      .mapPartitions(_.grouped(BatchSize).flatMap(g => decodeAudioBatch(g.toSeq)))
      .toDF()
  }

  /** m_audio_features oracle: amplitude stats re-derived from the
    * closed-form sample function — integer-exact, codec-free. Matches
    * only if the Spark side's WAV encode → AudioSystem decode
    * round-trip is sample-exact.
    */
  val mAudioFeaturesSql: String =
    """WITH n AS (
      |  SELECT doc_id, 64 + doc_id % 65 AS n_samples FROM documents),
      |sm AS (
      |  SELECT doc_id, n_samples, (doc_id * 37 + 11 * unnest(range(0, n_samples))) % 65536 - 32768 AS s
      |  FROM n)
      |SELECT doc_id, CAST(MAX(n_samples) AS BIGINT) AS n_samples,
      |  CAST(8000 AS INTEGER) AS sample_rate,
      |  CAST(SUM(s) AS BIGINT) AS amp_sum,
      |  CAST(MIN(s) AS INTEGER) AS amp_min,
      |  CAST(MAX(s) AS INTEGER) AS amp_max
      |FROM sm GROUP BY doc_id""".stripMargin

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

  /** F10: deterministic training-order shuffle — the WebDataset loader
    * discipline: an SGD epoch needs a pseudo-random sample order that
    * is REPRODUCIBLE (resume mid-epoch, re-run a job, audit a batch)
    * and cheap at 100 TB. Order = md5-keyed shard permutation × md5-
    * keyed within-shard permutation, seeded by the epoch number; the
    * global position is ARITHMETIC (per-shard base offsets from a
    * bounded 8-row manifest, broadcast) — there is NO global sort
    * anywhere, the only per-row work is one md5 and one within-shard
    * window, so the plan is one shuffle per epoch regardless of corpus
    * size. Two epochs are emitted to pin that the seed actually
    * permutes differently.
    */
  def mShardShuffle(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"))
      .withColumn("epoch", explode(array(lit(0), lit(1))))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard").orderBy("skey", "doc_id")
    val keyed = docs
      .withColumn("skey", md5(concat_ws(":", col("epoch"), col("doc_id"))))
      .withColumn("in_rank", row_number().over(wIn))
    val sizes = keyed.groupBy("epoch", "shard").agg(count(lit(1)).as("n"))
      .withColumn("shard_key", md5(concat_ws(":", col("epoch"), col("shard"))))
    val wSh = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch").orderBy("shard_key", "shard")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bases = sizes
      .withColumn("base", coalesce(sum("n").over(wSh), lit(0L)))
      .select("epoch", "shard", "base")
    keyed.join(broadcast(bases), Seq("epoch", "shard"))
      .select(col("epoch"), (col("base") + col("in_rank") - 1).as("pos"),
        col("shard"), col("doc_id"))
  }

  val mShardShuffleSql: String =
    """WITH e AS (
      |  SELECT doc_id, doc_id % 8 AS shard, epoch
      |  FROM documents, (SELECT unnest([0, 1]) AS epoch)),
      |k AS (
      |  SELECT *, md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS skey
      |  FROM e),
      |r AS (
      |  SELECT epoch, shard, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY skey, doc_id) AS in_rank
      |  FROM k),
      |sz AS (
      |  SELECT epoch, shard, COUNT(*) AS n,
      |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(shard AS VARCHAR)) AS shard_key
      |  FROM e GROUP BY 1, 2),
      |b AS (
      |  SELECT epoch, shard,
      |    COALESCE(SUM(n) OVER (PARTITION BY epoch ORDER BY shard_key, shard
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
      |  FROM sz)
      |SELECT r.epoch, CAST(b.base + r.in_rank - 1 AS BIGINT) AS pos, r.shard, r.doc_id
      |FROM r JOIN b USING (epoch, shard)""".stripMargin

  // ---- F8: perceptual-hash image dedup ----
  //
  // The image-dedup primitive a multimodal pipeline runs at scale:
  // average-hash (aHash) over the REAL decoded raster — 8×8
  // nearest-neighbor resample, mean threshold, 64 bits as 4×16-bit
  // bands — then SimHash-style band-equality candidate generation and
  // an exact hamming verify (≤ 3). Banding is pigeonhole-exhaustive at
  // this threshold: 3 differing bits cannot touch all 4 bands, so every
  // qualifying pair shares at least one exact band — candidates come
  // from an equi-join, never an all-pairs scan. The fixture pixel
  // function is NONLINEAR in (x, y, id) — the linear m_decode ramp
  // binarizes into near-identical patterns and collided ~5% of ALL
  // pairs at hamming ≤ 3, drowning the semantics. Planted near-dups:
  // every id ≡ 0 (mod 7) doc re-encoded (+1M id) from a brightness-
  // shifted raster (min(px+3, 255)) — aHash's mean-relative threshold
  // makes the shifted twin hash-identical away from saturation, which
  // is exactly the invariance perceptual hashing buys over sha256.
  // Decode is REAL (javax.imageio through the shared batch reader);
  // the oracle re-derives every sample, bit, band, candidate and
  // hamming distance from the closed-form pixels.

  def phashPixel(id: Long, x: Int, y: Int): Int =
    ((id * 131 + (x + 3).toLong * (y + 5) * (id % 17 + 1) + 7L * x + 13L * y) % 256).toInt

  private def encodePhashPng(writer: javax.imageio.ImageWriter,
      id: Long, shift: Int): Array[Byte] = {
    val (w, h) = pngDims(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, math.min(phashPixel(id, x, y) + shift, 255))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try { writer.setOutput(ios); writer.write(img) } finally ios.close()
    bos.toByteArray
  }

  final case class PhashRow(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** aHash for one batch of decoded images: 8×8 nearest resample
    * (sx = x·w div 8), integer mean threshold (64·v ≥ Σv — no
    * division), 4×16-bit bands.
    */
  def phashBatch(batch: Seq[BinaryRow]): Seq[PhashRow] =
    withPngReader { reader =>
      batch.map { r =>
        val img = readPng(reader, r.payload)
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val samp = new Array[Int](64)
        var s = 0
        var k = 0
        while (k < 64) {
          val v = raster.getSample((k % 8) * w / 8, (k / 8) * h / 8, 0)
          samp(k) = v; s += v; k += 1
        }
        val bands = new Array[Int](4)
        k = 0
        while (k < 64) {
          if (64 * samp(k) >= s) bands(k / 16) |= 1 << (k % 16)
          k += 1
        }
        PhashRow(r.doc_id, bands(0), bands(1), bands(2), bands(3))
      }
    }

  /** Candidate pairs for hamming ≤ 3 over the 64-bit aHash, WIDE bands
    * + multiprobe (the d_simhash scale lesson applied to images): 2
    * bands × 32 bits; by pigeonhole a qualifying pair has some band
    * differing by ≤ 1 bit, and the probe side posts every single-bit
    * variant of each band (2×33 rows/image), so recall at ≤ 3 stays
    * EXACT while band buckets live in a 2³² space instead of the 2¹⁶
    * one — the narrow 16-bit variant measured ~5% of ALL pairs
    * colliding on a low-entropy (near-constant raster) corpus, which is
    * the quadratic blow-up this trades 33× probe rows to avoid.
    */
  private[graft] def phashCandidates(hashes: DataFrame): DataFrame = {
    val wide = hashes.select(col("doc_id"),
      shiftleft(col("b0").cast("long"), 16).bitwiseOR(col("b1")).as("w0"),
      shiftleft(col("b2").cast("long"), 16).bitwiseOR(col("b3")).as("w1"))
    val exact = wide.select(col("doc_id"),
      posexplode(array(col("w0"), col("w1"))).as(Seq("t", "bv")))
    val probes = exact.select(col("doc_id"), col("t"), explode(array(
      (col("bv") +: (0 until 32).map(i =>
        col("bv").bitwiseXOR(lit(1L << i)))): _*)).as("pv"))
    probes.as("x")
      .join(exact.as("y"),
        col("x.t") === col("y.t") && col("x.pv") === col("y.bv"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
  }

  /** The narrow 4×16-bit equality banding (kept for the economics spec:
    * same recall contract at ≤ 3, quadratically worse candidate volume
    * on low-entropy hash populations).
    */
  private[graft] def phashCandidatesNarrow(hashes: DataFrame): DataFrame = {
    val bands = hashes.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("t", "bv")))
    bands.as("x").join(bands.as("y"), Seq("t", "bv"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
  }

  def mDedupPhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id")).as[Long]
    def encoded(shift: Int, offset: Long, only7: Boolean) = {
      val base = if (only7) ids.filter(_ % 7 == 0) else ids
      base.mapPartitions(_.grouped(BatchSize).flatMap(g =>
        withPngWriter(w => g.map(id =>
          BinaryRow(id + offset, encodePhashPng(w, id, shift))))))
    }
    val hashes = graft.Stage.cached(
      encoded(0, 0L, only7 = false).union(encoded(3, 1000000L, only7 = true))
        .mapPartitions(_.grouped(BatchSize).flatMap(g => phashBatch(g.toSeq)))
        .toDF())
    val cand = phashCandidates(hashes)
    cand
      .join(hashes.select(col("doc_id").as("id_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), Seq("id_a"))
      .join(hashes.select(col("doc_id").as("id_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), Seq("id_b"))
      .withColumn("hamming", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
  }

  val mDedupPhashSql: String =
    """WITH corpus AS (
      |  SELECT doc_id AS img_id, doc_id AS src, 0 AS shift FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 3 FROM documents WHERE doc_id % 7 = 0),
      |dims AS (
      |  SELECT img_id, src, shift,
      |    CAST(8 + src % 9 AS BIGINT) AS w, CAST(8 + src % 7 AS BIGINT) AS h
      |  FROM corpus),
      |samp AS (
      |  SELECT img_id, k,
      |    least((src * 131
      |        + ((k % 8) * w // 8 + 3) * ((k // 8) * h // 8 + 5) * (src % 17 + 1)
      |        + 7 * ((k % 8) * w // 8) + 13 * ((k // 8) * h // 8)) % 256 + shift,
      |      255) AS v
      |  FROM dims, (SELECT unnest(range(0, 64)) AS k)),
      |ssum AS (SELECT img_id, CAST(SUM(v) AS BIGINT) AS s FROM samp GROUP BY 1),
      |bits AS (
      |  SELECT samp.img_id, k, CASE WHEN 64 * v >= s THEN 1 ELSE 0 END AS bit
      |  FROM samp JOIN ssum ON ssum.img_id = samp.img_id),
      |bands AS (
      |  SELECT img_id, CAST(k // 16 AS INTEGER) AS t,
      |    CAST(SUM(bit * (1 << CAST(k % 16 AS INTEGER))) AS BIGINT) AS bv
      |  FROM bits GROUP BY 1, 2),
      |hash4 AS (
      |  SELECT img_id,
      |    MAX(CASE WHEN t = 0 THEN bv END) AS b0,
      |    MAX(CASE WHEN t = 1 THEN bv END) AS b1,
      |    MAX(CASE WHEN t = 2 THEN bv END) AS b2,
      |    MAX(CASE WHEN t = 3 THEN bv END) AS b3
      |  FROM bands GROUP BY 1),
      |cand AS (
      |  SELECT DISTINCT x.img_id AS id_a, y.img_id AS id_b
      |  FROM bands x JOIN bands y
      |    ON x.t = y.t AND x.bv = y.bv AND x.img_id < y.img_id)
      |SELECT id_a, id_b, hamming FROM (
      |  SELECT id_a, id_b,
      |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      |       + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
      |      AS INTEGER) AS hamming
      |  FROM cand
      |  JOIN hash4 a ON a.img_id = id_a
      |  JOIN hash4 b ON b.img_id = id_b)
      |WHERE hamming <= 3""".stripMargin

  /** F9: shard READ-BACK — the loader side of m_shard_pack's manifest
    * (the WebDataset round trip): shard blobs are physically
    * materialized per (shard, file) by concatenating the member
    * payloads in manifest order (one shuffle — shard building IS a
    * data movement; each blob is budget-bounded so the per-group
    * concat is bounded memory), then every sample is re-extracted by
    * its manifest (offset, byte_len) slice and byte-verified against
    * the original payload (sha256 equality computed IN the query). The
    * oracle asserts n_ok = n_samples per shard — a wrong offset, a
    * mis-ordered concat, or an off-by-one slice surfaces as a hash
    * mismatch, the same verified-decode contract as the image twins.
    * (The fold-concat copies the accumulated blob per member — fine at
    * the 16 KB demo budget; a production shard writer streams members
    * through an output stream at the mapPartitions seam instead.)
    */
  def mShardRead(s: SparkSession, d: String): DataFrame = {
    val manifest = mShardPack(s, d)
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    // PHYSICAL offsets: the manifest's `offset` is budget-relative
    // addressing, but a member that OVERHANGS the byte budget pushes
    // the next file's first member past (file_idx · budget) — within a
    // concatenated blob the true offset is the running sum of earlier
    // members' lengths in the SAME file (this distinction is exactly
    // what the verified read-back exists to catch)
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "file_idx").orderBy("doc_id")
    val members = manifest.join(payloads, Seq("doc_id"))
      .withColumn("phys_off", sum(col("byte_len")).over(wf) - col("byte_len"))
    val blobs = members
      .groupBy("shard", "file_idx")
      .agg(sort_array(collect_list(struct(col("phys_off"), col("payload")))).as("parts"))
      .select(col("shard"), col("file_idx"),
        aggregate(col("parts"), lit(Array.emptyByteArray),
          (a, x) => concat(a, x.getField("payload"))).as("blob"))
    members
      .join(blobs, Seq("shard", "file_idx"))
      .select(col("shard"), col("byte_len"),
        (sha2(expr("substring(blob, phys_off + 1, byte_len)"), 256) ===
          sha2(col("payload"), 256)).as("ok"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
        sum(col("byte_len")).cast("long").as("total_bytes"))
  }

  val mShardReadSql: String =
    """SELECT doc_id % 8 AS shard, COUNT(*) AS n_samples,
      |  CAST(COUNT(*) AS BIGINT) AS n_ok,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1""".stripMargin

  final case class HistRow(doc_id: Long, bucket: Int, cnt: Long)

  /** Intensity histogram for one decoded batch: 16 buckets of the gray
    * channel (v div 16), one row per OCCUPIED bucket. The exposure/
    * contrast profile an image-quality gate reads (all-dark, all-blown,
    * low-dynamic-range screens).
    */
  def intensityHistBatch(batch: Seq[BinaryRow]): Seq[HistRow] =
    withPngReader { reader =>
      batch.flatMap { r =>
        val img = readPng(reader, r.payload)
        val raster = img.getRaster
        val counts = new Array[Long](16)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            counts(raster.getSample(x, y, 0) / 16) += 1
            x += 1
          }
          y += 1
        }
        counts.zipWithIndex.collect { case (c, b) if c > 0 => HistRow(r.doc_id, b, c) }
      }
    }

  /** F14: per-image intensity histogram off the REAL decoded raster —
    * 16 gray buckets, integer counts, one row per occupied bucket.
    * Same batched-decode seam and partition-preserving shape as
    * m_decode_features; the oracle re-derives the buckets from the
    * closed-form pixel function, so the decode stays hash-verified.
    */
  def mIntensityHist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(pngFixturePartition)
      .mapPartitions(_.grouped(BatchSize).flatMap(g => intensityHistBatch(g.toSeq)))
      .toDF()
  }

  val mIntensityHistSql: String =
    """WITH dims AS (
      |  SELECT doc_id, CAST(8 + doc_id % 9 AS INTEGER) AS w,
      |         CAST(8 + doc_id % 7 AS INTEGER) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, unnest(range(0, CAST(w * h AS BIGINT))) AS k
      |  FROM dims)
      |SELECT doc_id,
      |  CAST(((doc_id * 31 + 7 * (k % w) + 13 * (k // w)) % 256) // 16 AS INTEGER) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM px GROUP BY 1, 2""".stripMargin

  final case class SharpRow(doc_id: Long, n_interior: Long,
      lap_sum: Long, lap_sq_sum: Long)

  /** 4-neighbor Laplacian stats for one decoded batch — the classic
    * variance-of-Laplacian blur/sharpness screen: interior pixels
    * only, lap = 4v − left − right − up − down, integer sums.
    */
  def sharpnessBatch(batch: Seq[BinaryRow]): Seq[SharpRow] =
    withPngReader { reader =>
      batch.map { r =>
        val img = readPng(reader, r.payload)
        val raster = img.getRaster
        var n = 0L
        var s = 0L
        var sq = 0L
        var y = 1
        while (y < img.getHeight - 1) {
          var x = 1
          while (x < img.getWidth - 1) {
            val lap = 4L * raster.getSample(x, y, 0) -
              raster.getSample(x - 1, y, 0) - raster.getSample(x + 1, y, 0) -
              raster.getSample(x, y - 1, 0) - raster.getSample(x, y + 1, 0)
            n += 1; s += lap; sq += lap * lap
            x += 1
          }
          y += 1
        }
        SharpRow(r.doc_id, n, s, sq)
      }
    }

  /** F15: variance-of-Laplacian sharpness (the standard blur detector
    * an image-quality pipeline runs before training ingestion) off the
    * REAL decoded raster. On the closed-form fixture the source is
    * linear in (x, y), so the Laplacian is zero except at the mod-256
    * wrap seams — giving deterministic nonzero variance the oracle
    * re-derives arithmetically (every neighbor term re-expanded from
    * the pixel function). Variance combines the BIGINT sums as
    * (n·Σl² − (Σl)²)/n² in DOUBLE with an identical expression tree.
    */
  def mSharpness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(pngFixturePartition)
      .mapPartitions(_.grouped(BatchSize).flatMap(g => sharpnessBatch(g.toSeq)))
      .toDF()
      .select(col("doc_id"), col("n_interior"), col("lap_sum"), col("lap_sq_sum"),
        expr("""CASE WHEN n_interior > 0
                THEN CAST(n_interior * lap_sq_sum - lap_sum * lap_sum AS DOUBLE)
                     / CAST(n_interior * n_interior AS DOUBLE)
                ELSE 0.0D END""").as("lap_var"))
  }

  val mSharpnessSql: String =
    """WITH dims AS (
      |  SELECT doc_id, CAST(8 + doc_id % 9 AS INTEGER) AS w,
      |         CAST(8 + doc_id % 7 AS INTEGER) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, unnest(range(0, CAST(w * h AS BIGINT))) AS k
      |  FROM dims),
      |ip AS (
      |  SELECT doc_id, w, h, k % w AS x, k // w AS y FROM px
      |  WHERE k % w BETWEEN 1 AND w - 2 AND k // w BETWEEN 1 AND h - 2),
      |lap AS (
      |  SELECT doc_id,
      |    4 * ((doc_id * 31 + 7 * x + 13 * y) % 256)
      |      - ((doc_id * 31 + 7 * (x - 1) + 13 * y) % 256)
      |      - ((doc_id * 31 + 7 * (x + 1) + 13 * y) % 256)
      |      - ((doc_id * 31 + 7 * x + 13 * (y - 1)) % 256)
      |      - ((doc_id * 31 + 7 * x + 13 * (y + 1)) % 256) AS l
      |  FROM ip),
      |sums AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_interior,
      |    CAST(SUM(l) AS BIGINT) AS lap_sum,
      |    CAST(SUM(l * l) AS BIGINT) AS lap_sq_sum
      |  FROM lap GROUP BY 1)
      |SELECT doc_id, n_interior, lap_sum, lap_sq_sum,
      |  CASE WHEN n_interior > 0
      |       THEN CAST(n_interior * lap_sq_sum - lap_sum * lap_sum AS DOUBLE)
      |            / CAST(n_interior * n_interior AS DOUBLE)
      |       ELSE 0.0 END AS lap_var
      |FROM sums""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("m_intensity_hist", mIntensityHist, Some(mIntensityHistSql)),
    QueryDef("m_sharpness", mSharpness, Some(mSharpnessSql)),
    QueryDef("m_shard_read", mShardRead, Some(mShardReadSql)),
    QueryDef("m_dedup_phash", mDedupPhash, Some(mDedupPhashSql)),
    QueryDef("m_binary_meta", mBinaryMeta, Some(mBinaryMetaSql)),
    QueryDef("m_shard_pack", mShardPack, Some(mShardPackSql)),
    QueryDef("m_shard_shuffle", mShardShuffle, Some(mShardShuffleSql)),
    QueryDef("m_decode_features", mDecodeFeatures, Some(mDecodeFeaturesSql)),
    QueryDef("m_patchify", mPatchify, Some(mPatchifySql)),
    QueryDef("m_frame_sample", mFrameSample, Some(mFrameSampleSql)),
    QueryDef("m_resize", mResize, Some(mResizeSql)),
    QueryDef("m_augment", mAugment, Some(mAugmentSql)),
    QueryDef("m_lossy_roundtrip", mLossyRoundtrip, Some(mLossyRoundtripSql)),
    QueryDef("m_magic_route", mMagicRoute, Some(mMagicRouteSql)),
    QueryDef("m_audio_features", mAudioFeatures, Some(mAudioFeaturesSql)),
  )
}
