package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the pipeline as
  * opaque `binary` columns with typed metadata, processed batch-at-a-time in
  * `mapPartitions` (the Scala analogue of `mapInPandas` — per-partition batch
  * shape, codec state initialized once per partition, output schema declared
  * up front).
  *
  * IMAGE decode/resize is REAL: `javax.imageio` (in-JDK) handles PNG/JPEG/
  * GIF/BMP, features are pixel statistics ([[imageFeatures]]), resize is a
  * Graphics2D bilinear scale re-encoded in the source format. AUDIO decode
  * is REAL for the in-JDK PCM containers (WAV/AIFF/AU via
  * `javax.sound.sampled` — [[audioFeatures]]: duration, rate, channels,
  * RMS/peak energy, zero-cross rate). Video and compressed-audio payloads
  * (no in-JDK codec) fall back to [[decodeStub]], a deterministic byte-hash
  * pseudo-feature — the pipeline shape is exercised end-to-end for every
  * modality and swapping the stub for an ffmpeg/JNI call changes one
  * function.
  */
object Multimodal {

  /** Schema of a media table: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("doc_id", LongType, nullable = true),
    StructField("mime", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  val featureDim = 8

  /** Real image decode via the in-JDK codecs (PNG/JPEG/GIF/BMP). `None` for
    * null/corrupt payloads and unsupported formats — callers fall back to
    * [[decodeStub]] so a bad file degrades, never kills the partition.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

  /** Pixel-statistic feature vector: [meanR, meanG, meanB, meanLuma,
    * stdLuma, w/4096, h/4096, aspect w/(w+h)] — all in [0,1]. Pixels are
    * sampled on a ≤64×64 grid so cost is bounded regardless of resolution.
    */
  def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (sx, sy) = (math.max(1, w / 64), math.max(1, h / 64))
    var (n, sr, sg, sb, sl, sl2) = (0L, 0.0, 0.0, 0.0, 0.0, 0.0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = ((rgb >> 16) & 0xFF) / 255.0
        val g = ((rgb >> 8) & 0xFF) / 255.0
        val b = (rgb & 0xFF) / 255.0
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l; n += 1
        x += sx
      }
      y += sy
    }
    val m = math.max(1L, n).toDouble
    val meanL = sl / m
    Array(
      (sr / m).toFloat, (sg / m).toFloat, (sb / m).toFloat, meanL.toFloat,
      math.sqrt(math.max(0.0, sl2 / m - meanL * meanL)).toFloat,
      math.min(1.0, w / 4096.0).toFloat, math.min(1.0, h / 4096.0).toFloat,
      (w.toDouble / (w + h)).toFloat)
  }

  /** Real audio decode for the in-JDK formats (WAV/AIFF/AU PCM via
    * `javax.sound.sampled` — compressed codecs like MP3 have no JDK SPI and
    * fall back to [[decodeStub]]). Features share the [[featureDim]]
    * contract: [duration/60 s, rate/96 kHz, channels/8, RMS energy, peak,
    * zero-cross rate, bits/32, samples/10M] — all clamped to [0,1].
    */
  def audioFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    if (bytes == null) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = fmt.getSampleSizeInBits
          if ((!signed && !unsigned) || (bits != 8 && bits != 16)) None
          else {
            val data = in.readAllBytes()
            val ch = math.max(1, fmt.getChannels)
            val bps = bits / 8
            val n = data.length / (bps * ch)
            if (n == 0) None
            else {
              var i = 0
              var sum2 = 0.0
              var peak = 0.0
              var crossings = 0L
              var prevNeg = false
              while (i < n) {
                // First channel of frame i, normalized to [-1, 1].
                val off = i * bps * ch
                val s =
                  if (bits == 8) {
                    val raw = if (unsigned) (data(off) & 0xFF) - 128 else data(off).toInt
                    raw / 128.0
                  } else {
                    if (fmt.isBigEndian)
                      pcm16(data(off + 1) & 0xFF, data(off), unsigned)
                    else
                      pcm16(data(off) & 0xFF, data(off + 1), unsigned)
                  }
                sum2 += s * s
                if (math.abs(s) > peak) peak = math.abs(s)
                val neg = s < 0
                if (i > 0 && neg != prevNeg) crossings += 1
                prevNeg = neg
                i += 1
              }
              val durMs = n * 1000.0 / fmt.getSampleRate
              Some(Array(
                math.min(1.0, durMs / 60000.0).toFloat,
                math.min(1.0, fmt.getSampleRate / 96000.0).toFloat,
                math.min(1.0, ch / 8.0).toFloat,
                math.sqrt(sum2 / n).toFloat,
                peak.toFloat,
                (crossings.toDouble / n).toFloat,
                math.min(1.0, bits / 32.0).toFloat,
                math.min(1.0, n / 1e7).toFloat))
            }
          }
        } finally in.close()
      } catch { case _: Exception => None }

  /** One 16-bit PCM sample normalized to [-1, 1]. Unsigned 16-bit holds
    * 0..65535: the high byte must be zero-extended, not sign-extended,
    * before the −32768 re-centering — sign-extension would map samples with
    * high byte ≥ 0x80 outside [-1, 1] (e.g. 0xFF00 → ≈ −1.008).
    */
  private[ops] def pcm16(lo: Int, hiByte: Byte, unsigned: Boolean): Double = {
    val hi = if (unsigned) hiByte & 0xFF else hiByte.toInt
    val raw = (hi << 8) | lo
    (if (unsigned) raw - 32768 else raw) / 32768.0
  }

  /** STUB media decoder for the modalities with no in-JDK codec (video,
    * compressed audio): derives a deterministic pseudo-feature vector from
    * the payload bytes so the pipeline is testable end-to-end. Also the
    * fallback for corrupt/undecodable image and audio payloads.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (bytes != null) {
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001B3L; i += 1 }
      var d = 0
      while (d < featureDim) {
        h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL
        out(d) = ((h >>> 40).toInt & 0xFFFF) / 65536.0f
        d += 1
      }
    }
    out
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Batch feature extraction over the media table: real pixel statistics
    * for decodable images ([[imageFeatures]]), [[decodeStub]] for everything
    * else. The returned plan is a narrow mapPartitions — at 100 TB this runs
    * embarrassingly parallel with partition sizes controlled by
    * `spark.sql.files.maxPartitionBytes` on the upstream scan.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "mime", "bytes").mapPartitions { rows =>
      // Per-partition init (codec state opened once): ImageIO's plugin
      // registry scan happens on first use per JVM; disk caching off keeps
      // decode purely in-memory for the small-payload common case.
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val mime = r.getString(1)
        val feats =
          if (mime != null && mime.startsWith("image/"))
            decodeImage(bytes).map(imageFeatures).getOrElse(decodeStub(bytes))
          else if (mime != null && mime.startsWith("audio/"))
            audioFeatures(bytes).getOrElse(decodeStub(bytes))
          else decodeStub(bytes)
        Row(r.getLong(0), mime, if (bytes == null) 0 else bytes.length, feats.toSeq)
      }
    }(enc)
  }

  /** Image resize over the media table: decodable payloads are REALLY
    * resized — decode ([[decodeImage]]), bilinear Graphics2D scale into the
    * (maxW, maxH) box aspect-preserving (never upscaling), re-encode in the
    * source format — with metadata updated to the actual output dimensions.
    * Non-image rows pass through untouched; undecodable image payloads fall
    * back to [[resizeStub]] driven by the metadata dims. Same narrow
    * per-partition batch shape as [[extractFeatures]].
    */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "doc_id", "mime", "bytes", "meta").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val mime = r.getString(2)
        val meta = if (r.isNullAt(4)) null else r.getStruct(4)
        val bytes = if (r.isNullAt(3)) null else r.getAs[Array[Byte]](3)
        if (mime == null || !mime.startsWith("image/") || bytes == null) r
        else decodeImage(bytes) match {
          case Some(img) =>
            val (w0, h0) = (img.getWidth, img.getHeight)
            val scale = math.min(1.0, math.min(maxW.toDouble / w0, maxH.toDouble / h0))
            val (w1, h1) = (math.max(1, (w0 * scale).round.toInt),
              math.max(1, (h0 * scale).round.toInt))
            val out = if (scale >= 1.0) bytes else reencode(scaleImage(img, w1, h1), mime)
            Row(r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1), mime, out,
              Row(w1, h1,
                if (meta == null || meta.isNullAt(2)) null else meta.getLong(2)))
          case None =>
            val w = if (meta == null || meta.isNullAt(0)) null else meta.get(0)
            val h = if (meta == null || meta.isNullAt(1)) null else meta.get(1)
            if (w == null || h == null) r
            else {
              val (w0, h0) = (w.asInstanceOf[Int], h.asInstanceOf[Int])
              val scale = math.min(1.0, math.min(maxW.toDouble / w0, maxH.toDouble / h0))
              val (w1, h1) = (math.max(1, (w0 * scale).round.toInt),
                math.max(1, (h0 * scale).round.toInt))
              Row(r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1), mime,
                resizeStub(bytes, w0, h0, w1, h1),
                Row(w1, h1, if (meta.isNullAt(2)) null else meta.getLong(2)))
            }
        }
      }
    }(enc)
  }

  private def scaleImage(img: java.awt.image.BufferedImage, w: Int, h: Int)
      : java.awt.image.BufferedImage = {
    import java.awt.image.BufferedImage
    // TYPE_INT_RGB: JPEG can't encode an alpha channel, and a canonical
    // pixel layout keeps the re-encode deterministic across source types.
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    dst
  }

  private def reencode(img: java.awt.image.BufferedImage, mime: String): Array[Byte] = {
    val fmt = mime.stripPrefix("image/") match {
      case "jpeg" | "jpg" => "jpg"
      case "gif" => "gif"
      case "bmp" => "bmp"
      case _ => "png"
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Fallback pixel resample for undecodable payloads: deterministic
    * proportional byte subsample keeping the pipeline total.
    */
  def resizeStub(bytes: Array[Byte], w0: Int, h0: Int, w1: Int, h1: Int): Array[Byte] = {
    val ratio = (w1.toLong * h1).toDouble / math.max(1L, w0.toLong * h0)
    val n = math.max(1, (bytes.length * ratio).round.toInt)
    Array.tabulate[Byte](n)(i => bytes(((i.toLong * bytes.length) / n).toInt))
  }

  /** Frame-sampling plan for video payloads: one row per sampled frame offset.
    * Frame decode is stubbed; the explode/partitioning shape is the real part.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media
      .where(col("mime").startsWith("video/"))
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"))
      .where(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("frame_ms"))

  /** Deterministic 64×48 test image: a color gradient parameterized by id
    * (so distinct ids decode to distinct pixel statistics), encoded for real
    * in the requested format.
    */
  def syntheticImageBytes(id: Long, fmt: String, w: Int = 64, h: Int = 48): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 255) / math.max(1, w - 1) + id * 37) % 256
        val g = ((y * 255) / math.max(1, h - 1) + id * 73) % 256
        val b = (id * 113 + x + y) % 256
        img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media table (for tests/demos): image rows carry
    * REAL PNG/JPEG payloads ([[syntheticImageBytes]]) so the decode path is
    * exercised end-to-end; audio/video rows carry opaque hash-derived bytes.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val mimes = Seq("image/png", "image/jpeg", "audio/wav", "video/mp4")
    spark.range(n.toLong).select(col("id").as("media_id")).map { r =>
      val id = r.getLong(0)
      val mime = mimes((id % 4).toInt)
      val isVideo = mime.startsWith("video/")
      val isImage = mime.startsWith("image/")
      val bytes =
        if (isImage) syntheticImageBytes(id, mime.stripPrefix("image/") match {
          case "jpeg" => "jpg"; case f => f
        })
        else Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 31 + i) & 0x7F).toByte)
      (id, id / 2, mime, bytes,
        (if (isImage) Some(64) else None, if (isImage) Some(48) else None,
          if (isVideo) Some(5000L) else None))
    }.toDF("media_id", "doc_id", "mime", "bytes", "m")
      .select(col("media_id"), col("doc_id"), col("mime"), col("bytes"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("duration_ms")).as("meta"))
  }
}
