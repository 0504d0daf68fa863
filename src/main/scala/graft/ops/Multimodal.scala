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
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): [[decodeStub]] produces a deterministic fake feature vector
  * from the bytes. The Spark-side contract — schemas, partition sizing,
  * batch iteration, metadata passthrough — is real and tested; swapping the
  * stub for a JNI/OpenCV/ffmpeg call changes one function.
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

  /** STUB media decoder: a real implementation would decode the image/audio
    * payload and extract features; this derives a deterministic pseudo-feature
    * vector from the payload bytes so the pipeline is testable end-to-end.
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

  /** Batch feature extraction over the media table. The returned plan is a
    * narrow mapPartitions — at 100 TB this runs embarrassingly parallel with
    * partition sizes controlled by `spark.sql.files.maxPartitionBytes` on the
    * upstream scan.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "mime", "bytes").mapPartitions { rows =>
      // Per-partition init (a real decoder would open codec state here, once).
      rows.map { r =>
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        Row(r.getLong(0), r.getString(1),
          if (bytes == null) 0 else bytes.length,
          decodeStub(bytes).toSeq)
      }
    }(enc)
  }

  /** Image resize over the media table: payloads re-encoded to the target
    * box (aspect-preserving), metadata updated to the computed dimensions,
    * non-image rows passed through untouched. The pixel resample itself is
    * STUBBED ([[resizeStub]] — a deterministic byte transform standing in
    * for the decoder+scaler); the schema/metadata/batch plumbing is real:
    * same narrow per-partition batch shape as [[extractFeatures]].
    */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "doc_id", "mime", "bytes", "meta").mapPartitions { rows =>
      rows.map { r =>
        val mime = r.getString(2)
        val meta = if (r.isNullAt(4)) null else r.getStruct(4)
        val bytes = if (r.isNullAt(3)) null else r.getAs[Array[Byte]](3)
        val w = if (meta == null || meta.isNullAt(0)) null else meta.get(0)
        val h = if (meta == null || meta.isNullAt(1)) null else meta.get(1)
        if (!mime.startsWith("image/") || bytes == null || w == null || h == null) r
        else {
          val (w0, h0) = (w.asInstanceOf[Int], h.asInstanceOf[Int])
          // Aspect-preserving fit into (maxW, maxH), never upscaling.
          val scale = math.min(1.0, math.min(maxW.toDouble / w0, maxH.toDouble / h0))
          val (w1, h1) = (math.max(1, (w0 * scale).round.toInt),
            math.max(1, (h0 * scale).round.toInt))
          Row(r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1), mime,
            resizeStub(bytes, w0, h0, w1, h1),
            Row(w1, h1, if (meta.isNullAt(2)) null else meta.getLong(2)))
        }
      }
    }(enc)
  }

  /** STUB pixel resample: deterministic proportional byte subsample (a real
    * implementation decodes, scales, re-encodes).
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

  /** Deterministic synthetic media table (for tests/demos — payload bytes
    * derived from the id).
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val mimes = Seq("image/png", "image/jpeg", "audio/wav", "video/mp4")
    spark.range(n.toLong).select(col("id").as("media_id")).map { r =>
      val id = r.getLong(0)
      val mime = mimes((id % 4).toInt)
      val bytes = Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 31 + i) & 0x7F).toByte)
      val isVideo = mime.startsWith("video/")
      val isImage = mime.startsWith("image/")
      (id, id / 2, mime, bytes,
        (if (isImage) Some(64) else None, if (isImage) Some(48) else None,
          if (isVideo) Some(5000L) else None))
    }.toDF("media_id", "doc_id", "mime", "bytes", "m")
      .select(col("media_id"), col("doc_id"), col("mime"), col("bytes"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("duration_ms")).as("meta"))
  }
}
