package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque BINARY payloads + typed metadata,
  * processed batch-wise in mapPartitions (the Scala analogue of a pandas
  * `mapInPandas` batch UDF — one buffer of rows at a time, vectorizable
  * decode in the middle).
  *
  * Image decode is REAL for PNG/JPEG/GIF/BMP via `javax.imageio` (ships in
  * the JDK — no external codec needed): width/height/channels from the
  * decoded raster, meanLuma and a 64-bit average-hash (aHash) from an 8×8
  * deterministic luma sample grid. Payloads that are not a decodable image
  * (and video frames, whose codecs are NOT in the JDK) fall back to
  * `decodeImageStub`, a deterministic fake derived from byte stats, so the
  * pipeline shape stays testable on any payload.
  */
object Multimodal {

  final case class ImageMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      meanLuma: Double,
      phash: Long)

  /** True when the payload starts with a magic number ImageIO can decode
    * out of the box (PNG / JPEG / GIF / BMP).
    */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Real decode for JDK-supported formats; deterministic stub otherwise.
    * meanLuma and phash come from an 8×8 grid of Rec.601 luma samples
    * (cell centers) — cheap, O(64) getRGB calls regardless of image size,
    * and deterministic across runs. phash = average-hash: bit i set iff
    * sample i is brighter than the grid mean.
    */
  def decodeImage(docId: Long, bytes: Array[Byte]): ImageMeta = {
    if (!looksLikeImage(bytes)) return decodeImageStub(docId, bytes)
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return decodeImageStub(docId, bytes)
      val w = img.getWidth
      val h = img.getHeight
      val channels = img.getColorModel.getNumComponents
      val g = new Array[Double](64)
      var yi = 0
      while (yi < 8) {
        var xi = 0
        while (xi < 8) {
          val px = img.getRGB(
            math.min(w - 1, xi * w / 8 + w / 16),
            math.min(h - 1, yi * h / 8 + h / 16))
          val r = (px >> 16) & 0xff
          val gg = (px >> 8) & 0xff
          val b = px & 0xff
          g(yi * 8 + xi) = 0.299 * r + 0.587 * gg + 0.114 * b
          xi += 1
        }
        yi += 1
      }
      val mean = g.sum / 64
      var ph = 0L
      var i = 0
      while (i < 64) {
        if (g(i) > mean) ph |= (1L << i)
        i += 1
      }
      ImageMeta(docId, w, h, channels, math.rint(mean * 1000) / 1000, ph)
    } catch {
      case _: Exception => decodeImageStub(docId, bytes) // corrupt payload
    }
  }

  /** STUB decode: deterministic pseudo-metadata from raw bytes, used for
    * payloads that are not a JDK-decodable image (and for video frames).
    */
  def decodeImageStub(docId: Long, bytes: Array[Byte]): ImageMeta = {
    val n = math.max(1, bytes.length)
    var sum = 0L
    var h = 1469598103934665603L // FNV-1a 64
    var i = 0
    while (i < bytes.length) {
      sum += (bytes(i) & 0xff)
      h = (h ^ (bytes(i) & 0xff)) * 1099511628211L
      i += 1
    }
    val w = 64 + (n % 512).toInt
    ImageMeta(docId, w, math.max(1, n / w), 3,
      math.rint(sum.toDouble / n * 1000) / 1000, h)
  }

  /** Treat the documents' text bytes as a fake binary payload column and
    * run the batch decode pipeline over it: binary column in, typed
    * metadata out, one partition-sized batch at a time.
    */
  def imageMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        col("text").cast("binary").as("payload")) // stand-in binary column
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real codecs want reuse of decoder state per batch — this is the
        // seam where a JNI/codec context would be opened once per partition
        batch.map { case (id, bytes) => decodeImage(id, bytes) }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame-sampling shape for video-like payloads: split the payload into
    * fixed-size "frames", sample every `stride`-th, emit (doc_id, frameIdx,
    * frameHash) — the partitioning/explode pattern a real frame sampler
    * uses.
    */
  def frameSample(
      spark: SparkSession,
      sfDir: String,
      frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frames = bytes.grouped(frameBytes).zipWithIndex
        frames.collect {
          case (frame, idx) if idx % stride == 0 =>
            var h = 1469598103934665603L
            frame.foreach(b => h = (h ^ (b & 0xff)) * 1099511628211L)
            (id, idx, h)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_hash")
      .orderBy("doc_id", "frame_idx")
  }
}
