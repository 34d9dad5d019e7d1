package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque BINARY payloads + typed metadata,
  * processed batch-wise in mapPartitions (the Scala analogue of a pandas
  * `mapInPandas` batch UDF — one buffer of rows at a time, vectorizable
  * decode in the middle).
  *
  * The DECODE STEP IS STUBBED: no image/audio codecs exist in this
  * container, so `decodeImageStub` derives a deterministic fake
  * (width/height/channel stats) from the bytes. The Spark-side contract —
  * schema, binary column handling, batch shape, partition sizing — is real
  * and tested; swap `decodeImageStub` for a real codec on a cluster.
  */
object Multimodal {

  final case class ImageMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      meanLuma: Double,
      phash: Long)

  /** STUB decode: deterministic pseudo-metadata from raw bytes. A real
    * implementation would parse the container header (PNG/JPEG) and
    * decode pixels; everything downstream of this function would not
    * change.
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
        batch.map { case (id, bytes) => decodeImageStub(id, bytes) }
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
