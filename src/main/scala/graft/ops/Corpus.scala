package graft.ops

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, Schema}

/** Adapters between the driver's `/root/testdata` tables and the engine's
  * corpus shape, plus per-sf index caching (checkpoint markers make repeat
  * builds no-ops).
  */
object Corpus {

  /** documents(doc_id, text, lang, source, n_chars) → Page rows. The url is
    * zero-padded so lexical url order == doc_id order, making docIds equal
    * doc_ids (deterministic, debuggable).
    */
  def documentsAsPages(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        format_string("doc%012d", col("doc_id")).as("url"),
        (lit(Timestamp.valueOf("2026-01-01 00:00:00"))
          .cast("timestamp")).as("warc_ts"),
        lit(null).cast("binary").as("html"),
        col("text"),
        col("lang"))
  }

  /** Stable per-sf index location; build skips entirely when meta.json
    * already exists (all stages checkpointed).
    */
  def indexDirFor(sfDir: String): String = {
    // the readable sanitization is LOSSY ("/a/sf-1" and "/a/sf_1" collide)
    // and a collision silently serves the wrong prebuilt index — suffix a
    // hash of the raw path to make the mapping injective
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    s"/tmp/graft_idx_${safe}_$digest"
  }

  def ensureIndex(spark: SparkSession, sfDir: String): String = {
    val dir = indexDirFor(sfDir)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$dir/meta.json"))) {
      // size the partition/group counts to the corpus (parquet metadata
      // count is free): a 5k-doc table does not need 32 range partitions
      val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
      val parts = math.min(32L, math.max(4L, nDocs / 2000L)).toInt
      // urls derive 1:1 from doc_id → unique by construction
      IndexBuilder.build(spark, documentsAsPages(spark, sfDir), dir,
        IndexBuilder.BuildConf(
          partitions = parts,
          postingGroups = math.min(4, parts),
          queryBuckets = math.max(8, parts * 2),
          assumeUniqueUrls = true))
    }
    dir
  }

  /** Build metrics of the cached index as a 1-row DataFrame. */
  def buildMetricsDf(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureIndex(spark, sfDir)
    val meta = IndexBuilder.readMeta(spark, dir)
    import spark.implicits._
    Seq((
      meta("buildId"),
      meta("docCount").toLong,
      meta("totalTokens").toLong,
      meta("termCount").toLong,
      meta("postingCount").toLong,
      meta("wallMs").toLong,
      meta("skewRatio").toDouble))
      .toDF("buildId", "docCount", "totalTokens", "termCount",
        "postingCount", "wallMs", "skewRatio")
  }
}
