package graft.query

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.index.IndexBuilder
import graft.index.Schema.Stats

/** Hot query-side state of one index: meta + stats are collected once;
  * the dictionary and docs tables are persisted in memory (they're the
  * per-query serving working set — on a cluster these are the natural
  * executor-cache residents, while postings/blocks stay on storage and are
  * read group-pruned per query).
  */
final class IndexHandles private (
    val spark: SparkSession,
    val indexDir: String) {

  val meta: Map[String, String] = IndexBuilder.readMeta(spark, indexDir)
  val postingGroups: Int = meta("postingGroups").toInt

  val stats: Stats = {
    import spark.implicits._
    spark.read.parquet(IndexBuilder.statsPath(indexDir)).as[Stats].head()
  }

  // cached partition counts sized to the data (~1M rows per cached
  // partition), not to the writer's partitioning — a small dictionary must
  // not cost 64 scheduler rounds per query
  private def parts(rows: Long): Int =
    math.max(1, math.min(256, (rows / 1000000L).toInt + 1))

  val terms: DataFrame = spark.read
    .parquet(IndexBuilder.termsPath(indexDir))
    .coalesce(parts(meta("termCount").toLong))
    .persist(StorageLevel.MEMORY_AND_DISK)

  val docs: DataFrame = spark.read
    .parquet(IndexBuilder.docsPath(indexDir))
    .select("docId", "url")
    .coalesce(parts(meta("docCount").toLong))
    .persist(StorageLevel.MEMORY_AND_DISK)

  /** Blocks of the candidate terms, group-pruned at the parquet layer. */
  def blocksFor(termIds: Seq[Long]): DataFrame =
    pruned(IndexBuilder.blocksPath(indexDir), termIds)

  def postingsFor(termIds: Seq[Long]): DataFrame =
    pruned(IndexBuilder.postingsPath(indexDir), termIds)

  private def pruned(base: String, termIds: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    val groups = termIds.map(_ % postingGroups).distinct
    spark.read.parquet(base)
      .filter(col("group").isin(groups: _*))
      .filter(col("termId").isin(termIds: _*))
  }

  def release(): Unit = {
    terms.unpersist()
    docs.unpersist()
  }
}

object IndexHandles {
  private val cache = TrieMap.empty[String, IndexHandles]

  /** Cached handle, validated against the CURRENT meta.json: any rebuild
    * (wallMs makes every build's meta distinct) or external rewrite of the
    * index directory drops the stale cached tables. Cost: one small-file
    * read per call.
    */
  def apply(spark: SparkSession, indexDir: String): IndexHandles = {
    val cur = IndexBuilder.readMeta(spark, indexDir)
    cache.get(indexDir) match {
      case Some(h) if h.meta == cur => h
      case stale =>
        stale.foreach(_.release())
        val h = new IndexHandles(spark, indexDir)
        cache.put(indexDir, h)
        h
    }
  }

  /** Drop cached state (call after incremental updates rewrite tables). */
  def invalidate(indexDir: String): Unit =
    cache.remove(indexDir).foreach(_.release())
}
