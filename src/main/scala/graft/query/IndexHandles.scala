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

  /** Driver-local dictionary when it's small enough (default ≤ 1M terms,
    * tens of MB): query expansion then runs as a local loop — ZERO Spark
    * jobs to plan a query. Big dictionaries keep the distributed scan.
    * Tunable via session conf `graft.maxDriverDictTerms` (0 disables).
    */
  val driverDict: Option[Array[graft.index.Schema.TermEntry]] = {
    val maxTerms = spark.conf
      .getOption("graft.maxDriverDictTerms").map(_.toLong)
      .getOrElse(1000000L)
    if (meta("termCount").toLong <= maxTerms) {
      import spark.implicits._
      Some(terms.as[graft.index.Schema.TermEntry].collect())
    } else None
  }

  // the (docId, url) projection is the per-query serving working set, but
  // it grows with the corpus — above ~50M docs (≈ a few GB) it must not
  // compete with execution memory, so pin it to disk-backed storage only
  val docs: DataFrame = spark.read
    .parquet(IndexBuilder.docsPath(indexDir))
    .select("docId", "url")
    .coalesce(parts(meta("docCount").toLong))
    .persist(
      if (meta("docCount").toLong <= 50000000L) StorageLevel.MEMORY_AND_DISK
      else StorageLevel.DISK_ONLY)

  // reader frames built ONCE per handle: re-creating them per query would
  // redo file listing + footer/schema reads (hundreds of ms of per-query
  // latency); the lazy plans + their FileIndex are reused by every filter
  private val blocksDf: DataFrame =
    spark.read.parquet(IndexBuilder.blocksPath(indexDir))
  private val postingsDf: DataFrame =
    spark.read.parquet(IndexBuilder.postingsPath(indexDir))

  /** Blocks of the candidate terms, group-pruned at the parquet layer. */
  def blocksFor(termIds: Seq[Long]): DataFrame =
    pruned(blocksDf, termIds)

  def postingsFor(termIds: Seq[Long]): DataFrame =
    pruned(postingsDf, termIds)

  private def pruned(base: DataFrame, termIds: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    val groups = termIds.map(_ % postingGroups).distinct
    base
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
