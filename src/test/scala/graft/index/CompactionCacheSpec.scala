package graft.index

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.Synth
import graft.query.Search

/** Regression: compaction after warm queries must swap every cached plan.
  *
  * Before the `metaRev` bump in [[IndexBuilder.updateMeta]], a compaction
  * whose visible meta fields all landed on their old values (deltaSeq
  * already at compactedThrough, recomputed bucketSize unchanged) produced
  * a meta map IDENTICAL to the pre-compaction one. The fresh handle then
  * salted its persisted blocks/docs plans with the SAME versionSalt as the
  * displaced (still cache-resident, 60 s release grace) handle, and
  * Spark's CacheManager re-attached the new plans to the stale
  * pre-compaction InMemoryRelation — queries for freshly-folded terms
  * returned nothing (and crashed block-max WAND with an empty cursor set).
  * The failure needs warm caches, which is why build→commit→compact→query
  * alone never caught it.
  */
class CompactionCacheSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private val conf = IndexBuilder.BuildConf(
    partitions = 8, postingGroups = 2, queryBuckets = 8)

  private val pages: IndexedSeq[Synth.PageRow] = Synth.pages(80)

  private def pagesDf(rows: Seq[Synth.PageRow]) =
    spark.createDataset(rows.map(p =>
      Schema.Page(p.url, p.warc_ts, p.html, p.text, p.lang)))(
      org.apache.spark.sql.Encoders.product[Schema.Page]).toDF()

  test("queries stay correct through commit+compact with warm handle " +
      "caches (metaRev keeps every meta rewrite distinct)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_cache_").toString
    val idx = s"$dir/index"
    IndexBuilder.build(spark, pagesDf(pages), idx, conf)
    val metaAfterBuild = IndexBuilder.readMeta(spark, idx)
    // warm the query-path caches before the commits, like a server does
    Search.searchTop(spark, idx, "texture array shader", Search.Bm25, 10)
      .collect()
    (0 until 2).foreach { round =>
      val p = Synth.page(6000L + round).copy(
        text = s"racing commit document $round texture",
        html = null,
        warc_ts = new Timestamp(
          pages.map(_.warc_ts.getTime).max + (round + 3) * 7200000L))
      val r = Incremental.update(spark, pagesDf(IndexedSeq(p)), idx,
        conf, purgeVanished = false)
      assert(r.changed)
      // query between commits, keeping the displaced handles cache-warm
      Search.searchTop(spark, idx, "texture array shader", Search.Bm25, 10)
        .collect()
    }
    val metaBeforeCompact = IndexBuilder.readMeta(spark, idx)
    Incremental.compact(spark, idx, conf)
    val metaAfterCompact = IndexBuilder.readMeta(spark, idx)
    // the invariant the fix restores: EVERY meta rewrite is distinct
    assert(metaAfterBuild != metaBeforeCompact)
    assert(metaBeforeCompact != metaAfterCompact,
      "compaction must never republish an identical meta map")
    import spark.implicits._
    val hits = Search.searchTop(spark, idx, "racing", Search.Bm25, 10)
      .select($"url").as[String].collect().toVector
    assert(hits.exists(_.contains("6000")) && hits.exists(_.contains("6001")),
      s"post-compaction query missed freshly-folded docs: $hits")
  }
}
