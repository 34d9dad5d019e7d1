package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{Incremental, IndexBuilder}

/** Structured Streaming front-ends for the engine.
  *
  * The reference has no streaming surface (its "dynamic re-indexing" is a
  * batch mtime diff, SURVEY.md §2.4), but a crawl pipeline at corpus scale
  * is naturally a FEED: page snapshots arriving continuously. Two
  * composable pieces:
  *
  *   - [[maintainIndex]]: readStream of page rows → `foreachBatch` →
  *     [[Incremental.update]] in upsert-only mode. Each micro-batch is a
  *     partial feed (not a full snapshot), so vanished-doc purge is off;
  *     staleness (M1) still applies per url via warc_ts, and all the
  *     incremental machinery (stable docIds, df deltas, affected-group
  *     rewrites, handle-cache invalidation) is reused unchanged — the
  *     streaming layer adds no second implementation of index maintenance.
  *   - [[crawlStats]]: watermarked sliding-window aggregation over the
  *     feed (docs + bytes per language per window) — the standard
  *     event-time monitoring companion of an ingest stream.
  *
  * Both take any streaming DataFrame of the pages shape `(url, warc_ts,
  * html, text, lang)` — a file-source over a landing directory, Kafka, or
  * a MemoryStream in tests.
  */
object StreamIngest {

  /** Continuously fold a stream of page rows into the index at `indexDir`
    * (which must already exist — build it once over the initial snapshot,
    * possibly empty). Exactly-once per micro-batch comes from the
    * checkpointed source offsets + idempotent upsert (re-applying a batch
    * whose warc_ts are not newer is a no-op by M1).
    */
  def maintainIndex(
      pagesStream: DataFrame,
      indexDir: String,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf(),
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    pagesStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // within-batch dedupe (a feed can carry several snapshots of one
          // url per batch; a crash-replay must commit the same row) is the
          // SAME last-write-wins rule update() itself applies via
          // IndexBuilder.dedupSnapshot — run it exactly once there instead
          // of paying a second identical url-window shuffle per trigger
          Incremental.update(batch.sparkSession, batch, indexDir,
            conf.copy(assumeUniqueUrls = false), purgeVanished = false)
        }
        ()
      }
      .start()
  }

  /** Watermarked per-language ingest stats: docs and raw bytes per
    * `windowDur` event-time window (sliding every `slideDur`), tolerating
    * `lateness` out-of-order arrival. Output mode append — closed windows
    * only, the shape a monitoring sink wants.
    */
  def crawlStats(
      pagesStream: DataFrame,
      windowDur: String = "1 minute",
      slideDur: String = "1 minute",
      lateness: String = "2 minutes"): DataFrame = {
    pagesStream
      .withWatermark("warc_ts", lateness)
      .groupBy(
        window(col("warc_ts"), windowDur, slideDur),
        col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        // octet_length: BYTES for the string column too — length() counts
        // characters, undercounting non-ASCII text up to 4× against the
        // binary html column's true byte size
        sum(coalesce(octet_length(col("text")), lit(0)) +
          coalesce(octet_length(col("html")), lit(0))).as("bytes"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("lang"), col("docs"), col("bytes"))
  }
}
