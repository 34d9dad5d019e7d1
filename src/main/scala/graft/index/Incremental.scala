package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.text.{Extract, Lexer}
import Schema._

/** Incremental index maintenance (SURVEY.md §2.4, M1–M6): given a NEW
  * corpus snapshot, re-index only docs that are new or stale
  * (`warc_ts` newer than indexed — M1), purge docs that disappeared (M3),
  * and apply everything as deltas (M2/M4):
  *
  *   - docIds stay STABLE for surviving urls; new urls get ids above the
  *     old max, ranked by url (deterministic);
  *   - `terms.df` is updated by delta aggregation (±1 per unique term per
  *     changed doc), not a full recount; terms reaching df = 0 are dropped
  *     (the reference keeps zero-df `gtf` entries, which NaN-poison its own
  *     TF-IDF scores — model.rs:169 divides by 0 — so the rebuild
  *     deliberately cleans them; SURVEY.md §2.6.5);
  *   - postings/blocks/docs changes are committed as a MERGE-ON-READ delta
  *     ([[DeltaLog]]): one small sequenced directory of added rows + encoded
  *     blocks + tombstones. Base posting files are NOT rewritten — a 1-doc
  *     update writes O(1 doc) bytes, not O(index). Deltas fold into the
  *     base when [[IndexBuilder.BuildConf.deltaCompactEvery]] accumulate or
  *     tombstones exceed `tombstoneCompactFraction` of the corpus
  *     ([[compact]]);
  *   - terms + stats are still rewritten whole: they are the O(vocabulary)
  *     and O(1) metadata tables, ~1000× smaller than postings — the delta
  *     machinery would cost more than it saves there. They participate in
  *     the commit protocol through VERSIONED side dirs (__v<seq>) swapped
  *     in only after the commit marker, so a crash can never leave updated
  *     df counts next to an invisible delta (which a retry would then
  *     double-apply);
  *   - "save only if changed" (S9): an empty delta writes nothing.
  *
  * On Iceberg this maps to MERGE INTO / positional-delete files with
  * snapshot isolation; on plain parquet the delta commit is made atomic by
  * writing the tombstone table last (= the commit marker), with
  * [[recover]] rolling a crashed commit's post-marker steps forward from
  * durable state.
  */
object Incremental {

  final case class UpdateReport(
      added: Long,
      reindexed: Long,
      removed: Long,
      changed: Boolean,
      compacted: Boolean = false)

  /** `purgeVanished = false` turns the snapshot diff into an UPSERT-ONLY
    * delta: urls absent from `pagesNew` are left untouched instead of
    * purged (M3 skipped). This is the streaming-ingest contract — a
    * micro-batch is a partial feed, not a full snapshot (M5's "visited
    * set" is then the whole stream history, not one batch).
    */
  def update(
      spark: SparkSession,
      pagesNew: DataFrame,
      indexDir: String,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf(),
      purgeVanished: Boolean = true)
      : UpdateReport = {
    import spark.implicits._

    recover(spark, indexDir) // roll forward any crashed commit first
    // a compaction interrupted mid-fold (intent present, deltas still
    // visible) must finish before this update writes new delta blocks —
    // they would otherwise encode with the pre-compaction bucketSize while
    // some base groups already carry the new one
    if (readCompactingIntent(spark, indexDir).isDefined &&
        DeltaLog.listSeqs(spark, indexDir).nonEmpty)
      compact(spark, indexDir, conf)

    val docs = DeltaLog.docsView(spark, indexDir)
    val termsOld = spark.read.parquet(IndexBuilder.termsPath(indexDir))
    val postingsOld = DeltaLog.postingsView(spark, indexDir)
      .select($"termId", $"docId", $"tf", $"docLen")

    // last-write-wins per-url dedup, same as build(): a snapshot with two
    // rows for one url would otherwise multiply through the joins below
    // (pageKeys × changedPages → 4 copies, summed tf/docLen doubled,
    // duplicate doc rows under a single docId)
    val pagesIn =
      if (conf.assumeUniqueUrls) pagesNew
      else IndexBuilder.dedupSnapshot(pagesNew)
    val pageKeys = pagesIn.select($"url", $"warc_ts".as("new_ts"))

    // M1: new or stale urls
    val joined = pageKeys.join(
      docs.select($"url", $"warc_ts".as("old_ts"), $"docId".as("oldDocId")),
      Seq("url"), "left")
    val toIndexUrls = joined
      .filter($"old_ts".isNull || $"new_ts" > $"old_ts")
      .select($"url", $"oldDocId")
    // M3: purge urls no longer present (full-snapshot mode only)
    val removedDocs =
      if (purgeVanished)
        docs.join(pageKeys, Seq("url"), "left_anti")
          .select($"url", $"docId")
      else
        docs.select($"url", $"docId").limit(0)

    val nToIndex = toIndexUrls.count()
    val nRemoved = removedDocs.count()
    if (nToIndex == 0 && nRemoved == 0)
      return UpdateReport(0, 0, 0, changed = false) // S9: skip save

    // extract + tokenize ONLY the changed pages. A doc whose extraction
    // FAILS keeps its old indexed version (main.rs:196-202: parse error →
    // continue, old entry neither replaced nor purged); a doc that extracts
    // to zero surviving tokens is REMOVED and not re-added (add_document
    // removes first, then skips the empty insert — model.rs:229-247).
    // Marker rows (term = null) carry "extraction succeeded" per url.
    val changedPages = pagesIn
      .join(toIndexUrls.select("url"), "url")
      .select("url", "warc_ts", "html", "text")
      .as[(String, java.sql.Timestamp, Array[Byte], String)]
    val ftDeltaRaw = changedPages.mapPartitions { it =>
      // same zero-alloc count table as the build's ft stage — the
      // HashMap[String, Integer] loop this replaced was the measured
      // allocation-bandwidth wall TermCounter exists to avoid (27% CPU,
      // 6.5× GC at 16 cores; see TermCounter's doc), and a bulk re-index
      // batch approaches build-sized input
      val tc = new TermCounter()
      it.flatMap { case (url, ts, html, text) =>
        Extract.extractText(html, text) match {
          case None => Iterator.empty // malformed → old version survives
          case Some(content) =>
            tc.beginDoc()
            Lexer.foreachTokenRaw(content)(
              (cs, s, e, stemmed) => tc.add(cs, s, e, stemmed))
            val out = new Array[(String, java.sql.Timestamp, String, Int)](
              tc.nTouched + 1)
            out(0) = ((url, ts, null, 0)) // extraction-succeeded marker
            var i = 0
            while (i < tc.nTouched) {
              val slot = tc.touched(i)
              out(i + 1) = ((url, ts, tc.termAt(slot), tc.countAt(slot)))
              i += 1
            }
            out.iterator
        }
      }
    }.toDF("url", "warc_ts", "term", "tf")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val extractedOkUrls = ftDeltaRaw.filter($"term".isNull).select("url")
    val ftDelta = ftDeltaRaw.filter($"term".isNotNull)

    val docLenDelta = ftDelta.groupBy($"url", $"warc_ts")
      .agg(sum($"tf").cast("long").as("docLen"))

    // docId assignment: keep old ids for re-indexed urls; rank new urls
    // above the previous max over EVERY layer ever written (dead included
    // — a live tombstone must never shadow a reused id). A3 holds:
    // empty/malformed docs never surface in ftDelta → no id, not indexed.
    val maxDocId = DeltaLog.docsAllLayers(spark, indexDir)
      .agg(coalesce(max($"docId"), lit(-1L))).as[Long].collect()
      .headOption.getOrElse(-1L) // empty initial index → ids start at 0
    val withOld = docLenDelta.join(
      toIndexUrls.filter($"oldDocId".isNotNull), Seq("url"), "inner")
      .select($"url", $"warc_ts", $"docLen", $"oldDocId".as("docId"))
    val newUrls = docLenDelta.join(
      toIndexUrls.filter($"oldDocId".isNotNull).select("url"),
      Seq("url"), "left_anti")
    val assigned = DenseId.assign(spark,
      newUrls.select($"url".as("value")).as[String],
      conf.partitions, idName = "newId", keyName = "url")
    val withNew = newUrls.join(assigned.df, "url")
      .select($"url", $"warc_ts", $"docLen",
        ($"newId" + lit(maxDocId + 1)).as("docId"))
    val docsDelta = withOld.unionByName(withNew)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // affected docIds: stale docs whose NEW extraction succeeded (their old
    // version is replaced/emptied) + removed urls. Malformed re-extractions
    // keep the old version (not affected). These become the tombstones.
    val affectedOld = toIndexUrls.filter($"oldDocId".isNotNull)
      .join(extractedOkUrls, "url")
      .select($"oldDocId".as("docId"))
      .unionByName(removedDocs.select($"docId"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // termId assignment for brand-new terms
    val termDeltaNames = ftDelta.select($"term").distinct()
      .join(termsOld.select($"term"), Seq("term"), "left_anti")
    val maxTermId = termsOld.agg(coalesce(max($"termId"), lit(-1L)))
      .as[Long].collect().headOption.getOrElse(-1L)
    val newTermIds = DenseId.assign(spark,
      termDeltaNames.select($"term".as("value")).as[String],
      conf.partitions, idName = "newTid", keyName = "term")
    val termIdMap = termsOld.select($"term", $"termId")
      .unionByName(newTermIds.df.select($"term",
        ($"newTid" + lit(maxTermId + 1)).as("termId")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // postings delta rows
    val postingsAdd = ftDelta
      .join(docsDelta.select($"url", $"docId", $"docLen"), "url")
      .join(termIdMap, "term")
      .select($"termId", $"docId", $"tf".cast("int").as("tf"),
        $"docLen".cast("int").as("docLen"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // df delta: -1 per (term, removed-or-stale doc), +1 per added posting
    val removedPostings = postingsOld
      .join(affectedOld, "docId")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfMinus = removedPostings.groupBy($"termId")
      .agg(count(lit(1)).as("minus"))
    val dfPlus = postingsAdd.groupBy($"termId")
      .agg(count(lit(1)).as("plus"))
    val termsNew = termIdMap
      .join(termsOld.select($"termId", $"df"), Seq("termId"), "left")
      .join(dfMinus, Seq("termId"), "left")
      .join(dfPlus, Seq("termId"), "left")
      .select($"termId", $"term",
        (coalesce($"df", lit(0L)) - coalesce($"minus", lit(0L)) +
          coalesce($"plus", lit(0L))).as("df"),
        octet_length($"term").as("tlen"))
      .filter($"df" > 0)

    val stats = spark.read.parquet(IndexBuilder.statsPath(indexDir))
      .as[Stats].head()
    val removedLens = docs.join(affectedOld, "docId")
      .agg(coalesce(sum($"docLen"), lit(0L)), count(lit(1)))
      .as[(Long, Long)].head()
    val addedLens = docsDelta
      .agg(coalesce(sum($"docLen"), lit(0L)), count(lit(1)))
      .as[(Long, Long)].head()
    val statsNew = Stats(
      stats.docCount - removedLens._2 + addedLens._2,
      stats.totalTokens - removedLens._1 + addedLens._1)

    val meta = IndexBuilder.readMeta(spark, indexDir)
    val bucketSize = math.max(1L, meta("bucketSize").toLong)

    // Materialize EVERYTHING derived from tables this update overwrites
    // (terms, stats) or that the delta write re-reads, before any write —
    // plans capture file listings at read() time, so a post-swap
    // re-execution would hit deleted files.
    val nAdded = withNew.count()
    val nReindexed = withOld.count()
    val nAffected = affectedOld.count()
    if (nAffected == 0 && nAdded == 0) {
      // only perpetually-malformed stale docs → nothing actually changed
      // (reference: parse error → continue, processed not incremented,
      // save skipped — main.rs:196-202, 267-272)
      Seq(ftDeltaRaw, docsDelta, affectedOld, termIdMap, postingsAdd,
        removedPostings).foreach(_.unpersist())
      assigned.release()
      newTermIds.release()
      return UpdateReport(0, 0, 0, changed = false)
    }
    docsDelta.count()
    termIdMap.count()
    val nPostingsAdd = postingsAdd.count()
    val nPostingsRemoved = removedPostings.count()
    val termsNewMat = termsNew.persist(StorageLevel.MEMORY_AND_DISK)
    val termCountNew = termsNewMat.count()

    // ---- writes (commit protocol; [[recover]] is its crash half):
    //   1. delta DATA tables (postings/blocks/docs) — invisible until 3
    //   2. terms/stats to VERSIONED side dirs (__v<seq>) — invisible
    //   3. tombstone table = THE commit marker (DeltaLog.commitDelta)
    //   4. swap the versioned terms/stats into place
    //   5. meta refresh
    // A crash before 3 leaves the old index fully intact (the retry
    // recomputes everything from unchanged state and overwrites the
    // orphans); a crash after 3 is rolled forward by recover() — so the
    // old ordering's failure mode (terms swapped, delta invisible, retry
    // double-applying df adjustments) cannot occur.
    val seq = DeltaLog.nextSeq(spark, indexDir)
    DeltaLog.writeDeltaData(spark, indexDir, seq,
      postingsAdd = postingsAdd,
      docsAdd = docsDelta.select($"docId", $"url", $"warc_ts", $"docLen"),
      blockSize = meta("blockSize").toInt,
      bucketSize = bucketSize,
      parts = math.max(1, math.min(4,
        conf.partitions / math.max(1, meta("postingGroups").toInt))))
    termsNewMat.write.mode("overwrite")
      .parquet(versionedPath(IndexBuilder.termsPath(indexDir), seq))
    Seq(statsNew).toDF().write.mode("overwrite")
      .parquet(versionedPath(IndexBuilder.statsPath(indexDir), seq))
    // the written tombstone table holds only KILLS (replaced/removed docs);
    // docs merely ADDED at this seq are tombstoned too, but DERIVED at read
    // time from this delta's docs/ table ([[DeltaLog.tombstonesDf]] unions
    // removed/ with docs-written (docId, seq)) — that derived entry is what
    // makes the compaction fold IDEMPOTENT for adds (a crashed compact()
    // restart, or a lost _compacted marker re-exposing folded deltas, would
    // otherwise read an added doc's folded layer-0 copy AND its delta rows
    // as live — permanent double-materialization). Deriving instead of
    // writing keeps the removed/ table = kill set (the compaction trigger
    // below counts it) and fixes pre-existing indexes for free.
    DeltaLog.commitDelta(spark, indexDir, seq, tombstones = affectedOld)
    swapVersioned(spark, indexDir, seq)

    // meta refresh: handle caches validate against meta.json, and the
    // driver-dict / cache sizing heuristics read these counts
    IndexBuilder.updateMeta(spark, indexDir, Map(
      "docCount" -> statsNew.docCount.toString,
      "totalTokens" -> statsNew.totalTokens.toString,
      "termCount" -> termCountNew.toString,
      "postingCount" ->
        (meta("postingCount").toLong - nPostingsRemoved + nPostingsAdd)
          .toString,
      "deltaSeq" -> seq.toString))

    Seq(ftDeltaRaw, docsDelta, affectedOld, termIdMap, postingsAdd,
      removedPostings, termsNewMat).foreach(_.unpersist())
    assigned.release()
    newTermIds.release()
    graft.query.IndexHandles.invalidate(indexDir) // cached tables are stale

    // ---- compaction policy: fold deltas into the base when enough have
    // accumulated or tombstones grew past a fraction of the corpus -------
    // KILL tombstones only: a pure-add delta must not drag the fold
    // forward (the derived add-tombstones kill nothing in normal reads)
    val tombCount = DeltaLog.killTombstonesDf(spark, indexDir)
      .map(_.select($"docId").distinct().count()).getOrElse(0L)
    // seqs are monotonic ACROSS compactions (compacted dirs linger through
    // the deletion grace), so the trigger counts visible uncompacted
    // deltas, not the raw seq number
    // fraction bounds read amplification; the absolute cap bounds the
    // tombstone working set itself (driver map / broadcast on the query
    // path) — min() so whichever is smaller fires first
    val tombTrigger = math.min(
      conf.tombstoneCompactFraction * math.max(1L, statsNew.docCount),
      conf.tombstoneAbsoluteCap.toDouble)
    // the DERIVED liveness working set (kills + add-tombstones from the
    // delta docs tables) is what the query handles collect/broadcast;
    // past graft.maxDriverTombstones they degrade to the distributed
    // path. A pure-add bulk ingest grows that set with ZERO kills, so a
    // kill-only trigger would pin every query on the slow path for up to
    // deltaCompactEvery more updates — fold as soon as the derived set
    // crosses the same cap the handles gate on (footer counts, no job).
    val visibleSeqs = DeltaLog.listSeqs(spark, indexDir)
    val derivedRows = DeltaLog.tombRowCount(spark, indexDir, visibleSeqs)
    val shouldCompact =
      visibleSeqs.size >= conf.deltaCompactEvery ||
        tombCount > tombTrigger ||
        derivedRows > DeltaLog.maxDriverTombstones(spark)
    if (shouldCompact) compact(spark, indexDir, conf)

    UpdateReport(
      added = nAdded,
      reindexed = nReindexed,
      removed = nRemoved,
      changed = true,
      compacted = shouldCompact)
  }

  /** Folds all deltas into the base tables: live postings are re-range-
    * partitioned and rewritten per group (concurrently — groups are
    * independent), blocks re-encoded, the docs table rewritten live-only,
    * and the delta log cleared. Cost is one base rewrite amortized over
    * `deltaCompactEvery` updates — the Iceberg-compaction analog.
    */
  def compact(
      spark: SparkSession,
      indexDir: String,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf()): Unit = {
    import spark.implicits._
    recover(spark, indexDir) // a crashed commit must be rolled forward first
    if (DeltaLog.listSeqs(spark, indexDir).isEmpty) return
    val meta = IndexBuilder.readMeta(spark, indexDir)
    val g = meta("postingGroups").toInt
    val blockSize = meta("blockSize").toInt
    val perGroupParts = math.max(1, conf.partitions / g)

    // materialize the live views BEFORE overwriting the base files they read
    val live = DeltaLog.postingsView(spark, indexDir)
      .select($"termId", $"docId", $"tf".cast("int").as("tf"),
        $"docLen".cast("int").as("docLen"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    live.count()
    val docsLive = DeltaLog.docsView(spark, indexDir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    docsLive.count()

    // re-derive bucketSize from the LIVE docId range: an index
    // bootstrapped from an empty snapshot carries a degenerate bucketSize
    // (docCount was 0 → every posting its own block), and a corpus grown
    // far past its build size needs coarser buckets. Compaction re-encodes
    // every block anyway, so this is the free place to heal it — and the
    // only safe one: bucketSize must be uniform across all blocks WAND
    // aligns, which holds exactly when base is rewritten and deltas
    // cleared together. The chosen value is durably recorded as a
    // _compacting INTENT before any base file changes: a crashed
    // compaction restarts (same value, idempotent fold) instead of leaving
    // some groups encoded with the new bucketSize while meta still
    // advertises the old one to future delta writers.
    val bucketSize = readCompactingIntent(spark, indexDir).getOrElse {
      val queryBuckets = meta.get("queryBuckets").map(_.toInt)
        .getOrElse(conf.queryBuckets)
      val maxDocId = docsLive.agg(coalesce(max($"docId"), lit(0L)))
        .as[Long].head()
      val b = math.max(1L, (maxDocId + queryBuckets) / queryBuckets)
      writeCompactingIntent(spark, indexDir, b)
      b
    }

    // groups are independent — rewrite + re-encode them concurrently,
    // like the build does
    IndexBuilder.runConcurrently((0 until g).map(grp => () => {
      val newGrp = live
        .filter(pmod($"termId", lit(g)) === grp)
        .repartitionByRange(perGroupParts, $"termId", $"docId")
        .sortWithinPartitions($"termId", $"docId")
        .persist(StorageLevel.MEMORY_AND_DISK)
      writeTemp(spark, newGrp,
        s"${IndexBuilder.postingsPath(indexDir)}/group=$grp")
      val blocks = spark.read
        .parquet(s"${IndexBuilder.postingsPath(indexDir)}/group=$grp")
        .as[Posting]
        .mapPartitions(it => Blocks.encode(it, blockSize, bucketSize))
      writeTemp(spark, blocks.toDF(),
        s"${IndexBuilder.blocksPath(indexDir)}/group=$grp")
      newGrp.unpersist()
      ()
    }))
    writeTemp(spark, docsLive, IndexBuilder.docsPath(indexDir))
    DeltaLog.clear(spark, indexDir)
    // the compacted floor is recorded REDUNDANTLY here: meta.json and the
    // _compacted marker each alone carry it (compactedThrough takes the
    // max), so losing one file never re-exposes folded deltas
    val floor = DeltaLog.compactedThrough(spark, indexDir)
    IndexBuilder.updateMeta(spark, indexDir, Map(
      "deltaSeq" -> floor.toString,
      "compactedThrough" -> floor.toString,
      "bucketSize" -> bucketSize.toString))
    dropCompactingIntent(spark, indexDir)
    live.unpersist()
    docsLive.unpersist()
    graft.query.IndexHandles.invalidate(indexDir)
  }

  private def compactingIntentPath(dir: String) = s"$dir/_compacting"

  private[index] def readCompactingIntent(
      spark: SparkSession, indexDir: String): Option[Long] = {
    val f = hadoopFs(spark, indexDir)
    val p = new org.apache.hadoop.fs.Path(compactingIntentPath(indexDir))
    if (!f.exists(p)) return None
    scala.util.Try(new String(DeltaLog.readSmallBytes(f, p),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong).toOption
  }

  private[index] def writeCompactingIntent(
      spark: SparkSession, indexDir: String, bucketSize: Long): Unit =
    DeltaLog.writeAtomicString(hadoopFs(spark, indexDir),
      compactingIntentPath(indexDir), bucketSize.toString)

  private def dropCompactingIntent(
      spark: SparkSession, indexDir: String): Unit = {
    val f = hadoopFs(spark, indexDir)
    val p = new org.apache.hadoop.fs.Path(compactingIntentPath(indexDir))
    if (f.exists(p)) f.delete(p, false)
  }

  private def hadoopFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Overwrite a table that the plan also READS: stage to a sibling temp
    * dir, then swap (parquet has no snapshot isolation — Iceberg would
    * commit atomically instead). The staging dir is UNDERSCORE-prefixed
    * (`_tmp_group=N`, not `group=N__tmp`): Spark's file listing skips
    * underscore paths, so a concurrent handle doing partition discovery on
    * postingsPath/blocksPath can never list the half-written dir and
    * corrupt `group` partition-column inference (or trip on its
    * `_temporary` contents).
    */
  private def writeTemp(
      spark: SparkSession,
      df: DataFrame,
      dest: String): Unit = {
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      destPath.getParent, "_tmp_" + destPath.getName)
    df.write.mode("overwrite").parquet(tmp.toString)
    swapInto(fs, tmp, destPath)
  }

  private def versionedPath(dest: String, seq: Int): String =
    s"${dest}__v$seq"

  private def swapInto(
      fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dest: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.rename(src, dest)
  }

  /** Step 4 of the commit protocol: move the seq's versioned terms/stats
    * into place. Idempotent — a missing versioned dir means that table was
    * already swapped.
    */
  private def swapVersioned(
      spark: SparkSession, indexDir: String, seq: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(IndexBuilder.termsPath(indexDir), IndexBuilder.statsPath(indexDir))
      .foreach { dest =>
        val v = new org.apache.hadoop.fs.Path(versionedPath(dest, seq))
        if (fs.exists(v)) swapInto(fs, v, new org.apache.hadoop.fs.Path(dest))
      }
  }

  /** Crash half of the delta commit protocol: rolls a crashed update
    * forward (or discards its invisible leftovers). For every versioned
    * terms/stats dir found:
    *   - seq COMMITTED (its tombstone table exists) → finish the swap and
    *     rebuild the meta counts from durable tables;
    *   - seq uncommitted → delete the orphan (the crash happened before
    *     the marker; the retry recomputes from the unchanged old state).
    * No-op (one glob) when nothing is pending. Called from update() and
    * compact(); single-writer per index dir, like all maintenance here.
    */
  def recover(spark: SparkSession, indexDir: String): Unit = {
    val fs = hadoopFs(spark, indexDir)
    val pendingSeqs = Seq(
      IndexBuilder.termsPath(indexDir), IndexBuilder.statsPath(indexDir))
      .flatMap { dest =>
        val glob = new org.apache.hadoop.fs.Path(dest + "__v*")
        fs.globStatus(glob).toSeq.map(_.getPath.getName)
          .flatMap(n => n.split("__v").lastOption)
          .flatMap(s => scala.util.Try(s.toInt).toOption)
      }.distinct.sorted
    val visible = DeltaLog.listSeqs(spark, indexDir)
    val committed = visible.toSet
    var swapped = false
    pendingSeqs.foreach { s =>
      if (committed(s)) {
        swapVersioned(spark, indexDir, s)
        swapped = true
      } else {
        Seq(IndexBuilder.termsPath(indexDir),
          IndexBuilder.statsPath(indexDir)).foreach { dest =>
          val v = new org.apache.hadoop.fs.Path(versionedPath(dest, s))
          if (fs.exists(v)) fs.delete(v, true)
        }
      }
    }
    // a crash BETWEEN the swap and the meta refresh leaves no __v dirs
    // behind — detect it by deltaSeq drift (meta advertises an older
    // version than the last committed delta) and rebuild meta the same way
    val metaDrift = visible.nonEmpty &&
      IndexBuilder.readMeta(spark, indexDir)
        .get("deltaSeq").flatMap(s =>
          scala.util.Try(s.toInt).toOption).getOrElse(0) < visible.last
    if (swapped || metaDrift) {
      import spark.implicits._
      val statsRow = spark.read.parquet(IndexBuilder.statsPath(indexDir))
        .as[Stats].collect()(0)
      val termCount =
        spark.read.parquet(IndexBuilder.termsPath(indexDir)).count()
      val postingCount = DeltaLog.postingsView(spark, indexDir).count()
      IndexBuilder.updateMeta(spark, indexDir, Map(
        "docCount" -> statsRow.docCount.toString,
        "totalTokens" -> statsRow.totalTokens.toString,
        "termCount" -> termCount.toString,
        "postingCount" -> postingCount.toString,
        "deltaSeq" -> visible.last.toString))
      graft.query.IndexHandles.invalidate(indexDir)
    }
    // a compaction that crashed AFTER folding + clearing but BEFORE its
    // meta refresh: no deltas remain, the intent still holds the
    // bucketSize every rewritten block was encoded with — finish the meta
    // and drop the intent. (An intent WITH deltas still visible means the
    // fold itself was interrupted; update()/compact() restart it.)
    readCompactingIntent(spark, indexDir) match {
      case Some(b) if DeltaLog.listSeqs(spark, indexDir).isEmpty =>
        val floor = DeltaLog.compactedThrough(spark, indexDir)
        IndexBuilder.updateMeta(spark, indexDir, Map(
          "bucketSize" -> b.toString,
          "deltaSeq" -> floor.toString,
          "compactedThrough" -> floor.toString))
        dropCompactingIntent(spark, indexDir)
        graft.query.IndexHandles.invalidate(indexDir)
      case _ => ()
    }
  }
}
