package graft.index

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.Synth
import graft.oracle.RefModel
import graft.query.Search
import graft.text.Extract

/** M1–M6: incremental update ≡ full rebuild (modulo id assignment), plus
  * the reference's staleness/purge/error semantics.
  */
class IncrementalSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val conf = IndexBuilder.BuildConf(
    partitions = 8, postingGroups = 2, queryBuckets = 8)

  private def later(ts: Timestamp): Timestamp =
    new Timestamp(ts.getTime + 3600 * 1000L)

  // v1: docs 0..299. v2: 0..339 with edits:
  //  - i % 7 == 3  → text replaced, ts bumped (stale → re-index)
  //  - i % 50 == 11 → deleted (purge)
  //  - i == 21     → becomes stop-words-only, ts bumped (→ removed, A3)
  //  - i == 24     → becomes malformed XML, ts bumped (→ OLD version kept)
  //  - 300..339    → brand new
  private val v1: IndexedSeq[Synth.PageRow] = Synth.pages(300)
  private val v2: IndexedSeq[Synth.PageRow] = {
    val edited = v1.flatMap { p =>
      val i = p.url.split("/")(3).toLong
      if (i % 50 == 11) None
      else if (i == 21)
        Some(p.copy(text = "the is and of to", html = null,
          warc_ts = later(p.warc_ts)))
      else if (i == 24)
        Some(p.copy(html = "<broken><xml".getBytes(StandardCharsets.UTF_8),
          text = null, warc_ts = later(p.warc_ts)))
      else if (i % 7 == 3)
        Some(p.copy(
          text = s"fresh edited shader texture content $i opengl revision",
          html = null, warc_ts = later(p.warc_ts)))
      else Some(p)
    }
    edited ++ (300 until 340).map(i => Synth.page(i.toLong))
  }

  private def df(rows: IndexedSeq[Synth.PageRow]) =
    spark.createDataset(rows.map(p =>
      Schema.Page(p.url, p.warc_ts, p.html, p.text, p.lang))).toDF()

  private lazy val updatedDir = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_incr_").toString
    IndexBuilder.build(spark, df(v1), dir, conf)
    val report = Incremental.update(spark, df(v2), dir, conf)
    assert(report.changed)
    assert(report.removed == 6) // i % 50 == 11 → 11, 61, ..., 261
    assert(report.added == 40)
    dir
  }

  private lazy val freshDir = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_incr_fresh_").toString
    // fresh build of the v2 state the reference would hold: doc 24 keeps
    // its V1 content (malformed re-extraction is skipped)
    val refState = v2.map { p =>
      val i = p.url.split("/")(3).toLong
      if (i == 24) v1(24) else p
    }
    IndexBuilder.build(spark, df(refState), dir, conf)
    dir
  }

  /** Oracle driven through the reference's index_directory flow over v2. */
  private lazy val oracle: RefModel = {
    val m = new RefModel()
    v1.foreach(p => Extract.extractText(p.html, p.text).foreach(t =>
      m.addDocument(p.url, t, p.warc_ts.getTime)))
    v2.foreach { p =>
      if (m.requiresReindexing(p.url, p.warc_ts.getTime)) {
        Extract.extractText(p.html, p.text) match {
          case Some(t) => m.addDocument(p.url, t, p.warc_ts.getTime)
          case None => // parse error → old version survives
        }
      }
    }
    val visited = v2.map(_.url).toSet
    m.docs.keys.filterNot(visited).toVector
      .foreach(m.removeDocument)
    m
  }

  test("update report counts: 6 removed, 40 added, stale set reindexed") {
    updatedDir // assertions inside
  }

  test("duplicate urls in one snapshot: last-write-wins ≡ winners-only " +
      "build (model.rs add_document upsert)") {
    val winners = v1.take(40)
    val losers = winners.take(15).map(p => p.copy(
      text = s"outdated superseded body for ${p.url}", html = null,
      warc_ts = new Timestamp(p.warc_ts.getTime - 7200 * 1000L)))
    val dupDir = java.nio.file.Files
      .createTempDirectory("graft_dup_").toString
    val winDir = java.nio.file.Files
      .createTempDirectory("graft_win_").toString
    IndexBuilder.build(spark, df(losers ++ winners), dupDir, conf)
    IndexBuilder.build(spark, df(winners), winDir, conf)
    def flat(dir: String): Set[(String, String, Int, Int)] = {
      val docs = spark.read.parquet(IndexBuilder.docsPath(dir))
        .select($"docId", $"url")
      val terms = spark.read.parquet(IndexBuilder.termsPath(dir))
        .select($"termId", $"term")
      spark.read.parquet(IndexBuilder.postingsPath(dir))
        .join(docs, "docId").join(terms, "termId")
        .select($"url", $"term", $"tf", $"docLen")
        .as[(String, String, Int, Int)].collect().toSet
    }
    assert(flat(dupDir) == flat(winDir))
    // no duplicated doc rows either (the old behavior joined both copies)
    val urls = spark.read.parquet(IndexBuilder.docsPath(dupDir))
      .select($"url").as[String].collect()
    assert(urls.length == urls.distinct.length)
  }

  test("docs table ≡ fresh rebuild at (url, docLen) level; " +
      "stop-only doc gone, malformed doc keeps old version") {
    val upd = DeltaLog.docsView(spark, updatedDir)
      .select($"url", $"docLen").as[(String, Long)].collect().toMap
    val fresh = spark.read.parquet(IndexBuilder.docsPath(freshDir))
      .select($"url", $"docLen").as[(String, Long)].collect().toMap
    assert(upd == fresh)
    assert(!upd.contains(v1(21).url)) // became stop-words-only
    assert(!upd.contains(v1(11).url)) // deleted
    assert(upd.contains(v1(24).url)) // malformed edit → old version kept
  }

  test("terms ≡ fresh rebuild at (term, df) level") {
    val upd = spark.read.parquet(IndexBuilder.termsPath(updatedDir))
      .select($"term", $"df").as[(String, Long)].collect().toMap
    val fresh = spark.read.parquet(IndexBuilder.termsPath(freshDir))
      .select($"term", $"df").as[(String, Long)].collect().toMap
    assert(upd == fresh)
  }

  /** Live (merge-on-read) flattened postings of an index directory. */
  private def flatLive(dir: String): Set[(String, String, Int, Int)] = {
    val docs = DeltaLog.docsView(spark, dir).select($"docId", $"url")
    val terms = spark.read.parquet(IndexBuilder.termsPath(dir))
      .select($"termId", $"term")
    DeltaLog.postingsView(spark, dir)
      .join(docs, "docId").join(terms, "termId")
      .select($"url", $"term", $"tf", $"docLen")
      .as[(String, String, Int, Int)].collect().toSet
  }

  test("postings ≡ fresh rebuild at (url, term, tf, docLen) level") {
    assert(flatLive(updatedDir) == flatLive(freshDir))
  }

  test("1-doc update is merge-on-read: base posting files untouched, " +
      "one small delta committed (bounded rewrite)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mor_").toString
    IndexBuilder.build(spark, df(v1), dir, conf)
    def baseFiles(): Map[String, (Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (0 until conf.postingGroups).flatMap { g =>
        fs.listStatus(new org.apache.hadoop.fs.Path(
          s"${IndexBuilder.postingsPath(dir)}/group=$g")).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(st => st.getPath.toString ->
            (st.getLen, st.getModificationTime))
      }.toMap
    }
    val before = baseFiles()
    // edit exactly one doc (diverse vocabulary — the case that rewrote the
    // whole index under group-granularity rewrites)
    val v1b = v1.updated(5, v1(5).copy(
      text = "completely rewritten body texture shader opengl pipeline " +
        "buffer compile network protocol cache pointer",
      html = null, warc_ts = later(v1(5).warc_ts)))
    val report = Incremental.update(spark, df(v1b), dir, conf)
    assert(report.changed && report.reindexed == 1 && !report.compacted)
    assert(baseFiles() == before) // NO base posting file rewritten
    assert(DeltaLog.listSeqs(spark, dir) == Seq(1))
    // the delta is O(1 doc): its postings are just the edited doc's terms
    val deltaRows = spark.read
      .parquet(s"${DeltaLog.seqPath(dir, 1)}/postings").count()
    assert(deltaRows < 30)
    // and the live view serves the edit
    val got = Search.searchTop(spark, dir, "completely rewritten protocol",
      Search.Bm25, 5).select($"url").as[String].collect()
    assert(got.contains(v1(5).url))
  }

  test("compaction folds deltas into the base and preserves the live view") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_").toString
    IndexBuilder.build(spark, df(v1), dir, conf)
    // deltaCompactEvery = 1 → the v1→v2 update compacts immediately
    val report = Incremental.update(spark, df(v2), dir,
      conf.copy(deltaCompactEvery = 1))
    assert(report.changed && report.compacted)
    assert(DeltaLog.listSeqs(spark, dir).isEmpty)
    assert(flatLive(dir) == flatLive(freshDir))
    // post-compaction the BASE tables alone carry the state
    val baseOnly = {
      val docs = spark.read.parquet(IndexBuilder.docsPath(dir))
        .select($"docId", $"url")
      val terms = spark.read.parquet(IndexBuilder.termsPath(dir))
        .select($"termId", $"term")
      spark.read.parquet(IndexBuilder.postingsPath(dir))
        .join(docs, "docId").join(terms, "termId")
        .select($"url", $"term", $"tf", $"docLen")
        .as[(String, String, Int, Int)].collect().toSet
    }
    assert(baseOnly == flatLive(freshDir))
    // queries on the compacted index ≡ oracle
    val got = Search
      .searchTop(spark, dir, "texture array shader", Search.Bm25, 100000)
      .select($"url", $"score").as[(String, Float)].collect().toVector
    val want = oracle.searchTop("texture array shader", RefModel.Bm25, 100000)
    def groups(v: Vector[(String, Float)]): Vector[(Float, Set[String])] =
      v.groupBy(_._2).toVector.sortBy(-_._1)
        .map { case (s, rows) => (s, rows.map(_._1).toSet) }
    assert(groups(got) == groups(want))
  }

  test("empty corpus builds a valid, servable empty index") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_empty_").toString
    val m = IndexBuilder.build(spark, df(v1).limit(0), dir, conf)
    assert(m.docCount == 0)
    assert(Search.loadStats(spark, dir) == Schema.Stats(0L, 0L))
    assert(Search.searchTop(spark, dir, "anything", Search.Bm25, 10)
      .count() == 0)
    // and it accepts a first incremental (streaming-style) upsert
    val report = Incremental.update(spark, df(v1.take(5)), dir, conf,
      purgeVanished = false)
    assert(report.changed && report.added == 5)
    assert(flatLive(dir).nonEmpty)
    val got = Search.searchTop(spark, dir, "texture", Search.Bm25, 3)
    assert(got.count() >= 0) // query path works end-to-end
  }

  test("stats ≡ fresh rebuild") {
    assert(Search.loadStats(spark, updatedDir) ==
      Search.loadStats(spark, freshDir))
  }

  test("blocks (base + delta layers, tombstones applied) decode to the " +
      "live postings view") {
    val tomb = DeltaLog.tombstoneMap(spark, updatedDir)
    val base = spark.read
      .parquet(IndexBuilder.blocksPath(updatedDir))
      .drop("group").withColumn("_seq", lit(0))
    val delta = DeltaLog.deltaBlocks(spark, updatedDir).get
      .withColumn("_seq", $"seq".cast("int")).drop("seq")
    val fromBlocks = base.unionByName(delta)
      .select($"_seq", struct($"termId", $"bucket", $"minDocId",
        $"maxDocId", $"n", $"minTf", $"maxTf", $"minDocLen", $"maxDocLen",
        $"docIdsDelta", $"tfs", $"docLens").as("b"))
      .as[(Int, Schema.TermBlock)]
      .flatMap { case (seq, b) =>
        val d = Blocks.decode(b)
        (0 until b.n).iterator.map(i =>
          (seq, b.termId, d.docIds(i), d.tfs(i), d.docLens(i)))
      }.collect()
      .filter { case (seq, _, docId, _, _) =>
        seq >= tomb.getOrElse(docId, 0) // liveness rule
      }
      .map { case (_, t, d, tf, dl) => (t, d, tf, dl) }.toSet
    val fromPostings = DeltaLog.postingsView(spark, updatedDir)
      .select($"termId", $"docId", $"tf", $"docLen")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(fromBlocks == fromPostings)
  }

  for (q <- Seq("texture array shader", "opengl", "fresh edited revision")) {
    test(s"query on updated index ≡ oracle after same M1-M4 flow: \"$q\"") {
      // After updates docIds are stable (not url ranks), so the engine's
      // (score, docId) tiebreak can permute equal-score runs vs the
      // oracle's (score, url) — rank identity is defined MODULO ties
      // (SURVEY.md §2.6.7). Compare untruncated lists as score-grouped
      // url sets.
      val got = Search
        .searchTop(spark, updatedDir, q, Search.Bm25, 100000)
        .select($"url", $"score").as[(String, Float)].collect().toVector
      val want = oracle.searchTop(q, RefModel.Bm25, 100000)
      def groups(v: Vector[(String, Float)]): Vector[(Float, Set[String])] =
        v.groupBy(_._2).toVector.sortBy(-_._1)
          .map { case (s, rows) => (s, rows.map(_._1).toSet) }
      assert(groups(got) == groups(want))
    }
  }

  test("idempotence: same snapshot again → no change (S9 save-if-changed)") {
    updatedDir
    val report2 = Incremental.update(spark, df(v2), updatedDir, conf)
    assert(!report2.changed)
  }

  private def hfs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def copyDir(src: String, dst: String): Unit = {
    val f = hfs(src)
    org.apache.hadoop.fs.FileUtil.copy(
      f, new org.apache.hadoop.fs.Path(src),
      f, new org.apache.hadoop.fs.Path(dst),
      false, spark.sparkContext.hadoopConfiguration)
  }

  private def moveDir(src: String, dst: String): Unit = {
    val f = hfs(src)
    val d = new org.apache.hadoop.fs.Path(dst)
    if (f.exists(d)) f.delete(d, true)
    f.rename(new org.apache.hadoop.fs.Path(src), d)
  }

  test("recover() rolls a crash-after-commit-marker forward: terms/stats " +
      "swap completed, meta rebuilt, retry is a no-change no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_crash_fwd_").toString
    IndexBuilder.build(spark, df(v1), dir, conf)
    val termsP = IndexBuilder.termsPath(dir)
    val statsP = IndexBuilder.statsPath(dir)
    // keep the PRE-update terms/stats aside, then update normally
    copyDir(termsP, s"$dir/terms_preupdate")
    copyDir(statsP, s"$dir/stats_preupdate")
    val report = Incremental.update(spark, df(v2), dir, conf)
    assert(report.changed)
    val seq = DeltaLog.listSeqs(spark, dir).last
    val expectedTerms = spark.read.parquet(termsP)
      .select($"term", $"df").as[(String, Long)].collect().toSet
    val expectedStats = spark.read.parquet(statsP)
      .as[Schema.Stats].head()
    // reconstruct the crash state: marker committed, but terms/stats not
    // yet swapped (live tables are still the pre-update versions, the new
    // versions sit in the __v<seq> side dirs) and meta still stale
    moveDir(termsP, s"${termsP}__v$seq")
    moveDir(statsP, s"${statsP}__v$seq")
    moveDir(s"$dir/terms_preupdate", termsP)
    moveDir(s"$dir/stats_preupdate", statsP)
    IndexBuilder.updateMeta(spark, dir, Map("docCount" -> "-1"))

    Incremental.recover(spark, dir)

    assert(!hfs(dir).exists(
      new org.apache.hadoop.fs.Path(s"${termsP}__v$seq")))
    assert(spark.read.parquet(termsP)
      .select($"term", $"df").as[(String, Long)].collect().toSet ==
      expectedTerms)
    assert(spark.read.parquet(statsP).as[Schema.Stats].head() ==
      expectedStats)
    val meta = IndexBuilder.readMeta(spark, dir)
    assert(meta("docCount").toLong == expectedStats.docCount)
    assert(meta("deltaSeq").toInt == seq)
    // the interrupted update's retry now sees a consistent state: nothing
    // stale → no change, no double-applied df
    assert(!Incremental.update(spark, df(v2), dir, conf).changed)
  }

  test("recover() discards versioned dirs of an UNcommitted seq " +
      "(crash before the marker leaves the old index intact)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_crash_back_").toString
    IndexBuilder.build(spark, df(v1), dir, conf)
    val termsP = IndexBuilder.termsPath(dir)
    val before = spark.read.parquet(termsP)
      .select($"term", $"df").as[(String, Long)].collect().toSet
    copyDir(termsP, s"${termsP}__v99") // orphan: seq 99 never committed
    Incremental.recover(spark, dir)
    assert(!hfs(dir).exists(new org.apache.hadoop.fs.Path(s"${termsP}__v99")))
    assert(spark.read.parquet(termsP)
      .select($"term", $"df").as[(String, Long)].collect().toSet == before)
  }

  test("recover() rebuilds meta after a crash between terms swap and the " +
      "meta refresh (no __v dirs left; detected by deltaSeq drift)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_crash_meta_").toString
    IndexBuilder.build(spark, df(v1), dir, conf)
    Incremental.update(spark, df(v2), dir, conf)
    val good = IndexBuilder.readMeta(spark, dir)
    // crash state: the commit and swap landed, meta did not
    IndexBuilder.updateMeta(spark, dir,
      Map("deltaSeq" -> "0", "docCount" -> "-1"))
    Incremental.recover(spark, dir)
    val fixed = IndexBuilder.readMeta(spark, dir)
    assert(fixed("deltaSeq") == good("deltaSeq"))
    assert(fixed("docCount") == good("docCount"))
    assert(fixed("postingCount").toLong > 0)
  }

  test("recover() finishes a compaction that crashed before its meta " +
      "refresh (intent present, no visible deltas)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_crash_compact_").toString
    IndexBuilder.build(spark, df(v1), dir, conf)
    Incremental.update(spark, df(v2), dir, conf.copy(deltaCompactEvery = 1))
    assert(DeltaLog.listSeqs(spark, dir).isEmpty)
    // crash state: groups re-encoded with intent bucketSize, meta stale
    Incremental.writeCompactingIntent(spark, dir, 999L)
    IndexBuilder.updateMeta(spark, dir,
      Map("bucketSize" -> "7", "deltaSeq" -> "0"))
    Incremental.recover(spark, dir)
    val meta = IndexBuilder.readMeta(spark, dir)
    assert(meta("bucketSize").toLong == 999L)
    assert(meta("deltaSeq").toInt ==
      DeltaLog.compactedThrough(spark, dir))
    assert(Incremental.readCompactingIntent(spark, dir).isEmpty)
  }

  test("delta seqs stay monotonic across compaction; compacted dirs are " +
      "invisible and the compaction trigger counts visible deltas only") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_monotonic_").toString
    IndexBuilder.build(spark, df(v1), dir, conf)
    // update 1 compacts immediately (deltaCompactEvery = 1)
    assert(Incremental.update(spark, df(v2), dir,
      conf.copy(deltaCompactEvery = 1)).compacted)
    val through = DeltaLog.compactedThrough(spark, dir)
    assert(through >= 1)
    assert(DeltaLog.listSeqs(spark, dir).isEmpty)
    // update 2 (one edited doc) must take a seq ABOVE the compacted range
    // (its dirs may still exist pending grace deletion) and must NOT
    // auto-compact under a loose threshold
    val v3 = v2.map { p =>
      if (p.url == v2.head.url)
        p.copy(text = "entirely new monotonic content opengl",
          html = null, warc_ts = later(p.warc_ts))
      else p
    }
    val r3 = Incremental.update(spark, df(v3), dir,
      conf.copy(deltaCompactEvery = 5))
    assert(r3.changed && !r3.compacted)
    assert(DeltaLog.listSeqs(spark, dir) == Seq(through + 1))
    // and the new delta is actually served
    val hits = Search.searchTop(spark, dir, "monotonic", Search.Bm25, 10)
      .select($"url").as[String].collect()
    assert(hits.contains(v2.head.url))
  }
}
