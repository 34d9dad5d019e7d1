package graft.index

import org.apache.hadoop.fs.Path
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.Synth
import graft.oracle.RefModel
import graft.query.{Search, Wand}
import graft.text.Extract

/** End-to-end rank-identity suite (the `sbt -batch test` gate from
  * BASELINE.json.input_hint): distributed build + both query paths vs the
  * in-memory oracle, plus resumability and determinism checks.
  */
class IndexEngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val nDocs = 400
  private lazy val indexDir =
    java.nio.file.Files.createTempDirectory("graft_spec_idx_").toString

  private lazy val oracle: RefModel = {
    val m = new RefModel()
    Synth.pages(nDocs).foreach { p =>
      Extract.extractText(p.html, p.text).foreach(t =>
        m.addDocument(p.url, t, p.warc_ts.getTime))
    }
    m
  }

  private def pagesDf = spark
    .createDataset(Synth.pages(nDocs).map(p =>
      Schema.Page(p.url, p.warc_ts, p.html, p.text, p.lang)))
    .toDF()

  override def beforeAll(): Unit = {
    super.beforeAll()
    IndexBuilder.build(spark, pagesDf, indexDir,
      IndexBuilder.BuildConf(partitions = 8, postingGroups = 2,
        queryBuckets = 8))
  }

  // the reference benchmark queries + fuzzy/duplicate/stop/number/punct/
  // empty coverage (FIXTURES.md §2)
  private val querySet = Seq(
    "opengl",
    "texture array shader",
    "missingkeywordthatdoesnotexist",
    "textur aray shaderz", // 1–2 edit typos + prefix
    "network network network", // duplicated words → max-weight once
    "the is and of", // stop-words only
    "", // empty prompt
    "42 . data", // number + punctuation + head term
    "caching pointers",
    "communicating nationally")

  private def oracleTop(q: String, m: RefModel.RankMethod, k: Int = 10) =
    oracle.searchTop(q, m, k)

  private def engineTop(q: String, m: Search.Method, useWand: Boolean,
      k: Int = 10): Vector[(String, Float)] =
    Search.searchTop(spark, indexDir, q, m, k, useWand = useWand)
      .select($"url", $"score").as[(String, Float)].collect().toVector

  for (q <- querySet) {
    test(s"rank identity [naive, bm25]: \"$q\"") {
      assert(engineTop(q, Search.Bm25, useWand = false) ==
        oracleTop(q, RefModel.Bm25))
    }
    test(s"rank identity [wand, bm25]: \"$q\"") {
      assert(engineTop(q, Search.Bm25, useWand = true) ==
        oracleTop(q, RefModel.Bm25))
    }
    test(s"rank identity [naive, tfidf]: \"$q\"") {
      assert(engineTop(q, Search.Tfidf, useWand = false) ==
        oracleTop(q, RefModel.Tfidf))
    }
    test(s"rank identity [wand, tfidf]: \"$q\"") {
      assert(engineTop(q, Search.Tfidf, useWand = true) ==
        oracleTop(q, RefModel.Tfidf))
    }
  }

  test("WAND == naive for larger k than matches (k=1000)") {
    val q = "texture array shader"
    assert(engineTop(q, Search.Bm25, useWand = true, k = 1000) ==
      engineTop(q, Search.Bm25, useWand = false, k = 1000))
  }

  test("CLI semantics (padToK): top-k of the FULL scored list — " +
      "negative-idf matches keep real scores BELOW the zeros, " +
      "never forged to 0.0 (main.rs:290 ranks every doc)") {
    // df("zebra") = 9 of 12 docs > (N+1)/2 → bm25 idf NEGATIVE: every
    // match scores negative, and the reference's full ranking puts the 3
    // non-matching docs (score 0.0) ABOVE all 9 matches
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val pages = (0 until 12).map { i =>
      val body =
        if (i < 9) s"zebra filler$i " + ("zebra " * (i % 3))
        else s"unrelated filler$i content"
      Schema.Page(f"/neg/doc$i%03d", ts, null, body, "en")
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_negcli_").toString
    IndexBuilder.build(spark,
      spark.createDataset(pages).toDF(), dir,
      IndexBuilder.BuildConf(partitions = 4, postingGroups = 2,
        queryBuckets = 4))
    val m = new RefModel()
    pages.foreach(p => Extract.extractText(p.html, p.text).foreach(t =>
      m.addDocument(p.url, t, p.warc_ts.getTime)))
    for (method <- Seq(Search.Bm25, Search.Tfidf)) {
      val refMethod =
        if (method == Search.Bm25) RefModel.Bm25 else RefModel.Tfidf
      val want = m.searchTopCli("zebra", refMethod, 12)
      val got = Search.searchTop(spark, dir, "zebra", method, 12,
        padToK = true)
        .select($"url", $"score").as[(String, Float)].collect().toVector
      assert(got == want, s"[$method] got=$got want=$want")
      if (method == Search.Bm25) {
        // the regime is real: zeros first, then genuine negatives
        assert(want.take(3).forall(_._2 == 0.0f))
        assert(want.drop(3).forall(_._2 < 0.0f),
          s"expected negative tail: $want")
      }
    }
  }

  test("distributed WAND ≡ driver-local WAND " +
      "(graft.maxLocalWandPostings=0 forces the shuffle path)") {
    val queries = Seq("texture array shader", "opengl", "42 . data",
      "textur aray shaderz")
    val before = queries.map(q => engineTop(q, Search.Bm25, useWand = true))
    spark.conf.set("graft.maxLocalWandPostings", "0")
    try {
      val after = queries.map(q => engineTop(q, Search.Bm25, useWand = true))
      assert(after == before)
    } finally spark.conf.unset("graft.maxLocalWandPostings")
  }

  test("distributed dictionary expansion ≡ driver-local expansion " +
      "(graft.maxDriverDictTerms=0 forces the big-dictionary path; " +
      "\"42 . data\" exercises the tlen-pruned exact-token branch)") {
    val queries = Seq("texture array shader", "textur aray shaderz",
      "opengl", "42 . data")
    val before = queries.map(q => engineTop(q, Search.Bm25, useWand = true))
    graft.query.IndexHandles.invalidate(indexDir)
    spark.conf.set("graft.maxDriverDictTerms", "0")
    try {
      val h = graft.query.IndexHandles(spark, indexDir)
      assert(h.driverDict.isEmpty)
      val after = queries.map(q => engineTop(q, Search.Bm25, useWand = true))
      assert(after == before)
    } finally {
      spark.conf.unset("graft.maxDriverDictTerms")
      graft.query.IndexHandles.invalidate(indexDir)
    }
  }

  test("engine stats match oracle (docCount, totalTokens, dictionary)") {
    val stats = Search.loadStats(spark, indexDir)
    assert(stats.docCount == oracle.docs.size.toLong)
    assert(stats.totalTokens == oracle.totalTokens)
    val termCount =
      spark.read.parquet(IndexBuilder.termsPath(indexDir)).count()
    assert(termCount == oracle.gtf.size.toLong)
  }

  test("df column equals oracle gtf for every term") {
    val dfMap = spark.read.parquet(IndexBuilder.termsPath(indexDir))
      .select($"term", $"df").as[(String, Long)].collect().toMap
    assert(dfMap.size == oracle.gtf.size)
    oracle.gtf.foreach { case (term, df) =>
      assert(dfMap(term) == df, s"term=$term")
    }
  }

  test("docIds are the global url sort rank (deterministic)") {
    val docs = spark.read.parquet(IndexBuilder.docsPath(indexDir))
      .select($"docId", $"url").as[(Long, String)].collect().sortBy(_._1)
    val urls = docs.map(_._2)
    assert(urls.sameElements(urls.sorted))
    assert(docs.map(_._1).sameElements(docs.indices.map(_.toLong)))
  }

  test("build resumes: deleting one group's marker re-runs only that group " +
      "and reproduces identical postings") {
    val before = spark.read
      .parquet(IndexBuilder.postingsPath(indexDir) + "/group=*")
      .as[Schema.Posting].collect().sortBy(p => (p.termId, p.docId)).toVector

    // simulate a failed group: drop marker + output of group 1
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$indexDir/_lineage/build0/postings__1.json"), false)
    fs.delete(new Path(s"${IndexBuilder.postingsPath(indexDir)}/group=1"),
      true)

    IndexBuilder.build(spark, pagesDf, indexDir,
      IndexBuilder.BuildConf(partitions = 8, postingGroups = 2,
        queryBuckets = 8))

    val after = spark.read
      .parquet(IndexBuilder.postingsPath(indexDir) + "/group=*")
      .as[Schema.Posting].collect().sortBy(p => (p.termId, p.docId)).toVector
    assert(after == before)
  }

  test("lineage records cover all stages and groups") {
    val cp = new Checkpoint(spark, indexDir, "build0")
    val recs = cp.readAll()
    val stages = recs.map(r => (r.stage, r.group)).toSet
    assert(stages.contains(("ft", -1)))
    assert(stages.contains(("docs", -1)))
    assert(stages.contains(("postings", 0)) && stages.contains(("postings", 1)))
    assert(stages.contains(("blocks", 0)) && stages.contains(("blocks", 1)))
    assert(recs.forall(_.status == "done"))
  }

  test("posting blocks decode back to exactly the postings table") {
    val fromBlocks = spark.read
      .parquet(IndexBuilder.blocksPath(indexDir) + "/group=*")
      .as[Schema.TermBlock]
      .flatMap { b =>
        val d = Blocks.decode(b)
        (0 until b.n).iterator.map(i =>
          Schema.Posting(b.termId, d.docIds(i), d.tfs(i), d.docLens(i)))
      }
      .collect().sortBy(p => (p.termId, p.docId)).toVector
    val fromPostings = spark.read
      .parquet(IndexBuilder.postingsPath(indexDir) + "/group=*")
      .as[Schema.Posting]
      .collect().sortBy(p => (p.termId, p.docId)).toVector
    assert(fromBlocks == fromPostings)
  }
}
