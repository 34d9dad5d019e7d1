package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.Synth
import graft.index.IndexBuilder
import graft.oracle.RefModel
import graft.query.Search
import graft.text.Extract

/** End-to-end driver for the distributed engine: synthesizes the corpus,
  * builds the inverted index under a temp dir, answers the reference query
  * set with BOTH the naive join-aggregate scorer and block-max WAND, and
  * cross-checks each against the in-memory oracle inline.
  *
  * Usage: runMain graft.tools.SparkSearchCli [--served] [nDocs] [query...]
  *
  * Default semantics are strict CLI parity with `main.rs:290`: k results
  * INCLUDING deterministic zero-score padding when fewer than k docs score
  * positive (`Search.searchTop(padToK = true)` vs `RefModel.searchTopCli`).
  * `--served` switches both sides to server semantics (positive-only,
  * `server.rs:86-90`) — the contract [[Serve]] keeps.
  */
object SparkSearchCli {

  def localSession(cores: String = "*"): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()

  def main(args: Array[String]): Unit = {
    val served = args.contains("--served")
    val rest = args.filterNot(_ == "--served")
    val n = rest.headOption.map(_.toInt).getOrElse(2000)
    val queries =
      if (rest.length > 1) Seq(rest.drop(1).mkString(" "))
      else Seq("opengl", "texture array shader",
        "missingkeywordthatdoesnotexist", "textur aray shaderz")

    val spark = localSession()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files
      .createTempDirectory("graft_index_").toString
    val t0 = System.nanoTime()
    val pages = spark.createDataset(Synth.pages(n).map(p =>
      graft.index.Schema.Page(p.url, p.warc_ts, p.html, p.text, p.lang)))
      .toDF()
    val metrics = IndexBuilder.build(spark, pages, dir)
    println(f"built index in ${(System.nanoTime() - t0) / 1e9}%.1fs: " +
      s"docs=${metrics.docCount} terms=${metrics.termCount} " +
      s"postings=${metrics.postingCount} " +
      f"docsPerSec=${metrics.docsPerSec}%.0f skew=${metrics.skewRatio}%.1f")

    // oracle ground truth
    val oracle = new RefModel()
    Synth.pages(n).foreach { p =>
      Extract.extractText(p.html, p.text).foreach(t =>
        oracle.addDocument(p.url, t, p.warc_ts.getTime))
    }

    var mismatches = 0
    for {
      q <- queries
      (method, oracleMethod) <- Seq(
        (Search.Bm25, RefModel.Bm25), (Search.Tfidf, RefModel.Tfidf))
    } {
      val want =
        if (served) oracle.searchTop(q, oracleMethod, 10)
        else oracle.searchTopCli(q, oracleMethod, 10)
      for (useWand <- Seq(false, true)) {
        val label = if (useWand) "wand " else "naive"
        val got = Search
          .searchTop(spark, dir, q, method, 10, useWand = useWand,
            padToK = !served)
          .select($"url", $"score").as[(String, Float)].collect().toVector
        val ok = got == want
        if (!ok) mismatches += 1
        println(s"[$label/$method] \"$q\": ${got.size} hits " +
          (if (ok) "== oracle ✓"
           else s"!= oracle ✗\n  got:  ${got.take(3)}\n  want: ${want.take(3)}"))
      }
    }
    println(if (mismatches == 0) "ALL QUERIES MATCH ORACLE"
            else s"$mismatches MISMATCHES")
    spark.stop()
    if (mismatches > 0) sys.exit(1)
  }
}
