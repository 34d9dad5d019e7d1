package graft.corpus

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1): rows
  * of exactly the `BASELINE.json.input_hint` shape
  * `(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)`.
  *
  * Pure function of (seed, i): no wall clock, no external data. Zipf-skewed
  * vocabulary (head terms in nearly every doc exercise the skewed posting
  * merge), injected punctuation (indexed as 1-char tokens), multi-digit
  * numbers (kept) and single digits (dropped), ~1% non-ASCII tokens from the
  * pinned Rust↔JVM Unicode divergence set, and ~2% stop-word-only docs
  * (skipped at index time, model.rs:243-247). Every third doc is XHTML with
  * whitespace-only text nodes, attributes and a CDATA section — all of which
  * the reference extractor ignores.
  */
object Synth {

  final case class PageRow(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** splitmix64 — stateless, deterministic. */
  final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = {
      val l = nextLong() & Long.MaxValue
      (l % bound).toInt
    }
  }

  /** Core vocabulary. Includes the reference benchmark query terms
    * ("opengl", "texture array shader") plus stemming families, so the
    * rank-identity suite has real hits, near-misses for the fuzzy paths, and
    * head terms for skew.
    */
  val vocab: IndexedSeq[String] = IndexedSeq(
    // head-ish tech words (low index = high Zipf weight)
    "data", "page", "index", "search", "query", "document", "web", "site",
    "texture", "shader", "array", "opengl", "buffer", "vertex", "pixel",
    "render", "engine", "graphics", "network", "networks", "networking",
    "running", "runner", "runs", "pointer", "pointers", "memory", "cache",
    "caches", "caching", "thread", "threads", "threading", "compile",
    "compiler", "compilation", "national", "nationally", "rational",
    "relations", "relational", "connection", "connections", "connected",
    "generate", "generated", "generation", "general", "generally",
    "communication", "communicate", "community", "arsenal",
    "happiness", "hopeful", "hopefully", "hoping", "hopped", "hopping",
    "tied", "ties", "tying", "dying", "lying", "skies", "skis",
    "agreement", "agreed", "feed", "luxuriated", "luxuriating",
    "conditional", "conditionally", "sensational", "sensitivity",
    "capability", "capabilities", "abilities", "ability",
    "serialization", "serialize", "optimizer", "optimization", "optimal",
    "adjustment", "adjustable", "dependent", "dependence", "dependency",
    "authorization", "authorize", "authority", "authorities",
    "texturing", "textured", "textures", "shaders", "shading", "shaded",
    "arrays", "arrayed", "vertices", "pixels", "rendering", "rendered",
    // words that stem into stop-word-adjacent shapes (kept: THESE not in list)
    "these", "those", "there", "their", "they",
    // stop words (dropped post-stem)
    "the", "is", "as", "are", "was", "were", "be", "been", "being", "and",
    "or", "but", "in", "on", "at", "to", "for", "of", "with", "by", "from",
    "it", "its", "this", "that", "not", "no",
    // multi-digit numbers (kept verbatim) and single digits (dropped)
    "2024", "1999", "42", "100", "7", "3", "9",
    // punctuation (each indexed as a 1-char token)
    ".", ",", ";", ":", "(", ")", "!", "?", "-", "/",
    // non-ASCII from the pinned divergence set
    "café", "naïve", "über", "данные", "数据", "Ⅷ", "x²", "ﬁle")

  private val langs = IndexedSeq("en", "de", "fr", "es", "zh")

  /** The global head: drawn in every doc (~10% of tokens) → df ≈ N, i.e.
    * NEGATIVE reference idf and heavy posting skew — exercises the salted
    * merge and the unclamped-idf quirk. Everything else is drawn from a
    * per-doc topic window, so mid-tail terms (incl. the reference query
    * terms) land at df ≈ windowSize/|vocab| ≈ 20% of docs → positive idf.
    */
  private val headCount = 8
  private val windowSize = 24

  private def zipfPick(rng: Rng, n: Int): Int = {
    // weight 1/(i+1) over 0..n-1 via inverse-CDF on the harmonic sum
    val h = harmonic(n)
    val r = (rng.nextLong() >>> 11) * (1.0 / (1L << 53)) * h
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += 1.0 / (i + 1)
      if (acc >= r) return i
      i += 1
    }
    n - 1
  }
  private def harmonic(n: Int): Double = {
    var s = 0.0
    var i = 1
    while (i <= n) { s += 1.0 / i; i += 1 }
    s
  }

  private def pickWord(rng: Rng, topicStart: Int): String = {
    if (rng.nextInt(10) == 0) vocab(zipfPick(rng, headCount))
    else {
      val off = zipfPick(rng, windowSize)
      vocab(headCount + (topicStart + off) % (vocab.length - headCount))
    }
  }

  /** Log-uniform (≈ zipf) pick from a large synthetic tail-vocabulary id
    * space — O(1) per pick, unlike the inverse-CDF used for the tiny core
    * vocab. Tail words make the DICTIONARY realistically large (the core
    * vocab alone has 85 distinct terms, which makes terms-stage and
    * dictionary-scan costs degenerate at bench scale).
    */
  private def pickTail(rng: Rng, tailVocab: Int): String = {
    val u = (rng.nextLong() >>> 11) * (1.0 / (1L << 53))
    val id = math.min(tailVocab - 1L,
      math.exp(u * math.log(tailVocab.toDouble)).toLong - 1L)
    "w" + java.lang.Long.toString(id, 36)
  }

  private val stopOnly =
    "the is and or with from this that not no to of in on at"

  val epochBaseMillis: Long = 1767225600000L // 2026-01-01T00:00:00Z

  /** Deterministic page i of a corpus with the given seed. `tailVocab > 0`
    * mixes ~20% tail words from a log-uniform id space of that size into
    * each body (default 0 keeps the pinned fixture corpus byte-identical).
    */
  def page(i: Long, seed: Long = 42L, tailVocab: Int = 0): PageRow = {
    val rng = new Rng(seed ^ (i * 0x9e3779b97f4a7c15L + 1))
    val isXhtml = i % 3 == 0
    val ext = if (isXhtml) "xhtml" else "txt"
    val url = s"https://site${i % 97}.example/$i/page.$ext"
    val ts = new Timestamp(epochBaseMillis + i * 1000L)
    val lang = langs((i % langs.length).toInt)

    val body: String =
      if (i % 50 == 17) stopOnly // stop-word-only doc → skipped at indexing
      else {
        val len = 30 + rng.nextInt(470)
        val topicStart = rng.nextInt(vocab.length - headCount)
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < len) {
          if (k > 0) sb.append(' ')
          if (tailVocab > 0 && rng.nextInt(5) == 1)
            sb.append(pickTail(rng, tailVocab))
          else sb.append(pickWord(rng, topicStart))
          k += 1
        }
        sb.toString
      }

    if (isXhtml) {
      val words = body.split(' ')
      val half = words.length / 2
      val part1 = words.take(half).mkString(" ")
      val part2 = words.drop(half).mkString(" ")
      // whitespace-only node, attributes, CDATA — all ignored by the
      // reference extractor (main.rs:36-39, xml-rs default config)
      val xml =
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<html xmlns="http://www.w3.org/1999/xhtml" lang="$lang">
           |<head><title>$part1</title></head>
           |<body class="page">
           |  <p id="p1">$part2</p>
           |  <pre><![CDATA[ignored cdata payload $i]]></pre>
           |  <div>   </div>
           |</body>
           |</html>""".stripMargin
      PageRow(url, ts, xml.getBytes(StandardCharsets.UTF_8), null, lang)
    } else {
      PageRow(url, ts, null, body, lang)
    }
  }

  def pages(n: Int, seed: Long = 42L): IndexedSeq[PageRow] =
    (0L until n.toLong).map(page(_, seed))

  /** Distributed generation: rows synthesized on executors (pure function
    * of (seed, i)), so bench corpora never sit on the driver. Partition
    * count is fixed so different core counts see identical splits.
    */
  def pagesDf(
      spark: org.apache.spark.sql.SparkSession,
      n: Long,
      seed: Long = 42L,
      partitions: Int = 64,
      tailVocab: Int = 0): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val tv = tailVocab
    spark.range(0L, n, 1L, partitions)
      .mapPartitions { it =>
        it.map { i =>
          val p = page(i, seed, tv)
          graft.index.Schema.Page(p.url, p.warc_ts, p.html, p.text, p.lang)
        }
      }
      .toDF()
  }

  /** Reference-extractor-equivalent text for a synthesized page, computed
    * WITHOUT the XML parser (titles/paragraph contents are known by
    * construction). Used to cross-check Extract.extractXml byte-identity.
    */
  def expectedText(row: PageRow): String =
    if (row.html == null) row.text
    else {
      val xml = new String(row.html, StandardCharsets.UTF_8)
      val title = substrBetween(xml, "<title>", "</title>")
      val para = substrBetween(xml, "<p id=\"p1\">", "</p>")
      // Characters events in document order, each + ' ': title, then the
      // "\n" runs between tags are whitespace-only (dropped), then the
      // paragraph. CDATA and the whitespace-only <div> are dropped.
      title + " " + para + " "
    }

  private def substrBetween(s: String, a: String, b: String): String = {
    val i = s.indexOf(a) + a.length
    s.substring(i, s.indexOf(b, i))
  }
}
