package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  */
object TextStats {

  // Measured (r6): these maps are LIGHT per-row (split/regex over ~1 KB
  // texts) — spreading an under-split scan (InputLayout.spread) costs
  // more in exchange than the parallelism returns (langid 0.13→0.27 s),
  // so the ops stay narrow; only genuinely heavy per-row ops (image
  // decode) spread.
  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // ---- language identification (marker-word + script heuristic) ---------

  private val markers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "with", "that", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "mit", "für", "nicht"),
    "fr" -> Set("le", "la", "les", "et", "est", "avec", "pour", "dans"),
    "es" -> Set("el", "la", "los", "las", "es", "con", "para", "que"))

  /** Deterministic heuristic language ID: CJK codepoint share decides "zh";
    * otherwise argmax of per-language marker-word hit counts, tiebroken by
    * language code (alphabetical), "und" when nothing matches.
    */
  def langIdOf(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        val b = Character.UnicodeScript.of(cp)
        if (b == Character.UnicodeScript.HAN) cjk += 1
      }
      i += Character.charCount(cp)
    }
    if (letters > 0 && cjk.toDouble / letters > 0.3)
      return ("zh", cjk.toDouble / letters)
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return ("und", 0.0)
    val scores = markers.view.mapValues(ms =>
      toks.count(ms.contains).toDouble / toks.length).toMap
    val (lang, score) = scores.toSeq.sortBy { case (l, s) => (-s, l) }.head
    if (score == 0.0) ("und", 0.0) else (lang, score)
  }

  /** SQL-parity language ID — the driver-registered entry. Emits the raw
    * evidence (per-language marker-token hits, Han/alpha char counts) as
    * integer columns plus `pred_lang` derived from them by a CASE both
    * engines evaluate identically:
    *   zh  iff han·10 > (han+alpha)·3   (CJK share > 0.3, integer-exact)
    *   else argmax of marker hits, alphabetical tiebreak, 'und' on zeros.
    * All counts are codegen'd built-ins (split/filter/regexp) — one narrow
    * map over the corpus, no shuffle. The richer codepoint-level heuristic
    * stays available as [[langIdOf]] (full Unicode letter classes are not
    * ANSI-SQL-expressible, which is exactly what kept this entry rows-only).
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    def hits(lang: String): org.apache.spark.sql.Column =
      size(filter(toks, t => t.isin(markers(lang).toSeq: _*))).cast("long")
    val han = (length(col("text")) -
      length(regexp_replace(col("text"), "[\u4e00-\u9fff]", ""))).cast("long")
    val alpha =
      length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long")
    docs(spark, sfDir)
      .select(col("doc_id"),
        hits("de").as("de_hits"), hits("en").as("en_hits"),
        hits("es").as("es_hits"), hits("fr").as("fr_hits"),
        han.as("han_chars"), alpha.as("alpha_chars"))
      .withColumn("pred_lang",
        when(col("han_chars") * 10 >
            (col("han_chars") + col("alpha_chars")) * 3, "zh")
          .when(greatest(col("de_hits"), col("en_hits"), col("es_hits"),
            col("fr_hits")) === 0, "und")
          .when(col("de_hits") >= col("en_hits") &&
            col("de_hits") >= col("es_hits") &&
            col("de_hits") >= col("fr_hits"), "de")
          .when(col("en_hits") >= col("es_hits") &&
            col("en_hits") >= col("fr_hits"), "en")
          .when(col("es_hits") >= col("fr_hits"), "es")
          .otherwise("fr"))
  // NO trailing orderBy: these ops are narrow codegen'd maps — a global
  // sort would be a needless full shuffle at corpus scale. Ordering for
  // the oracle comparison lives in the SparkEntry wrappers.
  }

  /** DuckDB twin of [[langId]] (same rows, names, and CASE logic). */
  def langIdSql: String = {
    def lst(lang: String): String =
      markers(lang).toSeq.sorted.map(w => s"'$w'").mkString("[", ",", "]")
    def hits(lang: String): String =
      s"len(list_filter(string_split(lower(text), ' '), " +
        s"x -> list_contains(${lst(lang)}, x)))::BIGINT"
    s"""SELECT doc_id,
       |  ${hits("de")} AS de_hits,
       |  ${hits("en")} AS en_hits,
       |  ${hits("es")} AS es_hits,
       |  ${hits("fr")} AS fr_hits,
       |  (length(text) - length(regexp_replace(text,
       |    '[\\x{4e00}-\\x{9fff}]', '', 'g')))::BIGINT AS han_chars,
       |  length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT
       |    AS alpha_chars,
       |  CASE
       |    WHEN (length(text) - length(regexp_replace(text,
       |        '[\\x{4e00}-\\x{9fff}]', '', 'g'))) * 10 >
       |      ((length(text) - length(regexp_replace(text,
       |        '[\\x{4e00}-\\x{9fff}]', '', 'g'))) +
       |       length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) * 3
       |      THEN 'zh'
       |    WHEN greatest(${hits("de")}, ${hits("en")}, ${hits("es")},
       |        ${hits("fr")}) = 0 THEN 'und'
       |    WHEN ${hits("de")} >= ${hits("en")} AND ${hits("de")} >=
       |      ${hits("es")} AND ${hits("de")} >= ${hits("fr")} THEN 'de'
       |    WHEN ${hits("en")} >= ${hits("es")} AND ${hits("en")} >=
       |      ${hits("fr")} THEN 'en'
       |    WHEN ${hits("es")} >= ${hits("fr")} THEN 'es'
       |    ELSE 'fr'
       |  END AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- quality scoring ----------------------------------------------------

  private val stopList =
    Seq("the", "and", "of", "to", "a", "is", "in", "that", "with", "for")

  /** Per-doc quality signals: token count, mean token length, stop-word
    * ratio, punctuation ratio, alpha ratio — the usual web-text filters,
    * all as codegen'd column expressions.
    */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    docs(spark, sfDir)
      .withColumn("n_tokens", size(toks))
      .withColumn("n_chars2", length(col("text")))
      .withColumn("n_stop",
        size(filter(toks, t => t.isin(stopList: _*))))
      .withColumn("n_punct",
        length(col("text")) -
          length(regexp_replace(col("text"), "[.,;:!?]", "")))
      .withColumn("n_alpha",
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("n_chars2").cast("double") /
          greatest(col("n_tokens"), lit(1)), 3).as("mean_tok_len"),
        round(col("n_stop").cast("double") /
          greatest(col("n_tokens"), lit(1)), 3).as("stop_ratio"),
        round(col("n_punct").cast("double") /
          greatest(col("n_chars2"), lit(1)), 3).as("punct_ratio"),
        round(col("n_alpha").cast("double") /
          greatest(col("n_chars2"), lit(1)), 3).as("alpha_ratio"))
  // unsorted by design — see langId; SparkEntry orders for the oracle
  }

  def qualitySql: String =
    """SELECT doc_id,
      |  len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      |    AS n_tokens,
      |  round(length(text)::DOUBLE / greatest(
      |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')), 1),
      |    3) AS mean_tok_len,
      |  round(len(list_filter(string_split(lower(text), ' '),
      |      x -> list_contains(['the','and','of','to','a','is','in','that',
      |                          'with','for'], x)))::DOUBLE
      |    / greatest(len(list_filter(string_split(lower(text), ' '),
      |        x -> x <> '')), 1), 3) AS stop_ratio,
      |  round((length(text) - length(regexp_replace(text, '[.,;:!?]', '',
      |    'g')))::DOUBLE / greatest(length(text), 1), 3) AS punct_ratio,
      |  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
      |    / greatest(length(text), 1), 3) AS alpha_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- token counting -----------------------------------------------------

  /** Whitespace tokens + a BPE-ish regex token count (letter runs, digit
    * runs, single non-alnum marks — a cheap proxy for subword count).
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= ""))
        .as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).as("bpe_tokens"))
  // unsorted by design — see langId; SparkEntry orders for the oracle

  def tokenCountsSql: String =
    """SELECT doc_id,
      |  len(list_filter(string_split(text, ' '), x -> x <> ''))
      |    AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
      |    AS bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- document fingerprinting (rolling hash / winnowing-lite) ------------

  /** k smallest rolling hashes of 8-byte windows — an order-insensitive
    * content fingerprint usable for containment checks. Emitted as scalar
    * rows (doc_id, k_rank, hash) — one row per kept hash, k_rank = position
    * in ascending hash order — so downstream comparators (and the driver's
    * row-sort/hash gate) never see array cells.
    */
  def fingerprints(
      spark: SparkSession,
      sfDir: String,
      window: Int = 8,
      keep: Int = 4): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val hashes = fingerprintOf(t, window, keep)
        hashes.iterator.zipWithIndex.map { case (h, r) => (id, r, h) }
      }
      .toDF("doc_id", "k_rank", "hash")
  // unsorted by design — see langId; SparkEntry orders for the oracle
  }

  /** Driver-side twin of the per-doc fingerprint (ascending hash order). */
  def fingerprintOf(t: String, window: Int = 8, keep: Int = 4): Array[Long] = {
    val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val heap = new scala.collection.mutable.PriorityQueue[Long]()
    if (bytes.length >= window) {
      var h = 0L
      val base = 1000003L
      var pow = 1L
      var i = 0
      while (i < window) { h = h * base + (bytes(i) & 0xff); i += 1 }
      var j = 1
      while (j < window) { pow *= base; j += 1 }
      var k = window
      heap.enqueue(h)
      while (k < bytes.length) {
        h = (h - (bytes(k - window) & 0xff) * pow) * base +
          (bytes(k) & 0xff)
        if (heap.size < keep) heap.enqueue(h)
        else if (h < heap.head) { heap.dequeue(); heap.enqueue(h) }
        k += 1
      }
    }
    heap.toArray.sorted
  }
}
