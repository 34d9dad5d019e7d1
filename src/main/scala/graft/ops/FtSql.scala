package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-analog fulltext operators over the driver's `documents` table, with
  * ANSI-SQL twins (SparkEntry.oracleSql) runnable by DuckDB. Tokenization
  * here is deliberately DuckDB-expressible — lowercase + single-space split
  * + drop empties — NOT the full reference lexer (stemming/Unicode are
  * covered by the scalatest oracle suite instead; SURVEY.md §5.6).
  *
  * Float policy for oracle parity: only exact aggregates (counts, integer
  * sums-as-double) order results; displayed scores are rounded to 3
  * decimals.
  */
object FtSql {

  /** (doc_id, tok) — one row per token occurrence. */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        explode(filter(split(lower(col("text")), " "), t => t =!= ""))
          .as("tok"))

  val tokensSqlFrom: String =
    "(SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), " +
      "x -> x <> '')) AS tok FROM documents)"

  /** Per-doc token count as a NARROW codegen'd map — zero shuffles, vs the
    * naive explode-every-occurrence + groupBy(doc_id) (a full corpus-token
    * shuffle for a per-row scalar). The `doclen > 0` filter preserves the
    * SQL twin's semantics: GROUP BY over unnested tokens emits no row for a
    * zero-token document.
    */
  def doclen(spark: SparkSession, sfDir: String): DataFrame =
    perDocTfCached(spark, sfDir)
      .select(col("doc_id"), col("doclen"))
      .filter(col("doclen") > 0)

  val doclenSql: String =
    s"SELECT doc_id, count(*) AS doclen FROM $tokensSqlFrom t GROUP BY doc_id"

  /** Document frequency per term: dedup per-doc BEFORE the explode
    * (`array_distinct` is a narrow map), so the plan is one partial-agg
    * shuffle on tok — vs the old `distinct()` + `groupBy` double wide
    * stage shuffling every token occurrence twice.
    */
  def df(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        explode(array_distinct(
          filter(split(lower(col("text")), " "), t => t =!= ""))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))

  val dfSql: String =
    "SELECT tok, count(*) AS df FROM " +
      s"(SELECT DISTINCT doc_id, tok FROM $tokensSqlFrom t) d GROUP BY tok"

  /** Corpus stats: doc_count, total_tokens, avgdl_milli. All BIGINT and
    * integer-exact on both sides: DuckDB's sum(BIGINT) yields HUGEINT
    * (→ float64 in pandas) and double rounding differs at the 3rd decimal,
    * so the oracle twin casts the sum to BIGINT and avgdl is emitted as
    * floor(total_tokens*1000/doc_count) instead of a rounded double.
    */
  def stats(spark: SparkSession, sfDir: String): DataFrame =
    doclen(spark, sfDir).agg(
      count(lit(1)).as("doc_count"),
      sum(col("doclen")).as("total_tokens"))
      .select(
        col("doc_count"),
        col("total_tokens"),
        expr("total_tokens * 1000L DIV doc_count").as("avgdl_milli"))

  val statsSql: String =
    "SELECT count(*) AS doc_count, sum(doclen)::BIGINT AS total_tokens, " +
      "(sum(doclen)::BIGINT * 1000) // count(*) AS avgdl_milli FROM " +
      s"($doclenSql) d"

  /** Fixed query-term set used by the SQL-analog scorers (present in the
    * synthetic documents vocabulary).
    */
  val queryTerms: Seq[String] = Seq("data", "query", "spark")
  private def termsIn: String =
    queryTerms.map(t => s"'$t'").mkString("(", ",", ")")

  /** Per-doc frame computed in ONE narrow pass (no explode, no shuffle):
    * doc_id, doclen, tf_i per query term — all codegen'd array expressions.
    * Both scorers derive from this; the global n/df/avgdl aggregate is a
    * 1-row branch crossJoined back (broadcast NL), so the whole score plan
    * is EXACTLY two corpus scans: per-doc math and the 1-row agg — no
    * separate count job, no tokenize re-passes, no shuffled joins.
    * UNFILTERED (empty docs kept): n counts every document (oracle
    * `count(*) FROM documents`), while avgdl averages non-empty doclens
    * only; scorers filter doclen > 0 themselves.
    */
  private def perDocTf(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(col("toks"), x => x === t)).cast("long").as(s"tf_$i")
    }
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id") +: size(col("toks")).cast("long").as("doclen")
        +: tfCols: _*)
  }

  /** [[perDocTf]] persisted once per input (fingerprint-keyed, bounded to
    * one live set — the serving-cache pattern every heavy pipeline op
    * uses): both scorers read it TWICE (per-doc math + the 1-row global
    * aggregate are two consumers of the same subtree, which Spark would
    * otherwise recompute — two full corpus tokenize passes per query),
    * and doclen/stats are plain projections of it. At 10^12 docs the
    * cached frame is 5 longs per doc — ~3 orders of magnitude smaller
    * than re-tokenizing the text column it replaces, and it spills
    * (MEMORY_AND_DISK) rather than OOMing.
    */
  private def perDocTfCached(spark: SparkSession, sfDir: String): DataFrame =
    LiveResultCache.getOrCompute("ftsql_perdoc",
      s"$sfDir|${LiveResultCache.fingerprint(spark,
        s"$sfDir/documents.parquet")}") {
      (perDocTf(spark, sfDir), Nil)
    }

  /** 1-row global frame: n over ALL docs, avgdl over non-empty docs, df
    * per query term.
    */
  private def globalStats(perDoc: DataFrame): DataFrame = {
    val dfAggs = queryTerms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    perDoc.agg(
      count(lit(1)).cast("double").as("n"),
      avg(when(col("doclen") > 0, col("doclen"))).as("avgdl") +: dfAggs: _*)
  }

  /** TF-IDF top-20: Σ_t (tf/doclen)·log10(N/df_t); ties → doc_id asc. */
  def tfidfTopK(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val perDoc = perDocTfCached(spark, sfDir)
    val contribs = queryTerms.indices.map { i =>
      when(col(s"tf_$i") > 0,
        col(s"tf_$i").cast("double") / col("doclen") *
          log10(col("n") / col(s"df_$i")))
        .otherwise(0.0)
    }
    perDoc.filter(col("doclen") > 0)
      .crossJoin(broadcast(globalStats(perDoc)))
      .filter(queryTerms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .withColumn("s", contribs.reduce(_ + _))
      .select(col("doc_id"), round(col("s"), 3).as("score"), col("s"))
      .orderBy(col("s").desc, col("doc_id").asc)
      .limit(k)
      .select("doc_id", "score")
  }

  def tfidfTopKSql(k: Int = 20): String =
    s"""WITH toks AS (SELECT doc_id, tok FROM $tokensSqlFrom t),
       |dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
       |dfs AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
       |        WHERE tok IN $termsIn GROUP BY tok),
       |n AS (SELECT count(*) AS n FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
       |       WHERE tok IN $termsIn GROUP BY doc_id, tok)
       |SELECT doc_id, round(sum(s), 3) AS score FROM (
       |  SELECT tf.doc_id,
       |         tf.tf::DOUBLE / dl.doclen * log10(n.n::DOUBLE / dfs.df) AS s
       |  FROM tf, dl, dfs, n
       |  WHERE tf.doc_id = dl.doc_id AND tf.tok = dfs.tok) c
       |GROUP BY doc_id ORDER BY sum(s) DESC, doc_id ASC LIMIT $k"""
      .stripMargin

  /** BM25 top-20 (k1=2.0, b=0.75, textbook idf ln(1+(N-df+0.5)/(df+0.5))).
    */
  def bm25TopK(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val perDoc = perDocTfCached(spark, sfDir)
    val k1 = 2.0
    val b = 0.75
    val contribs = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf: Column = log(
        lit(1.0) + (col("n") - col(s"df_$i") + 0.5) /
          (col(s"df_$i") + 0.5))
      when(tf > 0,
        idf * tf * (k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("doclen")
            / col("avgdl"))))
        .otherwise(0.0)
    }
    perDoc.filter(col("doclen") > 0)
      .crossJoin(broadcast(globalStats(perDoc)))
      .filter(queryTerms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .withColumn("s", contribs.reduce(_ + _))
      .select(col("doc_id"), round(col("s"), 3).as("score"), col("s"))
      .orderBy(col("s").desc, col("doc_id").asc)
      .limit(k)
      .select("doc_id", "score")
  }

  def bm25TopKSql(k: Int = 20): String =
    s"""WITH toks AS (SELECT doc_id, tok FROM $tokensSqlFrom t),
       |dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
       |av AS (SELECT avg(doclen) AS avgdl FROM dl),
       |dfs AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
       |        WHERE tok IN $termsIn GROUP BY tok),
       |n AS (SELECT count(*) AS n FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
       |       WHERE tok IN $termsIn GROUP BY doc_id, tok)
       |SELECT doc_id, round(sum(s), 3) AS score FROM (
       |  SELECT tf.doc_id,
       |         ln(1.0 + (n.n::DOUBLE - dfs.df + 0.5) / (dfs.df + 0.5)) *
       |         tf.tf * 3.0 /
       |         (tf.tf + 2.0 * (1.0 - 0.75 + 0.75 * dl.doclen / av.avgdl))
       |         AS s
       |  FROM tf, dl, dfs, n, av
       |  WHERE tf.doc_id = dl.doc_id AND tf.tok = dfs.tok) c
       |GROUP BY doc_id ORDER BY sum(s) DESC, doc_id ASC LIMIT $k"""
      .stripMargin
}
