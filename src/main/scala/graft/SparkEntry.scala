package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Corpus, Dedup, FtSql, Multimodal, TextStats}
import graft.query.Search

/** Driver contract — see SURVEY.md §7 and TESTDATA.md.
  *
  * Two query families:
  *   - SQL-parity operators (suffix `_sql`-less names with oracleSql
  *     entries): DuckDB-checkable analogs over the driver's parquet tables.
  *   - Full-fidelity engine operators (no oracleSql → rows-only check):
  *     stemming/fuzzy/WAND/LSH paths whose correctness gate is the
  *     scalatest oracle suite (`sbt -batch test`).
  */
object SparkEntry {

  /** JSON string escape shared by Verify and Bench: backslash, quote, and
    * ALL control chars (<0x20) — a tab/CR in builder-authored SQL or a
    * quote in an env-provided path would otherwise make the driver's
    * json.load fail and silently zero the round's record.
    */
  private[graft] def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Flagship: build the inverted index over sf0.001 documents (cached,
    * checkpointed) and answer a BM25 query via block-max WAND.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val idx = Corpus.ensureIndex(spark, sfDir)
    Search.searchTop(spark, idx, "dup data", Search.Bm25, 10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- generic relational operators (TPC-H-ish sanity) ----------------
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q2_join_topk" -> ((s, dir) => {
      // Aggregate BEFORE joining: o_orderkey is unique, so inner-join-
      // then-group ≡ group-then-join — the pre-agg shuffles one row per
      // ORDER (partial-agg map-side) instead of the whole fact table,
      // and the join side carries a single column. The DuckDB oracle
      // keeps the join-first formulation. r6: the join is INNER (on the
      // unique key it emits exactly the semi-join's rows — the r5
      // equivalence argument unchanged) because Catalyst's
      // PushDownLeftSemiAntiJoin pushed the SEMI variant below the
      // aggregate, re-probing the whole fact table BEFORE the exchange —
      // on under-split input that serialized 600 k broadcast-hash probes
      // into the single scan task; inner joins have no such pushdown, so
      // the probe now runs on the aggregated rows above the exchange, in
      // parallel. Plan evidence: plans/r06/q2_join_topk_{before,after}.txt.
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      li.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_lines"))
        .join(o.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "sum_qty", "n_lines")
        .orderBy(col("sum_qty").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    "q3_window" -> ((s, dir) => {
      // first-row-per-group as a min_by AGGREGATE, not a row_number
      // window: the window shape shuffles and SORTS every row per
      // l_suppkey partition, while min_by partial-aggregates map-side —
      // one surviving row per (suppkey, map partition) reaches the
      // shuffle. Identical result (the order tuple is unique per group);
      // the DuckDB oracle keeps the row_number formulation.
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy("l_suppkey")
        .agg(min_by(
          struct(col("l_orderkey"), col("l_linenumber")),
          struct(col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"))).as("m"))
        .select(col("l_suppkey"), col("m.l_orderkey").as("l_orderkey"),
          col("m.l_linenumber").as("l_linenumber"))
        .orderBy("l_suppkey")
    }),
    "q4_events_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy("event_type")),

    // ---- fulltext: SQL-parity analogs over documents ---------------------
    "ft_doclen" -> ((s, dir) => FtSql.doclen(s, dir).orderBy("doc_id")),
    "ft_df" -> ((s, dir) => FtSql.df(s, dir).orderBy("tok")),
    "ft_stats" -> ((s, dir) => FtSql.stats(s, dir)),
    "ft_tfidf_topk" -> ((s, dir) => FtSql.tfidfTopK(s, dir)),
    "ft_bm25_topk" -> ((s, dir) => FtSql.bm25TopK(s, dir)),

    // ---- fulltext: full-fidelity engine (rows-only; oracle = scalatest) --
    "ft_engine_build_metrics" -> ((s, dir) => Corpus.buildMetricsDf(s, dir)),
    "ft_engine_bm25_wand" -> ((s, dir) => {
      val idx = Corpus.ensureIndex(s, dir)
      Search.searchTop(s, idx, "dup data", Search.Bm25, 10)
    }),
    "ft_engine_tfidf" -> ((s, dir) => {
      val idx = Corpus.ensureIndex(s, dir)
      Search.searchTop(s, idx, "data query", Search.Tfidf, 10)
    }),
    "ft_engine_fuzzy" -> ((s, dir) => {
      val idx = Corpus.ensureIndex(s, dir)
      // 1-edit typo + prefix expansion through the full reference semantics
      Search.searchTop(s, idx, "dupp", Search.Bm25, 10)
    }),

    // ---- dedup ------------------------------------------------------------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(s, dir).orderBy("doc_id")),
    "dedup_minhash_lsh" -> ((s, dir) => Dedup.minhashPairs(s, dir)),
    "dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    "dedup_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(s, dir)),
    "dedup_embedding_cosine" -> ((s, dir) =>
      Ann.cosineNearDupPairs(s, dir)),

    // ---- similarity search -------------------------------------------------
    "ann_brute_cosine" -> ((s, dir) => Ann.bruteTopK(s, dir)),
    "ann_lsh_cosine" -> ((s, dir) => Ann.lshTopK(s, dir)),
    // IVF-flat: deterministic spherical k-means cells, nprobe-cell scan.
    // rows-only (k-means isn't DuckDB-expressible); recall + the
    // nprobe=nlist ≡ brute degeneracy are OpsSpec-gated.
    "ann_ivf_cosine" -> ((s, dir) => Ann.ivfTopK(s, dir)),
    // nprobe = nlist scans every cell partition ⇒ EXACTLY brute force
    // (the OpsSpec-gated degeneracy), which IS SQL-expressible — so the
    // persisted cells/ layout + ivfQuery path get the full DuckDB hash
    // gate here, while ann_ivf_cosine keeps the pruned nprobe<nlist shape.
    "ann_ivf_exact" -> ((s, dir) =>
      Ann.ivfTopK(s, dir, nlist = 16, nprobe = 16)),
    // IVF-PQ: m-byte product-quantized codes per vector (32× smaller
    // cells), ADC lookup-table scan over the probed partitions, exact
    // rerank of the top candidates from the source table. rows-only;
    // recall + degeneracy OpsSpec-gated.
    "ann_ivfpq_cosine" -> ((s, dir) => Ann.ivfPqTopK(s, dir)),
    // nprobe = nlist + rerank<=0 (re-rank every probed candidate)
    // degenerates to exact brute force over the PQ index — the full
    // DuckDB hash gate for the PQ layout + ADC + rerank path.
    "ann_ivfpq_exact" -> ((s, dir) =>
      Ann.ivfPqTopK(s, dir, nlist = 16, nprobe = 16, rerank = 0)),

    // ---- text analysis -----------------------------------------------------
    // orderBy here is ORACLE-COMPARISON plumbing, not operator semantics:
    // the ops return unsorted narrow-map frames (no global sort at corpus
    // scale); the driver gate wants deterministic dump order
    "text_langid" -> ((s, dir) => TextStats.langId(s, dir).orderBy("doc_id")),
    "text_quality" -> ((s, dir) =>
      TextStats.quality(s, dir).orderBy("doc_id")),
    "text_token_counts" -> ((s, dir) =>
      TextStats.tokenCounts(s, dir).orderBy("doc_id")),
    "text_fingerprints" -> ((s, dir) =>
      TextStats.fingerprints(s, dir).orderBy("doc_id", "k_rank")),

    // ---- multimodal plumbing: REAL ImageIO decode on the PNG stratum
    // (doc_id % 10 == 0 carries a deterministic synthesized PNG), stub for
    // opaque payloads; frame sampling is md5-digested and DuckDB-oracled --
    "mm_image_meta" -> ((s, dir) =>
      Multimodal.imageMeta(s, dir).orderBy("doc_id")),
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(s, dir).orderBy("doc_id", "frame_idx")))

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "count(*) AS cnt FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),
    "q2_join_topk" ->
      ("SELECT l_orderkey, sum(l_quantity) AS sum_qty, count(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY l_orderkey ORDER BY sum_qty DESC, l_orderkey ASC LIMIT 10"),
    "q3_window" ->
      ("SELECT l_suppkey, l_orderkey, l_linenumber FROM (" +
        "SELECT l_suppkey, l_orderkey, l_linenumber, row_number() OVER (" +
        "PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, " +
        "l_linenumber) AS rn FROM lineitem) t WHERE rn = 1 " +
        "ORDER BY l_suppkey"),
    "q4_events_agg" ->
      ("SELECT event_type, count(*) AS n, " +
        "count(DISTINCT user_id) AS users, " +
        "round(sum(value), 2) AS sum_value " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "ft_doclen" -> (FtSql.doclenSql + " ORDER BY doc_id"),
    "ft_df" -> (FtSql.dfSql + " ORDER BY tok"),
    "ft_stats" -> FtSql.statsSql,
    "ft_tfidf_topk" -> FtSql.tfidfTopKSql(),
    "ft_bm25_topk" -> FtSql.bm25TopKSql(),
    "dedup_exact" -> (Dedup.exactSql + " ORDER BY doc_id"),
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql(),
    "ann_brute_cosine" -> Ann.bruteTopKSql(),
    // nprobe=nlist IVF ≡ brute force: same oracle as ann_brute_cosine
    "ann_ivf_exact" -> Ann.bruteTopKSql(),
    // nprobe=nlist + full rerank IVF-PQ ≡ brute force: same oracle
    "ann_ivfpq_exact" -> Ann.bruteTopKSql(),
    "text_langid" -> TextStats.langIdSql,
    "text_quality" -> TextStats.qualitySql,
    "text_token_counts" -> TextStats.tokenCountsSql,
    "mm_frame_sample" -> Multimodal.frameSampleSql())
}
