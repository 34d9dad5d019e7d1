package graft.index

import java.sql.Timestamp

/** Columnar data model of the rebuilt engine (SURVEY.md §1.2). The corpus
  * row mirrors `BASELINE.json.input_hint` exactly; everything else is engine
  * state laid out as tables (parquet locally, Iceberg-shaped for clusters).
  */
object Schema {

  /** Input corpus row: `(url, warc_ts, html, text, lang)`. */
  final case class Page(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** Post-extraction intermediate (S5/S6/S8 applied, malformed rows gone). */
  final case class ExtractedDoc(url: String, warc_ts: Timestamp, text: String)

  /** Forward-index stage output: one row per (doc, term) — ≡ `Doc.ft`
    * entries (`model.rs:29`), before ids are assigned. Each surviving doc
    * additionally emits ONE marker row (term = null) carrying its warc_ts
    * and docLen (= Σ tf, `Doc.count`), so the docs stage is derived from
    * stage_ft alone — the (heavy) pages input is scanned exactly once per
    * build. warc_ts/docLen are null/0 on term rows; parquet RLE makes the
    * extra columns ~free.
    */
  final case class FtRow(
      url: String,
      term: String,
      tf: Int,
      warc_ts: Timestamp,
      docLen: Long,
      m: Boolean) // marker flag — doubles as the parquet PARTITION column
      // so the docs stage reads only the (small) m=true files and the
      // postings/terms stages read only m=false, with no row filtering

  /** ≡ `Docs` metadata (`model.rs:26-33`): docLen ≡ `Doc.count`. Only docs
    * with ≥1 surviving token exist here (A3).
    */
  final case class DocMeta(
      docId: Long,
      url: String,
      warc_ts: Timestamp,
      docLen: Long)

  /** Term dictionary; df ≡ `gtf[term]` (document frequency, model.rs:24). */
  final case class TermEntry(termId: Long, term: String, df: Long)

  /** One posting. The on-disk postings table also carries docLen
    * (denormalized) so block building and scoring never re-join docs.
    */
  final case class Posting(termId: Long, docId: Long, tf: Int, docLen: Int)

  /** ≡ cached `total_tokens` + doc count (`model.rs:35-46`). */
  final case class Stats(docCount: Long, totalTokens: Long)

  /** A compressed posting block (north rule): ≤ blockSize postings of one
    * term, delta+varint encoded, fully inside one docId bucket.
    *
    * Block-max metadata is stored as (min/max tf, min/max docLen) rather
    * than precomputed score bounds: BM25/TF-IDF partials are monotone
    * increasing in tf and decreasing in docLen, so
    *   upper(partial) = partial(maxTf, minDocLen),
    *   lower(partial) = partial(minTf, maxDocLen)
    * hold for ANY (k1, b, avgdl) — bounds survive incremental updates that
    * change avgdl, and k1/b stay configurable without re-encoding.
    */
  final case class TermBlock(
      termId: Long,
      bucket: Int,
      minDocId: Long,
      maxDocId: Long,
      n: Int,
      minTf: Int,
      maxTf: Int,
      minDocLen: Int,
      maxDocLen: Int,
      docIdsDelta: Array[Byte],
      tfs: Array[Byte],
      docLens: Array[Byte])

  /** Per-(stage, group) checkpoint record (north rule: resumable builds). */
  final case class LineageRecord(
      buildId: String,
      stage: String,
      group: Int,
      status: String,
      rows: Long,
      wallMs: Long)

  /** Per-build metrics (north rule: docs/sec, postings/partition, skew). */
  final case class BuildMetrics(
      buildId: String,
      docCount: Long,
      totalTokens: Long,
      termCount: Long,
      postingCount: Long,
      docsPerSec: Double,
      wallMs: Long,
      postingsPerPartitionAvg: Double,
      postingsPerPartitionMax: Long,
      skewRatio: Double)
}
