package graft.oracle

import scala.collection.mutable

import graft.query.Expand
import graft.score.Scoring
import graft.text.Lexer

/** In-memory oracle: a direct, deterministic port of the reference engine
  * (`/root/reference/src/model.rs`). This defines "correct" for the
  * distributed pipeline (SURVEY.md §5.2): the Spark engine must reproduce
  * this model's ranks exactly and scores bit-identically (both sum Float
  * contributions in [[Scoring.utf8Order]]).
  *
  * HashMap-iteration nondeterminism in the reference (tie order, f32 sum
  * order) is replaced by the canonical order; equal-score ties are broken by
  * url ascending.
  */
object RefModel {
  final case class DocEntry(
      var count: Long, // total surviving tokens (model.rs:28)
      ft: mutable.HashMap[String, Long], // per-doc term frequency
      var lastModified: Long) // ≡ warc_ts (epoch micros)

  sealed trait RankMethod
  case object Bm25 extends RankMethod
  case object Tfidf extends RankMethod
}

final class RefModel(params: Scoring.Params = Scoring.Params()) {
  import RefModel._

  val gtf: mutable.HashMap[String, Long] = mutable.HashMap.empty // df
  val docs: mutable.HashMap[String, DocEntry] = mutable.HashMap.empty
  var totalTokens: Long = 0L

  /** model.rs:174-186. Deliberate divergence: entries reaching df = 0 are
    * REMOVED here, while the reference keeps them — its own TF-IDF then
    * computes log10(N/0) = ∞ and 0·∞ = NaN scores for every doc
    * (model.rs:161-170), i.e. the kept-entry state is NaN-poisoned and
    * observably broken. The rebuild (and this oracle) drop the entry.
    */
  def removeDocument(url: String): Unit = {
    docs.remove(url).foreach { doc =>
      totalTokens = math.max(0L, totalTokens - doc.count)
      doc.ft.keysIterator.foreach { term =>
        gtf.get(term).foreach { f =>
          if (f <= 1L) gtf.remove(term)
          else gtf.update(term, f - 1)
        }
      }
    }
  }

  /** model.rs:229-260 — remove-then-insert upsert; docs whose content has no
    * surviving tokens are NOT indexed (A3).
    */
  def addDocument(url: String, content: String, lastModified: Long): Unit = {
    removeDocument(url)
    val tokens = Lexer.tokenize(content)
    val ft = mutable.HashMap.empty[String, Long]
    tokens.foreach(t => ft.updateWith(t) {
      case Some(c) => Some(c + 1)
      case None => Some(1L)
    })
    val termCount = ft.valuesIterator.sum
    if (termCount == 0L) return
    ft.keysIterator.foreach(t => gtf.updateWith(t) {
      case Some(c) => Some(c + 1)
      case None => Some(1L)
    })
    totalTokens += termCount
    docs.update(url, DocEntry(termCount, ft, lastModified))
  }

  /** model.rs:262-267 */
  def requiresReindexing(url: String, lastModified: Long): Boolean =
    docs.get(url) match {
      case Some(doc) => doc.lastModified < lastModified
      case None => true
    }

  /** BM25 idf — reference recomputes df by scanning docs (model.rs:53); the
    * gtf invariant makes this equal to gtf(term), but the oracle scans like
    * the reference to double-check the invariant in tests.
    */
  private def dfByScan(term: String): Long =
    docs.valuesIterator.count(_.ft.contains(term))

  /** model.rs:190-227 — full search: expansion, scoring of EVERY doc, sort
    * desc. Returned order: score desc, then url asc (canonical tiebreak).
    */
  def searchQuery(query: String, method: RankMethod)
      : Vector[(String, Float)] = {
    val tokens = Lexer.tokenize(query)
    val tokenWeights = Expand.expandAll(tokens.toSeq, gtf.keys)
    // canonical summation order: UTF-8 byte order of the matched term
    val expanded: Vector[(String, Float)] =
      tokenWeights.toVector.sortBy(_._1)(Scoring.utf8Order)

    val avgdl = Scoring.avgdl(totalTokens, docs.size.toLong)
    val n = docs.size.toLong

    // idf is identical for every doc; the reference recomputes it inside the
    // doc loop (model.rs:150) but the value is loop-invariant — hoisted here.
    val withIdf: Vector[(String, Float, Float)] = expanded.map {
      case (term, weight) =>
        val idf = method match {
          case Bm25 => Scoring.bm25Idf(n, dfByScan(term))
          case Tfidf => Scoring.tfidfIdf(n, gtf.getOrElse(term, 1L))
        }
        (term, weight, idf)
    }

    val results = docs.iterator.map { case (url, doc) =>
      val score: Float = method match {
        case Bm25 =>
          if (avgdl == 0.0f) 0.0f // model.rs:144
          else {
            var s = 0.0f
            withIdf.foreach { case (term, weight, idf) =>
              val tf = doc.ft.getOrElse(term, 0L).toFloat
              s += Scoring.bm25Contrib(
                tf, doc.count.toFloat, avgdl, idf, weight, params)
            }
            s
          }
        case Tfidf =>
          var s = 0.0f
          withIdf.foreach { case (term, weight, idf) =>
            s += Scoring.tfidfContrib(
              doc.ft.getOrElse(term, 0L).toFloat, doc.count.toFloat, idf,
              weight)
          }
          s
      }
      (url, score)
    }.toVector

    // ties break url-asc in UTF-8 BYTE order ([[Scoring.utf8Order]]), not
    // default UTF-16 code-unit order: the engine's docId-asc tiebreak
    // follows Spark's binary string sort, and the two orders disagree for
    // urls mixing BMP U+E000..U+FFFF with supplementary-plane code points
    results.sortBy { case (url, score) => (-score, url) }(
      Ordering.Tuple2(Ordering.Float.TotalOrdering, Scoring.utf8Order))
  }

  /** Server semantics (`/root/reference/src/server.rs:85-90`): positive
    * scores only, top k.
    */
  def searchTop(query: String, method: RankMethod, k: Int)
      : Vector[(String, Float)] =
    searchQuery(query, method).filter(_._2 > 0.0f).take(k)

  /** CLI semantics (`/root/reference/src/main.rs:290`): top k of the FULL
    * score-desc list — the reference scores EVERY doc, so non-matching
    * docs appear at 0.0 and negative-idf matches keep their REAL scores,
    * ranked BELOW the zeros (a head-term query where df > (N+1)/2 can
    * make every match negative — a positives-then-zero-pad model forges
    * both rank and score there). Equal-score ties order url ASC
    * (deterministic) where the reference iterates HashMap order; on
    * FRESH-BUILT indexes url asc = docId asc (SparkSearchCli always
    * fresh-builds; don't reuse this oracle against an updated index).
    * COVERAGE.md divergence #3.
    */
  def searchTopCli(query: String, method: RankMethod, k: Int)
      : Vector[(String, Float)] =
    searchQuery(query, method).take(k)
}
