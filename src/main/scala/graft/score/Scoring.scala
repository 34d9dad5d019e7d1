package graft.score

/** Scoring formulas ported 1:1 from `/root/reference/src/model.rs`, kept in
  * one place so the in-memory oracle and the distributed engine share the
  * exact same Float (f32) arithmetic.
  *
  * All math is performed in Float to mirror the reference's `f32` end to end
  * (SURVEY.md §2.6.7); `ln`/`log10` go through double and round back to
  * Float, which stays within the suite's 1e-5 relative tolerance of Rust's
  * `f32::ln`.
  */
object Scoring {
  /** model.rs:138-139 — reference uses K=2.0 (NOT the 1.2 in north_star
    * prose; rank identity wins, both configurable via [[Params]]).
    */
  val DefaultK: Float = 2.0f
  val DefaultB: Float = 0.75f

  final case class Params(k1: Float = DefaultK, b: Float = DefaultB)

  /** BM25 idf, model.rs:48-56. Nonstandard `+1` inside the log numerator;
    * can go NEGATIVE when df > (N+1)/2 — unclamped, as in the reference.
    */
  def bm25Idf(totalDocs: Long, docFreq: Long): Float = {
    val n = totalDocs.toFloat
    val df = docFreq.toFloat
    math.log((((n - df + 0.5f) + 1.0f) / (df + 0.5f)).toDouble).toFloat
  }

  /** avgdl, model.rs:43-46. */
  def avgdl(totalTokens: Long, docCount: Long): Float =
    if (docCount == 0L) 0.0f else totalTokens.toFloat / docCount.toFloat

  /** One term's BM25 contribution, model.rs:142-156 (loop body). The caller
    * must skip everything when avgdl == 0 (whole score is 0 then).
    */
  def bm25Contrib(
      tf: Float,
      docLen: Float,
      avgdl: Float,
      idf: Float,
      weight: Float,
      p: Params = Params()): Float = {
    val denom = tf + p.k1 * (1.0f - p.b + p.b * docLen / avgdl)
    if (denom == 0.0f) 0.0f
    else weight * idf * tf * (p.k1 + 1.0f) / denom
  }

  /** TF-IDF tf, model.rs:159-164. */
  def tfidfTf(termCount: Float, docLen: Float): Float =
    if (docLen == 0.0f) 0.0f else termCount / docLen

  /** TF-IDF idf, model.rs:166-171 — log10, df defaulting handled upstream
    * (expansion only yields dictionary terms, so df ≥ 1).
    */
  def tfidfIdf(totalDocs: Long, docFreq: Long): Float = {
    if (totalDocs == 0L) return 0.0f
    math.log10((totalDocs.toFloat / docFreq.toFloat).toDouble).toFloat
  }

  def tfidfContrib(
      tf: Float,
      docLen: Float,
      idf: Float,
      weight: Float): Float =
    tfidfTf(tf, docLen) * idf * weight

  /** Canonical term ordering for score summation: UTF-8 byte order (= code
    * point order), matching Spark's binary string ordering used for termId
    * assignment. Summing Float contributions in this fixed order makes
    * oracle and engine scores bit-identical.
    */
  val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val la = a.length
      val lb = b.length
      var i = 0
      var j = 0
      while (i < la && j < lb) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(la - i, lb - j)
    }
  }
}
