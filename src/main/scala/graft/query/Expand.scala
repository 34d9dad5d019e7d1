package graft.query

import java.nio.charset.StandardCharsets

/** Fuzzy query-token expansion, ported 1:1 from
  * `/root/reference/src/model.rs:59-135` (Q2–Q4 in SURVEY.md §2.5).
  *
  * Length semantics: the reference compares `str::len()` values, which are
  * UTF-8 BYTE lengths, for the edit budget, the prefix-overlap ratio and the
  * Levenshtein length pre-prune — while the Levenshtein DP itself runs over
  * `chars` (code points). Both are replicated exactly.
  */
object Expand {

  /** Edit budget by query-token byte length (model.rs:87-92). */
  def maxDist(qlenBytes: Int): Int =
    if (qlenBytes <= 3) 0
    else if (qlenBytes <= 7) 1
    else 2

  def utf8Len(s: String): Int = {
    // count UTF-8 bytes without materializing the array
    var bytes = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      bytes += (if (cp < 0x80) 1
                else if (cp < 0x800) 2
                else if (cp < 0x10000) 3
                else 4)
      i += Character.charCount(cp)
    }
    bytes
  }

  /** Two-row DP edit distance over code points (model.rs:59-76). */
  def levenshtein(a: String, b: String): Int = {
    val ac = a.codePoints().toArray
    val bc = b.codePoints().toArray
    val m = ac.length
    val n = bc.length
    if (m == 0) return n
    if (n == 0) return m
    var prev = Array.tabulate(n + 1)(identity)
    var curr = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      curr(0) = i
      var j = 1
      while (j <= n) {
        val cost = if (ac(i - 1) == bc(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(n)
  }

  /** Match ONE dictionary term against ONE query token; Some(weight) iff the
    * reference's expansion would include it (model.rs:96-132). Each gtf key
    * is visited once per token in the reference, so at most one weight
    * results per (token, term) pair.
    */
  def matchTerm(queryToken: String, qlenBytes: Int, term: String)
      : Option[Float] = {
    // Exact match → 1.0, short-circuits everything else (model.rs:100-103)
    if (term == queryToken) return Some(1.0f)
    val budget = maxDist(qlenBytes)
    if (budget == 0) return None

    val tlenBytes = utf8Len(term)
    // Prefix overlap, both ≥ 4 bytes (model.rs:107-120). Note: only
    // short-circuits the Levenshtein path when weight ≥ 0.5.
    if (qlenBytes >= 4 && tlenBytes >= 4 &&
        (term.startsWith(queryToken) || queryToken.startsWith(term))) {
      val shorter = math.min(qlenBytes, tlenBytes).toFloat
      val longer = math.max(qlenBytes, tlenBytes).toFloat
      val weight = (shorter / longer) * 0.85f
      if (weight >= 0.5f) return Some(weight)
    }

    // Levenshtein with byte-length pre-prune (model.rs:122-132)
    if (math.abs(qlenBytes - tlenBytes) > budget) return None
    val dist = levenshtein(queryToken, term)
    if (dist > 0 && dist <= budget) {
      val similarity =
        1.0f - (dist.toFloat / math.max(qlenBytes, tlenBytes).toFloat)
      Some(similarity * 0.75f)
    } else None
  }

  /** Expand a full token list against an in-memory dictionary (oracle path /
    * tests). Cross-token merge keeps the MAX weight per matched term
    * (model.rs:196-204) — duplicated query words do not double-count.
    */
  def expandAll(tokens: Seq[String], dictionary: Iterable[String])
      : Map[String, Float] = {
    val byteLens = tokens.map(t => t -> utf8Len(t))
    val merged = scala.collection.mutable.HashMap.empty[String, Float]
    for (term <- dictionary; (tok, qlen) <- byteLens) {
      matchTerm(tok, qlen, term) match {
        case Some(w) =>
          merged.updateWith(term) {
            case Some(prev) => Some(math.max(prev, w))
            case None => Some(w)
          }
        case None =>
      }
    }
    merged.toMap
  }
}
