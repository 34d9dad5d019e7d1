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

  /** Allocation-free per-token matcher for scanning LARGE dictionaries:
    * semantics identical to [[matchTerm]] (property-tested), but the token
    * code points are decoded once, the term code points and the DP rows
    * live in reusable buffers, and the Levenshtein runs BANDED (|i−j| ≤
    * budget cells per row) with an early exit when a whole row exceeds the
    * budget. For budget ≤ 2 the band is exact for any distance ≤ budget
    * (Ukkonen), and distances > budget only ever need to read as
    * "> budget" — which is all [[matchTerm]] consumes. A typical
    * alpha-vs-numeric non-match exits after 2–3 rows instead of filling
    * the full m×n table; measured ~8× on the 1.2M-term dictionary scan.
    *
    * NOT thread-safe — create one per task/partition.
    */
  final class TokenMatcher(val token: String) {
    val qlenBytes: Int = utf8Len(token)
    val budget: Int = maxDist(qlenBytes)
    private val tcp: Array[Int] = token.codePoints().toArray
    private var termCp = new Array[Int](32)
    private var prev = new Array[Int](64)
    private var curr = new Array[Int](64)

    private def decodeTerm(term: String): Int = {
      var n = 0
      var i = 0
      while (i < term.length) {
        val cp = term.codePointAt(i)
        if (n >= termCp.length)
          termCp = java.util.Arrays.copyOf(termCp, termCp.length * 2)
        termCp(n) = cp
        n += 1
        i += Character.charCount(cp)
      }
      n
    }

    /** Banded Levenshtein tcp vs termCp(0..n): exact when ≤ budget, any
      * value > budget otherwise.
      */
    private def levBanded(n: Int): Int = {
      val m = tcp.length
      val inf = budget + 1
      // The caller pre-prunes on UTF-8 BYTE lengths (reference semantics),
      // but the DP runs over CODE POINTS: for multibyte strings the
      // codepoint gap can exceed budget even when the byte gap does not.
      // Without this guard the band never reaches column n (n > m+budget)
      // and the final prev(n) read would hit a stale cell from a previous
      // term (the row buffers are reused). True distance ≥ |m−n|, so
      // anything past the budget may legally collapse to inf.
      if (math.abs(m - n) > budget) return inf
      if (m == 0) return math.min(n, inf)
      if (n == 0) return math.min(m, inf)
      if (prev.length < n + 2) {
        prev = new Array[Int](n + 2)
        curr = new Array[Int](n + 2)
      }
      var j = 0
      while (j <= math.min(n, budget + 1)) {
        prev(j) = if (j <= budget) j else inf
        j += 1
      }
      var i = 1
      while (i <= m) {
        val jLo = math.max(1, i - budget)
        val jHi = math.min(n, i + budget)
        // guard cells: left of the band and (for the next row's reads)
        // right of it are certainly > budget
        curr(jLo - 1) = if (jLo == 1 && i <= budget) i else inf
        var rowMin = curr(jLo - 1)
        j = jLo
        while (j <= jHi) {
          val cost = if (tcp(i - 1) == termCp(j - 1)) 0 else 1
          var v = prev(j - 1) + cost
          val del = prev(j) + 1
          if (del < v) v = del
          val ins = curr(j - 1) + 1
          if (ins < v) v = ins
          if (v > inf) v = inf
          curr(j) = v
          if (v < rowMin) rowMin = v
          j += 1
        }
        if (jHi + 1 <= n) curr(jHi + 1) = inf
        if (rowMin >= inf) return inf // no cell can recover within budget
        val t = prev; prev = curr; curr = t
        i += 1
      }
      math.min(prev(n), inf)
    }

    /** [[matchTerm]]'s result as a primitive: the weight, or -1 when the
      * reference's expansion would not include the pair. `tlenBytes` must
      * equal `utf8Len(term)` (pass the dictionary's stored `tlen`).
      */
    def weight(term: String, tlenBytes: Int): Float = {
      if (term == token) return 1.0f
      if (budget == 0) return -1.0f
      if (qlenBytes >= 4 && tlenBytes >= 4 &&
          (term.startsWith(token) || token.startsWith(term))) {
        val shorter = math.min(qlenBytes, tlenBytes).toFloat
        val longer = math.max(qlenBytes, tlenBytes).toFloat
        val w = (shorter / longer) * 0.85f
        if (w >= 0.5f) return w
      }
      if (math.abs(qlenBytes - tlenBytes) > budget) return -1.0f
      val n = decodeTerm(term)
      val dist = levBanded(n)
      if (dist > 0 && dist <= budget)
        (1.0f - dist.toFloat / math.max(qlenBytes, tlenBytes).toFloat) * 0.75f
      else -1.0f
    }
  }

  /** Proper string prefixes of `tok` with ≥ 4 UTF-8 bytes — the complete
    * IN-list for the "token extends term" prefix-match case (at most |tok|
    * entries). CHAR-level, not code-point-level, cuts: matchTerm's
    * `token.startsWith(term)` is Java char semantics, which accepts a
    * prefix that splits a surrogate pair — codepoint-boundary prefixes
    * would silently drop such a pair (caught by ExpandMatcherSpec).
    */
  def pushdownPrefixes(tok: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 1
    while (i < tok.length) {
      val p = tok.substring(0, i)
      if (utf8Len(p) >= 4) out += p
      i += 1
    }
    out.result()
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
