package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** Round-4 fast-path equivalence: the allocation-free banded
  * [[Expand.TokenMatcher]] must accept exactly the pairs [[Expand.matchTerm]]
  * accepts, with identical weights — and the distributed expansion's
  * pushdown prefilter must be COMPLETE (never drops a pair matchTerm would
  * accept).
  */
class ExpandMatcherSpec extends AnyFunSuite {

  // deterministic corpus of adversarial strings: ascii, digits, multi-byte
  // (2/3/4-byte UTF-8), boundary lengths around the budget thresholds
  private val alphabet: IndexedSeq[String] = IndexedSeq(
    "a", "b", "c", "x", "z", "0", "7", "9", "é", "ß", "中", "�", "😀")

  private def randString(rng: scala.util.Random): String = {
    val n = 1 + rng.nextInt(11)
    (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
  }

  /** Scala mirror of Search.plan's distributed pushdown disjunction for ONE
    * token (Column semantics: between inclusive, startsWith, isin).
    */
  private def pushdownAccepts(
      tok: String, qlen: Int, term: String, tlen: Int): Boolean = {
    val budget = Expand.maxDist(qlen)
    val levWin = tlen >= qlen - budget && tlen <= qlen + budget
    val prefixA = term.startsWith(tok) && tlen <= (1.7 * qlen).toInt + 1
    val prefixB = Expand.pushdownPrefixes(tok).contains(term)
    levWin || prefixA || prefixB
  }

  test("TokenMatcher.weight ≡ matchTerm on 60k adversarial random pairs") {
    val rng = new scala.util.Random(20260817L)
    var checked = 0
    var accepted = 0
    (0 until 2000).foreach { _ =>
      val tok = randString(rng)
      val qlen = Expand.utf8Len(tok)
      val m = new Expand.TokenMatcher(tok)
      (0 until 30).foreach { _ =>
        val term = if (rng.nextInt(4) == 0) {
          // bias toward near-misses: mutate the token
          val i = rng.nextInt(math.max(1, tok.length))
          tok.substring(0, i) + alphabet(rng.nextInt(alphabet.length)) +
            tok.substring(math.min(tok.length, i + 1))
        } else randString(rng)
        val tlen = Expand.utf8Len(term)
        val want = Expand.matchTerm(tok, qlen, term)
        val got = m.weight(term, tlen)
        want match {
          case Some(w) =>
            assert(got == w, s"tok=$tok term=$term: $got != $w")
            accepted += 1
          case None =>
            assert(got == -1.0f, s"tok=$tok term=$term: $got != -1")
        }
        checked += 1
      }
    }
    assert(checked == 60000)
    assert(accepted > 500, s"only $accepted accepts — generator too cold")
  }

  test("pushdown prefilter is complete: every matchTerm accept satisfies " +
      "the scan predicate") {
    val rng = new scala.util.Random(42L)
    var accepts = 0
    (0 until 2000).foreach { _ =>
      val tok = randString(rng)
      val qlen = Expand.utf8Len(tok)
      if (Expand.maxDist(qlen) > 0) { // only fuzzy tokens reach the scan
        (0 until 30).foreach { _ =>
          val term = if (rng.nextInt(3) == 0) {
            val i = rng.nextInt(math.max(1, tok.length))
            tok.substring(0, i) + alphabet(rng.nextInt(alphabet.length)) +
              tok.substring(math.min(tok.length, i + 1))
          } else if (rng.nextInt(3) == 0) {
            // prefix-pair bias: extensions and truncations of the token
            if (rng.nextBoolean()) tok + randString(rng)
            else tok.substring(0, 1 + rng.nextInt(tok.length))
          } else randString(rng)
          val tlen = Expand.utf8Len(term)
          if (Expand.matchTerm(tok, qlen, term).isDefined) {
            accepts += 1
            assert(pushdownAccepts(tok, qlen, term, tlen),
              s"pushdown dropped accepted pair tok=$tok term=$term " +
                s"(qlen=$qlen tlen=$tlen)")
          }
        }
      }
    }
    assert(accepts > 500, s"only $accepts accepts — generator too cold")
  }

  test("multibyte length-skew: byte pre-prune passes but codepoint gap " +
      "exceeds the band — reused buffers must not leak stale cells") {
    // token 'ééabcdef': 10 UTF-8 bytes (budget 2) but only 8 code points.
    // A 12-char ASCII term passes the BYTE prune (|10−12| ≤ 2) while its
    // codepoint length 12 > m+budget+1 = 11 — pre-fix, the band never
    // reached column n and weight() read a stale prev(12) from whatever
    // term was matched before. Interleave long near-miss terms (which
    // write small values high in the row buffers) with skewed terms, in
    // every pairing, and require ≡ matchTerm throughout.
    val tok = "ééabcdef"
    val qlen = Expand.utf8Len(tok)
    assert(qlen == 10 && tok.codePointCount(0, tok.length) == 8)
    val planters = Seq( // n within band: fills buffer cells legitimately
      "ébabcdef", "ééabcdxy", "ééabcdefg", "xéabcdef", "ééabcde")
    val skewed = Seq( // n = 11..12 > m+budget: must be inf, never stale
      "aabbccddeeff", "ababcdefxxxx", "eeabcdefxxxx", "ababcdefghi",
      "zzzzzzzzzzzz")
    val m = new Expand.TokenMatcher(tok)
    for (p <- planters; s <- skewed; term <- Seq(p, s, p, s)) {
      val tlen = Expand.utf8Len(term)
      val want = Expand.matchTerm(tok, qlen, term).getOrElse(-1.0f)
      assert(m.weight(term, tlen) == want,
        s"tok=$tok term=$term: ${m.weight(term, tlen)} != $want")
    }
    // symmetric skew: ASCII token vs multibyte term (n < m − budget)
    val tok2 = "abcdefghijkl" // 12 bytes, 12 cps, budget 2
    val m2 = new Expand.TokenMatcher(tok2)
    for (term <- Seq("ééééé", "ééabcdefghij", "ååååå", "abcdefghijk")) {
      val tlen = Expand.utf8Len(term)
      val want = Expand.matchTerm(tok2, Expand.utf8Len(tok2), term)
        .getOrElse(-1.0f)
      assert(m2.weight(term, tlen) == want, s"tok2 vs $term")
    }
  }

  test("prefix-ratio Float boundary: tlen = 1.7·qlen pairs survive the " +
      "pushdown bound") {
    // qlen=10, tlen=17: weight = (10/17)·0.85 lands exactly at the 0.5f
    // acceptance edge in Float — the +1 slack in the pushdown bound must
    // keep whatever matchTerm accepts
    val tok = "abcdefghij" // 10 bytes
    val term = tok + "klmnopq" // 17 bytes
    val qlen = Expand.utf8Len(tok)
    val tlen = Expand.utf8Len(term)
    val m = new Expand.TokenMatcher(tok)
    assert(m.weight(term, tlen) ==
      Expand.matchTerm(tok, qlen, term).getOrElse(-1.0f))
    if (Expand.matchTerm(tok, qlen, term).isDefined)
      assert(pushdownAccepts(tok, qlen, term, tlen))
  }
}
