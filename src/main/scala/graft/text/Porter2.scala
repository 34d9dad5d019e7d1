package graft.text

/** The Snowball "english" (Porter2) stemming algorithm, ported from the
  * published algorithm description (snowballstem.org, "The English (Porter2)
  * stemming algorithm") — the same program `rust-stemmers 1.2.0`'s
  * `Algorithm::English` compiles, which the reference lexer applies per token
  * (`/root/reference/src/lexer.rs:50,69`).
  *
  * Fidelity notes (SURVEY.md §2.6):
  *   - The reference stems the ORIGINAL-CASED token and uppercases afterwards.
  *     Snowball's generated code matches literal lowercase suffixes, so
  *     uppercase letters never match suffixes and are never vowels. This port
  *     therefore performs strictly literal lowercase matching and must NOT be
  *     handed a pre-lowercased string by the lexer.
  *   - The `Y` marker the prelude writes is uppercased away by the caller
  *     (`stem(tok).toUpperCase`), so the postlude's Y→y restoration only
  *     affects case and is still performed here for standalone correctness.
  */
object Porter2 {

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private def isDouble(a: Char, b: Char): Boolean =
    a == b && (a == 'b' || a == 'd' || a == 'f' || a == 'g' || a == 'm' ||
      a == 'n' || a == 'p' || a == 'r' || a == 't')

  private def isValidLiEnding(c: Char): Boolean =
    c == 'c' || c == 'd' || c == 'e' || c == 'g' || c == 'h' || c == 'k' ||
      c == 'm' || c == 'n' || c == 'r' || c == 't'

  /** Special-cased whole words (exception1 in the Snowball source). */
  private val exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariants
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Whole words halted after step 1a (exception2). */
  private val exception2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  /** exception1 results pre-uppercased for the fused stem+upper path. */
  private val exception1Upper: Map[String, String] =
    exception1.map { case (k, v) =>
      k -> v.toUpperCase(java.util.Locale.ROOT)
    }

  /** exception1Upper flattened for zero-allocation region lookup. */
  private val exc1Keys: Array[String] = exception1Upper.keys.toArray
  private val exc1Vals: Array[String] = exc1Keys.map(exception1Upper)

  private val exception2Arr: Array[String] = exception2.toArray

  /** Allocation-free exception2 membership test on the work buffer. */
  private def isException2(sb: java.lang.StringBuilder): Boolean = {
    var i = 0
    while (i < exception2Arr.length) {
      val c = exception2Arr(i)
      if (c.length == sb.length) {
        var k = 0
        var ok = true
        while (ok && k < c.length) {
          ok = sb.charAt(k) == c.charAt(k)
          k += 1
        }
        if (ok) return true
      }
      i += 1
    }
    false
  }

  // the stemmer's work buffer — one per thread, reused across tokens
  private val workBuf: ThreadLocal[java.lang.StringBuilder] =
    ThreadLocal.withInitial(() => new java.lang.StringBuilder(32))

  /** A short syllable *ending at* index `end` (exclusive). */
  private def shortSyllableEndingAt(w: CharSequence, end: Int): Boolean = {
    if (end == 2)
      isVowel(w.charAt(0)) && !isVowel(w.charAt(1))
    else if (end >= 3) {
      val c2 = w.charAt(end - 1)
      !isVowel(w.charAt(end - 3)) && isVowel(w.charAt(end - 2)) &&
      !isVowel(c2) && c2 != 'w' && c2 != 'x' && c2 != 'Y'
    } else false
  }

  def stem(word: String): String = {
    exception1.get(word) match {
      case Some(r) => return r
      case None =>
    }
    if (word.length <= 2) return word
    val sb = workBuf.get()
    sb.setLength(0)
    sb.append(word)
    stemBuf(sb)
    sb.toString
  }

  /** Fused stem + `toUpperCase(Locale.ROOT)` — the per-token form the lexer
    * needs (`lexer.rs:69-72`) with ONE String allocation instead of three
    * (buffer copy + stem result + uppercase result). The in-place ASCII
    * uppercase is exact for code points < 0x80 (ROOT uppercasing has no
    * special expansions there); buffers with any non-ASCII char take the
    * library fallback.
    */
  def stemUpper(word: String): String =
    stemUpperBuf(word, 0, word.length).toString

  /** Buffer-level fused stem + uppercase over `content[start, end)` — the
    * ZERO-allocation form of [[stemUpper]] for the index build's hot loop:
    * exception words are found by region compare, the stem runs in place,
    * and the THREAD-LOCAL work buffer is returned (contents valid only
    * until the next Porter2 call on this thread — callers intern or copy;
    * see [[graft.index.TermCounter]]). Only the rare non-ASCII uppercase
    * fallback allocates.
    */
  def stemUpperBuf(
      content: CharSequence, start: Int, end: Int): java.lang.StringBuilder = {
    val len = end - start
    val sb = workBuf.get()
    sb.setLength(0)
    var e = 0
    while (e < exc1Keys.length) {
      val k = exc1Keys(e)
      if (k.length == len) {
        var i = 0
        var ok = true
        while (ok && i < len) {
          ok = k.charAt(i) == content.charAt(start + i)
          i += 1
        }
        if (ok) { sb.append(exc1Vals(e)); return sb }
      }
      e += 1
    }
    sb.append(content, start, end)
    if (len > 2) stemBuf(sb)
    upperInPlace(sb)
    sb
  }

  /** ASCII uppercase in place (exact under Locale.ROOT below 0x80); any
    * non-ASCII char takes the library fallback through one String.
    */
  private def upperInPlace(sb: java.lang.StringBuilder): Unit = {
    var i = 0
    var ascii = true
    while (ascii && i < sb.length) {
      ascii = sb.charAt(i) < 0x80
      i += 1
    }
    if (ascii) {
      var k = 0
      while (k < sb.length) {
        val c = sb.charAt(k)
        if (c >= 'a' && c <= 'z') sb.setCharAt(k, (c - 32).toChar)
        k += 1
      }
    } else {
      val up = sb.toString.toUpperCase(java.util.Locale.ROOT)
      sb.setLength(0)
      sb.append(up)
    }
  }

  /** The algorithm proper, in-place on the caller's buffer. */
  private def stemBuf(sb: java.lang.StringBuilder): Unit = {
    // ---- prelude -------------------------------------------------------
    if (sb.length > 0 && sb.charAt(0) == '\'') sb.deleteCharAt(0)
    if (sb.length == 0) return
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1)))
        sb.setCharAt(i, 'Y')
      i += 1
    }

    // ---- mark_regions --------------------------------------------------
    // p1 = after the first non-vowel following a vowel (or after a special
    // prefix); p2 = same rule applied from p1 (`gopast v; gopast non-v`).
    def markFrom(from: Int): Int = {
      var j = from
      while (j < sb.length && !isVowel(sb.charAt(j))) j += 1
      if (j == sb.length) return sb.length
      j += 1 // past the vowel
      while (j < sb.length && isVowel(sb.charAt(j))) j += 1
      if (j == sb.length) return sb.length
      j + 1 // past the non-vowel
    }
    val prefix =
      if (startsWith(sb, "gener")) 5
      else if (startsWith(sb, "commun")) 6
      else if (startsWith(sb, "arsen")) 5
      else -1
    val p1 = if (prefix >= 0) prefix else markFrom(0)
    val p2 = markFrom(p1)

    @inline def inR1(suffixStart: Int): Boolean = suffixStart >= p1
    @inline def inR2(suffixStart: Int): Boolean = suffixStart >= p2
    @inline def endsWith(s: String): Boolean = {
      val n = sb.length - s.length
      n >= 0 && {
        var k = 0
        var ok = true
        while (ok && k < s.length) { ok = sb.charAt(n + k) == s.charAt(k); k += 1 }
        ok
      }
    }
    @inline def hasVowelIn(from: Int, until: Int): Boolean = {
      var k = from
      while (k < until) { if (isVowel(sb.charAt(k))) return true; k += 1 }
      false
    }
    def replaceSuffix(len: Int, repl: String): Unit = {
      sb.delete(sb.length - len, sb.length)
      sb.append(repl)
    }

    // ---- Step 0: longest of ' 's 's' ----------------------------------
    if (endsWith("'s'")) replaceSuffix(3, "")
    else if (endsWith("'s")) replaceSuffix(2, "")
    else if (endsWith("'")) replaceSuffix(1, "")

    // ---- Step 1a --------------------------------------------------------
    if (endsWith("sses")) replaceSuffix(4, "ss")
    else if (endsWith("ied") || endsWith("ies")) {
      // replace by i if preceded by more than one letter, otherwise by ie
      if (sb.length - 3 > 1) replaceSuffix(3, "i") else replaceSuffix(3, "ie")
    } else if (endsWith("us") || endsWith("ss")) {
      // do nothing
    } else if (endsWith("s")) {
      // delete if the preceding word part contains a vowel NOT immediately
      // before the s
      if (hasVowelIn(0, sb.length - 2)) replaceSuffix(1, "")
    }

    if (isException2(sb)) return

    // ---- Step 1b --------------------------------------------------------
    if (endsWith("eedly")) {
      if (inR1(sb.length - 5)) replaceSuffix(5, "ee")
    } else if (endsWith("eed")) {
      if (inR1(sb.length - 3)) replaceSuffix(3, "ee")
    } else {
      val sufLen =
        if (endsWith("ingly")) 5
        else if (endsWith("edly")) 4
        else if (endsWith("ing")) 3
        else if (endsWith("ed")) 2
        else 0
      if (sufLen > 0 && hasVowelIn(0, sb.length - sufLen)) {
        replaceSuffix(sufLen, "")
        if (endsWith("at") || endsWith("bl") || endsWith("iz")) sb.append('e')
        else if (sb.length >= 2 &&
            isDouble(sb.charAt(sb.length - 2), sb.charAt(sb.length - 1)))
          sb.deleteCharAt(sb.length - 1)
        else if (p1 >= sb.length && shortSyllableEndingAt(sb, sb.length))
          sb.append('e') // word is short
      }
    }

    // ---- Step 1c --------------------------------------------------------
    if (sb.length > 2) {
      val last = sb.charAt(sb.length - 1)
      if ((last == 'y' || last == 'Y') && !isVowel(sb.charAt(sb.length - 2)))
        sb.setCharAt(sb.length - 1, 'i')
    }

    // ---- Step 2 (longest suffix, then condition; in R1) -----------------
    locally {
      // ordered longest-first so the first textual match is the longest
      val n = sb.length
      def at(len: Int) = n - len
      if (endsWith("ational")) { if (inR1(at(7))) replaceSuffix(7, "ate") }
      else if (endsWith("ization")) { if (inR1(at(7))) replaceSuffix(7, "ize") }
      else if (endsWith("fulness")) { if (inR1(at(7))) replaceSuffix(7, "ful") }
      else if (endsWith("ousness")) { if (inR1(at(7))) replaceSuffix(7, "ous") }
      else if (endsWith("iveness")) { if (inR1(at(7))) replaceSuffix(7, "ive") }
      else if (endsWith("tional")) { if (inR1(at(6))) replaceSuffix(6, "tion") }
      else if (endsWith("biliti")) { if (inR1(at(6))) replaceSuffix(6, "ble") }
      else if (endsWith("lessli")) { if (inR1(at(6))) replaceSuffix(6, "less") }
      else if (endsWith("entli")) { if (inR1(at(5))) replaceSuffix(5, "ent") }
      else if (endsWith("ation")) { if (inR1(at(5))) replaceSuffix(5, "ate") }
      else if (endsWith("alism")) { if (inR1(at(5))) replaceSuffix(5, "al") }
      else if (endsWith("aliti")) { if (inR1(at(5))) replaceSuffix(5, "al") }
      else if (endsWith("ousli")) { if (inR1(at(5))) replaceSuffix(5, "ous") }
      else if (endsWith("iviti")) { if (inR1(at(5))) replaceSuffix(5, "ive") }
      else if (endsWith("fulli")) { if (inR1(at(5))) replaceSuffix(5, "ful") }
      else if (endsWith("enci")) { if (inR1(at(4))) replaceSuffix(4, "ence") }
      else if (endsWith("anci")) { if (inR1(at(4))) replaceSuffix(4, "ance") }
      else if (endsWith("abli")) { if (inR1(at(4))) replaceSuffix(4, "able") }
      else if (endsWith("izer")) { if (inR1(at(4))) replaceSuffix(4, "ize") }
      else if (endsWith("ator")) { if (inR1(at(4))) replaceSuffix(4, "ate") }
      else if (endsWith("alli")) { if (inR1(at(4))) replaceSuffix(4, "al") }
      else if (endsWith("bli")) { if (inR1(at(3))) replaceSuffix(3, "ble") }
      else if (endsWith("ogi")) {
        if (inR1(at(3)) && n >= 4 && sb.charAt(n - 4) == 'l')
          replaceSuffix(3, "og")
      } else if (endsWith("li")) {
        if (inR1(at(2)) && n >= 3 && isValidLiEnding(sb.charAt(n - 3)))
          replaceSuffix(2, "")
      }
    }

    // ---- Step 3 (in R1) --------------------------------------------------
    locally {
      val n = sb.length
      def at(len: Int) = n - len
      if (endsWith("ational")) { if (inR1(at(7))) replaceSuffix(7, "ate") }
      else if (endsWith("tional")) { if (inR1(at(6))) replaceSuffix(6, "tion") }
      else if (endsWith("alize")) { if (inR1(at(5))) replaceSuffix(5, "al") }
      else if (endsWith("icate")) { if (inR1(at(5))) replaceSuffix(5, "ic") }
      else if (endsWith("iciti")) { if (inR1(at(5))) replaceSuffix(5, "ic") }
      else if (endsWith("ative")) { if (inR2(at(5))) replaceSuffix(5, "") }
      else if (endsWith("ical")) { if (inR1(at(4))) replaceSuffix(4, "ic") }
      else if (endsWith("ness")) { if (inR1(at(4))) replaceSuffix(4, "") }
      else if (endsWith("ful")) { if (inR1(at(3))) replaceSuffix(3, "") }
    }

    // ---- Step 4 (in R2) --------------------------------------------------
    locally {
      val n = sb.length
      def at(len: Int) = n - len
      if (endsWith("ement")) { if (inR2(at(5))) replaceSuffix(5, "") }
      else if (endsWith("ance")) { if (inR2(at(4))) replaceSuffix(4, "") }
      else if (endsWith("ence")) { if (inR2(at(4))) replaceSuffix(4, "") }
      else if (endsWith("able")) { if (inR2(at(4))) replaceSuffix(4, "") }
      else if (endsWith("ible")) { if (inR2(at(4))) replaceSuffix(4, "") }
      else if (endsWith("ment")) { if (inR2(at(4))) replaceSuffix(4, "") }
      else if (endsWith("ent")) { if (inR2(at(3))) replaceSuffix(3, "") }
      else if (endsWith("ant")) { if (inR2(at(3))) replaceSuffix(3, "") }
      else if (endsWith("ism")) { if (inR2(at(3))) replaceSuffix(3, "") }
      else if (endsWith("ate")) { if (inR2(at(3))) replaceSuffix(3, "") }
      else if (endsWith("iti")) { if (inR2(at(3))) replaceSuffix(3, "") }
      else if (endsWith("ous")) { if (inR2(at(3))) replaceSuffix(3, "") }
      else if (endsWith("ive")) { if (inR2(at(3))) replaceSuffix(3, "") }
      else if (endsWith("ize")) { if (inR2(at(3))) replaceSuffix(3, "") }
      else if (endsWith("ion")) {
        if (inR2(at(3)) && n >= 4 &&
            (sb.charAt(n - 4) == 's' || sb.charAt(n - 4) == 't'))
          replaceSuffix(3, "")
      } else if (endsWith("al")) { if (inR2(at(2))) replaceSuffix(2, "") }
      else if (endsWith("er")) { if (inR2(at(2))) replaceSuffix(2, "") }
      else if (endsWith("ic")) { if (inR2(at(2))) replaceSuffix(2, "") }
    }

    // ---- Step 5 -----------------------------------------------------------
    locally {
      val n = sb.length
      if (n > 0 && sb.charAt(n - 1) == 'e') {
        if (inR2(n - 1) ||
            (inR1(n - 1) && !shortSyllableEndingAt(sb, n - 1)))
          sb.deleteCharAt(n - 1)
      } else if (n > 1 && sb.charAt(n - 1) == 'l') {
        if (inR2(n - 1) && sb.charAt(n - 2) == 'l') sb.deleteCharAt(n - 1)
      }
    }

    // ---- postlude: Y → y ---------------------------------------------------
    var k = 0
    while (k < sb.length) {
      if (sb.charAt(k) == 'Y') sb.setCharAt(k, 'y')
      k += 1
    }
  }

  private def startsWith(sb: java.lang.StringBuilder, s: String): Boolean = {
    if (sb.length < s.length) return false
    var k = 0
    while (k < s.length) {
      if (sb.charAt(k) != s.charAt(k)) return false
      k += 1
    }
    true
  }
}
