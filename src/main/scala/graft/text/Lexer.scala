package graft.text

import scala.collection.mutable.ArrayBuffer

/** The reference's 29 stop words (`/root/reference/src/lexer.rs:3-10`),
  * matched against the STEMMED + UPPERCASED token (`lexer.rs:70-72`).
  */
object StopWords {
  val set: Set[String] = Set(
    "A", "AN", "THE",
    "IS", "AS", "ARE", "WAS", "WERE", "BE", "BEEN", "BEING",
    "AND", "OR", "BUT", "NOR", "SO", "YET",
    "IN", "ON", "AT", "TO", "FOR", "OF", "WITH", "BY", "FROM",
    "IT", "ITS", "THIS", "THAT",
    "NOT", "NO")
}

/** Tokenizer replicating the reference `Lexer` exactly
  * (`/root/reference/src/lexer.rs:13-87`):
  *
  *   - whitespace (Rust `is_whitespace`) separates tokens (L1);
  *   - a run starting `is_numeric` extends over `is_numeric`; single-code-
  *     point runs are DROPPED, longer runs kept verbatim (L2);
  *   - a run starting `is_alphabetic` extends over `is_alphanumeric`, is
  *     Porter2-stemmed on the ORIGINAL-CASED text, then uppercased; stop
  *     words (post-stem) are dropped (L3, L4);
  *   - any other code point is a single-character token — punctuation IS
  *     indexed (L5).
  *
  * Operates on code points (Rust `char` = scalar value), so supplementary-
  * plane input tokenizes identically.
  */
object Lexer {

  /** Tokenize a document or query string. */
  def tokenize(content: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]()
    foreachToken(content)(out += _)
    out
  }

  /** Streaming form of [[tokenize]]: allocates one String per emitted
    * token. Stop words (L4) are dropped here, matching the reference.
    */
  def foreachToken(content: String)(emit: String => Unit): Unit =
    foreachTokenRaw(content) { (cs, s, e, stemmed) =>
      val str = cs match {
        case str0: String => str0.substring(s, e)
        case b => b.subSequence(s, e).toString
      }
      if (!stemmed || !StopWords.set.contains(str)) emit(str)
    }

  /** Zero-allocation streaming tokenize — the index build's hot path.
    * `emit(cs, start, end, stemmed)` receives each token as a REGION of
    * either `content` (numeric runs, symbols) or the shared Porter2 work
    * buffer (alpha runs, already stemmed + uppercased); the region is
    * valid ONLY during the callback — intern or copy (see
    * [[graft.index.TermCounter]]). Tokens with `stemmed = true` must still
    * be dropped by the caller when they match a stop word (L4 applies
    * post-stem only); [[foreachToken]] does exactly that.
    */
  def foreachTokenRaw(content: String)(
      emit: (CharSequence, Int, Int, Boolean) => Unit): Unit = {
    val n = content.length
    var i = 0 // UTF-16 index
    while (i < n) {
      val cp = content.codePointAt(i)
      if (RustChar.isWhitespace(cp)) {
        i += Character.charCount(cp)
      } else if (RustChar.isNumeric(cp)) {
        val start = i
        var count = 0
        var j = i
        while (j < n && RustChar.isNumeric(content.codePointAt(j))) {
          val c = content.codePointAt(j)
          j += Character.charCount(c)
          count += 1
        }
        i = j
        // ignore single digit number (lexer.rs:59-61): count is in code
        // points, matching Rust's slice length over [char]
        if (count > 1) emit(content, start, j, false)
      } else if (RustChar.isAlphabetic(cp)) {
        val start = i
        var j = i
        while (j < n && RustChar.isAlphanumeric(content.codePointAt(j))) {
          j += Character.charCount(content.codePointAt(j))
        }
        i = j
        val sb = Porter2.stemUpperBuf(content, start, j)
        emit(sb, 0, sb.length, true)
      } else {
        val w = Character.charCount(cp)
        emit(content, i, i + w, false)
        i += w
      }
    }
  }
}
