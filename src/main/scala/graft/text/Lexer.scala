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

  /** Streaming form of [[tokenize]] — the index build's per-doc hot path
    * counts tokens straight into a hash map, so the intermediate buffer
    * (and its growth copies) is pure allocation overhead there.
    */
  def foreachToken(content: String)(emit: String => Unit): Unit = {
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
        if (count > 1) emit(content.substring(start, j))
      } else if (RustChar.isAlphabetic(cp)) {
        val start = i
        var j = i
        while (j < n && RustChar.isAlphanumeric(content.codePointAt(j))) {
          j += Character.charCount(content.codePointAt(j))
        }
        i = j
        val stemmed = Porter2.stemUpper(content.substring(start, j))
        if (!StopWords.set.contains(stemmed)) emit(stemmed)
      } else {
        val w = Character.charCount(cp)
        emit(content.substring(i, i + w))
        i += w
      }
    }
  }
}
