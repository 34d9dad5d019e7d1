package graft.text

/** Character predicates matching Rust's `char` classification methods, which
  * the reference lexer uses (`/root/reference/src/lexer.rs:24,58,60,65,66`).
  *
  * The JVM's defaults differ from Rust's:
  *   - Rust `char::is_whitespace`  = Unicode `White_Space` property; Java's
  *     `Character.isWhitespace` excludes U+00A0/U+2007/U+202F.
  *   - Rust `char::is_numeric`     = general categories Nd ∪ Nl ∪ No; Java's
  *     `Character.isDigit` is Nd only.
  *   - Rust `char::is_alphabetic`  = Unicode `Alphabetic` property, which
  *     `Character.isAlphabetic(int)` also implements (L* ∪ Nl ∪
  *     Other_Alphabetic).
  *
  * All predicates take a full code point (Rust `char` is a scalar value, not
  * a UTF-16 unit).
  */
object RustChar {
  /** Unicode `White_Space` property (Rust `char::is_whitespace`). */
  def isWhitespace(cp: Int): Boolean = cp match {
    case 0x20 => true
    case _ if cp >= 0x09 && cp <= 0x0d => true
    case 0x85 | 0xa0 | 0x1680 | 0x2028 | 0x2029 | 0x202f | 0x205f | 0x3000 =>
      true
    case _ if cp >= 0x2000 && cp <= 0x200a => true
    case _ => false
  }

  /** General categories Nd ∪ Nl ∪ No (Rust `char::is_numeric`). */
  def isNumeric(cp: Int): Boolean = {
    if (cp < 128) cp >= '0' && cp <= '9'
    else {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
    }
  }

  /** Unicode `Alphabetic` property (Rust `char::is_alphabetic`). */
  def isAlphabetic(cp: Int): Boolean = {
    if (cp < 128) (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
    else Character.isAlphabetic(cp)
  }

  /** Rust `char::is_alphanumeric` = is_alphabetic || is_numeric. */
  def isAlphanumeric(cp: Int): Boolean = isAlphabetic(cp) || isNumeric(cp)
}
