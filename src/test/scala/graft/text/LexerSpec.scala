package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Token-level golden tests covering L1–L5 (SURVEY.md §2.2) and the pinned
  * Rust↔JVM Unicode divergences (§2.6.2).
  */
class LexerSpec extends AnyFunSuite {

  private def toks(s: String): List[String] = Lexer.tokenize(s).toList

  test("basic sentence: stem + uppercase + stop words + punctuation") {
    assert(toks("The quick brown foxes are running!") ==
      List("QUICK", "BROWN", "FOX", "RUN", "!"))
  }

  test("single digits dropped, multi-digit kept verbatim") {
    assert(toks("a 5 42 2024 b7c 007") ==
      List("42", "2024", "B7C", "007"))
  }

  test("punctuation runs become single-char tokens") {
    assert(toks("x... (y)") == List("X", ".", ".", ".", "(", "Y", ")"))
  }

  test("hyphenated phrase: '-' indexed, stop words dropped post-stem") {
    assert(toks("state-of-the-art") ==
      List("STATE", "-", "-", "-", "ART"))
  }

  test("stop words matched against stemmed+uppercased token") {
    // "This"→stem "This"→"THIS" dropped; "These"→stem "these"→"THESE" kept
    assert(toks("This These that Those") == List("THESE", "THOSE"))
  }

  test("alphanumeric run starting alphabetic") {
    assert(toks("abc123 123abc") == List("ABC123", "123", "ABC"))
  }

  test("empty and whitespace-only input") {
    assert(toks("") == Nil)
    assert(toks(" \t\n\r ") == Nil)
  }

  test("U+00A0 NBSP is whitespace (Rust White_Space; Java isWhitespace " +
      "disagrees)") {
    assert(toks("x y") == List("X", "Y"))
    assert(toks("x y z") == List("X", "Y", "Z"))
  }

  test("U+2167 Ⅷ (Nl) is numeric for Rust: single → dropped, run kept") {
    assert(toks("Ⅷ") == Nil)
    assert(toks("ⅧⅧ") == List("ⅧⅧ"))
  }

  test("U+00B2 ² (No) is numeric for Rust (Java isDigit disagrees)") {
    assert(toks("²") == Nil) // single numeric code point → dropped
    assert(toks("3²") == List("3²")) // 2-cp numeric run kept verbatim
    assert(toks("x²") == List("X²")) // alpha start, extends alnum
  }

  test("non-ASCII letters tokenize and uppercase") {
    assert(toks("café данные 数据") == List("CAFÉ", "ДАННЫЕ", "数据"))
  }

  test("ligature uppercases via full case mapping like Rust to_uppercase") {
    assert(toks("ﬁle") == List("FILE"))
  }

  test("supplementary-plane symbol becomes one single-char token") {
    val pile = new String(Character.toChars(0x1f4a9))
    assert(toks(s"a${pile}b") == List(pile, "B")) // "a"→"A" is a stop word
  }

  test("query string tokenizes identically to documents (L6)") {
    assert(toks("texture array shader") ==
      List("TEXTUR", "ARRAY", "SHADER"))
    assert(toks("opengl") == List("OPENGL"))
    assert(toks("missingkeywordthatdoesnotexist") ==
      List("MISSINGKEYWORDTHATDOESNOTEXIST"))
  }
}
