package graft.text

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Byte-identity golden tests for S5/S6/S8 extraction (SURVEY.md §2.6.10,
  * FIXTURES.md §4).
  */
class ExtractSpec extends AnyFunSuite {

  private def xml(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def ex(s: String): Option[String] = Extract.extractXml(xml(s))

  test("each Characters event content + one space") {
    assert(ex("<r>hello <b>world</b></r>") == Some("hello  world "))
  }

  test("whitespace-only text nodes dropped (xml-rs Whitespace events)") {
    assert(ex("<r>  \n\t </r>") == Some(""))
    assert(ex("<r><a>x</a>   <b>y</b></r>") == Some("x y "))
  }

  test("CDATA ignored and breaks a text run") {
    assert(ex("<r>a<![CDATA[ZZ]]>b</r>") == Some("a b "))
    assert(ex("<r><![CDATA[only cdata]]></r>") == Some(""))
  }

  test("attributes and element names contribute nothing") {
    assert(ex("""<r k="KEYVALUE" x="1">t</r>""") == Some("t "))
  }

  test("builtin entities are resolved inside one text run") {
    assert(ex("<r>a &amp; b</r>") == Some("a & b "))
    assert(ex("<r>&lt;tag&gt;</r>") == Some("<tag> "))
  }

  test("text with internal whitespace kept verbatim") {
    assert(ex("<r>  foo  bar  </r>") == Some("  foo  bar   "))
  }

  test("malformed XML → None (doc skipped entirely, main.rs:196-202)") {
    assert(ex("<r><unclosed></r>") == None)
    assert(ex("not xml at all") == None)
    assert(ex("<r>text</r><trailing/>") == None)
  }

  test("xml declaration + nesting") {
    assert(ex("""<?xml version="1.0" encoding="UTF-8"?>
                |<html><head><title>T1</title></head>
                |<body><p>P1</p><div>   </div></body></html>"""
      .stripMargin) == Some("T1 P1 "))
  }

  test("S8 row rule: html non-null → S5; else text verbatim; both null → " +
      "skip") {
    assert(Extract.extractText(xml("<r>x</r>"), "ignored") == Some("x "))
    assert(Extract.extractText(null, "raw text\n") == Some("raw text\n"))
    assert(Extract.extractText(null, null) == None)
  }

  test("synthesized corpus pages extract to their constructed expectation") {
    graft.corpus.Synth.pages(60).foreach { row =>
      val got = Extract.extractText(row.html, row.text)
      assert(got == Some(graft.corpus.Synth.expectedText(row)),
        s"url=${row.url}")
    }
  }
}
