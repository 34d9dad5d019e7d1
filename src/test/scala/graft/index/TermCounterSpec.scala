package graft.index

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Lexer, StopWords}

/** TermCounter ≡ the naive HashMap-per-doc counting it replaced, including
  * epoch isolation, stop-word drops, interning identity, and growth
  * remapping mid-document.
  */
class TermCounterSpec extends AnyFunSuite {

  private def countsOf(tc: TermCounter): Map[String, Int] =
    (0 until tc.nTouched).map { i =>
      val s = tc.touched(i)
      tc.termAt(s) -> tc.countAt(s)
    }.toMap

  private def naiveCounts(content: String): Map[String, Int] = {
    val m = mutable.Map.empty[String, Int].withDefaultValue(0)
    Lexer.foreachToken(content)(t => m(t) += 1)
    m.toMap
  }

  private def feed(tc: TermCounter, content: String): Unit = {
    tc.beginDoc()
    Lexer.foreachTokenRaw(content)((cs, s, e, st) => tc.add(cs, s, e, st))
  }

  test("single doc counts ≡ foreachToken counting") {
    val doc = "The running runner runs; 42 4 2 caches cache cached " +
      "texture texture shader ... the THE a 世界 世界 x7y 99"
    val tc = new TermCounter()
    feed(tc, doc)
    assert(countsOf(tc) == naiveCounts(doc))
  }

  test("epoch isolation: successive docs do not bleed counts") {
    val tc = new TermCounter()
    val d1 = "alpha beta beta gamma"
    val d2 = "beta delta delta delta"
    feed(tc, d1)
    assert(countsOf(tc) == naiveCounts(d1))
    feed(tc, d2)
    assert(countsOf(tc) == naiveCounts(d2))
    feed(tc, "")
    assert(tc.nTouched == 0)
  }

  test("stop words are interned but never counted") {
    val tc = new TermCounter()
    // "the" stems to THE (stop); "is" -> IS (stop); punctuation kept
    feed(tc, "the is the , data")
    val c = countsOf(tc)
    assert(!c.keys.exists(StopWords.set.contains))
    assert(c(",") == 1 && c("DATA") == 1)
  }

  test("growth mid-document remaps touched slots (tiny initial capacity)") {
    val tc = new TermCounter(initialCapacity = 16)
    // >8 distinct terms forces several grow() calls inside one doc
    val terms = (0 until 500).map(i => s"term$i xx$i")
    val doc = (terms ++ terms).mkString(" ")
    feed(tc, doc)
    assert(countsOf(tc) == naiveCounts(doc))
  }

  test("randomized docs ≡ naive across a shared table") {
    val rnd = new scala.util.Random(42)
    val vocabSrc = Vector("data", "the", "running", "caches", "texture",
      "shader", "opengl", "42", "7", "...", "世界", "ünïcode", "x1y2",
      "national", "only", "dying", "eß") // ß exercises the fallback
    val tc = new TermCounter(initialCapacity = 16)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(40)
      val doc = Seq.fill(n)(vocabSrc(rnd.nextInt(vocabSrc.size)))
        .mkString(" ")
      feed(tc, doc)
      assert(countsOf(tc) == naiveCounts(doc))
    }
  }

  test("interning: repeated terms across docs return the same String") {
    val tc = new TermCounter()
    feed(tc, "texture shader")
    val t1 = (0 until tc.nTouched).map(i => tc.termAt(tc.touched(i)))
      .find(_ == "TEXTUR").get
    feed(tc, "texture again")
    val t2 = (0 until tc.nTouched).map(i => tc.termAt(tc.touched(i)))
      .find(_ == "TEXTUR").get
    assert(t1 eq t2)
  }
}
