package graft.oracle

import org.scalatest.funsuite.AnyFunSuite
import graft.query.Expand
import graft.score.Scoring

class RefModelSpec extends AnyFunSuite {

  private def model(docs: (String, String)*): RefModel = {
    val m = new RefModel()
    docs.zipWithIndex.foreach { case ((url, text), i) =>
      m.addDocument(url, text, i.toLong)
    }
    m
  }

  test("gtf is DOCUMENT frequency (model.rs:249-252)") {
    val m = model(
      "u1" -> "cat cat cat dog",
      "u2" -> "cat bird",
      "u3" -> "bird bird")
    assert(m.gtf("CAT") == 2L) // 2 docs, not 4 occurrences
    assert(m.gtf("DOG") == 1L)
    assert(m.gtf("BIRD") == 2L)
    assert(m.totalTokens == 4L + 2L + 2L)
  }

  test("stop-word-only docs are not indexed (A3, model.rs:243-247)") {
    val m = model("u1" -> "the is and of", "u2" -> "cat")
    assert(m.docs.size == 1)
    assert(m.docs.contains("u2"))
  }

  test("upsert removes the old version first (M2, model.rs:229-231)") {
    val m = model("u1" -> "cat dog")
    m.addDocument("u1", "bird", 5L)
    assert(m.gtf.getOrElse("CAT", 0L) == 0L)
    assert(m.gtf("BIRD") == 1L)
    assert(m.totalTokens == 1L)
  }

  test("remove decrements df and totals (M4, model.rs:174-186)") {
    val m = model("u1" -> "cat dog", "u2" -> "cat")
    m.removeDocument("u1")
    assert(m.gtf("CAT") == 1L)
    assert(m.gtf.getOrElse("DOG", 0L) == 0L)
    assert(m.totalTokens == 1L)
  }

  test("requiresReindexing: absent or older ts (M1, model.rs:262-267)") {
    val m = model("u1" -> "cat")
    assert(m.requiresReindexing("u2", 0L))
    assert(!m.requiresReindexing("u1", 0L)) // same ts → NOT stale
    assert(m.requiresReindexing("u1", 99L))
  }

  test("exact search ranks tf-heavy doc first (bm25)") {
    // N=4, df=2 → idf = ln((4-2+1.5)/2.5) > 0 (df=2 of N=3 would be 0!)
    val m = model(
      "u1" -> "cat cat cat filler filler filler",
      "u2" -> "cat filler filler filler filler filler",
      "u3" -> "filler filler",
      "u4" -> "filler filler")
    val r = m.searchQuery("cat", RefModel.Bm25)
    assert(r.map(_._1) == Vector("u1", "u2", "u3", "u4"))
    assert(r(0)._2 > r(1)._2 && r(1)._2 > 0f && r(2)._2 == 0f)
  }

  test("nonstandard bm25 idf can go negative when df > (N+1)/2") {
    // N=3, df=3: ln((3-3+0.5+1)/3.5) = ln(1.5/3.5) < 0
    assert(Scoring.bm25Idf(3, 3) < 0f)
    val m = model("u1" -> "cat x", "u2" -> "cat y", "u3" -> "cat z")
    val r = m.searchQuery("cat", RefModel.Bm25)
    assert(r.forall(_._2 < 0f)) // unclamped, replicated
  }

  test("tfidf uses log10 and df from gtf") {
    val m = model("u1" -> "cat cat dog dog", "u2" -> "dog mouse")
    val r = m.searchQuery("cat", RefModel.Tfidf)
    val expected = Scoring.tfidfTf(2f, 4f) *
      Scoring.tfidfIdf(2, 1) * 1.0f
    assert(r.head._1 == "u1")
    assert(math.abs(r.head._2 - expected) < 1e-7f)
  }

  test("fuzzy expansion: prefix and levenshtein weights (model.rs:85-135)") {
    // qlen≥4 & tlen≥4, prefix, ratio*0.85 ≥ 0.5
    assert(Expand.matchTerm("TEXTUR", 6, "TEXTUR") == Some(1.0f))
    val pw = Expand.matchTerm("TEXTUR", 6, "TEXTURING")
    assert(pw.isDefined && math.abs(pw.get - (6f / 9f) * 0.85f) < 1e-6f)
    // 1-edit typo within budget (len 6 → budget 1)
    val lw = Expand.matchTerm("SHADER", 6, "SHADES")
    assert(lw.isDefined && math.abs(lw.get - (1f - 1f / 6f) * 0.75f) < 1e-6f)
    // short tokens: exact only
    assert(Expand.matchTerm("CAT", 3, "CAR") == None)
    assert(Expand.matchTerm("CAT", 3, "CAT") == Some(1.0f))
    // budget 2 only at byte length ≥ 8
    assert(Expand.matchTerm("POINTERS", 8, "POINTEDS") != None)
    assert(Expand.matchTerm("POINTER", 7, "POINTED") != None) // dist 1
    assert(Expand.matchTerm("POINTER", 7, "POANTED") == None) // dist 2 > 1
  }

  test("duplicated query words keep max weight once (Q3)") {
    val m = model("u1" -> "cat cat", "u2" -> "dog")
    val once = m.searchQuery("cat", RefModel.Bm25)
    val twice = m.searchQuery("cat cat cat", RefModel.Bm25)
    assert(once == twice)
  }

  test("empty / missing-term / punctuation-only queries") {
    val m = model("u1" -> "cat", "u2" -> "dog")
    assert(m.searchQuery("", RefModel.Bm25).forall(_._2 == 0f))
    assert(m.searchQuery("zebra", RefModel.Bm25).forall(_._2 == 0f))
    val p = m.searchQuery("...", RefModel.Bm25)
    assert(p.forall(_._2 == 0f)) // '.' not indexed here
  }

  test("gtf invariant: gtf(term) == #docs containing term") {
    val m = model(
      "u1" -> "cat dog . 42", "u2" -> "cat . .", "u3" -> "bird 42 cat")
    m.gtf.foreach { case (term, df) =>
      val scan = m.docs.valuesIterator.count(_.ft.contains(term))
      assert(scan.toLong == df, s"term=$term")
    }
  }

  test("levenshtein DP matches known distances over code points") {
    assert(Expand.levenshtein("kitten", "sitting") == 3)
    assert(Expand.levenshtein("", "abc") == 3)
    assert(Expand.levenshtein("abc", "abc") == 0)
    assert(Expand.levenshtein("café", "cafe") == 1)
  }

  test("utf8 byte lengths drive the edit budget (Rust str::len)") {
    assert(Expand.utf8Len("café") == 5)
    assert(Expand.utf8Len("数据") == 6)
    assert(Expand.maxDist(3) == 0)
    assert(Expand.maxDist(4) == 1)
    assert(Expand.maxDist(7) == 1)
    assert(Expand.maxDist(8) == 2)
  }
}
