package graft.tools

import graft.corpus.Synth
import graft.oracle.RefModel
import graft.text.{Extract, Lexer}

/** Tiny CLI over the in-memory oracle engine: synthesizes the deterministic
  * corpus, indexes it, and answers queries — the single-node stand-in for
  * the reference binary (`docsense search`). Useful for eyeballing ranks and
  * as the verification surface for the text/oracle layers.
  *
  * Usage: runMain graft.tools.OracleSearchCli [nDocs] [method] [query...]
  */
object OracleSearchCli {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val method = args.lift(1) match {
      case Some("tfidf") => RefModel.Tfidf
      case _ => RefModel.Bm25
    }
    val queries =
      if (args.length > 2) Seq(args.drop(2).mkString(" "))
      else Seq("opengl", "texture array shader",
        "missingkeywordthatdoesnotexist")

    val model = new RefModel()
    var skipped = 0
    Synth.pages(n).foreach { p =>
      Extract.extractText(p.html, p.text) match {
        case Some(text) => model.addDocument(p.url, text, p.warc_ts.getTime)
        case None => skipped += 1
      }
    }
    println(s"indexed ${model.docs.size} of $n docs " +
      s"(skipped: $skipped malformed, " +
      s"${n - skipped - model.docs.size} empty/stop-only); " +
      s"dictionary ${model.gtf.size} terms; totalTokens ${model.totalTokens}")

    queries.foreach { q =>
      val toks = Lexer.tokenize(q)
      println(s"\nquery: \"$q\" → tokens ${toks.mkString("[", " ", "]")} " +
        s"(${method.getClass.getSimpleName.stripSuffix("$")})")
      val top = model.searchTop(q, method, 10)
      if (top.isEmpty) println("  (no hits with positive score)")
      top.zipWithIndex.foreach { case ((url, score), i) =>
        println(f"  ${i + 1}%2d. $url%-50s $score%.6f")
      }
    }
  }
}
