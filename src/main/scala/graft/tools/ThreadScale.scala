package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

import graft.corpus.Synth
import graft.text.{Extract, Lexer}

/** Pure-JVM (no Spark) thread-scaling probe for the per-doc hot path.
  * Usage: runMain graft.tools.ThreadScale [docsPerThread]
  */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val perThread = args.headOption.map(_.toInt).getOrElse(4000)
    val threadCounts =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(1, 8, 32)
    for (threads <- threadCounts; phase <- Seq("gen", "extract", "tokenize")) {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0L
            var acc = 0L
            while (i < perThread) {
              val p = Synth.page(t * perThread + i)
              if (phase != "gen") {
                val txt = Extract.extractText(p.html, p.text)
                if (phase == "tokenize")
                  txt.foreach(c => acc += Lexer.tokenize(c).length)
                else acc += txt.map(_.length).getOrElse(0).toLong
              }
              i += 1
            }
            if (acc == Long.MinValue) println("") // keep acc live
          }
        })
      }
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.HOURS)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d phase=$phase%-9s wall=$dt%7.2f s " +
        f"(docs=${threads * perThread}, docs/s=${threads * perThread / dt}%9.0f)")
    }
  }
}
