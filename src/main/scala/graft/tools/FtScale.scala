package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.Synth
import graft.text.{Extract, Lexer}

/** Isolates the scaling behavior of the ft stage's sub-phases at one core
  * count: corpus generation, +extraction, +tokenization, +parquet write.
  * Usage: runMain graft.tools.FtScale <cores> <nDocs>
  */
object FtScale {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(body: => Long): Unit = {
      val t = System.nanoTime()
      val n = body
      println(f"[$cores cores] $name%-18s ${(System.nanoTime() - t) / 1e9}%8.1f s  (n=$n)")
    }

    val pages = Synth.pagesDf(spark, nDocs, partitions = 64)
      .select("url", "warc_ts", "html", "text")
      .as[(String, java.sql.Timestamp, Array[Byte], String)]

    time("generate") {
      pages.mapPartitions(it => Iterator.single(it.size.toLong))
        .reduce(_ + _)
    }
    time("gen+extract") {
      pages.mapPartitions(it => Iterator.single(it.map { case (_, _, h, t) =>
        Extract.extractText(h, t).map(_.length.toLong).getOrElse(0L)
      }.sum)).reduce(_ + _)
    }
    time("gen+extract+tokenize") {
      pages.mapPartitions(it => Iterator.single(it.map { case (_, _, h, t) =>
        Extract.extractText(h, t).map(c => Lexer.tokenize(c).length.toLong)
          .getOrElse(0L)
      }.sum)).reduce(_ + _)
    }
    time("full ft + write") {
      val out = java.nio.file.Files
        .createTempDirectory("ftscale_").toString
      val ft = pages.mapPartitions { it =>
        it.flatMap { case (url, _, html, text) =>
          Extract.extractText(html, text) match {
            case None => Iterator.empty
            case Some(content) =>
              val counts = new java.util.HashMap[String, Integer]()
              Lexer.tokenize(content).foreach(tok =>
                counts.merge(tok, 1, (a, b) => a + b))
              val b = Iterator.newBuilder[(String, String, Int)]
              counts.forEach((k, v) => b += ((url, k, v)))
              b.result()
          }
        }
      }
      ft.write.mode("overwrite").parquet(out)
      spark.read.parquet(out).count()
    }
    spark.stop()
  }
}
