package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.{Corpus, Dedup}
import graft.query.Search

/** One-off phase profiler for the driver-bench hot spots.
  * Usage: runMain graft.tools.BenchOne <sfDir> [cpus]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[benchone] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // warm the session on something tiny first (JVM/codegen warmup)
    time("warmup count") {
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    }
    val idx = time("ensureIndex (build)") { Corpus.ensureIndex(spark, sfDir) }
    time("searchTop tfidf (1st)") {
      Search.searchTop(spark, idx, "data query", Search.Tfidf, 10).count()
    }
    time("searchTop tfidf (2nd)") {
      Search.searchTop(spark, idx, "data query", Search.Tfidf, 10).count()
    }
    time("minhashPairs count (1st)") { Dedup.minhashPairs(spark, sfDir).count() }
    time("minhashPairs count (2nd)") { Dedup.minhashPairs(spark, sfDir).count() }
    time("simhashPairs count") { Dedup.simhashPairs(spark, sfDir).count() }
    time("embCosine count") {
      graft.ops.Ann.cosineNearDupPairs(spark, sfDir).count()
    }
    spark.stop()
  }
}
