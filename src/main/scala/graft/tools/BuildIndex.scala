package graft.tools

import org.apache.hadoop.fs.Path

import graft.corpus.Synth
import graft.index.IndexBuilder

/** Builds (once) a synthetic-corpus index at a fixed path, for profiling
  * tools that want a reusable large index.
  * Usage: runMain graft.tools.BuildIndex <nDocs> <indexDir> [cores]
  */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val dir = args(1)
    val cores = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = ScalingBench.session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$dir/meta.json"))) {
      val corpusDir = s"$dir/__corpus"
      Synth.pagesDf(spark, nDocs, partitions = 64)
        .write.mode("overwrite").parquet(corpusDir)
      val m = IndexBuilder.build(spark, spark.read.parquet(corpusDir), dir,
        IndexBuilder.BuildConf(partitions = 64, postingGroups = 4,
          queryBuckets = 64, buildId = "profile",
          assumeUniqueUrls = true))
      fs.delete(new Path(corpusDir), true)
      println(s"built: ${m.docCount} docs, ${m.postingCount} postings, " +
        f"${m.docsPerSec}%.0f docs/s")
    } else println("index exists — skipped")
    spark.stop()
  }
}
