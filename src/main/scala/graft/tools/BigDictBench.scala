package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.corpus.Synth
import graft.index.IndexBuilder
import graft.query.{IndexHandles, Search}

/** Latency evidence for the DISTRIBUTED dictionary path (SURVEY §7.4 risk
  * 7): builds an index whose termCount exceeds `graft.maxDriverDictTerms`
  * (default 1M) — so `Search.plan` takes the distributed expansion branch
  * for real, not force-flagged — and measures query p50/p99 through it.
  *
  * Vocabulary inflation is honest web-shaped data, not a conf trick: every
  * text-mode doc carries three per-doc unique multi-digit tokens (ids /
  * hashes / timestamps are exactly what makes real crawl dictionaries
  * huge); the lexer keeps numeric runs as terms (L2), so ~2 of 3 docs add
  * 3 unique dictionary entries each.
  *
  * Usage: runMain graft.tools.BigDictBench [nDocs] [outFile]
  * Prints one JSON line; appends a markdown block to BENCH/BASELINE.md
  * only when run with `--append-md`.
  */
object BigDictBench {

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--"))
    val rest = args.filterNot(_.startsWith("--"))
    val nDocs = rest.headOption.map(_.toLong).getOrElse(600000L)
    val outFile = rest.lift(1).getOrElse("/tmp/bigdict.json")

    val spark = ScalingBench.session(
      Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("ERROR")

    // --keep reuses a fixed dir across runs (skips the rebuild when its
    // meta is present) so QueryProfile can iterate on the same index
    val keep = flags.contains("--keep")
    val dir =
      if (keep) s"/tmp/graft_bigdict_keep_$nDocs"
      else Files.createTempDirectory("graft_bigdict_").toString
    val corpusDir = s"$dir/corpus"
    val haveIndex = keep && {
      val f = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.exists(new org.apache.hadoop.fs.Path(s"$dir/meta.json"))
    }
    if (!haveIndex) {
      // per-doc unique numeric tokens (disjoint from Synth's vocab
      // numbers): uid bases 7e6/9e6/11e6 + doc index
      val docIdx = element_at(split(col("url"), "/"), 4).cast("long")
      Synth.pagesDf(spark, nDocs, partitions = 128)
        .withColumn("text",
          when(col("text").isNotNull, concat(col("text"),
            lit(" "), (docIdx + 7000000L).cast("string"),
            lit(" "), (docIdx + 9000000L).cast("string"),
            lit(" "), (docIdx + 11000000L).cast("string")))
            .otherwise(col("text")))
        .write.mode("overwrite").parquet(corpusDir)
    }
    val t0 = System.nanoTime()
    // --keep + existing index: actually skip the build (checkpointed
    // resume would still pay a multi-second no-op pass) and read the
    // counts from meta; buildMs/docsPerSec are then not meaningful
    val (termCount, buildMs) =
      if (haveIndex)
        (IndexBuilder.readMeta(spark, dir)("termCount").toLong, -1L)
      else {
        val m = IndexBuilder.build(spark,
          spark.read.parquet(corpusDir), dir,
          IndexBuilder.BuildConf(partitions = 64, postingGroups = 4,
            queryBuckets = 64, buildId = "bigdict", assumeUniqueUrls = true))
        (m.termCount, (System.nanoTime() - t0) / 1000000L)
      }

    val h = IndexHandles(spark, dir)
    require(h.driverDict.isEmpty,
      s"termCount $termCount did not exceed the driver-dict " +
        "gate — the distributed branch would not be measured")

    val queries = Seq(
      ("opengl", Search.Bm25), // exact, head term
      ("texture array shader", Search.Bm25), // exact multi-term
      ("missingkeywordthatdoesnotexist", Search.Bm25), // fuzzy, no hit
      ("textur aray shaderz", Search.Bm25), // fuzzy, 3 typo tokens
      ("7000042", Search.Bm25)) // exact uid lookup (tlen+term IN pushdown)
    val results = queries.map { case (q, m) =>
      val times = ScalingBench.timedQueryMs(spark, dir, q, m)
      (q, ScalingBench.percentile(times, 0.50),
        ScalingBench.percentile(times, 0.99))
    }

    val qJson = results.map { case (q, p50, p99) =>
      s""""$q":{"p50":$p50,"p99":$p99}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"bigdict","nDocs":$nDocs,""" +
        s""""termCount":${termCount},"buildMs":$buildMs,""" +
        s""""docsPerSec":${if (buildMs > 0) nDocs * 1000.0 / buildMs else -1.0},""" +
        s""""queryLatencyMs":$qJson}"""
    println(line)
    Files.writeString(Paths.get(outFile), line)

    if (flags.contains("--append-md")) {
      val md = new StringBuilder("\n## Big-dictionary distributed " +
        "expansion path (round 4)\n\n")
      md.append(s"$nDocs docs, **${termCount} terms** (> the 1M " +
        "`graft.maxDriverDictTerms` gate → `Search.plan` runs the " +
        "DISTRIBUTED dictionary branch; `tlen` clustering prunes both " +
        "scans), local[" +
        Runtime.getRuntime.availableProcessors() + "]:\n\n")
      md.append("| query | p50 ms | p99 ms |\n|---|---|---|\n")
      results.foreach { case (q, p50, p99) =>
        md.append(f"| $q | $p50%.0f | $p99%.0f |\n")
      }
      Files.writeString(Paths.get("BENCH/BASELINE.md"), md.toString,
        java.nio.file.StandardOpenOption.APPEND)
      println("appended BENCH/BASELINE.md")
    }
    spark.stop()
  }
}
