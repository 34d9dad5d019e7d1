package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Median of an odd-length (or any non-empty) sample. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val samples = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "3").toInt
    require(samples >= 1, s"SPARK_GRAFT_BENCH_SAMPLES must be >= 1, got $samples")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq
    // 1 unmeasured warm-up pass (absorbs JVM/codegen compilation and the
    // cached index build — the reference benchmark's own methodology,
    // benchmark.rs:73-76), then `samples` timed passes with the QUERIES
    // INTERLEAVED in time (pass 1 runs every query, then pass 2, …) and
    // the per-query MEDIAN reported. This host has documented ~38% steal
    // bursts (BENCH/BASELINE.md): a single sample made unchanged queries
    // drift ~2× between rounds, indistinguishable from a real regression.
    // Interleaving spreads a noisy minute across all queries equally; the
    // median discards the burst. Same methodology as ScalingBench.
    names.foreach { n =>
      try { SparkEntry.queries(n)(spark, sfDir).count() }
      catch { case _: Throwable => () }
    }
    // a query that THROWS must never contribute a timing: recording its
    // time-to-failure would make a broken engine read as a speedup in the
    // round-over-round comparison. Failed queries are dropped from
    // `queries` and listed under `errors` instead.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val timings: Map[String, Seq[Double]] = {
      val acc = scala.collection.mutable.Map
        .empty[String, List[Double]].withDefaultValue(Nil)
      (0 until samples).foreach { _ =>
        names.foreach { n =>
          if (!failed(n)) {
            val t0 = System.nanoTime()
            try {
              SparkEntry.queries(n)(spark, sfDir).count()
              acc(n) = acc(n) :+ (System.nanoTime() - t0) / 1e9
            } catch { case e: Throwable =>
              failed += n
              System.err.println(s"[bench] $n failed: ${e.getMessage}")
            }
          }
        }
      }
      acc.toMap
    }
    val ok = names.filter(n => !failed(n) && timings(n).nonEmpty)
    val results: Map[String, Double] =
      ok.map(n => n -> median(timings(n))).toMap

    val esc = SparkEntry.jsonEscape _
    val qs = ok.map(k => esc(k) + ":" + results(k))
      .mkString("{", ",", "}")
    val errs = failed.toSeq.map(esc).mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""samples":$samples,"errors":$errs,"sf":${esc(sfDir)}}"""
    println(line)
    // file fallback for parsers that can't strip build-tool log prefixes
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), line)
    spark.stop()
  }
}
