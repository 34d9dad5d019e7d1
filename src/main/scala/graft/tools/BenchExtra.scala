package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-6 measurement harness (optimization guide §1): per-query timings
  * OUTSIDE the frozen driver bench, plus `.explain("formatted")` capture
  * for the plan evidence in plans/r06/.
  *
  * Usage:
  *   runMain graft.tools.BenchExtra <sfDir> <samples> [query ...]
  *
  * Env:
  *   SPARK_GRAFT_CPUS       local core count (default 32)
  *   SPARK_GRAFT_PLANS_DIR  when set, writes <query>_<SPARK_GRAFT_PLAN_TAG>
  *                          .txt formatted plans (finalized AQE plans — the
  *                          frame is executed via its own QueryExecution
  *                          before dumping, so AdaptiveSparkPlan is final)
  *   SPARK_GRAFT_PLAN_TAG   suffix for plan files (default "plan")
  *   SPARK_GRAFT_SINK       "noop" times `write.format("noop")` instead
  *                          of `.count()` — guide §1.4 isolation: every
  *                          column of every row is computed and
  *                          discarded, so sort/column costs that count()
  *                          legally prunes are included
  *
  * Methodology mirrors Bench.scala (same session confs, warm-up pass, then
  * timed `.count()` passes) so numbers are comparable to the driver's, but
  * per-query samples are printed raw (min + median) for before/after
  * evidence. This main is ADDITIVE: Bench.scala is frozen for measurement.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val samples = args.lift(1).map(_.toInt).getOrElse(5)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))

    // warm-up (codegen + cached index builds), identical role to Bench's
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[benchextra] warmup $n failed: ${e.getMessage}")
      }
    }

    plansDir.foreach { pd =>
      Files.createDirectories(Paths.get(pd))
      names.foreach { n =>
        try {
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          df.collect() // finalize THIS frame's AdaptiveSparkPlan
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(pd, s"${n}_$tag.txt"), txt)
        } catch { case e: Throwable =>
          System.err.println(s"[benchextra] plan $n failed: ${e.getMessage}")
        }
      }
    }

    val noop = sys.env.get("SPARK_GRAFT_SINK").contains("noop")
    val out = new StringBuilder
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"benchextra: $n")
      val ts = (0 until samples).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save()
          else df.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[benchextra] $n failed: ${e.getMessage}")
          None
        }
      }
      spark.sparkContext.setJobDescription(null)
      if (ts.nonEmpty) {
        val sorted = ts.sorted
        val med = sorted(sorted.length / 2)
        val line = f"[benchextra] $n%-24s min=${sorted.head}%8.3f " +
          f"med=$med%8.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}"
        println(line)
        out.append(line).append('\n')
      }
    }
    sys.env.get("SPARK_GRAFT_EXTRA_OUT").foreach(p =>
      Files.writeString(Paths.get(p), out.toString))
    spark.stop()
  }
}
