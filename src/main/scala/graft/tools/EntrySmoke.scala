package graft.tools

/** Smoke: SparkEntry.entry must return >0 rows on sf0.001 (driver gate). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSearchCli.localSession("4")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY ROWS: ${rows.length}")
    rows.take(5).foreach(r => println("  " + r))
    spark.stop()
    if (rows.isEmpty) sys.exit(1)
  }
}
