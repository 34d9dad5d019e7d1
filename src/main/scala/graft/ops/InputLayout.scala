package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Input-layout adaptivity for per-row-heavy operators.
  *
  * The optimization-guide §2.5 "input skew" case: a parquet file with one
  * giant row group scans as ONE task no matter how many cores the session
  * has (splits cannot cut a row group), so every per-row operator above
  * the scan — tokenize, decode, hash — runs serially while the rest of
  * the machine idles. The driver's testdata tables are exactly this shape
  * (single row group per table at every SF).
  *
  * [[spread]] applies the guide's fix ("otherwise repartition immediately
  * after the read") ADAPTIVELY: only when the scan actually yields fewer
  * partitions than the session's cores does it add a hash repartition on
  * a caller-chosen uniform key (a unique id — deterministic, skew-free,
  * and no sort-before-repartition cost, unlike round-robin). On healthy
  * multi-row-group input — any real table at the 100 TB target — the scan
  * already produces >= cores splits and this is a NO-OP: no exchange
  * enters the plan, so the operators stay narrow exactly where narrowness
  * matters. The decision reads only FS/plan metadata (no job).
  */
object InputLayout {

  def spread(spark: SparkSession, df: DataFrame, key: Column): DataFrame = {
    val cores = math.max(1, spark.sparkContext.defaultParallelism)
    val scanParts = df.rdd.getNumPartitions
    // fire only on GROSS under-split (≤ half the cores): a scan already
    // within 2× of the core count would pay a full exchange to reclaim a
    // sliver of idle capacity — not worth it at any scale
    if (scanParts * 2 <= cores) df.repartition(cores, key) else df
  }
}
