package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Schema.Posting

/** Merge-on-read delta log for incremental index maintenance.
  *
  * Rewriting posting/block groups per update amplifies a 1-doc change into
  * a near-full postings rewrite (a changed doc with a diverse vocabulary
  * touches every termId range). Instead, each [[Incremental.update]] appends
  * one sequenced delta under `indexDir/deltas/seq_<n>/`:
  *
  *   - `postings/`  new (termId, docId, tf, docLen, seq) rows
  *   - `blocks/`    the same rows delta+varint-encoded (same bucketSize as
  *                  the base, so WAND aligns base and delta blocks)
  *   - `docs/`      new/replacing DocMeta rows (+ seq)
  *   - `removed/`   tombstones: (docId, seq) — "every version of docId
  *                  written BEFORE seq is dead"
  *
  * Liveness rule (read side): a row written at layer `r` (base = 0, delta
  * = its seq) is live iff `r >= lastTombstoneSeq(docId)` (0 when none).
  * A replaced doc keeps its stable docId: the tombstone at seq s kills the
  * base/earlier rows, the seq-s rows survive (`s >= s`).
  *
  * This is exactly Iceberg's merge-on-read shape (delete files + data
  * files + periodic compaction) expressed on plain parquet; on a real
  * cluster the delta commit maps to one Iceberg snapshot. Read cost grows
  * with the number of live tombstones, so [[Incremental.compact]] folds
  * deltas back into the base when `deltaCompactEvery` deltas accumulate or
  * tombstones exceed a fraction of the corpus.
  */
object DeltaLog {

  def deltasPath(dir: String) = s"$dir/deltas"
  def seqPath(dir: String, seq: Int) = s"$dir/deltas/seq_$seq"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed delta sequence numbers, ascending (a seq is committed once
    * its `removed/` table exists — it is written LAST, so a crashed
    * half-written delta is invisible and safely overwritten by the retry).
    */
  def listSeqs(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val p = new Path(deltasPath(dir))
    if (!f.exists(p)) return Nil
    f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("seq_") => s.stripPrefix("seq_").toInt }
      .filter(s => f.exists(new Path(s"${seqPath(dir, s)}/removed")))
      .sorted
  }

  def nextSeq(spark: SparkSession, dir: String): Int =
    listSeqs(spark, dir).lastOption.getOrElse(0) + 1

  /** (docId, tombSeq = max tombstone seq) — the small side of every
    * liveness join; None when the index has no deltas.
    */
  def tombstonesDf(spark: SparkSession, dir: String): Option[DataFrame] = {
    val seqs = listSeqs(spark, dir)
    if (seqs.isEmpty) None
    else Some(spark.read
      .parquet(seqs.map(s => s"${seqPath(dir, s)}/removed"): _*)
      .groupBy("docId").agg(max(col("seq")).cast("int").as("tombSeq")))
  }

  /** Driver-collected tombstones for the WAND decode filter. Bounded by
    * compaction (tombstones > `tombstoneCompactFraction`·docCount trigger
    * a fold), so this stays a small working set.
    */
  def tombstoneMap(spark: SparkSession, dir: String): Map[Long, Int] = {
    import spark.implicits._
    tombstonesDf(spark, dir) match {
      case None => Map.empty
      case Some(t) => t.as[(Long, Int)].collect().toMap
    }
  }

  private def basePostings(spark: SparkSession, dir: String): DataFrame = {
    val g = IndexBuilder.readMeta(spark, dir)("postingGroups").toInt
    spark.read.parquet((0 until g)
      .map(i => s"${IndexBuilder.postingsPath(dir)}/group=$i"): _*)
      .select("termId", "docId", "tf", "docLen")
  }

  /** Applies the liveness rule to a frame carrying a `_seq` layer column;
    * the tombstone side is broadcast (it is compaction-bounded small).
    */
  def withLiveness(
      spark: SparkSession, dir: String, layers: DataFrame): DataFrame =
    tombstonesDf(spark, dir) match {
      case None => layers.drop("_seq")
      case Some(t) =>
        layers.join(broadcast(t), Seq("docId"), "left")
          .filter(col("_seq") >= coalesce(col("tombSeq"), lit(0)))
          .drop("_seq", "tombSeq")
    }

  /** Live postings across base + deltas: (termId, docId, tf, docLen). */
  def postingsView(spark: SparkSession, dir: String): DataFrame = {
    val seqs = listSeqs(spark, dir)
    val base = basePostings(spark, dir)
    if (seqs.isEmpty) return base
    val cols = Seq("termId", "docId", "tf", "docLen")
    val delta = spark.read
      .parquet(seqs.map(s => s"${seqPath(dir, s)}/postings"): _*)
    withLiveness(spark, dir,
      base.withColumn("_seq", lit(0))
        .select((cols :+ "_seq").map(col): _*)
        .unionByName(delta.withColumn("_seq", col("seq").cast("int"))
          .select((cols :+ "_seq").map(col): _*)))
  }

  private val docCols = Seq("docId", "url", "warc_ts", "docLen")

  /** Live docs table across base + deltas. */
  def docsView(spark: SparkSession, dir: String): DataFrame = {
    val seqs = listSeqs(spark, dir)
    val base = spark.read.parquet(IndexBuilder.docsPath(dir))
      .select(docCols.map(col): _*)
    if (seqs.isEmpty) return base
    val delta = spark.read
      .parquet(seqs.map(s => s"${seqPath(dir, s)}/docs"): _*)
    withLiveness(spark, dir,
      base.withColumn("_seq", lit(0))
        .select((docCols :+ "_seq").map(col): _*)
        .unionByName(delta.withColumn("_seq", col("seq").cast("int"))
          .select((docCols :+ "_seq").map(col): _*)))
  }

  /** Every doc row ever written (dead included) — for max-docId assignment,
    * so a purged doc's id is never handed to a new url while tombstones
    * that mention it are still live.
    */
  def docsAllLayers(spark: SparkSession, dir: String): DataFrame = {
    val seqs = listSeqs(spark, dir)
    val base = spark.read.parquet(IndexBuilder.docsPath(dir))
      .select(docCols.map(col): _*)
    if (seqs.isEmpty) base
    else base.unionByName(spark.read
      .parquet(seqs.map(s => s"${seqPath(dir, s)}/docs"): _*)
      .select(docCols.map(col): _*))
  }

  /** Delta blocks (TermBlock columns + `seq`); None when no deltas. */
  def deltaBlocks(spark: SparkSession, dir: String): Option[DataFrame] = {
    val seqs = listSeqs(spark, dir)
    if (seqs.isEmpty) None
    else Some(spark.read
      .parquet(seqs.map(s => s"${seqPath(dir, s)}/blocks"): _*))
  }

  /** Commits one delta: postings + their encoded blocks + doc rows +
    * tombstones. `removed/` is written last = the commit marker.
    */
  def writeDelta(
      spark: SparkSession,
      dir: String,
      seq: Int,
      postingsAdd: DataFrame,
      docsAdd: DataFrame,
      tombstones: DataFrame, // docId column
      blockSize: Int,
      bucketSize: Long,
      parts: Int): Unit = {
    import spark.implicits._
    val p = seqPath(dir, seq)
    postingsAdd.select("termId", "docId", "tf", "docLen")
      .withColumn("seq", lit(seq))
      .write.mode("overwrite").parquet(s"$p/postings")
    val sorted = spark.read.parquet(s"$p/postings")
      .select(col("termId"), col("docId"),
        col("tf").cast("int").as("tf"), col("docLen").cast("int").as("docLen"))
      .repartitionByRange(parts, col("termId"), col("docId"))
      .sortWithinPartitions("termId", "docId")
      .as[Posting]
    sorted.mapPartitions(it => Blocks.encode(it, blockSize, bucketSize))
      .withColumn("seq", lit(seq))
      .write.mode("overwrite").parquet(s"$p/blocks")
    docsAdd.select(docCols.map(col): _*)
      .withColumn("seq", lit(seq))
      .write.mode("overwrite").parquet(s"$p/docs")
    tombstones.select(col("docId"))
      .withColumn("seq", lit(seq))
      .write.mode("overwrite").parquet(s"$p/removed")
  }

  /** Drops all deltas (after compaction folded them into the base). */
  def clear(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val p = new Path(deltasPath(dir))
    if (f.exists(p)) f.delete(p, true)
  }
}
