package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
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
  *   - `_committed` the commit marker (tiny file, created atomically via
  *                  temp + rename AFTER every table above has fully
  *                  written — see [[commitDelta]])
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
  * tombstones exceed min(`tombstoneCompactFraction` of the corpus,
  * `tombstoneAbsoluteCap`).
  */
object DeltaLog {

  def deltasPath(dir: String) = s"$dir/deltas"
  def seqPath(dir: String, seq: Int) = s"$dir/deltas/seq_$seq"
  private def compactedMarker(dir: String) = s"$dir/deltas/_compacted"
  private def committedMarker(dir: String, seq: Int) =
    s"${seqPath(dir, seq)}/_committed"
  def removedPath(dir: String, seq: Int) = s"${seqPath(dir, seq)}/removed"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic small-file write: temp + atomic-replace rename, so concurrent
    * readers see either the old content or the new — never a truncated
    * overwrite and NEVER an absent file. Shared by every marker/meta
    * writer in the index package.
    *
    * `FileSystem.rename` has no overwrite contract, and the local FS
    * Spark actually installs (Hive's ProxyLocalFileSystem) REFUSES to
    * overwrite — measured: 1999/2000 rewrites returned false — which
    * forced every meta rewrite through a delete-then-rename fallback
    * whose absent-file window ServeSpec's commit-race test caught as a
    * reader 500 on a vanished meta.json. So:
    *
    *   - `file:` scheme → java.nio ATOMIC_MOVE (POSIX rename(2), atomic
    *     replace, no window). The raw write leaves no checksum sidecar;
    *     stale `.crc` sidecars from older writers are deleted first so a
    *     Checksum reader can't verify NEW content against an OLD crc
    *     (with no crc present, reads fall back to raw — no absent-data
    *     window either way).
    *   - other schemes → `FileContext.rename(…, Rename.OVERWRITE)`, the
    *     API that DOES contract atomic replace (HDFS implements it);
    *     only a filesystem with no FileContext binding at all takes the
    *     legacy delete+retry fallback.
    *
    * The temp name is unique per write: concurrent writers to the same
    * destination (Serve maintenance + streaming foreachBatch) must not
    * consume each other's temp file — with a shared name, the loser's
    * fallback would DELETE the destination and then fail its rename.
    */
  /** Fully reads a small meta/marker file, retrying ONCE on a transient
    * ChecksumException: the file:-scheme [[writeAtomicString]] deletes
    * the stale `.crc` sidecar and ATOMIC_MOVEs the data as two separate
    * steps, so a ChecksumFileSystem reader that opened the old crc just
    * before the delete can verify NEW bytes against the OLD checksum
    * exactly once — the retry re-opens with the post-move state (crc
    * absent → raw read). Every small-file reader in the index/ops layer
    * goes through here.
    */
  private[graft] def readSmallBytes(
      f: FileSystem, p: Path): Array[Byte] = {
    def once(): Array[Byte] = {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        bytes
      } finally in.close()
    }
    try once()
    catch { case _: org.apache.hadoop.fs.ChecksumException => once() }
  }

  private[graft] def writeAtomicString(
      f: FileSystem, path: String, content: String): Unit = {
    val dest = new Path(path)
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val uniq = s".tmp.${java.lang.Thread.currentThread().getId}." +
      java.lang.System.nanoTime()
    if (f.getScheme == "file") {
      val p = java.nio.file.Paths.get(dest.toUri.getPath match {
        case "" => path
        case up => up
      })
      val name = p.getFileName.toString
      val tmp = p.resolveSibling(name + uniq)
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.deleteIfExists(p.resolveSibling(s".$name.crc"))
      java.nio.file.Files.deleteIfExists(p.resolveSibling(s".$name.tmp.crc"))
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new Path(path + uniq)
      val out = f.create(tmp, true)
      out.write(bytes)
      out.close()
      try {
        val fc = org.apache.hadoop.fs.FileContext
          .getFileContext(f.getUri, f.getConf)
        fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // no FileContext binding: legacy path. The window is real but
          // the second failure must SURFACE, not silently leave
          // meta.json/_committed/_compacted absent (a deleted meta is
          // fatal; a deleted commit marker hides a committed delta).
          if (!f.rename(tmp, dest)) {
            if (f.exists(dest)) f.delete(dest, false)
            require(f.rename(tmp, dest),
              s"atomic write failed: rename $tmp -> $dest after delete")
          }
      }
    }
  }

  /** Highest seq folded into the base by [[Incremental.compact]]; seqs at
    * or below it are invisible to readers even while their dirs await
    * grace-period deletion (see [[clear]]).
    *
    * A missing, empty, or garbage marker reads as 0 — that is SAFE, not
    * just lenient: re-exposing folded deltas over the folded base yields
    * the identical live view, BECAUSE every docId a delta writes reads as
    * tombstoned at its seq — including docs merely ADDED by the delta
    * ([[tombstonesDf]] derives those entries from the delta's own docs/
    * table). The tombstone kills each such doc's folded layer-0 rows and
    * its delta rows re-supply the same content; a marker lost to a crash
    * (and likewise a compact() restarted mid-fold) degrades read cost,
    * never correctness. Were adds untombstoned, both rows would read as
    * live and the doc would be double-materialized.
    *
    * One documented hairline corner: the DISTRIBUTED-liveness WAND path
    * routes tombstones by `docId / meta.bucketSize`, so if a lost marker
    * re-exposes deltas whose blocks were stamped with a DIFFERENT
    * bucketSize (the fold heals bucketSize as the corpus grows) while the
    * tombstone set ALSO exceeds `graft.maxDriverTombstones`, a replaced
    * doc's re-exposed old-generation rows can land in a bucket its
    * tombstone is not routed to. This needs three independent failures at
    * once (marker loss + bucketSize change in that very fold + >10M
    * tombstones); the driver-map path — every configuration below the
    * cap — filters by docId globally and is immune. ChaosSpec exercises
    * marker loss and fold restarts under the normal path.
    */
  def compactedThrough(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = new Path(compactedMarker(dir))
    val marker =
      if (!f.exists(p)) 0
      else scala.util.Try(new String(readSmallBytes(f, p),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt).getOrElse(0)
    // redundant floor in meta.json ([[Incremental.compact]] records it
    // after every fold): losing EITHER file alone re-exposes nothing —
    // the derived add-tombstones keep even the both-lost case correct,
    // but redundancy keeps its read cost and the documented
    // distributed-path hairline corner behind TWO independent losses
    val metaFloor = scala.util.Try(
      IndexBuilder.readMeta(spark, dir)
        .get("compactedThrough").map(_.toInt)).toOption.flatten.getOrElse(0)
    math.max(marker, metaFloor)
  }

  /** Committed, uncompacted delta sequence numbers, ascending.
    *
    * A seq is committed iff its `_committed` marker file exists — NOT iff
    * its `removed/` directory exists: Spark's FileOutputCommitter creates
    * the output directory (with `_temporary/`) at job SETUP, before any
    * data commits, so directory existence would make a crashed or
    * in-flight `removed/` write look committed to a concurrent reader —
    * which would then either wedge on schema inference over an empty
    * table or double-apply the delta after the retry. The marker is a
    * separate file written atomically (temp + rename) strictly after the
    * tombstone parquet job commits ([[commitDelta]]), so visibility flips
    * in one rename.
    *
    * Back-compat: deltas committed by the pre-marker code have no
    * `_committed` file — treating them as uncommitted would silently drop
    * committed data (deleted docs resurrect) and then let nextSeq
    * OVERWRITE their dirs. Those deltas do carry `removed/_SUCCESS`
    * (written by the committer at JOB COMMIT, i.e. strictly after the
    * tombstone data), so a seq also reads as committed on that job-commit
    * artifact: exactly the alternative gate the visibility fix allows, and
    * never true for a crashed/in-flight write.
    */
  def listSeqs(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val p = new Path(deltasPath(dir))
    if (!f.exists(p)) return Nil
    val floor = compactedThrough(spark, dir)
    f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("seq_") => s.stripPrefix("seq_").toInt }
      .filter(s => s > floor &&
        (f.exists(new Path(committedMarker(dir, s))) ||
          f.exists(new Path(s"${removedPath(dir, s)}/_SUCCESS"))))
      .sorted
  }

  /** Monotonic across compactions: compacted dirs may still exist on disk
    * pending grace-period deletion, so a reused seq number would make a
    * fresh commit invisible (≤ compactedThrough). A crashed HALF-written
    * delta keeps its seq (retry overwrites it in place).
    */
  def nextSeq(spark: SparkSession, dir: String): Int =
    math.max(listSeqs(spark, dir).lastOption.getOrElse(0),
      compactedThrough(spark, dir)) + 1

  /** (docId, tombSeq = max tombstone seq) over the GIVEN seq snapshot —
    * the small side of every liveness join; None when no deltas. Callers
    * holding a handle pass the seq listing captured at handle construction
    * so every derived frame shares one consistent snapshot.
    *
    * The set unions the WRITTEN kill tombstones (`removed/`) with DERIVED
    * entries (docId, seq) from each delta's `docs/` table: every docId a
    * delta writes — docs merely ADDED included — reads as tombstoned at its
    * seq. For an add this changes nothing in normal state (its only rows
    * live at `_seq = s >= s`), but it upholds the invariant the compaction
    * fold's restart/lost-marker safety rests on (see [[compactedThrough]]):
    * were adds untombstoned, a re-exposed folded delta would read the add's
    * folded layer-0 copy AND its delta rows as live. Deriving (instead of
    * writing add rows into `removed/`) keeps the kill set pure for the
    * compaction trigger and retrofits the invariant onto deltas committed
    * by older writers.
    */
  def tombstonesDf(
      spark: SparkSession, dir: String, seqs: Seq[Int]): Option[DataFrame] =
    killTombstonesDf(spark, dir, seqs).map { removed =>
      val f = fs(spark, dir)
      // hand-crafted/degenerate deltas may lack docs/ — skip, don't fail
      val docsDirs = seqs.map(s => s"${seqPath(dir, s)}/docs")
        .filter(p => f.exists(new Path(p)))
      val sides =
        if (docsDirs.isEmpty) removed
        else removed.unionByName(spark.read.parquet(docsDirs: _*)
          .select(col("docId"), col("seq")))
      sides.groupBy("docId").agg(max(col("seq")).cast("int").as("tombSeq"))
    }

  def tombstonesDf(spark: SparkSession, dir: String): Option[DataFrame] =
    tombstonesDf(spark, dir, listSeqs(spark, dir))

  /** WRITTEN kill tombstones only (replaced/removed docs — no derived add
    * entries), ungrouped (docId, seq). This is the read the compaction
    * TRIGGER wants: a pure-add delta kills nothing and must not drag the
    * fold forward.
    */
  private[graft] def killTombstonesDf(
      spark: SparkSession, dir: String, seqs: Seq[Int]): Option[DataFrame] =
    if (seqs.isEmpty) None
    else Some(spark.read
      .parquet(seqs.map(s => removedPath(dir, s)): _*)
      .select(col("docId"), col("seq")))

  private[graft] def killTombstonesDf(
      spark: SparkSession, dir: String): Option[DataFrame] =
    killTombstonesDf(spark, dir, listSeqs(spark, dir))

  /** Driver-collected tombstones for the WAND decode filter. Bounded by
    * compaction (min(fraction·docCount, tombstoneAbsoluteCap) triggers a
    * fold) AND by the caller's own gate ([[graft.query.IndexHandles]]
    * falls back to the distributed liveness join past
    * `graft.maxDriverTombstones`), so this stays a small working set.
    */
  def tombstoneMap(
      spark: SparkSession, dir: String, seqs: Seq[Int]): Map[Long, Int] = {
    import spark.implicits._
    tombstonesDf(spark, dir, seqs) match {
      case None => Map.empty
      case Some(t) => t.as[(Long, Int)].collect().toMap
    }
  }

  def tombstoneMap(spark: SparkSession, dir: String): Map[Long, Int] =
    tombstoneMap(spark, dir, listSeqs(spark, dir))

  private def basePostings(spark: SparkSession, dir: String): DataFrame = {
    val g = IndexBuilder.readMeta(spark, dir)("postingGroups").toInt
    spark.read.parquet((0 until g)
      .map(i => s"${IndexBuilder.postingsPath(dir)}/group=$i"): _*)
      .select("termId", "docId", "tf", "docLen")
  }

  /** Tombstone row count for a (dir, seqs) snapshot, from parquet
    * footers. Memoized per seq dir KEYED ON ITS FILE STATUSES
    * (path+length+mtime): a committed seq's `removed/` files are
    * immutable and seqs are never reused ([[nextSeq]] floors at
    * [[compactedThrough]]), so repeated view constructions over the same
    * snapshot — every postingsView/docsView during an update or
    * compaction — skip the per-file footer opens, while a
    * rebuilt-in-place dir (tests) changes the key and misses rather than
    * serving a stale count. The listStatus itself stays per-call: one
    * cheap RPC, vs a footer open per file.
    */
  private val tombRowsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  private[graft] def tombRowCount(
      spark: SparkSession, dir: String, seqs: Seq[Int]): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def rowsUnder(path: String): Long = {
      val p = new Path(path)
      val f = p.getFileSystem(hconf)
      if (!f.exists(p)) 0L
      else {
        val sts = f.listStatus(p).toSeq
          .filter(st => st.getPath.getName.endsWith(".parquet"))
        val key = sts.map(st =>
          s"${st.getPath}|${st.getLen}|${st.getModificationTime}")
          .mkString(";")
        if (tombRowsMemo.size > 1024) tombRowsMemo.clear() // rebuildable
        tombRowsMemo.getOrElseUpdate(key,
          sts.map(IndexBuilder.footerRowCount(_, hconf)).sum)
      }
    }
    // removed/ + docs/: [[tombstonesDf]] derives an add-tombstone per doc
    // row, so the liveness working set the overflow gates bound includes
    // both sides
    seqs.map(s =>
      rowsUnder(removedPath(dir, s)) +
        rowsUnder(s"${seqPath(dir, s)}/docs")).sum
  }

  /** Tombstone working-set cap for driver collects/broadcasts — THE single
    * definition shared by the query handles ([[graft.query.IndexHandles]]
    * tombOverflow) and the maintenance liveness join below.
    */
  private[graft] def maxDriverTombstones(spark: SparkSession): Long =
    spark.conf.getOption("graft.maxDriverTombstones").map(_.toLong)
      .getOrElse(10000000L)

  /** Applies the liveness rule to a frame carrying a `_seq` layer column.
    * The tombstone side is usually compaction-bounded small and broadcast —
    * but a maintenance lull under heavy churn can leave more tombstones
    * than the driver can collect (a broadcast build side IS a driver
    * collect, hard-capped at 8 GB by Spark). Gate on the same
    * `graft.maxDriverTombstones` threshold the query handles use
    * ([[graft.query.IndexHandles]] tombOverflow): the row count comes from
    * parquet FOOTERS (driver-side metadata read, no job), and past the cap
    * the hint is dropped so Spark picks a shuffled SMJ/SHJ — exactly how
    * the overflowed compaction that is supposed to CLEAR the lull must
    * read its own input.
    */
  def withLiveness(
      spark: SparkSession, dir: String, layers: DataFrame,
      seqs: Seq[Int]): DataFrame =
    tombstonesDf(spark, dir, seqs) match {
      case None => layers.drop("_seq")
      case Some(t) =>
        val cap = maxDriverTombstones(spark)
        val tombRows = tombRowCount(spark, dir, seqs)
        val side = if (tombRows > cap) t else broadcast(t)
        layers.join(side, Seq("docId"), "left")
          .filter(col("_seq") >= coalesce(col("tombSeq"), lit(0)))
          .drop("_seq", "tombSeq")
    }

  def withLiveness(
      spark: SparkSession, dir: String, layers: DataFrame): DataFrame =
    withLiveness(spark, dir, layers, listSeqs(spark, dir))

  /** Live postings across base + deltas: (termId, docId, tf, docLen). */
  def postingsView(
      spark: SparkSession, dir: String, seqs: Seq[Int]): DataFrame = {
    val base = basePostings(spark, dir)
    if (seqs.isEmpty) return base
    val cols = Seq("termId", "docId", "tf", "docLen")
    val delta = spark.read
      .parquet(seqs.map(s => s"${seqPath(dir, s)}/postings"): _*)
    withLiveness(spark, dir,
      base.withColumn("_seq", lit(0))
        .select((cols :+ "_seq").map(col): _*)
        .unionByName(delta.withColumn("_seq", col("seq").cast("int"))
          .select((cols :+ "_seq").map(col): _*)),
      seqs)
  }

  def postingsView(spark: SparkSession, dir: String): DataFrame =
    postingsView(spark, dir, listSeqs(spark, dir))

  private val docCols = Seq("docId", "url", "warc_ts", "docLen")

  /** Live docs table across base + deltas. */
  def docsView(
      spark: SparkSession, dir: String, seqs: Seq[Int]): DataFrame = {
    val base = spark.read.parquet(IndexBuilder.docsPath(dir))
      .select(docCols.map(col): _*)
    if (seqs.isEmpty) return base
    val delta = spark.read
      .parquet(seqs.map(s => s"${seqPath(dir, s)}/docs"): _*)
    withLiveness(spark, dir,
      base.withColumn("_seq", lit(0))
        .select((docCols :+ "_seq").map(col): _*)
        .unionByName(delta.withColumn("_seq", col("seq").cast("int"))
          .select((docCols :+ "_seq").map(col): _*)),
      seqs)
  }

  def docsView(spark: SparkSession, dir: String): DataFrame =
    docsView(spark, dir, listSeqs(spark, dir))

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
  def deltaBlocks(
      spark: SparkSession, dir: String, seqs: Seq[Int]): Option[DataFrame] =
    if (seqs.isEmpty) None
    else Some(spark.read
      .parquet(seqs.map(s => s"${seqPath(dir, s)}/blocks"): _*))

  def deltaBlocks(spark: SparkSession, dir: String): Option[DataFrame] =
    deltaBlocks(spark, dir, listSeqs(spark, dir))

  /** Writes one delta's DATA tables (postings + their encoded blocks +
    * doc rows). NOT visible to readers until [[commitDelta]] writes the
    * `_committed` marker; a crash in between leaves an invisible
    * half-written dir that the retry overwrites.
    */
  def writeDeltaData(
      spark: SparkSession,
      dir: String,
      seq: Int,
      postingsAdd: DataFrame,
      docsAdd: DataFrame,
      blockSize: Int,
      bucketSize: Long,
      parts: Int): Unit = {
    val p = seqPath(dir, seq)
    // a retried seq must re-commit from scratch: drop any stale marker a
    // previous successful commit of this seq could have left (can only
    // happen if a caller re-runs a committed seq, which the nextSeq
    // protocol forbids — cheap insurance against manual intervention)
    val f = fs(spark, dir)
    val m = new Path(committedMarker(dir, seq))
    if (f.exists(m)) f.delete(m, false)
    postingsAdd.select("termId", "docId", "tf", "docLen")
      .withColumn("seq", lit(seq))
      .write.mode("overwrite").parquet(s"$p/postings")
    val sorted = spark.read.parquet(s"$p/postings")
      .select(col("termId"), col("docId"),
        col("tf").cast("int").as("tf"), col("docLen").cast("int").as("docLen"))
      .repartitionByRange(parts, col("termId"), col("docId"))
      .sortWithinPartitions("termId", "docId")
      .as[Posting](org.apache.spark.sql.Encoders.product[Posting])
    sorted.mapPartitions(it => Blocks.encode(it, blockSize, bucketSize))(
        org.apache.spark.sql.Encoders.product[Schema.TermBlock])
      .withColumn("seq", lit(seq))
      .write.mode("overwrite").parquet(s"$p/blocks")
    docsAdd.select(docCols.map(col): _*)
      .withColumn("seq", lit(seq))
      .write.mode("overwrite").parquet(s"$p/docs")
  }

  /** COMMITS seq: writes the tombstone table, then — strictly after the
    * parquet job has committed — creates the `_committed` marker file
    * atomically (temp + rename). Marker existence IS commit visibility
    * ([[listSeqs]]); everything ordered after it in [[Incremental.update]]
    * (terms/stats swap, meta) is reconstructible from durable state by
    * [[Incremental.recover]].
    */
  def commitDelta(
      spark: SparkSession,
      dir: String,
      seq: Int,
      tombstones: DataFrame): Unit = { // docId column
    tombstones.select(col("docId"))
      .withColumn("seq", lit(seq))
      .write.mode("overwrite").parquet(removedPath(dir, seq))
    writeAtomicString(fs(spark, dir), committedMarker(dir, seq),
      seq.toString)
  }

  /** Marks every current delta compacted — readers ignore them from the
    * next [[listSeqs]] — and physically deletes only the dirs made
    * invisible by a PREVIOUS compaction at least `graceMs` ago: the grace
    * is measured from when a dir stopped being readable (the previous
    * marker's mtime), never from the dir's own commit time, so in-flight
    * queries whose plans captured the old file listing (the displaced-
    * handle grace in IndexHandles is 60 s) cannot have those files deleted
    * under them. Dirs compacted just now always survive to the NEXT clear
    * call (disk cost: one generation of deltas).
    */
  def clear(spark: SparkSession, dir: String, graceMs: Long = 120000L): Unit = {
    val f = fs(spark, dir)
    val p = new Path(deltasPath(dir))
    if (!f.exists(p)) return
    val all = f.listStatus(p).toSeq.filter(
      _.getPath.getName.startsWith("seq_"))
    val prevFloor = compactedThrough(spark, dir)
    val marker = new Path(compactedMarker(dir))
    val prevMarkerAgeMs: Long =
      if (f.exists(marker))
        System.currentTimeMillis() - f.getFileStatus(marker)
          .getModificationTime
      else Long.MinValue // no earlier compaction → nothing is deletable yet
    val maxSeq = (prevFloor +: all.map(
      _.getPath.getName.stripPrefix("seq_").toInt)).max
    // marker via temp + rename — an in-place overwrite has a truncated-
    // content window that would read as garbage (and the fallback-0 read,
    // while safe, would resurrect read cost)
    writeAtomicString(f, compactedMarker(dir), maxSeq.toString)
    if (prevMarkerAgeMs > graceMs)
      all.filter(_.getPath.getName.stripPrefix("seq_").toInt <= prevFloor)
        .foreach(st => f.delete(st.getPath, true))
  }
}
