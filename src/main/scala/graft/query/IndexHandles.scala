package graft.query

import scala.collection.concurrent.TrieMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.index.{DeltaLog, IndexBuilder}
import graft.index.Schema.Stats

/** Hot query-side state of one index: meta + stats are collected once;
  * the dictionary and docs tables are persisted in memory (they're the
  * per-query serving working set — on a cluster these are the natural
  * executor-cache residents, while postings/blocks stay on storage and are
  * read group-pruned per query). Merge-on-read deltas ([[DeltaLog]]) are
  * snapshotted at handle construction: the delta frames, and the tombstone
  * map the WAND decode filter needs, are loaded once per index version
  * (meta.deltaSeq changes per update, so the meta-validated cache swaps
  * handles on every commit).
  */
final class IndexHandles private (
    val spark: SparkSession,
    val indexDir: String) {

  val meta: Map[String, String] = IndexBuilder.readMeta(spark, indexDir)
  val postingGroups: Int = meta("postingGroups").toInt

  /** The ONE delta-seq listing this handle is built from: every derived
    * frame (tombstones, docs view, delta blocks, postingsFor layers) is
    * passed this snapshot explicitly, so a delta commit landing while the
    * handle is constructed can never pair seq-N data files with a
    * tombstone set missing seq N (which would score a replaced doc from
    * both its old and new layers until the next handle swap).
    */
  val deltaSeqs: Seq[Int] = DeltaLog.listSeqs(spark, indexDir)

  /** Tombstone ROW count across the snapshot's deltas, summed from parquet
    * footers — no Spark job (shared, status-keyed-memoized implementation
    * in [[DeltaLog.tombRowCount]]). Upper-bounds the distinct-docId
    * tombstone working set, so it gates the driver collect below.
    */
  val tombRows: Long =
    if (deltaSeqs.isEmpty) 0L
    else DeltaLog.tombRowCount(spark, indexDir, deltaSeqs)

  /** True when the tombstone working set is too large to collect to the
    * driver (`graft.maxDriverTombstones`, default 10M ≈ 120 MB of map
    * entries). Compaction normally folds deltas long before this
    * (min(fraction·docCount, tombstoneAbsoluteCap) trigger), but a
    * maintenance lull under heavy churn must DEGRADE to the distributed
    * liveness join, not OOM the driver: [[Wand.topKArray]] skips the
    * driver-local path and co-partitions tombstones with blocks by docId
    * bucket; [[postingsFor]] joins the tombstone frame without a
    * broadcast hint.
    */
  val tombOverflow: Boolean =
    tombRows > DeltaLog.maxDriverTombstones(spark)

  /** docId → latest tombstone seq; a row from layer r is live iff
    * r >= tombSeq(docId). Compaction-bounded small; empty on fresh builds
    * AND under [[tombOverflow]] (the distributed path takes over).
    */
  val tombMap: Map[Long, Int] =
    if (deltaSeqs.isEmpty || tombOverflow) Map.empty
    else DeltaLog.tombstoneMap(spark, indexDir, deltaSeqs)

  /** Snapshot tombstone frame: rebuilt from the collected map when small
    * (broadcast-joined), read straight from the snapshot's parquet when
    * overflowed (regular join — Spark picks SMJ/SHJ).
    */
  private[query] val tombDf: Option[DataFrame] =
    if (deltaSeqs.isEmpty) None
    else if (tombOverflow) DeltaLog.tombstonesDf(spark, indexDir, deltaSeqs)
    else if (tombMap.isEmpty) None
    else {
      import spark.implicits._
      Some(tombMap.toSeq.toDF("docId", "tombSeq"))
    }

  /** Handle-scoped broadcast of [[tombMap]] for the distributed WAND path.
    * The map is immutable per index version, so a per-QUERY
    * `sparkContext.broadcast` re-serialized and re-shipped up to
    * `graft.maxDriverTombstones` entries (~120 MB) on every distributed
    * query and left a broadcast block behind until the ContextCleaner
    * caught up. Built lazily — the warm driver-local path never touches
    * it — and executor copies are dropped on [[release]].
    */
  @volatile private var bTombV: Broadcast[Map[Long, Int]] = null
  private[query] def bTombMap: Broadcast[Map[Long, Int]] = {
    var b = bTombV
    if (b == null) synchronized {
      b = bTombV
      if (b == null) {
        b = spark.sparkContext.broadcast(tombMap)
        bTombV = b
      }
    }
    b
  }

  val stats: Stats = {
    import spark.implicits._
    spark.read.parquet(IndexBuilder.statsPath(indexDir)).as[Stats].head()
  }

  // cached partition counts sized to the data (~1M rows per cached
  // partition), not to the writer's partitioning — a small dictionary must
  // not cost 64 scheduler rounds per query
  private def parts(rows: Long): Int =
    math.max(1, math.min(256, (rows / 1000000L).toInt + 1))

  /** Version salt on every frame this handle PERSISTS. Spark's
    * CacheManager substitutes cached data by canonicalized-plan equality,
    * and `InMemoryFileIndex.equals` compares ROOT PATHS only — file
    * contents and listings don't participate. Without the salt, the handle
    * created after an incremental commit builds byte-identical plans over
    * the same paths and silently RE-ATTACHES to the displaced handle's
    * still-cached (stale — it has a 60 s release grace) tables: a
    * freshly-committed doc then doesn't exist for queries until the grace
    * expires (caught by ServeSpec's freshness test). The salt is a
    * constant-true filter on a literal derived from this index VERSION, so
    * same-version handles still share cache while cross-version plans can
    * never canonicalize equal. meta includes wallMs + deltaSeq, so every
    * rebuild and every commit changes it.
    */
  private val versionSalt: Int =
    scala.util.hashing.MurmurHash3.unorderedHash(meta)
  private def salted(df: DataFrame): DataFrame =
    df.filter(lit(versionSalt) === lit(versionSalt))

  private val maxDriverDictTerms: Long = spark.conf
    .getOption("graft.maxDriverDictTerms").map(_.toLong)
    .getOrElse(1000000L)

  val terms: DataFrame = {
    val rows = meta("termCount").toLong
    // partition sizing depends on WHO scans this cache: a driver-collected
    // dictionary only pays the one collect (few fat partitions are
    // cheapest), but a BIG dictionary is scanned per query by the
    // CPU-bound fuzzy-expansion flatMap — there the row-count heuristic
    // alone left a 1.2M-term dictionary in 2 partitions, running the
    // Levenshtein scan on 2 of 32 cores (measured 710 ms p50; 32-way
    // parallelism cut it ~5×). Size to the session's parallelism so every
    // core works the scan.
    val raw = spark.read.parquet(IndexBuilder.termsPath(indexDir))
    val sized =
      if (rows <= maxDriverDictTerms) raw.coalesce(parts(rows))
      else {
        val p = math.max(spark.sparkContext.defaultParallelism, parts(rows))
        // one shuffle at handle construction (not per query), range-keyed
        // on (tlen, term) so the cached batches KEEP the byte-length
        // clustering the expansion prefilters prune on; coalesce cannot
        // raise the count above the writer's ~16 files
        if (raw.columns.contains("tlen"))
          raw.repartitionByRange(p, col("tlen"), col("term"))
        else raw.repartition(p)
      }
    salted(sized).persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Driver-local dictionary when it's small enough (default ≤ 1M terms,
    * tens of MB): query expansion then runs as a local loop — ZERO Spark
    * jobs to plan a query. Big dictionaries keep the distributed scan.
    * Tunable via session conf `graft.maxDriverDictTerms` (0 disables).
    */
  val driverDict: Option[Array[graft.index.Schema.TermEntry]] =
    if (meta("termCount").toLong <= maxDriverDictTerms) {
      import spark.implicits._
      Some(terms.as[graft.index.Schema.TermEntry].collect())
    } else None

  /** Live (docId, url) liveness-filtered across base + deltas. The
    * projection is the per-query serving working set, but it grows with the
    * corpus — above ~50M docs (≈ a few GB) it must not compete with
    * execution memory, so pin it to disk-backed storage only.
    */
  val docs: DataFrame = {
    val base = spark.read
      .parquet(IndexBuilder.docsPath(indexDir))
    val live =
      if (deltaSeqs.isEmpty) base.select("docId", "url")
      else DeltaLog.docsView(spark, indexDir, deltaSeqs)
        .select("docId", "url")
    salted(live.coalesce(parts(meta("docCount").toLong)))
      .persist(
        if (meta("docCount").toLong <= 50000000L)
          StorageLevel.MEMORY_AND_DISK
        else StorageLevel.DISK_ONLY)
  }

  // reader frames built ONCE per handle: re-creating them per query would
  // redo file listing + footer/schema reads (hundreds of ms of per-query
  // latency); the lazy plans + their FileIndex are reused by every filter.
  // The BASE blocks frame is additionally persisted when the index is small
  // enough (conf graft.maxCachedBlockPostings, default 200M postings ≈ a
  // few hundred MB encoded): per-query latency is then bounded by compute,
  // not re-scanning parquet. On a cluster this is the executor block cache;
  // at 10^12 docs the gate keeps blocks on storage where they belong.
  private val cacheBlocks: Boolean = {
    val maxPostings = spark.conf
      .getOption("graft.maxCachedBlockPostings").map(_.toLong)
      .getOrElse(200000000L)
    meta("postingCount").toLong <= maxPostings
  }
  // cached blocks get ~8M postings (≈ 25-30 MB encoded) per partition: the
  // writer's 64 file-partitions would cost a 64-task scheduling round per
  // query, which dominates p50 at small candidate sets
  private def blockParts(postings: Long): Int =
    math.max(1, math.min(64, (postings / 8000000L).toInt + 1))
  private val blocksDf: DataFrame = {
    val df = spark.read.parquet(IndexBuilder.blocksPath(indexDir))
    if (cacheBlocks)
      salted(df.coalesce(blockParts(meta("postingCount").toLong)))
        .persist(StorageLevel.MEMORY_AND_DISK)
    else df
  }
  private val postingsDf: DataFrame =
    spark.read.parquet(IndexBuilder.postingsPath(indexDir))
  private val deltaBlocksDf: Option[DataFrame] =
    DeltaLog.deltaBlocks(spark, indexDir, deltaSeqs)
      .map(df => if (cacheBlocks)
        salted(df.coalesce(1)).persist(StorageLevel.MEMORY_AND_DISK)
      else df)

  /** Candidate blocks across base + delta layers, with a `_seq` layer
    * column (base = 0). Base is group- and termId-pruned at the parquet
    * layer; delta layers (small) are termId-pruned. Tombstones are NOT
    * applied here — the WAND decode filter handles per-row liveness using
    * [[tombMap]] (block-max bounds stay safe upper bounds under deletes).
    */
  def blocksFor(termIds: Seq[Long]): DataFrame = {
    val base = pruned(blocksDf, termIds)
      .drop("group").withColumn("_seq", lit(0))
    deltaBlocksDf match {
      case None => base
      case Some(d) =>
        val delta = d.filter(col("termId").isin(termIds: _*))
          .withColumn("_seq", col("seq").cast("int")).drop("seq")
        base.unionByName(delta)
    }
  }

  /** Serving-node block cache: collected candidate blocks per termId, for
    * the driver-local WAND path. The reference engine holds its ENTIRE
    * index in process memory; the rebuild's analog is this bounded hot-term
    * cache — repeat terms skip the Spark collect entirely (0 jobs), cold
    * terms pay one pruned scan. Capacity is bounded in POSTINGS
    * (`graft.driverBlockCachePostings`, default 8M ≈ ~30 MB encoded);
    * inserts past the cap evict oldest-first. Per-handle, so every index
    * version (delta commit / rebuild) starts clean.
    */
  private val blockCacheCap: Long = spark.conf
    .getOption("graft.driverBlockCachePostings").map(_.toLong)
    .getOrElse(8000000L)
  private val blockCache =
    TrieMap.empty[Long, Array[(Int, graft.index.Schema.TermBlock)]]
  private val blockCacheOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  private val blockCachePostings =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Layered candidate blocks of `termIds`, collected (driver-local WAND
    * input), served from the bounded hot-term cache where possible.
    */
  def candidateBlocks(
      termIds: Seq[Long]): Array[(Int, graft.index.Schema.TermBlock)] = {
    import spark.implicits._
    // read hit ARRAYS first, not just membership: an eviction between a
    // contains() check and the later read (by this query's own insert
    // pass, or any concurrent query) would silently drop a term's blocks
    // from the query — a wrong-top-k bug, not a slow path
    val hitArrays: Map[Long, Array[(Int, graft.index.Schema.TermBlock)]] =
      termIds.iterator.flatMap(t => blockCache.get(t).map(t -> _)).toMap
    val misses = termIds.filterNot(hitArrays.contains)
    val fetched: Array[(Int, graft.index.Schema.TermBlock)] =
      if (misses.isEmpty) Array.empty
      else blocksFor(misses)
        .select(col("_seq").cast("int").as("_1"),
          struct(col("termId"), col("bucket"), col("minDocId"),
            col("maxDocId"), col("n"), col("minTf"), col("maxTf"),
            col("minDocLen"), col("maxDocLen"), col("docIdsDelta"),
            col("tfs"), col("docLens")).as("_2"))
        .as[(Int, graft.index.Schema.TermBlock)]
        .collect()
    if (misses.nonEmpty) {
      val byTerm = fetched.groupBy(_._2.termId)
      misses.foreach { t =>
        val bs = byTerm.getOrElse(t, Array.empty)
        // putIfAbsent: a concurrent query may have inserted t already —
        // counting both inserts would inflate the postings counter
        // forever (evictions subtract each term once), silently shrinking
        // the effective cache toward zero
        if (blockCache.putIfAbsent(t, bs).isEmpty) {
          blockCachePostings.addAndGet(bs.iterator.map(_._2.n.toLong).sum)
          blockCacheOrder.add(t)
        }
      }
      while (blockCachePostings.get() > blockCacheCap &&
          !blockCacheOrder.isEmpty) {
        val old = blockCacheOrder.poll()
        blockCache.remove(old).foreach(bs =>
          blockCachePostings.addAndGet(-bs.iterator.map(_._2.n.toLong).sum))
      }
    }
    termIds.iterator.flatMap(t => hitArrays.getOrElse(t, Array.empty))
      .toArray ++ fetched
  }

  /** Bounded docId → url cache for result attachment: top-k ids repeat
    * heavily across queries, so the warm serving path needs zero Spark
    * jobs. Cap ~100k entries (a few MB of urls); cleared with the handle.
    */
  private val urlCache = TrieMap.empty[Long, String]

  def urlsFor(docIds: Seq[Long]): Map[Long, String] = {
    import spark.implicits._
    val misses = docIds.filterNot(urlCache.contains)
    if (misses.nonEmpty) {
      val fetched = docs
        .filter(col("docId").isin(misses: _*))
        .as[(Long, String)]
        .collect()
      if (urlCache.size + fetched.length <= 100000)
        fetched.foreach { case (id, u) => urlCache.put(id, u) }
      return docIds.iterator
        .flatMap(id => urlCache.get(id).orElse(
          fetched.collectFirst { case (i, u) if i == id => u })
          .map(id -> _))
        .toMap
    }
    docIds.iterator.flatMap(id => urlCache.get(id).map(id -> _)).toMap
  }

  /** Live candidate postings (liveness applied): the naive-scorer input.
    *
    * Deliberately NOT DeltaLog.withLiveness: that re-reads tombstones from
    * disk per call, while a handle must apply the liveness rule with the
    * SAME (deltaSeqs, tombDf) snapshot it was created with — otherwise a
    * concurrent commit could pair new tombstones with an old layer list
    * mid-query. Keep the rule itself (`_seq >= coalesce(tombSeq, 0)`)
    * textually identical to DeltaLog.withLiveness when touching either.
    */
  def postingsFor(termIds: Seq[Long]): DataFrame = {
    val cols = Seq("termId", "docId", "tf", "docLen")
    val base = pruned(postingsDf, termIds)
    if (deltaSeqs.isEmpty) return base.select(cols.map(col): _*)
    val deltaAll = spark.read.parquet(
      deltaSeqs.map(s => s"${DeltaLog.seqPath(indexDir, s)}/postings"): _*)
    val delta = deltaAll.filter(col("termId").isin(termIds: _*))
    val layered = base.withColumn("_seq", lit(0))
      .select((cols :+ "_seq").map(col): _*)
      .unionByName(delta.withColumn("_seq", col("seq").cast("int"))
        .select((cols :+ "_seq").map(col): _*))
    tombDf match {
      case None => layered.drop("_seq")
      case Some(t) =>
        // broadcast only the collected (bounded) map frame; an overflowed
        // tombstone set stays a distributed join — broadcasting it would
        // recreate the very driver/executor-memory problem the overflow
        // gate exists to avoid
        val side = if (tombOverflow) t else broadcast(t)
        layered.join(side, Seq("docId"), "left")
          .filter(col("_seq") >= coalesce(col("tombSeq"), lit(0)))
          .select(cols.map(col): _*)
    }
  }

  private def pruned(base: DataFrame, termIds: Seq[Long]): DataFrame = {
    val groups = termIds.map(_ % postingGroups).distinct
    base
      .filter(col("group").isin(groups: _*))
      .filter(col("termId").isin(termIds: _*))
  }

  def release(): Unit = {
    terms.unpersist()
    docs.unpersist()
    if (cacheBlocks) {
      blocksDf.unpersist()
      deltaBlocksDf.foreach(_.unpersist())
    }
    // unpersist (not destroy): an in-flight query past the displacement
    // grace can still re-fetch from the driver copy; executor memory is
    // what must not accumulate across versions
    val b = bTombV
    if (b != null) b.unpersist(false)
  }
}

object IndexHandles {
  private val cache = TrieMap.empty[String, IndexHandles]
  private val locks = TrieMap.empty[String, Object]

  // deferred unpersist of displaced handles: an in-flight query may still
  // hold the old handle's cached tables; releasing after a grace period
  // avoids recompute-latency spikes without keeping blocks forever
  private lazy val reaper =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-handle-reaper")
        t.setDaemon(true)
        t
      })

  // displaced handles wait out the full 60 s grace before their caches
  // are released (in-flight queries may still hold them — releasing early
  // un-persists tables whose backing files a swap has since replaced).
  // The waiting set is BOUNDED per dir: past 8 generations (pathological
  // commit rates) the oldest is force-released, trading its stragglers'
  // recompute risk for bounded executor storage — at normal rates nothing
  // is ever released before its grace elapses.
  private val pendingRelease = TrieMap
    .empty[String, scala.collection.mutable.ArrayDeque[IndexHandles]]

  private def deferRelease(dir: String, h: IndexHandles): Unit = {
    def releaseQuietly(x: IndexHandles): Unit =
      try x.release()
      catch { case _: Throwable => () } // session may already be stopped
    val q = pendingRelease.getOrElseUpdate(
      dir, scala.collection.mutable.ArrayDeque.empty)
    q.synchronized {
      q.append(h)
      while (q.size > 8) releaseQuietly(q.removeHead())
    }
    reaper.schedule(new Runnable {
      def run(): Unit = {
        val stillPending = q.synchronized {
          val i = q.indexOf(h)
          if (i >= 0) { q.remove(i); true } else false
        }
        if (stillPending) releaseQuietly(h)
      }
    }, 60, java.util.concurrent.TimeUnit.SECONDS)
  }

  /** Cached handle, validated against the CURRENT meta.json: any rebuild or
    * delta commit (deltaSeq/wallMs make every index version's meta
    * distinct) drops the stale cached tables. Swaps happen under a
    * per-indexDir lock so concurrent callers (Serve + streaming
    * foreachBatch) can't double-create handles; the displaced handle is
    * released on a delay (queries already running against it stay correct
    * either way — unpersisted tables recompute). Cost per call: one
    * small-file read.
    */
  def apply(spark: SparkSession, indexDir: String): IndexHandles = {
    val lock = locks.getOrElseUpdate(indexDir, new Object)
    lock.synchronized {
      val cur = IndexBuilder.readMeta(spark, indexDir)
      cache.get(indexDir) match {
        case Some(h) if h.meta == cur => h
        case stale =>
          val h = new IndexHandles(spark, indexDir)
          cache.put(indexDir, h)
          stale.foreach(deferRelease(indexDir, _))
          h
      }
    }
  }

  /** Drop cached state (call after incremental updates rewrite tables). */
  def invalidate(indexDir: String): Unit =
    cache.remove(indexDir).foreach(deferRelease(indexDir, _))
}
