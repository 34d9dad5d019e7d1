package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded serving-style result cache for the pipeline operators whose
  * plans persist corpus-sized intermediates (LSH groups/membership,
  * minhash/simhash/hyperplane signatures).
  *
  * Each operator keeps exactly ONE live cache set — the frames of its most
  * recent (input, params) key — so repeated calls on the same input
  * re-attach to the cached plans (Spark's CacheManager matches
  * canonicalized plans, so the fresh `persist()` calls are no-ops and the
  * recompute is skipped: serving-cache semantics, like the index handles),
  * while a call with a DIFFERENT key swaps the previous set out. Bounded:
  * at most one input's frames per operator, MEMORY_AND_DISK — neither the
  * per-call leak the round-2 code had, nor a forced cold recompute per
  * call.
  */
private[ops] object LiveResultCache {

  private final case class Entry(inputKey: String, frames: Seq[DataFrame])
  private val live =
    scala.collection.concurrent.TrieMap.empty[String, Entry]
  // getOrCompute serializes per op: without it two concurrent misses both
  // build corpus-sized frame sets, and the loser's same-key finish() would
  // skip unpersisting the winner's set — a permanent cache leak
  private val opLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Order-independent fingerprint of every data file under `path`
    * (name × length × mtime, recursive) — O(listing), no data read.
    * Callers fold it into their `inputKey` so a REWRITTEN input at the
    * same path is a cache MISS, not a stale hit: (path, params) keying
    * alone would keep serving the old memoized frame after the parquet
    * underneath changed (safe for the driver harness's immutable testdata,
    * wrong for Serve / any long-lived session sharing this JVM).
    */
  def fingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val it = fs.listFiles(p, true)
    var acc = 0L
    var n = 0L
    while (it.hasNext) {
      val st = it.next()
      var h = st.getPath.getName.hashCode.toLong
      h = h * 1000003L + st.getLen
      h = h * 1000003L + st.getModificationTime
      acc ^= h * -7046029254386353131L // order-independent mix
      n += 1
    }
    s"$n:${java.lang.Long.toHexString(acc)}"
  }

  /** Returns the op's memoized result DataFrame when the key matches the
    * live entry — same object, so actions read the existing cached blocks
    * even when the plan contains per-call closures/broadcasts that defeat
    * canonicalized-plan matching (e.g. the ANN signature flatMap). On a
    * miss, runs `build` and records its output via [[finish]]. Callers
    * key on (path, [[fingerprint]], params), so both a different input
    * and a rewritten same-path input miss.
    */
  def getOrCompute(op: String, inputKey: String)(
      build: => (DataFrame, Seq[DataFrame])): DataFrame =
    opLocks.getOrElseUpdate(op, new Object).synchronized {
      live.get(op) match {
        case Some(e) if e.inputKey == inputKey => e.frames.last
        case _ =>
          val (result, intermediates) = build
          finish(op, inputKey, result, intermediates)
      }
    }

  /** Persists + eagerly materializes `result` (while the intermediates are
    * still cached), then records (result ∪ intermediates) as the op's one
    * live set, dropping a previous set only if its key differs.
    */
  def finish(
      op: String,
      inputKey: String,
      result: DataFrame,
      intermediates: Seq[DataFrame]): DataFrame = {
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    val keep = intermediates.filter(_ != null) :+ out
    live.put(op, Entry(inputKey, keep)) match {
      case Some(prev) if prev.inputKey != inputKey =>
        // different input/params: the previous plans are distinct cache
        // entries — drop them. (Same key ⇒ `keep` re-attached to the SAME
        // entries; unpersisting prev would evict what was just reused.)
        prev.frames.foreach(_.unpersist(false))
      case _ => ()
    }
    out
  }
}
