package graft.query

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{Blocks, IndexBuilder}
import graft.index.Schema.TermBlock
import graft.score.Scoring

/** Distributed block-max WAND top-k (SURVEY.md Q10, north rule).
  *
  * Physical shape: candidate blocks (`termId IN (...)` pushed to parquet —
  * only the query terms' row groups are read) are shuffled once by docId
  * bucket so all terms of a docId range are co-located, then each bucket
  * runs document-at-a-time WAND with a k-heap:
  *
  *   - pivot selection over term-level upper bounds (only POSITIVE bounds
  *     drive; negative-idf terms — the reference's unclamped idf — never
  *     raise a score, so they are excluded from bounds but still scored
  *     exactly at candidates);
  *   - whole blocks are skipped without decoding when advancing;
  *   - admitted candidates get EXACT scores summed in termId order, so
  *     results are bit-identical to the naive join-aggregate scorer (and
  *     the oracle) — pruning is bound-safe by construction.
  *
  * The per-bucket partial top-k (≤ k rows per bucket) is then reduced to
  * the global top-k. The bucket heap starts empty (θ warms up per bucket),
  * which costs pruning, not correctness.
  */
object Wand {

  /** Upper bound of one term's contribution for ANY doc in a block.
    * partial(tf, dl) is increasing in tf, decreasing in dl ⇒
    * ub = w·idf·partial(maxTf, minDl) for idf ≥ 0, w·idf·partial(minTf,
    * maxDl) for idf < 0 (≤ 0 then).
    */
  private def blockUpperBound(
      b: TermBlock,
      weight: Float,
      idf: Float,
      avgdl: Float,
      method: Search.Method,
      p: Scoring.Params): Float = {
    def partial(tf: Float, dl: Float): Float = method match {
      case Search.Bm25 =>
        Scoring.bm25Contrib(tf, dl, avgdl, idf, weight, p)
      case Search.Tfidf =>
        Scoring.tfidfContrib(tf, dl, idf, weight)
    }
    if (idf >= 0.0f) partial(b.maxTf.toFloat, b.minDocLen.toFloat)
    else partial(b.minTf.toFloat, b.maxDocLen.toFloat)
  }

  private final class Cursor(
      val termId: Long,
      val weight: Float,
      val idf: Float,
      blocksIn: Array[TermBlock],
      avgdl: Float,
      method: Search.Method,
      p: Scoring.Params) {
    // per-term blocks ordered by minDocId (ranges are disjoint)
    private val blocks = blocksIn.sortBy(_.minDocId)
    val termUb: Float = {
      var m = 0.0f
      blocks.foreach { b =>
        val u = blockUpperBound(b, weight, idf, avgdl, method, p)
        if (u > m) m = u
      }
      m // max(0, bounds): negative-idf terms never drive
    }
    private var bi = 0
    private var pos = 0
    private var dec: Blocks.Decoded = null
    var curDoc: Long = Long.MaxValue
    positionAtBlockStart()

    private def positionAtBlockStart(): Unit = {
      dec = null
      pos = 0
      curDoc = if (bi < blocks.length) blocks(bi).minDocId else Long.MaxValue
    }

    private def ensureDecoded(): Unit = {
      if (dec == null && bi < blocks.length) {
        dec = Blocks.decode(blocks(bi))
        // pos stays; curDoc == dec.docIds(pos) holds at block start
      }
    }

    /** Advance to the first docId ≥ target; skips whole blocks without
      * decoding them.
      */
    def advanceTo(target: Long): Unit = {
      if (curDoc >= target) return
      // skip whole blocks
      while (bi < blocks.length && blocks(bi).maxDocId < target) {
        bi += 1
        positionAtBlockStart()
      }
      if (bi >= blocks.length) { curDoc = Long.MaxValue; return }
      if (blocks(bi).minDocId >= target) {
        // fresh block starting at/after target (positionAtBlockStart already
        // set curDoc = minDocId, dec = null) — no decode needed yet
        return
      }
      ensureDecoded()
      while (pos < dec.docIds.length && dec.docIds(pos) < target) pos += 1
      if (pos >= dec.docIds.length) {
        bi += 1
        positionAtBlockStart()
        advanceTo(target)
      } else curDoc = dec.docIds(pos)
    }

    /** Exact contribution for curDoc (must be positioned on a real doc). */
    def contribAtCur(): Float = {
      ensureDecoded()
      // after a no-decode advance, pos may still be 0 at block start — the
      // decode above makes dec.docIds(pos) == curDoc hold
      val tf = dec.tfs(pos).toFloat
      val dl = dec.docLens(pos).toFloat
      method match {
        case Search.Bm25 => Scoring.bm25Contrib(tf, dl, avgdl, idf, weight, p)
        case Search.Tfidf => Scoring.tfidfContrib(tf, dl, idf, weight)
      }
    }

    def step(): Unit = { // move past curDoc
      ensureDecoded()
      pos += 1
      if (pos >= dec.docIds.length) {
        bi += 1
        positionAtBlockStart()
      } else curDoc = dec.docIds(pos)
    }
  }

  /** (score desc, docId asc)-top-k heap; head = worst kept entry. */
  private val worstFirst: Ordering[(Float, Long)] =
    new Ordering[(Float, Long)] {
      def compare(a: (Float, Long), b: (Float, Long)): Int = {
        val c = java.lang.Float.compare(b._1, a._1) // smaller score = worse
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger docId = worse
      }
    }

  /** Run WAND over one bucket's blocks. Emits ≤ k (docId, score) rows. */
  def wandBucket(
      blocks: Iterator[TermBlock],
      termInfo: Map[Long, (Float, Float)], // termId → (weight, idf)
      avgdl: Float,
      method: Search.Method,
      k: Int,
      p: Scoring.Params): Iterator[(Long, Float)] = {
    val byTerm = blocks.toArray.groupBy(_.termId)
    val cursors: Array[Cursor] = byTerm.toArray
      .sortBy(_._1) // termId asc — fixed order for deterministic sums
      .map { case (termId, bs) =>
        val (w, idf) = termInfo(termId)
        new Cursor(termId, w, idf, bs, avgdl, method, p)
      }
    val heap = mutable.PriorityQueue.empty[(Float, Long)](worstFirst)

    def theta: Float =
      if (heap.size >= k) heap.head._1 else Float.NegativeInfinity

    var done = false
    while (!done) {
      val live = cursors.filter(_.curDoc != Long.MaxValue)
      if (live.isEmpty) done = true
      else {
        val sorted = live.sortBy(_.curDoc)
        // pivot: minimal prefix whose positive term-ub sum reaches θ
        var acc = 0.0f
        var pivotIdx = -1
        var i = 0
        val th = theta
        while (pivotIdx < 0 && i < sorted.length) {
          acc += sorted(i).termUb
          if (acc >= th) pivotIdx = i
          i += 1
        }
        if (pivotIdx < 0) done = true // even all ubs can't reach θ
        else {
          val pivotDoc = sorted(pivotIdx).curDoc
          if (sorted(0).curDoc == pivotDoc) {
            // fully aligned: exact score in termId order (cursors array
            // is already termId-sorted)
            var s = 0.0f
            cursors.foreach { c =>
              if (c.curDoc == pivotDoc) s += c.contribAtCur()
            }
            val cand = (s, pivotDoc)
            if (heap.size < k) heap.enqueue(cand)
            else if (worstFirst.compare(cand, heap.head) < 0) {
              // beats the current worst under (score desc, docId asc)
              heap.dequeue()
              heap.enqueue(cand)
            }
            cursors.foreach { c =>
              if (c.curDoc == pivotDoc) c.step()
            }
          } else {
            // advance the earliest cursor up to the pivot
            sorted(0).advanceTo(pivotDoc)
          }
        }
      }
    }
    heap.iterator.map { case (score, docId) => (docId, score) }
  }

  /** Distributed top-k: filter candidate blocks, shuffle by bucket, run
    * per-bucket WAND, reduce to global k. Returns (docId, score).
    */
  def topK(
      spark: SparkSession,
      h: IndexHandles,
      qp: Search.QueryPlan,
      method: Search.Method,
      k: Int,
      params: Scoring.Params = Scoring.Params()): DataFrame = {
    import spark.implicits._
    if (qp.terms.isEmpty || (method == Search.Bm25 && qp.avgdl == 0.0f))
      return spark.emptyDataset[(Long, Float)].toDF("docId", "score")

    val termInfo: Map[Long, (Float, Float)] =
      qp.terms.map(t => t.termId -> (t.weight, t.idf)).toMap
    val bInfo = spark.sparkContext.broadcast(termInfo)
    val avgdl = qp.avgdl
    val m = method
    val kk = k
    val p = params

    val blocks = h.blocksFor(qp.terms.map(_.termId))
      .drop("group")
      .as[TermBlock]

    val partials =
      if (qp.terms.size == 1)
        // single term: every docId lives in exactly one block, and all
        // blocks belong to the one cursor — per-PARTITION top-k needs no
        // bucket co-location, so skip the shuffle entirely (1 Spark job)
        blocks.mapPartitions { it =>
          wandBucket(it, bInfo.value, avgdl, m, kk, p)
        }
      else
        blocks
          .groupByKey(_.bucket)
          .flatMapGroups { (_, it) =>
            wandBucket(it, bInfo.value, avgdl, m, kk, p)
          }

    partials
      .toDF("docId", "score")
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
  }
}
