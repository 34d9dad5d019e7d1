package graft.index

import scala.collection.mutable.ArrayBuffer

import Schema.{Posting, TermBlock}

/** Posting-block construction (SURVEY.md A8): groups runs of ≤ blockSize
  * postings of one term from a (termId, docId)-sorted stream into
  * delta+varint-compressed [[TermBlock]]s with block-max metadata. Blocks
  * are additionally cut at docId-bucket boundaries so each block lies fully
  * inside one bucket — the query engine aligns different terms' blocks by
  * bucket for document-at-a-time WAND without decoding.
  */
object Blocks {

  val DefaultBlockSize = 128

  def encode(
      postings: Iterator[Posting],
      blockSize: Int,
      bucketSize: Long): Iterator[TermBlock] = new Iterator[TermBlock] {
    private val it = postings.buffered
    def hasNext: Boolean = it.hasNext

    def next(): TermBlock = {
      val first = it.head
      val termId = first.termId
      val bucket = first.docId / bucketSize
      val docIds = new ArrayBuffer[Long](blockSize)
      val tfs = new Array[Int](blockSize)
      val dls = new Array[Int](blockSize)
      var n = 0
      var minTf = Int.MaxValue
      var maxTf = 0
      var minDl = Int.MaxValue
      var maxDl = 0
      while (n < blockSize && it.hasNext && it.head.termId == termId &&
          it.head.docId / bucketSize == bucket) {
        val p = it.next()
        docIds += p.docId
        tfs(n) = p.tf
        dls(n) = p.docLen
        if (p.tf < minTf) minTf = p.tf
        if (p.tf > maxTf) maxTf = p.tf
        if (p.docLen < minDl) minDl = p.docLen
        if (p.docLen > maxDl) maxDl = p.docLen
        n += 1
      }
      val ids = docIds.toArray
      TermBlock(
        termId = termId,
        bucket = bucket.toInt,
        minDocId = ids(0),
        maxDocId = ids(n - 1),
        n = n,
        minTf = minTf,
        maxTf = maxTf,
        minDocLen = minDl,
        maxDocLen = maxDl,
        docIdsDelta = Codec.encodeDeltas(ids),
        tfs = Codec.encodeInts(tfs, n),
        docLens = Codec.encodeInts(dls, n))
    }
  }

  /** Decoded view of one block. */
  final case class Decoded(
      docIds: Array[Long],
      tfs: Array[Int],
      docLens: Array[Int])

  def decode(b: TermBlock): Decoded =
    Decoded(
      Codec.decodeDeltas(b.docIdsDelta, b.n),
      Codec.decodeInts(b.tfs, b.n),
      Codec.decodeInts(b.docLens, b.n))
}
