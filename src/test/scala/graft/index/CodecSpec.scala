package graft.index

import org.scalatest.funsuite.AnyFunSuite

import Schema.Posting

class CodecSpec extends AnyFunSuite {

  test("varint round-trips longs including boundaries") {
    val vals = Array(0L, 1L, 127L, 128L, 300L, 16383L, 16384L,
      Int.MaxValue.toLong, Long.MaxValue / 2)
    val out = new java.io.ByteArrayOutputStream()
    vals.foreach(Codec.writeVarLong(out, _))
    val r = new Codec.VarIntReader(out.toByteArray)
    vals.foreach(v => assert(r.next() == v))
    assert(!r.hasNext)
  }

  test("delta codec round-trips sorted arrays (100 random cases)") {
    val rnd = new scala.util.Random(42)
    (0 until 100).foreach { _ =>
      val n = rnd.nextInt(300)
      val sorted = Array.fill(n)(rnd.nextLong(1L << 40)).sorted
      val dec = Codec.decodeDeltas(Codec.encodeDeltas(sorted), n)
      assert(dec.sameElements(sorted))
    }
  }

  test("int codec round-trips (100 random cases)") {
    val rnd = new scala.util.Random(43)
    (0 until 100).foreach { _ =>
      val n = rnd.nextInt(300)
      val a = Array.fill(n)(rnd.nextInt(Int.MaxValue))
      assert(Codec.decodeInts(Codec.encodeInts(a, n), n).sameElements(a))
    }
  }

  test("block encoder: round-trip, block-max metadata, bucket/size cuts") {
    val rnd = new scala.util.Random(7)
    // 3 terms, skewed list sizes, docIds sorted per term
    val postings = (0 until 3).flatMap { t =>
      val n = Seq(5, 400, 37)(t)
      var doc = 0L
      (0 until n).map { _ =>
        doc += 1 + rnd.nextInt(9)
        Posting(t.toLong, doc, 1 + rnd.nextInt(5), 10 + rnd.nextInt(90))
      }
    }
    val blockSize = 64
    val bucketSize = 512L
    val blocks = Blocks.encode(postings.iterator, blockSize, bucketSize)
      .toVector

    // decode all blocks → identical posting stream
    val decoded = blocks.flatMap { b =>
      val d = Blocks.decode(b)
      (0 until b.n).map(i =>
        Posting(b.termId, d.docIds(i), d.tfs(i), d.docLens(i)))
    }
    assert(decoded == postings.toVector)

    blocks.foreach { b =>
      val d = Blocks.decode(b)
      assert(b.n <= blockSize)
      assert(b.minDocId == d.docIds.head && b.maxDocId == d.docIds.last)
      assert(b.minTf == d.tfs.min && b.maxTf == d.tfs.max)
      assert(b.minDocLen == d.docLens.min && b.maxDocLen == d.docLens.max)
      // block fully inside one bucket
      assert(b.minDocId / bucketSize == b.maxDocId / bucketSize)
      assert(b.bucket == (b.minDocId / bucketSize).toInt)
      // strictly increasing docIds
      assert(d.docIds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    }
  }
}
