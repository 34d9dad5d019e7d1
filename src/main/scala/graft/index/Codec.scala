package graft.index

import java.io.ByteArrayOutputStream

/** Delta + varint (LEB128) codec for posting blocks (SURVEY.md §2.3 A8).
  * Pure Scala; byte arrays are opaque BINARY columns to Catalyst.
  */
object Codec {

  /** Unsigned LEB128 append. Values must be ≥ 0. */
  def writeVarLong(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode sorted longs as first value + deltas, all varint. */
  def encodeDeltas(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length * 2)
    var prev = 0L
    var i = 0
    while (i < values.length) {
      val d = if (i == 0) values(0) else values(i) - prev
      require(d >= 0, s"input not sorted at $i")
      writeVarLong(out, d)
      prev = values(i)
      i += 1
    }
    out.toByteArray
  }

  /** Encode non-negative ints as plain varints. */
  def encodeInts(values: Array[Int], n: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(n * 2)
    var i = 0
    while (i < n) {
      writeVarLong(out, values(i).toLong)
      i += 1
    }
    out.toByteArray
  }

  final class VarIntReader(bytes: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < bytes.length
    def next(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
  }

  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val r = new VarIntReader(bytes)
    val out = new Array[Long](n)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += r.next()
      out(i) = acc
      i += 1
    }
    out
  }

  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val r = new VarIntReader(bytes)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = r.next().toInt
      i += 1
    }
    out
  }
}
