package graft.index

/** Open-addressing per-PARTITION term-count table fused with string
  * interning, for the index build's per-doc hot loop.
  *
  * The loop feeds it raw token regions (zero-allocation — see
  * `Lexer.foreachTokenRaw`); a canonical String is allocated only on the
  * FIRST occurrence of a term per partition. Counting is epoch-based:
  * `beginDoc()` bumps the epoch instead of clearing anything, and
  * `touched(0 until nTouched)` lists this doc's distinct live slots.
  * Stop-flagged terms (L4, decided once at intern time on stemmed tokens)
  * are interned but never counted.
  *
  * Why it exists: the previous HashMap[String, Integer] loop allocated ~2
  * short-lived objects per token OCCURRENCE (token String + boxed count),
  * and per-stage task metrics showed the ft stage's total CPU time
  * inflating 27% (GC time 6.5×) from 4 to 16 pinned cores on one socket —
  * an allocation-bandwidth contention signature, not a dataflow limit.
  * Single-threaded; one instance per partition/task.
  */
final class TermCounter(initialCapacity: Int = 1 << 12) {

  private var cap = Integer.highestOneBit(math.max(16, initialCapacity))
  private var mask = cap - 1
  private var keys = new Array[String](cap)
  private var hashes = new Array[Int](cap)
  private var stops = new Array[Boolean](cap)
  private var counts = new Array[Int](cap)
  private var epochs = new Array[Long](cap)
  private var size = 0
  private var epoch = 0L

  /** Slots with a nonzero count for the current doc, in first-touch order
    * (order never affects results: postings are range-sorted downstream).
    */
  var touched = new Array[Int](512)
  var nTouched = 0

  def beginDoc(): Unit = { epoch += 1; nTouched = 0 }

  def termAt(slot: Int): String = keys(slot)
  def countAt(slot: Int): Int = counts(slot)

  /** Count one occurrence of `cs[start, end)`. `checkStop` marks stemmed
    * (alpha-run) tokens — only those are matched against the stop list.
    */
  def add(cs: CharSequence, start: Int, end: Int, checkStop: Boolean): Unit = {
    if ((size + 1) * 2 > cap) grow()
    var h = 1
    var i = start
    while (i < end) { h = h * 31 + cs.charAt(i); i += 1 }
    var slot = h & mask
    while (true) {
      val k = keys(slot)
      if (k == null) {
        val s = cs match {
          case str: String => str.substring(start, end)
          case b => b.subSequence(start, end).toString
        }
        keys(slot) = s
        hashes(slot) = h
        stops(slot) = checkStop && graft.text.StopWords.set.contains(s)
        size += 1
        count(slot)
        return
      } else if (hashes(slot) == h && regionEquals(k, cs, start, end)) {
        count(slot)
        return
      } else {
        slot = (slot + 1) & mask
      }
    }
  }

  private def count(slot: Int): Unit = {
    if (stops(slot)) return
    if (epochs(slot) != epoch) {
      epochs(slot) = epoch
      counts(slot) = 0
      if (nTouched == touched.length)
        touched = java.util.Arrays.copyOf(touched, nTouched * 2)
      touched(nTouched) = slot
      nTouched += 1
    }
    counts(slot) += 1
  }

  private def regionEquals(
      k: String, cs: CharSequence, start: Int, end: Int): Boolean = {
    if (k.length != end - start) return false
    var i = 0
    while (i < k.length) {
      if (k.charAt(i) != cs.charAt(start + i)) return false
      i += 1
    }
    true
  }

  /** Doubles the table. `touched` slot indexes are remapped, so growth is
    * safe mid-document.
    */
  private def grow(): Unit = {
    val oldCap = cap
    val oldKeys = keys
    val oldHashes = hashes
    val oldStops = stops
    val oldCounts = counts
    val oldEpochs = epochs
    cap <<= 1
    mask = cap - 1
    keys = new Array[String](cap)
    hashes = new Array[Int](cap)
    stops = new Array[Boolean](cap)
    counts = new Array[Int](cap)
    epochs = new Array[Long](cap)
    val newSlotOf = new Array[Int](oldCap)
    var i = 0
    while (i < oldCap) {
      val k = oldKeys(i)
      if (k != null) {
        var s = oldHashes(i) & mask
        while (keys(s) != null) s = (s + 1) & mask
        keys(s) = k
        hashes(s) = oldHashes(i)
        stops(s) = oldStops(i)
        counts(s) = oldCounts(i)
        epochs(s) = oldEpochs(i)
        newSlotOf(i) = s
      }
      i += 1
    }
    var t = 0
    while (t < nTouched) {
      touched(t) = newSlotOf(touched(t))
      t += 1
    }
  }
}
