package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[VecMath.vecDot]] ≡ the zip_with+aggregate composition it replaced —
  * values bit-identical (same sequential fold) and null semantics exact,
  * in BOTH whole-stage-codegen and interpreted execution.
  */
class FunctionsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  // deterministic corpus: dense vectors, zero vectors, empty arrays,
  // length mismatches, null elements, null arrays
  private def rows: Seq[(Int, Array[java.lang.Float], Array[java.lang.Float])] = {
    val rng = new java.util.Random(42)
    def vec(n: Int): Array[java.lang.Float] =
      Array.fill(n)(java.lang.Float.valueOf(rng.nextFloat() * 2f - 1f))
    val dense = (0 until 200).map(i => (i, vec(64), vec(64)))
    val edges = Seq(
      (1000, vec(8), vec(12)), // length mismatch → null
      (1001, vec(0), vec(0)), // empty → 0.0
      (1002, vec(5), null), // null side → null
      (1003, null, null),
      (1004, vec(3), vec(3).updated(1, null: java.lang.Float)), // null elem
      (1005, Array.fill(4)(java.lang.Float.valueOf(0f)), vec(4)))
    dense ++ edges
  }

  private def compare(): Unit = {
    val df = rows.toDF("id", "a", "b")
      .select($"id",
        VecMath.vecDot($"a", $"b").as("native"),
        hofDot($"a", $"b").as("hof"))
    val bad = df.filter(
      !($"native" <=> $"hof") ||
        // bit-identity, not just ==: same sequential fold required
        !(isnull($"native") ||
          expr("cast(native as string) = cast(hof as string)")))
      .collect()
    assert(bad.isEmpty, s"diverging rows: ${bad.mkString("; ")}")
    // sanity: the dense rows are non-null and the mismatch row IS null
    val byId = df.collect().map(r => r.getInt(0) -> r).toMap
    assert(!byId(0).isNullAt(1))
    assert(byId(1000).isNullAt(1) && byId(1000).isNullAt(2))
    assert(byId(1001).getDouble(1) == 0.0)
    assert(byId(1004).isNullAt(1))
  }

  test("vecDot ≡ zip_with+aggregate under whole-stage codegen") {
    compare()
  }

  test("vecDot ≡ zip_with+aggregate interpreted (codegen off)") {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      compare()
    } finally spark.conf.set(key, old)
  }

  test("direct eval matches a hand-computed dot") {
    val a = Array(1.0f, 2.0f, -3.5f)
    val b = Array(4.0f, -0.5f, 2.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VecMath.vecDot($"a", $"b")).as[Double].head()
    val want = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
      s + x.toDouble * y.toDouble
    }
    assert(got == want)
  }

  // ---- AdcScore: ≡ the Dataset.map closure it replaced -------------------

  private val adcKsub = 16
  private val adcM = 8
  private val adcTable: Array[Double] = {
    val rng = new java.util.Random(7)
    Array.fill(adcM * adcKsub)(rng.nextDouble() * 2 - 1)
  }

  /** The former closure's fold, verbatim: j-ascending sequential sum,
    * reads min(code.length, m) bytes, None on a byte ≥ ksub.
    */
  private def adcRef(code: Array[Byte]): Option[Double] = {
    var s = 0.0
    var j = 0
    val n = math.min(code.length, adcM)
    while (j < n) {
      val ci = code(j) & 0xff
      if (ci >= adcKsub) return None
      s += adcTable(j * adcKsub + ci)
      j += 1
    }
    Some(s)
  }

  private def adcRows: Seq[(Int, Array[Byte])] = {
    val rng = new java.util.Random(11)
    val dense = (0 until 100).map(i =>
      (i, Array.fill(adcM)(rng.nextInt(adcKsub).toByte)))
    dense ++ Seq(
      (1000, Array.fill(adcM)(200.toByte)), // corrupt byte → null
      (1001, Array[Byte](1, 2, 3)), // short code: prefix scored
      (1002, Array.fill(adcM + 4)(2.toByte)), // long code: m-prefix only
      (1003, Array.empty[Byte]), // empty → 0.0
      (1004, null)) // null → null
  }

  private def adcCompare(): Unit = {
    val rows = adcRows
    val got = rows.toDF("id", "code")
      .select($"id", AdcScore.adcScore($"code", adcTable, adcKsub).as("adc"))
      .collect().map(r =>
        r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    rows.foreach { case (id, code) =>
      val want = Option(code).flatMap(adcRef)
      assert(got(id) == want, s"id=$id got=${got(id)} want=$want")
    }
    assert(got(1000).isEmpty)
    assert(got(1003).contains(0.0))
    assert(got(1004).isEmpty)
  }

  test("adcScore ≡ the replaced closure under whole-stage codegen") {
    adcCompare()
  }

  test("adcScore ≡ the replaced closure interpreted (codegen off)") {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      adcCompare()
    } finally spark.conf.set(key, old)
  }

  // ---- HyperplaneSig: ≡ the flatMap closure it replaced ------------------

  private val sigDim = 32
  private val sigPlaneCount = 12
  private val sigMat: Array[Double] = {
    val rng = new java.util.Random(13)
    Array.fill(sigPlaneCount * sigDim)(rng.nextDouble() * 2 - 1)
  }

  /** The former closure's fold, verbatim: p-ascending planes, i-ascending
    * double accumulation over min(dim, |v|) floats, bit set iff s ≥ 0.
    */
  private def sigRef(v: Array[java.lang.Float]): Option[Long] = {
    val n = math.min(sigDim, v.length)
    var sig = 0L
    var p = 0
    while (p < sigPlaneCount) {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (v(i) == null) return None
        s += sigMat(p * sigDim + i) * v(i).floatValue()
        i += 1
      }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    Some(sig)
  }

  private def sigRows: Seq[(Int, Array[java.lang.Float])] = {
    val rng = new java.util.Random(17)
    def vec(n: Int): Array[java.lang.Float] =
      Array.fill(n)(java.lang.Float.valueOf(rng.nextFloat() * 2f - 1f))
    (0 until 100).map(i => (i, vec(sigDim))) ++ Seq(
      (1000, vec(8)), // shorter than dim: prefix fold
      (1001, vec(sigDim + 16)), // longer: clamped to dim
      (1002, vec(0)), // empty: every s = 0.0 → all bits set
      (1003, vec(4).updated(2, null: java.lang.Float)), // null elem → null
      (1004, null)) // null vector → null
  }

  private def sigCompare(): Unit = {
    val rows = sigRows
    val got = rows.toDF("id", "v")
      .select($"id", HyperplaneSig.hyperplaneSig($"v", sigMat, sigDim)
        .as("sig"))
      .collect().map(r =>
        r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    rows.foreach { case (id, v) =>
      val want = Option(v).flatMap(sigRef)
      assert(got(id) == want, s"id=$id got=${got(id)} want=$want")
    }
    assert(got(1002).contains((1L << sigPlaneCount) - 1))
    assert(got(1003).isEmpty && got(1004).isEmpty)
  }

  test("hyperplaneSig ≡ the replaced closure under whole-stage codegen") {
    sigCompare()
  }

  test("hyperplaneSig ≡ the replaced closure interpreted (codegen off)") {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      sigCompare()
    } finally spark.conf.set(key, old)
  }
}
