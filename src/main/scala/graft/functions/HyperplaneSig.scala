package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for one LSH table's random-hyperplane
  * signature: bit p of the result is set iff
  * Σ_{i < min(dim, |v|)} planes[p·dim + i] · v(i) ≥ 0, p-ascending —
  * exactly the per-row closure it replaced (graft.ops.Ann
  * tableSignatures), same double accumulation over the float vector,
  * same min-length clamp, so signatures (and therefore every LSH bucket
  * downstream) are bit-identical.
  *
  * The planes matrix (planeCount × dim doubles, flattened row-major)
  * rides in the expression: the signature scan — tables × planes dot
  * products per vector, the bucketing hot loop of LSH dedup at the
  * 100 TB target — stays inside whole-stage codegen with no per-row
  * lambda or Dataset (de)serialization.
  *
  * NULL on a null vector or a null element (the closure path could not
  * even decode those rows); empty vectors get the all-sign-bits-of-zero
  * signature, like the closure's zero-length loop.
  */
case class HyperplaneSig(child: Expression, planes: Array[Double], dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(dim > 0, s"dim must be positive, got $dim")
  require(planes.length % dim == 0,
    s"planes length ${planes.length} is not a multiple of dim $dim")

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "hyperplane_sig"

  private def planeCount: Int = planes.length / dim

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var sig = 0L
    var p = 0
    while (p < planeCount) {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        s += planes(p * dim + i) * v.getFloat(i)
        i += 1
      }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pl = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = java.lang.Math.min($dim, $v.numElements());
         |long $sig = 0L;
         |for (int $p = 0; $p < $planeCount && !${ev.isNull}; $p++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $pl[$p * $dim + $i] * (double) $v.getFloat($i);
         |  }
         |  if (!${ev.isNull} && $s >= 0) {
         |    $sig |= (1L << $p);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSig = copy(child = newChild)
}

object HyperplaneSig {

  /** Codegen'd hyperplane sign-bit signature of an ARRAY<FLOAT> column
    * under a flat (planeCount·dim) plane matrix → LONG.
    */
  def hyperplaneSig(vec: Column, planes: Array[Double], dim: Int): Column =
    GraftColumnBridge.column(
      HyperplaneSig(GraftColumnBridge.expression(vec), planes, dim))
}
