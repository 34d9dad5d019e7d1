package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-embedding dot product.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * Catalyst-native but NOT codegen-friendly: higher-order functions
  * evaluate a lambda expression tree per ELEMENT with boxed
  * `NamedLambdaVariable`s, and `zip_with` materializes the intermediate
  * product array — per-row garbage on the hot path of every brute-force /
  * rerank ANN scan. This expression compiles to a primitive fused
  * multiply-add loop inside whole-stage codegen (`doGenCode`), reading the
  * parquet float arrays in place.
  *
  * Null semantics are EXACTLY the composable form's (property-tested in
  * FunctionsSpec): null when either side is null, when the lengths differ
  * (zip_with pads the shorter side with null → null product → null sum),
  * or when any element is null. Accumulation order is the same sequential
  * left fold, so results are bit-identical.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: AbstractDataType itself is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VecMath {

  /** Codegen'd `dot(a, b)` over two `ARRAY<FLOAT>` columns → DOUBLE.
    * Drop-in for `aggregate(zip_with(...))` — identical values and null
    * semantics, no per-element lambda evaluation or intermediate array.
    */
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
