package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters that
  * Spark 4's Connect-agnostic `Column` hid behind
  * `org.apache.spark.sql.classic.ExpressionUtils`. This is the standard
  * extension-library technique (one file in the `org.apache.spark.sql`
  * package; no reflection, no bytecode tricks) for exposing a custom
  * Catalyst `Expression` as a `Column` — here [[graft.functions.FloatVecDot]].
  */
object GraftColumnBridge {

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
