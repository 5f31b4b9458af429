package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Classic-runtime bridge: Column <-> Catalyst Expression converters live
  * in the `private[sql]` `classic.ExpressionUtils` since Spark 4, so this
  * one-file shim re-exports the two conversions graft's native-expression
  * Column wrappers need -- the standard pattern third-party expression
  * libraries use to interoperate with the classic execution runtime.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
