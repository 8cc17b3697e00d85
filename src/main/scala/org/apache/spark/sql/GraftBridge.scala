package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression converters so the
  * engine's custom Catalyst expressions (graft.functions) can surface as
  * Columns. Uses only the classic (non-Connect) execution path, same as
  * the rest of this library. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
