package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column ⇄ Expression converters (Spark 4
  * moved `Column` onto ColumnNode; `classic.ExpressionUtils` is
  * `private[sql]`). Standard extension-library shim — the only file outside
  * the `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
