package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** The one sanctioned crossing between this engine's native Catalyst
  * expressions and the public `Column` API. Spark 4 made
  * `Column(expr)` private to the sql package (columns now wrap
  * `ColumnNode`s), so the conversion helper must live inside
  * `org.apache.spark.sql` — the standard extension-library technique.
  * Nothing else of this project lives outside the `graft` namespace.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
