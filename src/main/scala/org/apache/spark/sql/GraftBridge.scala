package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public Column(Expression) constructor in favor of
  * ColumnNode; the conversion lives in `private[sql]` ExpressionUtils.
  * This bridge re-exports just the two conversions our custom Catalyst
  * expressions need.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
