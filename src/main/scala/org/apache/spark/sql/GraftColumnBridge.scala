package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark 4's `private[sql]` Column↔Expression
  * converters, so graft's custom Catalyst expressions can expose
  * `Column`-level entry points. Standard practice for Spark extension
  * libraries (the Column API hides Expression behind ColumnNode in 4.x).
  */
object GraftColumnBridge {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
