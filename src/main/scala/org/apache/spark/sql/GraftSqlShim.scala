package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into package-private Column↔Expression conversions — the
  * standard extension-library pattern for registering custom Catalyst
  * expressions from outside the org.apache.spark.sql package.
  */
object GraftSqlShim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
