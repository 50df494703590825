package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so third-party native
  * expressions need this one-file shim in the sql package — the same
  * technique Spark ecosystem libraries use to expose custom expressions as
  * `Column`s without going through the (slower) FunctionRegistry + parser
  * path.
  */
object GraftExpressionBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
