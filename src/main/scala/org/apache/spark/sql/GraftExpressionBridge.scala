package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Expression ↔ Column converters so
  * graft's custom Catalyst expressions can be exposed as Columns (the
  * same technique Spark-extension libraries use; no Spark internals
  * are modified).
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
