package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversions, so
  * graft's native Catalyst expressions (graft.functions.*) can be exposed as
  * user-facing `Column`s. This is the standard extension-library pattern —
  * the classic API keeps these behind `org.apache.spark.sql.classic`. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
