package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 `Column` wraps a `ColumnNode`, not an `Expression`; the
  * conversion utilities are `private[sql]`. This bridge exposes them to the
  * graft function library.
  */
object ColumnBridge {
  def colOf(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)
}
