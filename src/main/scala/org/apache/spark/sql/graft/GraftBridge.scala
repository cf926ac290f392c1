package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into `private[sql]` Spark internals: Column ↔ Expression.
 * Spark 4.x removed the public `new Column(expr)` constructor (columns are
 * now backend-agnostic ColumnNodes); the classic bridge lives in
 * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql] —
 * hence this one-file shim in the sql package namespace. Nothing else in
 * the codebase reaches into Spark internals.
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
