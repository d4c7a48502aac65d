package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a Catalyst [[Expression]] to a user-facing [[Column]].
  *
  * Spark 4 moved `Column` to the connect-compatible sql-api layer and made
  * the classic conversion `private[sql]` (`ExpressionUtils.column`); a
  * one-line accessor inside the `org.apache.spark.sql` namespace is the
  * standard technique extension libraries use to expose custom
  * expressions as Columns. Nothing else in the engine lives in Spark's
  * namespace. */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
