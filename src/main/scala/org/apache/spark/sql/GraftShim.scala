package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4 moved
  * Column onto ColumnNode; classic-mode expression wrapping lives behind
  * package-private API). Living in this package is the sanctioned shim
  * pattern for libraries contributing custom Catalyst expressions. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
