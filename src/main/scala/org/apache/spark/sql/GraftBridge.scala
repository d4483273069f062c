package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversions for custom
  * Catalyst expressions (Spark 4 moved `new Column(expr)` behind
  * classic.ExpressionUtils). Lives in the org.apache.spark.sql package for
  * access; keep it minimal.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
