package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge. Spark 4 made the converters
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so custom
  * expressions need this one-file shim in the sql package — the standard
  * pattern used by Spark-extension libraries.
  */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
