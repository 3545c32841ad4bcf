package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Column ⇄ Expression converters —
  * the standard pattern for libraries shipping custom Catalyst
  * expressions against Spark 4's split Column API (cf. public extension
  * projects that place a factory in `org.apache.spark.sql` for the same
  * reason).
  */
object GraftInternal {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
