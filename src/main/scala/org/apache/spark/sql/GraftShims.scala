package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for graft's custom Catalyst expressions: Column ⇄ Expression
  * conversion lives behind `private[sql]` in Spark 4 (classic
  * ExpressionUtils), so the adapter sits in this package — the standard
  * extension-library pattern. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
