package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for graft's custom Catalyst expressions: Column ⇄ Expression
  * conversion lives behind `private[sql]` in Spark 4 (classic
  * ExpressionUtils), so the adapter sits in this package — the standard
  * extension-library pattern. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager ColumnNode→Expression conversion. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper — fine inside the DataFrame API, but
    * a FunctionRegistry builder must hand the analyzer a REAL expression
    * tree (the wrapper's children are invisible to resolution, so a SQL
    * plan containing it fails with a VOID-typed filter). */
  def expressionTree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
