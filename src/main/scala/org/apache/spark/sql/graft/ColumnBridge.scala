package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 routes `Column` through `ColumnNode`s, and the
  * Expression↔Column converters live in `org.apache.spark.sql.classic`
  * with `private[sql]` visibility — this object re-exports the two
  * converters from inside the `org.apache.spark.sql` package so the rest
  * of the codebase (graft.*) can wrap a custom `Expression` (e.g.
  * [[graft.expressions.DotProduct]]) as a `Column` without going through
  * the SQL parser.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
