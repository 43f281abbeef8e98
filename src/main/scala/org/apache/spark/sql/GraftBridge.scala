package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made `Column` wrap a `ColumnNode` and gated the expression
  * constructors behind `private[sql]` (`classic.ExpressionUtils`), so a
  * library shipping its own codegen'd expressions needs this one-file
  * bridge in the `org.apache.spark.sql` package — the same technique
  * Spark-native libraries use in the wild. Everything else in graft stays
  * outside Spark's namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
