package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Catalyst-Expression converters —
  * the standard pattern for Spark extension libraries that define native
  * expressions and need to expose them as `Column`s (the alternative, a
  * function-registry round-trip per call site, forces session-dependent
  * registration into pure column functions).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
