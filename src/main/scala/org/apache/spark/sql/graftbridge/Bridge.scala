package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression conversions for custom Catalyst expressions.
  * `ExpressionUtils` is private[sql] in Spark 4, so extension libraries
  * expose it through an org.apache.spark.sql.* bridge package — the only
  * piece of this codebase that reaches into Spark internals.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
