package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4 Columns are ColumnNode-backed and
  * the sanctioned converter (`classic.ExpressionUtils`) is private[sql], so
  * this one-file shim lives in the sql package namespace — the same pattern
  * third-party Catalyst extensions use to expose custom expressions as
  * Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
