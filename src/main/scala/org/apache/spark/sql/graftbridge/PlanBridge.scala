package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LocalLimit

/** Logical-plan bridge for operators the public Dataset API doesn't
  * expose. `localLimit` is Spark's own per-partition limit node — the
  * first half of `limit(n)` = GlobalLimit(LocalLimit(n)) — used alone for
  * Cascading's per-slice `Limit` semantics (each task slice emits at most
  * n rows, no single-partition gather). */
object PlanBridge {
  def localLimit(df: DataFrame, n: Int): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    org.apache.spark.sql.classic.Dataset.ofRows(
      cdf.sparkSession, LocalLimit(Literal(n), cdf.queryExecution.logical))
  }
}
