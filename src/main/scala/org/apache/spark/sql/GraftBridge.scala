package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's public Column wraps a ColumnNode and no longer exposes
  * `.expr` / `new Column(expr)`; the converters live in
  * `classic.ExpressionUtils`, which is private[sql]. Exporting them
  * from inside the package is the established pattern for libraries
  * that ship native expressions (cf. public extensions like Qbeast's
  * DatasetFactory).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) logical plan. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
