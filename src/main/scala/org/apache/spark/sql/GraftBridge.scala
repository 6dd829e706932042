package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal visibility bridge: Spark 4 made the Column ↔ Expression
  * converters `private[sql]` (`classic.ExpressionUtils`), so third-party
  * expression libraries need one object inside the `org.apache.spark.sql`
  * package to cross the boundary. This is the only graft code outside the
  * `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
