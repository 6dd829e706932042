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

  /** Free the block-manager storage behind a `localCheckpoint()`'d
    * DataFrame. `Dataset.unpersist` only talks to the cache manager, so
    * the MEMORY_AND_DISK blocks a local checkpoint pins are otherwise
    * unreachable from public API — this reaches the `LogicalRDD` the
    * checkpoint wrapped and unpersists its RDD. No-op for any other
    * plan shape. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
