package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge into `private[sql]` constructors needed to materialize a
  * DataFrame from a custom logical plan (graft.plans.TopKPerGroup). This is
  * the standard extension-library technique; nothing else from the internal
  * API is touched. */
object GraftSqlAccess {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
