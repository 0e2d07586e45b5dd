package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the one private[sql] entry point a planner extension needs:
  * turning a custom LogicalPlan into a DataFrame. Standard technique for
  * Spark extension libraries (the SparkSessionExtensions API injects rules
  * and strategies but offers no public plan→DataFrame constructor). */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
