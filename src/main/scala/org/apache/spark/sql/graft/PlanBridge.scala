package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to `private[sql]` plan→DataFrame construction (sibling of
  * [[ColumnBridge]]): extensions that define custom logical operators
  * need `Dataset.ofRows` to hand a hand-built [[LogicalPlan]] back to
  * the public API surface.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
