package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` plan→DataFrame
  * constructor, for [[graft.lake.GraftInsertCommand]]: a command
  * receives the already-analyzed INSERT source as a LogicalPlan and
  * must re-wrap it to hand to the writer API. Living under
  * `org.apache.spark.sql` grants the access — the same technique
  * Delta Lake uses for the same reason.
  */
object SqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
