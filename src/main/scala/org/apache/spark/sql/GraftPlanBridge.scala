package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one-file bridge every Spark plan-level extension library ships:
  * `classic.Dataset.ofRows` (the only way to wrap a hand-built
  * `LogicalPlan` in a `DataFrame`) is `private[sql]`, so the accessor has
  * to live inside the `org.apache.spark.sql` package. No other Spark
  * internals are touched here. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
