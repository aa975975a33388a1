package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one-file bridge every Spark plan-level extension library ships:
  * `classic.Dataset.ofRows` (the only way to wrap a hand-built
  * `LogicalPlan` in a `DataFrame`) and `classic.ExpressionUtils` (the only
  * way to wrap a hand-built `Expression` in a `Column`) are `private[sql]`,
  * so the accessors have to live inside the `org.apache.spark.sql`
  * package. No other Spark internals are touched here.
  *
  * `column`/`expression` exist for expressions that cannot go through the
  * `FunctionRegistry` because they carry non-child state — the
  * broadcast-shipped codebook expressions (functions/Codebooks.scala) hold
  * a `Broadcast` handle constructed per query, which a registry builder
  * (a static `Seq[Expression] => Expression`) cannot close over. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
