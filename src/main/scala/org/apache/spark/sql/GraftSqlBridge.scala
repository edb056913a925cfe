package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to two `private[sql]` factories graft needs:
  * `Column` from a Catalyst `Expression` (for expressions whose parameters
  * are JVM objects rather than child expressions, e.g. CentroidScores'
  * centroid matrix — passing them as literal arguments through the function
  * registry would put dim-proportional data into the plan), and
  * `Dataset.ofRows` (for Bench's unordered variant, which re-wraps a plan
  * with its oracle-determinism top-level Sort stripped).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
