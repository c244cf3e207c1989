package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and Catalyst `Expression`s.
  *
  * Spark 4 moved Column↔Expression conversion behind
  * `private[sql] org.apache.spark.sql.classic.ExpressionUtils`; this
  * shim lives in a child package of `org.apache.spark.sql` solely to
  * re-export those two conversions to graft's custom expressions.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom logical plan back into a public DataFrame
    * (`classic.Dataset.ofRows` is `private[sql]` in Spark 4).
    */
  def dataFrame(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
}
