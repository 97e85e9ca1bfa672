package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Catalyst Expression
  * conversions (Spark 4 wraps Columns in ColumnNodes; the classic
  * converters live in [[org.apache.spark.sql.classic.ExpressionUtils]]).
  * Needed for expressions that carry NON-Expression constructor state —
  * e.g. a [[org.apache.spark.broadcast.Broadcast]] handle — which the
  * function-registry builder path (Expression children only) cannot
  * express. Kept to the two minimal forwarders; everything else in the
  * library goes through the public DSL or the registry.
  */
object GraftColumns {
  def ofExpr(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built (already resolved) LogicalPlan — the
    * entry point for custom operators like the native as-of join,
    * whose logical node cannot be produced by the public DSL.
    */
  def ofPlan(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
