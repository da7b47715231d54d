package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 removed the
  * public `Column(expr)` constructor in the Connect-compatible API; library
  * extensions that define native Catalyst expressions (graft.plans.*) need
  * exactly this hop, so it lives in an org.apache.spark.sql subpackage —
  * the standard extension-point pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (Dataset.ofRows is private[sql]) —
    * needed to surface custom logical operators like graft.plans.TopKPerKey.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
