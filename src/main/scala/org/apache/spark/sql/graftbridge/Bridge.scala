package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 wraps Columns in ColumnNodes and gates the Expression
  * constructors behind `private[sql]` (`org.apache.spark.sql.classic
  * .ExpressionUtils`). Custom native expressions (graft.expr) need exactly
  * those two conversions, so this object lives in an `org.apache.spark.sql`
  * subpackage to satisfy the access modifier — the canonical pattern for
  * Catalyst extension libraries. Nothing else in the repo uses this
  * namespace.
  */
object Bridge {
  /** `org.apache.spark.sql.types.AbstractDataType` is `private[sql]` in
    * Spark 4; expressions outside the sql package that mix in
    * `ExpectsInputTypes` need a nameable alias for the `inputTypes`
    * override's result type. */
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for building custom logical
    * operators on top of it). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame (classic.Dataset.ofRows is
    * private[sql]). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
