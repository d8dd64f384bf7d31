package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Access shims for `protected[sql]` Spark internals we intentionally reuse
  * instead of reimplementing (Catalyst filter translation).
  */
object SparkShims {
  def translateFilter(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)

  /** Column <-> Catalyst Expression bridges (Spark 4 moved these behind
    * ColumnNode; ExpressionUtils is the supported internal bridge).
    */
  def column(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expr(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a (classic) DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Construct a PartitionedFile for the file-source read function
    * (insulates callers from the constructor churn across Spark versions).
    */
  def partitionedFile(
      partitionValues: org.apache.spark.sql.catalyst.InternalRow,
      path: String,
      start: Long,
      length: Long): org.apache.spark.sql.execution.datasources.PartitionedFile =
    org.apache.spark.sql.execution.datasources.PartitionedFile(
      partitionValues,
      org.apache.spark.paths.SparkPath.fromPathString(path),
      start, length, Array.empty, 0L, length)
}
