package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column constructor so library
  * code can expose custom Catalyst expressions as ordinary Columns
  * (the standard extension-library technique; Spark offers no public
  * equivalent for classic sessions).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) custom logical plan node as a DataFrame — the
    * `private[sql]` Dataset.ofRows, exposed for graft's custom
    * operators (e.g. the as-of join plan). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Block until the listener bus has delivered all queued events —
    * `private[spark]`, needed so metric collection sees every TaskEnd
    * of the measured action before reading its counters. */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession, timeoutMillis: Long): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)
}
