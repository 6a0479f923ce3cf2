package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression conversion so graft
  * can expose custom Catalyst expressions as ordinary Columns. Lives in
  * an org.apache.spark.sql subpackage purely for access; no Spark
  * internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a single-row/single-column Dataset as a scalar subquery
    * expression (required e.g. by BloomFilterMightContain). */
  def scalarSubquery(df: org.apache.spark.sql.Dataset[_]): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        df.queryExecution.analyzed))

  /** Analyzed logical plan of a DataFrame (for building custom logical
    * nodes on already-resolved children). */
  def analyzed(df: org.apache.spark.sql.Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point for
    * custom LogicalPlan nodes planned by an injected SparkStrategy. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-root a batch DataFrame as a STREAMING-flagged plan — what a V1
    * streaming Source's getBatch must return (the engine asserts
    * isStreaming). Physical planning of the batch plan is preserved
    * verbatim through its InternalRow RDD. */
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    ofRows(df.sparkSession, org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(ds.queryExecution.toRdd, ds, isStreaming = true))
  }
}
