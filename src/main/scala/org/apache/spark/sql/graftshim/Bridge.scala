package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession}

/** Column ↔ Expression ↔ plan bridge. Spark 4 made the classic helpers
  * private[sql]; this shim lives in the sql package tree solely to
  * re-export three conversions for our native expressions and the SQL
  * MERGE command. Contains no logic.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Wrap an analyzable LogicalPlan as a DataFrame. */
  def ofRows(session: SparkSession, plan: LogicalPlan): Dataset[Row] =
    Dataset.ofRows(session, plan)

  /** Re-plan `df` as a streaming (isStreaming = true) DataFrame — what a
    * V1 streaming Source's getBatch must return (MicroBatchExecution
    * asserts it). The physical plan is fixed here; the RDD itself stays
    * lazy until the micro-batch runs.
    */
  def asStreamingFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = df.asInstanceOf[Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, c.schema, isStreaming = true)
  }

  /** Re-plan a V1 Sink.addBatch DataFrame as a plain batch frame. The
    * incoming frame carries the micro-batch's IncrementalExecution plan,
    * which must not be re-analyzed by batch operations (the DeltaSink
    * pattern: pin the physical plan, wrap its RDD).
    */
  def asBatchFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = df.asInstanceOf[Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, c.schema, isStreaming = false)
  }
}
