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

}
