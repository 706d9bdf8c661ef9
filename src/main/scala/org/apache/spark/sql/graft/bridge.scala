package org.apache.spark.sql.graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Access bridge for `private[sql]` planner API, in the standard
  * extension-library location (a subpackage of org.apache.spark.sql, the
  * pattern every DSv2 ecosystem project uses for exactly this call).
  * Contains NO logic — one delegation.
  */
object bridge {
  /** Wrap an analyzed/analyzable LogicalPlan as a DataFrame. */
  def ofRows(session: SparkSession, plan: LogicalPlan): Dataset[Row] =
    Dataset.ofRows(session, plan)
}
