package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `org.apache.spark.sql` package so the graft
  * library can wrap a custom [[LogicalPlan]] node in a public
  * `DataFrame` (`Dataset.ofRows` is `private[sql]`). This is the
  * standard extension-library pattern — no Spark internals are
  * modified, we only call the same constructor `spark.sql(...)` uses.
  */
object PlanBridge {

  /** Wrap an already-resolved logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed (resolved) logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Session-local physical-strategy registration (idempotent), for
    * sessions not built with the `GraftExtensions` hook. Checks the
    * planner's FULL strategy list, so an extensions-wired session is
    * left untouched; synchronized because `extraStrategies` is a
    * plain read-modify-write var.
    */
  def registerStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit =
    synchronized {
      val cs = spark.asInstanceOf[classic.SparkSession]
      if (!cs.sessionState.planner.strategies.contains(strategy))
        cs.experimental.extraStrategies =
          cs.experimental.extraStrategies :+ strategy
    }
}
