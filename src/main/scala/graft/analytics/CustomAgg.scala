package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.WelfordVar

/** SURVEY.md §2.9c — the typed custom aggregate surface, registered as
  * an oracle-checked query. The merge order across partitions is
  * nondeterministic, so outputs are rounded to 4 digits; DuckDB's
  * avg/var_samp agree to ~1e-12 relative, far inside the rounding.
  */
object CustomAgg {
  type Q = (SparkSession, String) => DataFrame

  private val welford = udaf(WelfordVar)

  val queries: Map[String, Q] = Map(
    "q_agg_custom" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(welford(col("l_quantity")).as("w"))
        .select(col("l_returnflag"),
          round(col("w.mean"), 4).as("mean_qty"),
          round(col("w.var_samp"), 4).as("var_qty"))
        .orderBy(col("l_returnflag")))
  )

  val oracles: Map[String, String] = Map(
    "q_agg_custom" ->
      """SELECT l_returnflag, round(avg(l_quantity), 4) AS mean_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
