package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Typed row for the lineitem columns the typed query touches
  * (Dataset[T] projects by name, extra parquet columns are pruned).
  */
case class LineRow(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** SURVEY.md §1.3 — the typed `Dataset[T]` surface: case-class
  * encoders, lambda filters, groupByKey. Trade-off stated plainly:
  * typed lambdas deserialize rows and break whole-stage codegen /
  * filter pushdown, so the engine uses them only where compile-time
  * row types pay for that (business logic, not scans). This query
  * exists to declare + verify the capability; the column-expression
  * equivalent is what the other 60 queries do.
  */
object Typed {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_typed_agg" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .as[LineRow]
        .filter(_.l_quantity > 45.0)
        .groupByKey(_.l_returnflag)
        .count()
        .toDF("l_returnflag", "n_heavy")
        .orderBy("l_returnflag")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_typed_agg" ->
      """SELECT l_returnflag, count(*) AS n_heavy FROM lineitem
        |WHERE l_quantity > 45.0 GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
