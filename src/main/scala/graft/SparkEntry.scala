package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{Behavioral, CustomAgg, Extras, Joins, Relational, Stats, Temporal, TemporalJoins, WindowsSetsScalars}
import graft.analytics.Typed
import graft.ops.{Baskets, Dedup, Govern, Multimodal, Pref, Prep, Similarity, Skew, SpanExact, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory and
  * the per-module scaladoc for reference citations. Every implemented
  * operator registers a `queries` entry; SQL-expressible ones also
  * register an `oracleSql` entry for the driver's DuckDB compare.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Joins.queries, Joins.oracles),
      (WindowsSetsScalars.queries, WindowsSetsScalars.oracles),
      (Temporal.queries, Temporal.oracles),
      (TemporalJoins.queries, TemporalJoins.oracles),
      (Behavioral.queries, Behavioral.oracles),
      (Stats.queries, Stats.oracles),
      (CustomAgg.queries, CustomAgg.oracles),
      (Extras.queries, Extras.oracles),
      (Dedup.queries, Dedup.oracles),
      (Govern.queries, Govern.oracles),
      (SpanExact.queries, SpanExact.oracles),
      (Skew.queries, Skew.oracles),
      (Prep.queries, Prep.oracles),
      (Pref.queries, Pref.oracles),
      (Typed.queries, Typed.oracles),
      (Similarity.queries, Similarity.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Baskets.queries, Baskets.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
