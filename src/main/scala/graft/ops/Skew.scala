package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Skew-handling aggregation: the two-stage salted pattern. When one
  * group key holds a disproportionate share of rows (a hot county, a
  * crawler-dominated source domain), the single reducer for that key
  * becomes the straggler. Salting splits each key into `Salt`
  * sub-groups for the partial aggregate, then combines the partials —
  * the hot key's work spreads over `Salt` reducers and the second
  * shuffle only carries `keys × Salt` pre-aggregated rows.
  *
  * The salt here is `pmod(l_orderkey, Salt)` (deterministic — rand()
  * salting would break retry idempotence and the oracle); the oracle
  * is the PLAIN group-by, proving the decomposition is exact.
  *
  * For skewed JOINS, prefer AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) which splits oversized partitions at runtime without
  * changing the query.
  */
object Skew {
  type Q = (SparkSession, String) => DataFrame

  val Salt = 16

  val queries: Map[String, Q] = Map(
    "q_skew_salted_agg" -> ((s, dir) => {
      val partial = Tables(s, dir, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(Salt)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(sum(dec(col("l_quantity"))).as("qty_part"),
          count(lit(1)).as("n_part"))
      partial
        .groupBy(col("l_returnflag"))
        .agg(sum(col("qty_part")).cast("double").as("sum_qty"),
          sum(col("n_part")).as("n"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_skew_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
