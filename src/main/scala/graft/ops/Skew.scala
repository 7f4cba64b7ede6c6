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
    // Salted JOIN for a skewed key distribution: the probe side gets a
    // deterministic salt, the build side is replicated once per salt
    // value, and the join key becomes (key, salt) — a hot key's rows
    // now spread over `Salt` reducers. Cost: build side ×Salt (use
    // only for the skewed key subset in production; AQE's runtime
    // skew-join split is the zero-code alternative).
    "q_skew_salted_join" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .withColumn("salt_l", pmod(col("l_orderkey"), lit(Salt)))
      val ords = Tables(s, dir, "orders")
        .withColumn("salt_r", explode(array((0 until Salt).map(i => lit(i)): _*)))
      // SHUFFLE_HASH forces the exchange on (key, salt): the planner's
      // size estimate does not grow through explode, so left alone it
      // auto-BROADCASTS the ×Salt-replicated build side (measured 0 MB
      // shuffled at sf0.1) — silently un-demonstrating the salt (a
      // broadcast join has no reducer skew to spread) and, at scale,
      // shipping Salt copies of the dimension to every executor.
      li.hint("shuffle_hash").join(ords,
          col("l_orderkey") === col("o_orderkey") && col("salt_l") === col("salt_r"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderstatus"))
    }),

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
    "q_skew_salted_join" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_skew_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
