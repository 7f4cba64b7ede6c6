package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** SURVEY.md §2.3 — joins. The reference has none (single-table
  * warehouse, scripts/postgres_db_scripts.sql:1-8); these declare and
  * verify the engine capability on the testdata star schema.
  *
  * Scale strategy per join:
  *  - q_join_inner:  dim join — explicit `broadcast(customer)` so the
  *    big side never shuffles (BroadcastHashJoin).
  *  - q_join_large:  fact⋈fact on the natural key — shuffled hash /
  *    sort-merge, both sides partitioned by the join key; AQE can
  *    re-plan skew at runtime.
  *  - q_join_semi / q_join_anti: existence checks without payload
  *    duplication (left_semi/left_anti — no row multiplication, the
  *    probe side streams).
  *  - q_join_multi: star join — all dims broadcast, single pass over
  *    the fact table, one shuffle for the final group-by.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_join_inner" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("total_price"))
        .orderBy(col("c_mktsegment"))),

    // MERGE hint: this entry's inventory role is the fact⋈fact
    // SHUFFLED join path (both sides exchanged on the key). At bench
    // SFs the orders file squeaks under autoBroadcastJoinThreshold and
    // the planner would quietly broadcast — correct planning for small
    // inputs, but it would leave the sort-merge path with zero bench
    // coverage and the measured shuffle at 0 MB. At warehouse scale
    // the hint is a no-op (both sides are far past the threshold).
    "q_join_large" -> ((s, dir) =>
      Tables(s, dir, "lineitem").hint("merge")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))),

    "q_join_semi" -> ((s, dir) => {
      val bigOrders = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
      Tables(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_anti" -> ((s, dir) => {
      val bigOrders = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
      Tables(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_without_big_order"))
        .orderBy(col("c_mktsegment"))
    }),

    // Outer joins: unmatched rows survive with nulls.
    "q_join_left" -> ((s, dir) => {
      val bigOrders = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      Tables(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big"),
          moneySum(col("o_totalprice")).as("big_total"))
        .orderBy(col("c_custkey"))
    }),

    // RIGHT outer — the mirror of q_join_left with the dim on the
    // probe side: orders RIGHT JOIN customer keeps every customer.
    // Planned as the same broadcast join with build/probe swapped;
    // registered so the enumerable join-type surface is complete.
    "q_join_right" -> ((s, dir) => {
      val bigOrders = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      bigOrders
        .join(Tables(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big"),
          moneySum(col("o_totalprice")).as("big_total"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_full" -> ((s, dir) => {
      val hi = Tables(s, dir, "orders").filter(col("o_totalprice") > 480000)
        .select(col("o_custkey").as("k"), col("o_orderkey").as("hi_key"))
      val lo = Tables(s, dir, "orders").filter(col("o_totalprice") < 2000)
        .select(col("o_custkey").as("k2"), col("o_orderkey").as("lo_key"))
      hi.join(lo, col("k") === col("k2"), "full")
        .select(coalesce(col("k"), col("k2")).as("custkey"),
          col("hi_key"), col("lo_key"))
        .orderBy(col("custkey").asc_nulls_first,
          col("hi_key").asc_nulls_first, col("lo_key").asc_nulls_first)
    }),

    // TPC-H Q5-shaped star join: revenue by nation for one region.
    "q_join_multi" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = broadcast(Tables(s, dir, "customer"))
      val n = broadcast(Tables(s, dir, "nation"))
      val r = broadcast(Tables(s, dir, "region").filter(col("r_name") === "EUROPE"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // Explicit Bloom-prefilter join: build a Bloom filter over the
    // (selective) dim keys, drop probe rows that cannot match BEFORE
    // the shuffle, then verify exactly with the real join — Bloom
    // false positives die in the join, false negatives don't exist,
    // so the result is identical to the plain join (and the oracle IS
    // the plain join). This is the manual form of the runtime bloom
    // pruning Spark injects automatically (asserted in SourcesSpec);
    // explicit construction matters when the filter must cross jobs
    // (e.g. built once, reused by N incremental loads). The probe is
    // Spark's own codegen BloomFilterMightContain expression over the
    // serialized filter (via PlanBridge — the expression is not in the
    // public Column API), NOT a Scala udf: the filter scan stays
    // inside whole-stage codegen with mightContainLong inlined per
    // row, and the plan shape is pinned in SourcesSpec.
    "q_bloom_prefilter" -> ((s, dir) => {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.graft.PlanBridge
      import org.apache.spark.sql.types.BinaryType
      val dim = Tables(s, dir, "orders")
        .where(col("o_totalprice") > 400000)
        .select(col("o_orderkey"))
      val bf = dim.stat.bloomFilter("o_orderkey", 20000, 0.01)
      val bytes = {
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        bos.toByteArray
      }
      val might = PlanBridge.column(BloomFilterMightContain(
        Literal(bytes, BinaryType), PlanBridge.expression(col("l_orderkey"))))
      Tables(s, dir, "lineitem")
        .where(might)
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracles: Map[String, String] = Map(
    // The bloom prefilter is a lossless optimization — oracle is the
    // plain join it accelerates.
    "q_bloom_prefilter" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_large" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_without_big_order FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |  WHERE o_totalprice > 450000) o ON c_custkey = o.o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |  WHERE o_totalprice > 450000) o
        |RIGHT JOIN customer ON c_custkey = o.o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """SELECT coalesce(k, k2) AS custkey, hi_key, lo_key FROM
        |  (SELECT o_custkey AS k, o_orderkey AS hi_key FROM orders
        |   WHERE o_totalprice > 480000) hi
        |FULL OUTER JOIN
        |  (SELECT o_custkey AS k2, o_orderkey AS lo_key FROM orders
        |   WHERE o_totalprice < 2000) lo ON k = k2
        |ORDER BY custkey ASC NULLS FIRST, hi_key ASC NULLS FIRST,
        |  lo_key ASC NULLS FIRST""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
