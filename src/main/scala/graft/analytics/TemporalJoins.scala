package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal join operators Spark has no native node for, composed from
  * built-ins with exact semantics (preference (a) of the custom-op
  * ladder — no planner hook needed):
  *
  *  - q_asof_join: for each event, the latest order of that customer
  *    at-or-before the event time. Join + per-event top-1; Catalyst
  *    prunes and pushes both sides. At 100 TB the same semantics run
  *    as a sort-merge scan: co-partition both sides by key, sort by
  *    time, and a single merge pass per partition (mapPartitions) —
  *    the composed form here stays correct but multiplies matches
  *    before ranking, so prefer the merge form when per-key match
  *    lists are long.
  *  - q_range_join: all event pairs within a 60 s band. The naive form
  *    is an O(n²) theta join; bucketing each side by minute and
  *    replicating ONE side into its adjacent buckets turns it into an
  *    equi-join on the bucket key (every qualifying pair shares
  *    exactly one (bL, exploded-bR) combination — no dedup needed),
  *    with the exact predicate re-checked after. Work is
  *    Σ per-bucket products — linear for time-spread data.
  */
object TemporalJoins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"))
      val ords = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      ev.join(ords,
          col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
          "left")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey").as("asof_orderkey"), col("o_orderdate").as("asof_date"))
        .orderBy(col("event_id"))
    }),

    // Same semantics as q_asof_join, executed by the NATIVE custom
    // physical operator (plans/AsOfJoin: logical node + strategy +
    // BroadcastAsOfJoinExec). O(log m) probe per event, no shuffle of
    // the event side; AsOfPlanSpec asserts the plan shape.
    "q_asof_native" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"))
      val ords = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        // date <= timestamp comparisons coerce date → midnight; make
        // the same cast explicit for the native operator's time key.
        .withColumn("o_ts", col("o_orderdate").cast("timestamp"))
      graft.plans.AsOfJoin.broadcastAsOf(ev, ords,
          Seq("user_id"), Seq("o_custkey"), "ts", "o_ts", Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey").as("asof_orderkey"), col("o_orderdate").as("asof_date"))
        .orderBy(col("event_id"))
    }),

    // The co-partitioned MERGE form of the as-of join — the variant
    // the broadcast operator can't cover when the build side is
    // fact-sized: `cogroup` co-shuffles both sides once on the key,
    // each group sorts its own slices, and one forward pointer pass
    // emits the latest at-or-before order per event (orders ascending
    // by (date, key) ⇒ the last qualifying one IS the (date, key)-max,
    // matching the window tiebreak). O(|evs|·log + |ords|·log) per
    // key, no per-event candidate blowup, no broadcast. Same oracle
    // as q_asof_join/q_asof_native — three executions, one semantic.
    "q_asof_merge" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
        .as[(Long, Long, java.sql.Timestamp)]
      val ords = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp"))
        .as[(Long, Long, java.sql.Timestamp)]
      def us(t: java.sql.Timestamp): Long =
        t.getTime / 1000 * 1000000L + t.getNanos / 1000
      val merged = ev.groupByKey(_._2).cogroup(ords.groupByKey(_._1)) {
        (user, evs, os) =>
          val events = evs.toArray.sortBy(e => (us(e._3), e._1))
          val orders = os.toArray.sortBy(o => (us(o._3), o._2))
          var i = 0
          var best: Option[(Long, java.sql.Timestamp)] = None
          events.iterator.map { case (eid, _, ts) =>
            while (i < orders.length && us(orders(i)._3) <= us(ts)) {
              best = Some((orders(i)._2, orders(i)._3)); i += 1
            }
            (eid, user, ts, best.map(_._1), best.map(_._2))
          }
      }
      merged.toDF("event_id", "user_id", "ts", "asof_orderkey", "asof_date")
        .orderBy(col("event_id"))
    }),

    "q_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("ts"), expr("unix_micros(ts)").as("us"))
      val bucket = expr("unix_micros(ts) div 60000000")
      val left = ev.withColumn("b", bucket)
        .select(col("b"), col("event_id").as("id1"), col("us").as("us1"))
      val right = ev.withColumn("b0", bucket)
        .select(explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("b"),
          col("event_id").as("id2"), col("us").as("us2"))
      left.join(right, Seq("b"))
        .where(col("id1") < col("id2") &&
          abs(col("us2") - col("us1")) <= 60000000L)
        .select(col("id1"), col("id2"),
          ((col("us2") - col("us1")) / lit(1000000.0)).as("diff_s"))
        .orderBy(col("id1"), col("id2"))
    }),

    // Interval-OVERLAP join (two interval sets, `aS < bE AND bS < aE`)
    // — the third temporal-join shape after as-of (top-1 backward) and
    // range (point band). Views and purchases become [ts, ts+20min)
    // intervals per user; equal interval length L means overlapping
    // pairs start within L of each other, so bucketing both sides by
    // L and replicating ONE side to its adjacent buckets makes it an
    // equi-join on (user, bucket) — each qualifying pair shares
    // exactly one (own-bucket, exploded-bucket) combination, no dedup
    // — with the exact half-open predicate re-checked after. Variable-
    // length intervals at scale: bucket by a chosen L, replicate
    // ⌈len/L⌉+1 buckets per row (the q_range_join generalization).
    "q_interval_join" -> ((s, dir) => {
      val L = 1200L * 1000000L // 20 min in µs
      val ev = Tables(s, dir, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          expr("unix_micros(ts)").as("vs"),
          expr(s"unix_micros(ts) + ${L}").as("ve"),
          expr(s"unix_micros(ts) div ${L}").as("b"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id"),
          expr("unix_micros(ts)").as("bs"),
          expr(s"unix_micros(ts) + ${L}").as("be"),
          expr(s"unix_micros(ts) div ${L}").as("b0"))
        .select(col("buy_id"), col("user_id"), col("bs"), col("be"),
          explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("b"))
      views.join(buys, Seq("user_id", "b"))
        .where(col("vs") < col("be") && col("bs") < col("ve"))
        .select(col("view_id"), col("buy_id"),
          ((least(col("ve"), col("be")) - greatest(col("vs"), col("bs"))) /
            lit(1000000.0)).as("overlap_s"))
        .orderBy(col("view_id"), col("buy_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT event_id, user_id, ts, o_orderkey AS asof_orderkey,
        |  o_orderdate AS asof_date
        |FROM (SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_asof_native" ->
      """SELECT event_id, user_id, ts, o_orderkey AS asof_orderkey,
        |  o_orderdate AS asof_date
        |FROM (SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_asof_merge" ->
      """SELECT event_id, user_id, ts, o_orderkey AS asof_orderkey,
        |  o_orderdate AS asof_date
        |FROM (SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      """SELECT a.event_id AS id1, b.event_id AS id2,
        |  (epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0 AS diff_s
        |FROM events a JOIN events b
        |  ON a.event_id < b.event_id
        | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
        |ORDER BY id1, id2""".stripMargin,
    "q_interval_join" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS vs,
        |    epoch_us(ts) + 1200000000 AS ve FROM events
        |  WHERE event_type = 'view'),
        |b AS (SELECT event_id AS buy_id, user_id, epoch_us(ts) AS bs,
        |    epoch_us(ts) + 1200000000 AS be FROM events
        |  WHERE event_type = 'purchase')
        |SELECT v.view_id, b.buy_id,
        |  (least(v.ve, b.be) - greatest(v.vs, b.bs)) / 1000000.0 AS overlap_s
        |FROM v JOIN b ON v.user_id = b.user_id
        |  AND v.vs < b.be AND b.bs < v.ve
        |ORDER BY view_id, buy_id""".stripMargin
  )
}
