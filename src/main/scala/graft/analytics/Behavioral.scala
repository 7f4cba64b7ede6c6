package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Tables
import graft.util.Exact

/** Behavioral / warehouse-maintenance patterns over the `events` and
  * `orders` tables (reference: the dashboard's per-entity activity
  * cards, README.md:154-161, and the hourly upsert-style ETL of
  * dags/ETL.py:37-154 — its Postgres load is effectively a keyed
  * merge of new rows into existing state):
  *
  *  - q_sessionize: batch gaps-and-islands sessionization (30-min
  *    inactivity gap), the stateless complement of the streaming
  *    `session_window` (q_stream_session). One window pass partitioned
  *    by user — shuffles once on user_id, never a global sort.
  *  - q_funnel: strict-order view→click→purchase funnel. Three
  *    per-user min-aggregates chained by key joins; each stage
  *    re-shuffles on user_id so AQE can coalesce, and stage frames
  *    shrink monotonically.
  *  - q_retention: weekly cohort retention triangle. distinct
  *    (user, week) pairs → per-user min week (cohort) → count per
  *    (cohort, offset). All shuffles on user_id / (cohort, week_no).
  *  - q_merge_upsert: CDC merge of an aggregated change batch into a
  *    keyed snapshot (insert/update/keep actions) via one full-outer
  *    join — the MERGE INTO shape without a transactional table
  *    format. Decimal-exact balance arithmetic (graft.util.Exact).
  *
  * 100 TB story: every operator here shuffles only on its natural key
  * (user_id / merge key) — hash-partition both sides, no broadcast
  * needed since both sides are fact-sized; sessionization and
  * retention are single-window/single-agg passes. The merge's
  * full-outer join co-partitions snapshot and delta; with a bucketed
  * snapshot (sources/Bucketing) the snapshot side never re-shuffles
  * across incremental runs.
  */
object Behavioral {
  type Q = (SparkSession, String) => DataFrame

  private val GapUs = 1800L * 1000000L // 30 min session gap
  private val WeekUs = 604800000000.0  // µs per week (exact in double)

  /** Gaps-and-islands sessionizer — the production column tree, shared
    * with BehavioralProperties so the boundary property guards exactly
    * what q_sessionize ships. STRICTLY > gap starts a new session:
    * session_window's convention — an event at exactly prev+gap still
    * merges (probed empirically; the window end extends per event).
    */
  def sessionize(ev0: DataFrame, user: String, ts: String,
      tiebreaks: Seq[Column], gapUs: Long): DataFrame = {
    val ev = ev0.withColumn("us", expr(s"unix_micros($ts)"))
    val ord = col(ts) +: tiebreaks
    val w = Window.partitionBy(col(user)).orderBy(ord: _*)
    val run = Window.partitionBy(col(user)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("nf",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1).otherwise(0))
      .withColumn("sess_id", sum(col("nf")).over(run))
      .groupBy(col(user), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(ts)).as("start_ts"), max(col(ts)).as("end_ts"),
        ((max(col("us")) - min(col("us"))) / lit(1000000.0)).as("dur_s"))
  }

  val queries: Map[String, Q] = Map(
    "q_sessionize" -> ((s, dir) =>
      sessionize(
        Tables(s, dir, "events").select(col("user_id"), col("event_id"), col("ts")),
        "user_id", "ts", Seq(col("event_id")), GapUs)
        .orderBy(col("user_id"), col("sess_id"))),

    "q_funnel" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id").where(col("ts") > col("tv"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("ts") > col("tc"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    }),

    // Conversion-window funnel: q_funnel with a 7-day bound at each
    // stage (the realistic attribution form — a purchase a month
    // after the click doesn't convert). Same chained min-aggregate
    // shape; the bound is exact µs interval arithmetic.
    "q_funnel_bounded" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id")
        .where(col("ts") > col("tv") &&
          col("ts") <= col("tv") + expr("interval 7 days"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id")
        .where(col("ts") > col("tc") &&
          col("ts") <= col("tc") + expr("interval 7 days"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    }),

    "q_retention" -> ((s, dir) => {
      val uw = Tables(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      uw.join(cohort, "user_id")
        .withColumn("week_no",
          ((expr("unix_micros(wk)") - expr("unix_micros(cohort)")) / lit(WeekUs))
            .cast("int"))
        .groupBy(col("cohort"), col("week_no"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"), col("week_no"))
    }),

    // Day-over-day percent change of daily totals per event type —
    // the BI trend column, computed on the AGGREGATED series (facts
    // collapse to decimal-exact daily totals first, the lag window
    // runs on the types×days grid). Division of two exact doubles,
    // round(6) display-only; first day emits NULL change.
    "q_pop_change" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(Exact.moneySum(col("value")).as("total"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("prev", lag(col("total"), 1).over(w))
        .select(col("event_type"), col("day"), col("total"),
          round((col("total") - col("prev")) / col("prev") * lit(100.0), 6)
            .as("pct_change"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Time-weighted average value per user (each observation weighted
    // by its holding duration until the next event — the IoT/position
    // averaging idiom where arithmetic means lie). Exact decimals:
    // value-cents × duration-µs products sum in DECIMAL(38,0), the
    // µs denominators in long, one double division at the end. One
    // lead() window on the user partition; users whose events all
    // share one microsecond (zero total duration) are excluded rather
    // than emitting 0/0.
    "q_time_weighted_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .where(col("next_us").isNotNull)
        .select(col("user_id"), (col("next_us") - col("us")).as("dur"),
          (Exact.dec(col("value")) * 100).cast("decimal(38,0)").as("vc"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("vc") * col("dur").cast("decimal(38,0)")).as("num"),
          sum(col("dur")).as("den"))
        .where(col("den") > 0)
        .select(col("user_id"), col("n_spans"),
          round(col("num").cast("double") / col("den").cast("double") /
            lit(100.0), 6).as("twa"))
        .orderBy(col("user_id"))
    }),

    // Per-type outlier counts via 3σ z-score. Exactness trick: the
    // only order-dependent quantities (Σv, Σv²) are summed in DECIMAL
    // (exact, order-free); mean/variance/the squared-deviation
    // comparison are then derived in double with the SAME formula
    // order in both engines, so even the threshold comparison is
    // bit-identical. Two passes over events: one tiny stats aggregate
    // (|event_type| rows, broadcast back), one map-side flag+count.
    "q_anomaly" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").select(col("event_type"), col("value"))
      val stats = ev.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(Exact.dec(col("value"))).as("svd"),
          sum(Exact.dec(col("value")) * Exact.dec(col("value"))).as("sv2d"))
        .select(col("event_type"), col("n"),
          (col("svd").cast(DoubleType) / col("n")).as("mean"),
          (col("sv2d").cast(DoubleType) / col("n")).as("m2"))
        .withColumn("variance", col("m2") - col("mean") * col("mean"))
      ev.join(broadcast(stats), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("n")).as("n"), round(first(col("mean")), 6).as("mean"),
          sum(when((col("value") - col("mean")) * (col("value") - col("mean"))
            > lit(9.0) * col("variance"), 1L).otherwise(0L)).as("n_out"))
        .orderBy(col("event_type"))
    }),

    // Event-type transition matrix (first-order Markov statistics):
    // per-user next-event pairs via lead() over (ts, event_id) —
    // event_id breaks timestamp ties deterministically — then global
    // transition counts and conditional probabilities (exact integer
    // division). One shuffle on user_id for the window, one tiny agg;
    // the |types|² matrix is broadcast-scale at any corpus size.
    // Last-touch attribution: each purchase is credited to the user's
    // most recent PRECEDING touchpoint (view/click), or 'direct' if
    // none — the marketing-analytics join of sessionization and the
    // as-of idea, executed as one LOCF window pass (last(...,
    // ignoreNulls) over rows [-∞, -1]) — shuffles once on user_id,
    // no self-join, no per-purchase probe. Revenue rides the decimal
    // money sum; waiting time totals in exact integer micros.
    "q_attribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("touch", last(
          when(col("event_type").isin("view", "click"), col("event_type")),
          ignoreNulls = true).over(w))
        .withColumn("touch_us", last(
          when(col("event_type").isin("view", "click"),
            expr("unix_micros(ts)")),
          ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("direct")).as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          Exact.moneySum(col("value")).as("revenue"),
          sum(when(col("touch_us").isNotNull,
            expr("unix_micros(ts)") - col("touch_us"))).as("wait_us_total"))
        .orderBy(col("touch_type"))
    }),

    "q_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy("from_type").agg(sum(col("n")).as("n_from"))
      pairs.join(tot, Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("n_from")).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Sweep-line peak concurrency: events become [ts, ts+10min)
    // intervals; ±1 deltas collapse per distinct instant FIRST (so the
    // running sum is tie-order-free — intermediate values inside an
    // instant never exist), then one cumulative window per event_type
    // yields the concurrency curve; its max and first argmax come from
    // a second frame-free window over the same partition (one shuffle
    // total). Half-open semantics: an interval ending at t no longer
    // counts at t, which the per-instant net (starts − ends) encodes
    // exactly. 100 TB: deltas aggregate to ≤2 rows per distinct
    // instant per type before the window; the per-type sweep is
    // inherently sequential — with billions of instants per type the
    // production form buckets by day and stitches boundary offsets
    // (the q_sequence_gaps pattern).
    "q_interval_overlap" -> ((s, dir) => {
      val iv = Tables(s, dir, "events")
        .select(col("event_type"), expr("unix_micros(ts)").as("us"))
        .withColumn("e_us", col("us") + lit(600L * 1000000L))
      val deltas = iv.select(col("event_type"), col("us").as("t"), lit(1L).as("d"))
        .unionAll(iv.select(col("event_type"), col("e_us").as("t"), lit(-1L).as("d")))
      val net = deltas.groupBy(col("event_type"), col("t"))
        .agg(sum(col("d")).as("net"))
      val wRun = Window.partitionBy(col("event_type")).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      net.withColumn("cur", sum(col("net")).over(wRun))
        .withColumn("peak", max(col("cur")).over(wAll))
        .where(col("cur") === col("peak"))
        .groupBy(col("event_type"))
        .agg(max(col("cur")).as("peak"), min(col("t")).as("peak_at_us"))
        .orderBy(col("event_type"))
    }),

    // Last-observation-carried-forward via lag(..., IGNORE NULLS): for
    // every event, the value of that user's most recent PURCHASE
    // strictly before it (purchases project to a nullable column, the
    // window skips the nulls). One window on the user partition — the
    // streaming analog is O(1) keyed state carrying the last purchase.
    "q_lag_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("pv",
          when(col("event_type") === "purchase", col("value")))
        .withColumn("last_purchase_value", lag(col("pv"), 1, null, true).over(w))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          col("last_purchase_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Per-customer 2-D skyline (Pareto frontier): an order survives if
    // no strictly-earlier order of the same customer had an
    // equal-or-higher price. Sort-free dominance test: a cumulative
    // max over a RANGE frame ending at 1 PRECEDING (same-day orders
    // can't dominate each other — strict date dominance needs the
    // RANGE frame, a ROWS frame would leak ties). Price compares in
    // exact decimal; one window on the natural customer partition.
    "q_skyline" -> ((s, dir) => {
      val t = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("day"),
          Exact.dec(col("o_totalprice")).as("price"))
        .withColumn("dd", datediff(col("day"), lit("1990-01-01").cast("date")))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("dd"))
        .rangeBetween(Window.unboundedPreceding, -1)
      t.withColumn("prev_max", max(col("price")).over(w))
        .where(col("prev_max").isNull || col("price") > col("prev_max"))
        .select(col("o_custkey"), col("o_orderkey"), col("day"),
          col("price").cast("double").as("price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Trailing-7-day rolling DISTINCT user counts per event type —
    // the window-distinct problem Spark (rightly) refuses as a window
    // function. Scale-shape: facts collapse to distinct (type, user,
    // day) triples first, each triple explodes to the ≤7 window days
    // it serves (a constant fanout on the already-collapsed frame,
    // grid-bounded by a semi-join), and ONE count-distinct aggregate
    // per (type, window-day) finishes — no per-window recompute, no
    // fact-sized window partition.
    "q_rolling_distinct" -> ((s, dir) => {
      val d = Tables(s, dir, "events")
        .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val grid = d.select(col("day")).distinct()
      d.select(col("event_type"), col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("day"))
        .join(grid, Seq("day"), "left_semi")
        .groupBy(col("event_type"), col("day"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"), col("day"))
    }),

    // SCD type-2 dimension build from an event log: consecutive
    // repeats of the tracked attribute collapse (lag() change filter),
    // each surviving change opens a version row whose validity closes
    // at the next change (lead() on the filtered frame) — NULL
    // valid_to marks the current version. Two windows, both on the
    // user_id partition, so the whole build is one shuffle on the
    // natural key; version counts are bounded by the change count, not
    // the event count.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ch = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNull || col("prev") =!= col("event_type"))
      ch.withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }),

    "q_merge_upsert" -> ((s, dir) => {
      // Snapshot deliberately misses every 7th key so the change batch
      // produces genuine inserts alongside updates and keeps.
      val snap = Tables(s, dir, "customer")
        .where(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey").as("key"), Exact.dec(col("c_acctbal")).as("bal"))
      val changes = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
        .groupBy(col("o_custkey").as("key"))
        .agg(sum(Exact.dec(col("o_totalprice"))).as("delta"))
      snap.join(changes, Seq("key"), "full_outer")
        .select(col("key"),
          when(col("delta").isNull, lit("keep"))
            .when(col("bal").isNull, lit("insert"))
            .otherwise(lit("update")).as("action"),
          (coalesce(col("bal"), lit(0).cast(DecimalType(18, 2))) +
            coalesce(col("delta"), lit(0).cast(DecimalType(18, 2))))
            .cast(DoubleType).as("new_bal"))
        .orderBy(col("key"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_attribution" ->
      """WITH t AS (SELECT user_id, ts, event_id, event_type, value,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN event_type END IGNORE NULLS)
        |      OVER w AS touch,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER w AS touch_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT coalesce(touch, 'direct') AS touch_type,
        |  count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(sum(CASE WHEN touch_us IS NOT NULL
        |    THEN epoch_us(ts) - touch_us END) AS BIGINT) AS wait_us_total
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |f AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nf
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT *, CAST(sum(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |      FROM f)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts,
        |  (max(us) - min(us)) / 1000000.0 AS dur_s
        |FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS tv FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase""".stripMargin,
    "q_funnel_bounded" ->
      """WITH v AS (SELECT user_id, min(ts) AS tv FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.tv
        |        AND e.ts <= v.tv + INTERVAL 7 DAY GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.tc
        |        AND e.ts <= c.tc + INTERVAL 7 DAY GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase""".stripMargin,
    "q_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
        |co AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id)
        |SELECT co.cohort,
        |  CAST((epoch_us(uw.wk) - epoch_us(co.cohort)) / 604800000000 AS INT) AS week_no,
        |  count(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN co ON uw.user_id = co.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_pop_change" ->
      """WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, day, total,
        |    lag(total) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM d)
        |SELECT event_type, day, total,
        |  round((total - prev) / prev * 100.0, 6) AS pct_change
        |FROM l ORDER BY event_type, day""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS vc,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_us
        |  FROM events),
        |g AS (SELECT user_id, count(*) AS n_spans,
        |    sum(vc * (next_us - us)) AS num, sum(next_us - us) AS den
        |  FROM e WHERE next_us IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_spans,
        |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 100.0, 6) AS twa
        |FROM g WHERE den > 0 ORDER BY user_id""".stripMargin,
    "q_anomaly" ->
      """WITH st AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
        |      AS DOUBLE) AS sv2
        |  FROM events GROUP BY event_type),
        |m AS (SELECT event_type, n, sv / n AS mean,
        |    sv2 / n - (sv / n) * (sv / n) AS variance FROM st)
        |SELECT e.event_type, m.n AS n, round(m.mean, 6) AS mean,
        |  CAST(sum(CASE WHEN (e.value - m.mean) * (e.value - m.mean)
        |    > 9.0 * m.variance THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM events e JOIN m ON e.event_type = m.event_type
        |GROUP BY e.event_type, m.n, m.mean ORDER BY e.event_type""".stripMargin,
    "q_transitions" ->
      """WITH p AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
        |  CAST(c.n AS DOUBLE) / t.n_from AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY c.from_type, c.to_type""".stripMargin,
    "q_lag_ignore_nulls" ->
      """SELECT user_id, event_id, ts, event_type,
        |  lag(CASE WHEN event_type = 'purchase' THEN value END, 1 IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS last_purchase_value
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,
    "q_skyline" ->
      """WITH t AS (SELECT o_custkey, o_orderkey,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS dd
        |  FROM orders),
        |m AS (SELECT *, max(price) OVER (PARTITION BY o_custkey ORDER BY dd
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM t)
        |SELECT o_custkey, o_orderkey, day, CAST(price AS DOUBLE) AS price
        |FROM m WHERE prev_max IS NULL OR price > prev_max
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rolling_distinct" ->
      """WITH d AS (SELECT DISTINCT event_type, user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |g AS (SELECT DISTINCT day FROM d)
        |SELECT d.event_type, g.day, count(DISTINCT d.user_id) AS n_users
        |FROM g JOIN d ON d.day BETWEEN g.day - 6 AND g.day
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_interval_overlap" ->
      """WITH iv AS (SELECT event_type, epoch_us(ts) AS us,
        |    epoch_us(ts) + 600000000 AS e_us FROM events),
        |d AS (SELECT event_type, us AS t, 1 AS d FROM iv
        |      UNION ALL SELECT event_type, e_us AS t, -1 AS d FROM iv),
        |n AS (SELECT event_type, t, sum(d) AS net FROM d GROUP BY 1, 2),
        |c AS (SELECT event_type, t, sum(net) OVER (PARTITION BY event_type
        |        ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS cur FROM n),
        |p AS (SELECT event_type, t, cur,
        |        max(cur) OVER (PARTITION BY event_type) AS peak FROM c)
        |SELECT event_type, CAST(max(cur) AS BIGINT) AS peak,
        |  min(t) AS peak_at_us
        |FROM p WHERE cur = peak GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_scd2" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS valid_to
        |  FROM ch)
        |SELECT user_id, event_id, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, valid_from, event_id""".stripMargin,
    "q_merge_upsert" ->
      """WITH snap AS (SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |              FROM customer WHERE c_custkey % 7 <> 0),
        |ch AS (SELECT o_custkey AS key,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS delta
        |       FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' GROUP BY 1)
        |SELECT COALESCE(snap.key, ch.key) AS key,
        |  CASE WHEN ch.delta IS NULL THEN 'keep'
        |       WHEN snap.bal IS NULL THEN 'insert'
        |       ELSE 'update' END AS action,
        |  CAST(COALESCE(snap.bal, 0) + COALESCE(ch.delta, 0) AS DOUBLE) AS new_bal
        |FROM snap FULL OUTER JOIN ch ON snap.key = ch.key
        |ORDER BY key""".stripMargin
  )
}
