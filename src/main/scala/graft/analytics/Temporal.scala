package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** SURVEY.md §2.8 — incremental / streaming semantics, expressed in
  * batch form so the DuckDB oracle can verify them. The genuinely
  * streaming execution (readStream + watermark + AvailableNow) lives in
  * [[graft.streaming.Streams]] and is asserted equal to these batch
  * plans in ScalaTest.
  *
  * Reference touchpoints: strict-`>` date watermark (dags/ETL.py:68-74),
  * hourly incremental batches (dags/ETL.py:40), checkpoint cursor
  * (dags/ETL.py:47-62).
  *
  * Scale notes: the watermark predicate lands in `PushedFilters` of the
  * parquet scan (partition pruning when the warehouse is written
  * partitioned-by-date); all window aggregations below are single-
  * shuffle hash aggregates on (window, key).
  */
object Temporal {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // High-watermark incremental extract: strictly-greater-than cursor.
    "q_incremental" -> ((s, dir) =>
      Tables(s, dir, "events")
        .filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
        .orderBy(col("event_type"))),

    // First event per user — written with the row_number window idiom
    // users actually write, EXECUTED as a sort-free min_by hash
    // aggregate by graft.plans.RewriteTop1PerGroup (asserted in
    // RuleSpec: the optimized plan has no Window node). The window
    // form would shuffle and sort every event of every user to keep
    // one row each; the rewrite ships one partial row per user per
    // mapper and sorts nothing.
    "q_first_event" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .orderBy(col("user_id"))
    }),

    // Incremental materialized-view maintenance: the warehouse keeps a
    // per-key aggregate table (n, total, mn, mx); a delta batch
    // arrives past the watermark; the refreshed MV is a MERGE OF
    // PARTIALS, never a recompute over base facts. count/sum/min/max
    // are algebraic — partials combine by sum/sum/min/max, and avg
    // derives as total/n at read time (avg itself is NOT algebraic:
    // merging avgs loses the weights). At 100 TB this turns the daily
    // full-table aggregate into an O(delta) job; it is also exactly
    // Spark's own partial→final aggregation contract, applied across
    // batches instead of across partitions. The oracle recomputes from
    // all facts — merged partials must match the full recompute
    // hash-exactly (decimal sums make the merge order-free).
    "q_mv_merge" -> ((s, dir) => {
      val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
      def partial(df: DataFrame): DataFrame = df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("total"),
          min(col("value")).as("mn"), max(col("value")).as("mx"))
      val ev = Tables(s, dir, "events")
      val baseMv = partial(ev.filter(col("ts") <= cutoff)) // stored MV
      val delta = partial(ev.filter(col("ts") > cutoff))   // new batch
      baseMv.unionByName(delta)
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("total")).as("total"),
          min(col("mn")).as("mn"), max(col("mx")).as("mx"))
        .select(col("event_type"), col("n"),
          col("total").cast("double").as("total"), col("mn"), col("mx"),
          (col("total").cast("double") / col("n")).as("avg_value"))
        .orderBy(col("event_type"))
    }),

    // Tumbling 1-hour windows (batch form of q_stream_tumbling).
    "q_stream_tumbling" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("win_start"), col("event_type"))),

    // Sliding 1-hour windows every 15 minutes.
    "q_stream_sliding" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))
        .orderBy(col("win_start"), col("event_type"))),

    // Streaming exact dedup — unlike the other q_stream_* entries
    // (batch forms of streaming semantics), this one EXECUTES on the
    // streaming engine: readStream → state-backed dropDuplicates →
    // memory sink, drained synchronously. Keys only (the first-seen
    // row is arrival-order-dependent; the key set is deterministic).
    "q_stream_dedup" -> ((s, dir) =>
      graft.streaming.Streams.dedupToTable(s, dir, "stream_dedup_sink")
        .select(col("user_id"), col("event_type"))
        .orderBy(col("user_id"), col("event_type"))),

    // Stream-stream interval join — EXECUTES on the streaming engine
    // (two watermarked streams, state-bounded inner join; see
    // Streams.intervalJoinToTable). Inner-join pair sets are
    // arrival-order-independent, so the full result is oracle-exact.
    "q_stream_join" -> ((s, dir) =>
      graft.streaming.Streams.intervalJoinToTable(s, dir, "stream_join_sink")
        .orderBy(col("view_id"), col("buy_id"))),

    // LEFT OUTER stream-stream join — EXECUTES on the streaming
    // engine; unmatched views emit null-padded when the watermark
    // passes their window (state eviction IS the emission; see
    // Streams.leftOuterIntervalJoinToTable for the sentinel-staged
    // flush). The full pair set equals the batch left join exactly.
    "q_stream_leftouter" -> ((s, dir) =>
      graft.streaming.Streams.leftOuterIntervalJoinToTable(
          s, dir, "stream_loj_sink")
        .orderBy(col("view_id"), col("buy_id"))),

    // Per-user running stats on the Spark 4 arbitrary-state API
    // (transformWithState + RocksDB store) — EXECUTES on the
    // streaming engine; the single-drain totals equal the batch
    // aggregate exactly (integer-cent sums, order-free).
    "q_stream_user_stats" -> ((s, dir) =>
      graft.streaming.Streams.userStatsTwsToTable(s, dir, "stream_tws_sink")
        .orderBy(col("user_id"))),

    // Streaming corpus quality gate — EXECUTES on the streaming
    // engine: document stream → Gopher rule filter (the exact batch
    // Column tree, shared via TextAnalysis.gopherFlags) → per-lang
    // kept-counts in complete mode. Final counts are deterministic.
    "q_stream_quality" -> ((s, dir) =>
      graft.streaming.Streams.qualityCountsToTable(s, dir, "stream_quality_sink")
        .orderBy(col("lang"))),

    // EXECUTES on the streaming engine: document stream → PII
    // redaction (the exact batch Column tree, shared via
    // TextAnalysis.piiScrub) in append mode — the compliance gate
    // that scrubs every document AT ingest, before raw text can
    // persist. Shares q_pii_scrub's oracle — batch and stream cannot
    // drift.
    "q_stream_pii" -> ((s, dir) =>
      graft.streaming.Streams.piiToTable(s, dir, "stream_pii_sink")
        .orderBy(col("doc_id"))),

    // EXECUTES on the streaming engine: stream-static enrichment join
    // (event stream ⋈ broadcast customer dim) + per-segment totals.
    "q_stream_enrich" -> ((s, dir) =>
      graft.streaming.Streams.enrichToTable(s, dir, "stream_enrich_sink")
        .orderBy(col("c_mktsegment"))),

    // EXECUTES on the streaming engine: per-user flatMapGroupsWithState
    // emits consecutive event-type pairs (O(1) state/user — the
    // unbounded-stream form of the batch lead() window); counts +
    // exact conditional probabilities aggregate the drained pairs.
    // Shares q_transitions' oracle — streaming and batch cannot drift.
    "q_stream_transitions" -> ((s, dir) => {
      val wFrom = org.apache.spark.sql.expressions.Window
        .partitionBy(col("from_type"))
      graft.streaming.Streams
        .transitionsToTable(s, dir, "stream_trans_sink")
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / sum(col("n")).over(wFrom)).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // EXECUTES on the streaming engine: complete-mode top-3 event
    // types by count — sort+limit runs INSIDE the streaming query
    // (only complete mode allows it), i.e. a live leaderboard.
    "q_stream_topk" -> ((s, dir) =>
      graft.streaming.Streams.topkToTable(s, dir, "stream_topk_sink", 3)
        .orderBy(col("n").desc, col("event_type"))),

    // EXECUTES on the streaming engine: per-user O(1)-state strict-
    // order funnel (Streams.funnelToTable); the drained per-user flag
    // rows OR per user (flags are monotone across batches) and count
    // into the same 1-row summary as batch q_funnel, whose oracle this
    // shares — streaming and batch funnels cannot drift.
    "q_stream_funnel" -> ((s, dir) => {
      val per = graft.streaming.Streams
        .funnelToTable(s, dir, "stream_funnel_sink")
        .groupBy(col("user_id"))
        .agg(expr("bool_or(has_view)").as("v"),
          expr("bool_or(has_click)").as("c"),
          expr("bool_or(has_purchase)").as("p"))
      per.agg(sum(when(col("v"), 1L).otherwise(0L)).as("n_view"),
        sum(when(col("c"), 1L).otherwise(0L)).as("n_click"),
        sum(when(col("p"), 1L).otherwise(0L)).as("n_purchase"))
    }),

    // EXECUTES on the streaming engine: per-user O(1)-state last-touch
    // attribution (Streams.attributionToTable) — each purchase is
    // credited the moment it arrives against the latest stored
    // view/click; the drained per-purchase rows aggregate to the batch
    // attribution table exactly, so this shares q_attribution's oracle
    // and streaming/batch attribution cannot drift.
    "q_stream_attribution" -> ((s, dir) =>
      graft.streaming.Streams
        .attributionToTable(s, dir, "stream_attr_sink")
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          moneySum(col("value")).as("revenue"),
          sum(col("wait_us")).as("wait_us_total"))
        .orderBy(col("touch_type"))),

    // EXECUTES on the streaming engine: foreachBatch keyed upsert —
    // the changelog→table materialization (CDC apply / SCD1): one
    // stored row per user, each micro-batch merges its per-key argmax
    // by (ts, event_id); associative+commutative merge ⇒ arrival-order
    // invariant ⇒ equals the batch last-row-per-key window query.
    "q_stream_upsert" -> ((s, dir) => {
      val work = graft.util.WorkDirs.temp("graft_sups")
      graft.streaming.Streams.upsertIngest(s, dir, work)
        .orderBy(col("user_id"))
    }),

    // EXECUTES on the streaming engine: per-micro-batch as-of
    // enrichment against the static orders dim through the NATIVE
    // broadcast as-of operator (feature-store lookup; Structured
    // Streaming has no as-of join type — foreachBatch is the door).
    // Row-local against an immutable dim ⇒ arrival-order invariant ⇒
    // shares q_asof_join's oracle.
    "q_stream_asof" -> ((s, dir) => {
      val work = graft.util.WorkDirs.temp("graft_sasof")
      graft.streaming.Streams.asofEnrichIngest(s, dir, work)
        .orderBy(col("event_id"))
    }),

    // EXECUTES on the streaming engine: foreachBatch incremental MV
    // maintenance — per-key algebraic partials (n, decimal total, mn,
    // mx) merged batch-over-batch, never recomputing base facts; the
    // final stored MV must equal the full recompute bit-for-bit (the
    // same contract q_mv_merge asserts across two batches, here across
    // three genuine micro-batches with a versioned write-then-swap).
    "q_stream_mv_merge" -> ((s, dir) => {
      val work = graft.util.WorkDirs.temp("graft_smv")
      graft.streaming.Streams.mvMergeIngest(s, dir, work)
        .select(col("event_type"), col("n"),
          col("total").cast("double").as("total"), col("mn"), col("mx"),
          (col("total").cast("double") / col("n")).as("avg_value"))
        .orderBy(col("event_type"))
    }),

    // EXECUTES on the streaming engine: timeout-closed sessionization
    // (flatMapGroupsWithState + EventTimeTimeout) — per-user state is
    // only the OPEN session and watermark-driven eviction IS the
    // emission, i.e. the sessionizer that survives an unbounded stream
    // with bounded state (see Streams.sessionizeTimeoutToTable for the
    // sentinel-staged tail flush).
    "q_stream_sessionize" -> ((s, dir) =>
      graft.streaming.Streams
        .sessionizeTimeoutToTable(s, dir, "stream_sessto_sink")
        .orderBy(col("user_id"), col("sess_start"))),

    // Session windows: 30-minute inactivity gap per user.
    "q_stream_session" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
        .select(col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"), col("user_id"),
          col("n"), col("total_value"))
        .orderBy(col("user_id"), col("sess_start")))
  )

  /** Shared by q_mv_merge and q_stream_mv_merge: both assert "merged
    * partials == full recompute", so they must check against the SAME
    * recompute or the contract silently diverges.
    */
  private val MvRecomputeOracle =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  min(value) AS mn, max(value) AS mx,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_incremental" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Full recompute over all facts — the merged partials must equal it.
    "q_mv_merge" -> MvRecomputeOracle,
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    // Each event belongs to the 4 sliding windows whose start is
    // floor15(ts) - k*15min, k=0..3 — same set Spark's `window()` emits.
    "q_stream_sliding" ->
      """SELECT win_start, event_type, count(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - (k * INTERVAL '15 minutes') AS win_start, event_type
        |  FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k))
        |GROUP BY win_start, event_type ORDER BY win_start, event_type""".stripMargin,
    "q_stream_dedup" ->
      """SELECT user_id, event_type FROM events
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "q_first_event" ->
      """SELECT user_id, event_id, event_type, ts FROM (
        |  SELECT user_id, event_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_stream_transitions" ->
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
    "q_stream_enrich" ->
      """SELECT c.c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "q_stream_quality" ->
      """WITH m AS (SELECT lang,
        |  CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS INT) AS n_tok,
        |  CAST(length(array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> ''), '')) AS INT) AS n_tok_chars,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|a)\b')) AS INT) AS n_stop,
        |  CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS INT) AS n_sym
        |FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept FROM m
        |WHERE (n_tok >= 25 AND n_tok <= 75)
        |  AND (CAST(n_tok_chars AS DOUBLE) / greatest(n_tok, 1) >= 3.0
        |    AND CAST(n_tok_chars AS DOUBLE) / greatest(n_tok, 1) <= 10.0)
        |  AND (CAST(n_sym AS DOUBLE) / greatest(n_tok, 1) < 0.1)
        |  AND (CAST(n_stop AS DOUBLE) / greatest(n_tok, 1) >= 0.06)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Verbatim q_pii_scrub oracle — ONE SQL text for the batch scrub
    // and its ingest-time twin.
    "q_stream_pii" ->
      """WITH w AS (SELECT doc_id,
        |  lower(text) || ' contact doc' || CAST(doc_id AS VARCHAR)
        |    || '@example.com acct '
        |    || CAST(doc_id * 1000003 + 100000 AS VARCHAR) AS t0
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t0,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(t0, '[0-9]{6,}')) AS INT)
        |    AS n_longnums,
        |  md5(regexp_replace(regexp_replace(t0,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+', '<email>', 'g'),
        |    '[0-9]{6,}', '<num>', 'g')) AS scrub_hash
        |FROM w ORDER BY doc_id""".stripMargin,
    "q_stream_join" ->
      """SELECT a.event_id AS view_id, b.event_id AS buy_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'view' AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY view_id, buy_id""".stripMargin,
    "q_stream_leftouter" ->
      """SELECT a.event_id AS view_id, b.event_id AS buy_id
        |FROM (SELECT * FROM events WHERE event_type = 'view') a
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY view_id, buy_id""".stripMargin,
    "q_stream_user_stats" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_stream_topk" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3""".stripMargin,
    "q_stream_funnel" ->
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
    // Identical to q_attribution's oracle — streaming credit
    // assignment must equal the batch LOCF window.
    "q_stream_attribution" -> Behavioral.oracles("q_attribution"),
    "q_stream_upsert" ->
      """SELECT user_id, ts AS last_ts, event_type AS last_type,
        |  value AS last_value
        |FROM (SELECT user_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // Identical to q_asof_join's oracle — per-batch enrichment against
    // an immutable dim must equal the one-shot batch join.
    "q_stream_asof" -> TemporalJoins.oracles("q_asof_join"),
    // Full recompute over all facts — the streamed MV must equal it
    // (literally q_mv_merge's oracle; the two cannot drift apart).
    "q_stream_mv_merge" -> MvRecomputeOracle,
    // Same gaps-and-islands reconstruction as q_stream_session (split
    // STRICTLY > 30 min; end = last event + gap), keyed output shape.
    "q_stream_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_sess
        |  FROM events),
        |grouped AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM flagged)
        |SELECT user_id, min(ts) AS sess_start,
        |  max(ts) + INTERVAL '30 minutes' AS sess_end,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM grouped GROUP BY user_id, sess
        |ORDER BY user_id, sess_start""".stripMargin,
    // Gaps-and-islands reconstruction of Spark's session_window: a new
    // session starts when the gap since the previous event is STRICTLY
    // > 30min (an event at exactly prev+gap still merges — probed
    // empirically, property-tested in BehavioralProperties); session
    // end = last event + gap.
    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_sess
        |  FROM events),
        |grouped AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM flagged)
        |SELECT min(ts) AS sess_start, max(ts) + INTERVAL '30 minutes' AS sess_end,
        |  user_id, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM grouped GROUP BY user_id, sess
        |ORDER BY user_id, sess_start""".stripMargin
  )
}
