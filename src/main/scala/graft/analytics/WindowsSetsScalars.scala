package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** SURVEY.md §2.5 window functions, §2.6 set operations, §2.7 scalar
  * functions. Reference touchpoints: the 2000-row card cap and sorted
  * bar (§2.4), `strip`/`title`/`int()` row cleaning (dags/ETL.py:96-105),
  * JSON round-tripping of whole records (ingest_csv_to_elastic.py:106-108).
  *
  * Determinism: every window orderBy carries a unique tiebreak column
  * so row_number/lag are reproducible; running sums aggregate DECIMAL
  * (order-independent) and only cast to double at the end.
  */
object WindowsSetsScalars {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Top-3 orders per customer ("worst day per county" shape).
    "q_window_rank" -> ((s, dir) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byPriceTies = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(byPrice))
        .withColumn("rnk", rank().over(byPriceTies))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"), col("rnk"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Running total per customer over time.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // lag/lead: delta vs previous order of the same customer.
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("prev_price"), col("next_key"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Global top-k: planned as TakeOrderedAndProject (per-partition
    // heap + driver merge — no global sort, scale-safe).
    "q_topk" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)),

    // §2.6 set ops (batch-append semantics of S7/S10 are unions).
    "q_union" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), lit("hi").as("bucket"))
      val lo = o.filter(col("o_totalprice") < 5000)
        .select(col("o_orderkey"), lit("lo").as("bucket"))
      hi.unionByName(lo).orderBy(col("o_orderkey"), col("bucket"))
    }),

    // Schema-evolution union: two snapshots whose schemas drifted
    // (columns added/dropped between corpus versions) merged with
    // unionByName(allowMissingColumns) — absent columns null-fill.
    // THE ingestion op for long-lived datasets: parquet snapshots
    // never all share one schema. Map-only (no shuffle but the sort).
    "q_union_evolve" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val v1 = o.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("key"), col("o_totalprice").as("total"))
      val v2 = o.where(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey").as("key"),
          col("o_orderpriority").as("prio"))
      v1.unionByName(v2, allowMissingColumns = true).orderBy(col("key"))
    }),

    "q_except" -> ((s, dir) => {
      val custs = Tables(s, dir, "customer").select(col("c_custkey").as("key"))
      val active = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 100000).select(col("o_custkey").as("key"))
      custs.except(active).orderBy(col("key"))
    }),

    "q_intersect" -> ((s, dir) => {
      val rich = Tables(s, dir, "customer")
        .filter(col("c_acctbal") > 5000).select(col("c_custkey").as("key"))
      val active = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 400000).select(col("o_custkey").as("key"))
      rich.intersect(active).orderBy(col("key"))
    }),

    // Multiset (ALL) set ops — distinct semantics from the two above:
    // EXCEPT ALL subtracts one occurrence per match (a customer with n
    // orders survives n−1 times — the "copies beyond the registry"
    // shape), INTERSECT ALL keeps min(count_l, count_r) copies. Spark
    // plans both as ONE hash aggregate counting per side then
    // replicating rows — a single shuffle on the row value, no join,
    // so they scale exactly like a groupBy on the same key.
    "q_except_all" -> ((s, dir) => {
      val ordered = Tables(s, dir, "orders").select(col("o_custkey").as("key"))
      val registry = Tables(s, dir, "customer").select(col("c_custkey").as("key"))
      ordered.exceptAll(registry).orderBy(col("key"))
    }),

    "q_intersect_all" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val big = o.filter(col("o_totalprice") > 200000).select(col("o_custkey").as("key"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("key"))
      big.intersectAll(urgent).orderBy(col("key"))
    }),

    // ntile quartiles WITHIN each priority class — the partitioned form
    // keeps every window partition bounded by the group's size (the
    // global-ntile variant would be q_batch_number's single-reducer
    // sort; at scale use the q_gini bucket-stitch to assemble global
    // ranks instead).
    "q_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("quartile", ntile(4).over(w))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"), col("quartile"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.7 scalar strings (P2 clean: trim/case/length; initcap parity
    // with Python str.title() is pinned in ScalaTest — DuckDB has no
    // initcap, so the oracle sticks to portable functions).
    "q_clean_strings" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
          trim(lower(col("c_name"))).as("name_lc"),
          upper(col("c_mktsegment")).as("seg_uc"),
          length(col("c_name")).as("name_len"))
        .orderBy(col("c_custkey"))),

    "q_scalar_strings" -> ((s, dir) =>
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          lpad(col("p_partkey").cast("string"), 10, "0").as("padded_key"))
        .filter(col("p_name").like("%a%"))
        .orderBy(col("p_partkey"))),

    "q_scalar_dates" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(lit("2001-12-31").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to_end"))
        .orderBy(col("o_orderkey")).limit(1000)),

    // §2.7 JSON: extract typed value from the events.props JSON blob,
    // aggregate per event type (exact int sums — no fp ambiguity).
    "q_scalar_json" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_type"),
          expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // S7 JSON-staging parity: serialize whole records to JSON and
    // re-parse them (the reference ships every row through NDJSON,
    // ingest_csv_to_elastic.py:104-113). The oracle compares the
    // ROUND-TRIPPED values against the raw table, so any lossiness in
    // to_json/from_json would hash-mismatch.
    "q_json_roundtrip" -> ((s, dir) => {
      val src = Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val schema = src.schema
      src.select(to_json(struct(col("*"))).as("js"))
        .select(from_json(col("js"), schema).as("rec"))
        .select(col("rec.event_id"), col("rec.event_type"), col("rec.value"))
        .orderBy(col("event_id")).limit(2000)
    }),

    // S1/S7 CSV parity through the ORACLE gate (the golden-file e2e in
    // CovidPipelineSpec covers the covid schema; this covers the
    // documents corpus): write documents to headered CSV, read back
    // with the explicit schema, and aggregate — counts, exact char
    // sums, and the lexicographic min/max of md5(text) per (lang,
    // source), so any quoting/escaping lossiness in the CSV sink or
    // scan hash-mismatches against the parquet-derived oracle. The
    // write stays distributed (one CSV part per partition).
    "q_csv_roundtrip" -> ((s, dir) => {
      val tmp = graft.util.WorkDirs.temp("graft_csv_rt")
      val docs = Tables(s, dir, "documents")
      docs.write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.option("header", "true").schema(docs.schema).csv(tmp)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"),
          min(md5(col("text"))).as("lo_md5"), max(md5(col("text"))).as("hi_md5"))
        .orderBy(col("lang"), col("source"))
    }),

    // DSv2 WRITE parity through the ORACLE gate: orders round-trip
    // through the graftsink connector (task files invisible until the
    // atomic manifest commit — graft.sources.GraftSink; the
    // commit/abort/orphan semantics themselves are executed in
    // SourcesSpec) and aggregate — so any encode/decode or
    // manifest-visibility lossiness in the V2 write path
    // hash-mismatches against the parquet-derived oracle.
    "q_sink_roundtrip" -> ((s, dir) => {
      val tmp = graft.util.WorkDirs.temp("graft_sink_rt")
      Tables(s, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
        .write.format("graftsink").option("path", tmp)
        .mode("overwrite").save()
      s.read.format("graftsink").load(tmp)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total_price"),
          min(col("id")).as("lo_id"), max(col("id")).as("hi_id"))
        .orderBy(col("o_orderpriority"))
    }),

    // P3 triad: missing key → default 0; unparseable → row dropped
    // (Spark cast yields null under non-ANSI; oracle uses TRY_CAST).
    "q_cast_default" -> ((s, dir) => {
      val raw = get_json_object(col("props"), "$.k")
      Tables(s, dir, "events")
        .select(col("event_id"), coalesce(raw, lit("0")).as("raw"))
        .withColumn("k", expr("try_cast(raw AS INT)"))
        .filter(col("k").isNotNull)
        .select(col("event_id"), col("k"))
        .orderBy(col("event_id")).limit(2000)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
        |FROM orders QUALIFY rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_union" ->
      """SELECT o_orderkey, 'hi' AS bucket FROM orders WHERE o_totalprice > 450000
        |UNION ALL
        |SELECT o_orderkey, 'lo' AS bucket FROM orders WHERE o_totalprice < 5000
        |ORDER BY o_orderkey, bucket""".stripMargin,
    "q_union_evolve" ->
      """SELECT o_orderkey AS key, o_totalprice AS total FROM orders
        |WHERE o_orderkey % 2 = 0
        |UNION ALL BY NAME
        |SELECT o_orderkey AS key, o_orderpriority AS prio FROM orders
        |WHERE o_orderkey % 2 = 1
        |ORDER BY key""".stripMargin,
    "q_except" ->
      """SELECT c_custkey AS key FROM customer
        |EXCEPT
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 100000
        |ORDER BY key""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
        |ORDER BY key""".stripMargin,
    "q_except_all" ->
      """SELECT o_custkey AS key FROM orders
        |EXCEPT ALL
        |SELECT c_custkey AS key FROM customer
        |ORDER BY key""".stripMargin,
    "q_intersect_all" ->
      """SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
        |INTERSECT ALL
        |SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY key""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_clean_strings" ->
      """SELECT c_custkey, trim(lower(c_name)) AS name_lc,
        |  upper(c_mktsegment) AS seg_uc, CAST(length(c_name) AS INT) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scalar_strings" ->
      """SELECT p_partkey, substr(p_name, 1, 8) AS name_prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key
        |FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""".stripMargin,
    "q_scalar_dates" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-12-31') AS INT) AS days_to_end
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin,
    "q_scalar_json" ->
      """SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_json_roundtrip" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY event_id LIMIT 2000""".stripMargin,
    // Roundtrip identity: the oracle aggregates the PARQUET table —
    // the query must get identical results back out of its CSV cycle.
    "q_csv_roundtrip" ->
      """SELECT lang, source, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(md5(text)) AS lo_md5, max(md5(text)) AS hi_md5
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    "q_cast_default" ->
      """SELECT event_id, k FROM (
        |  SELECT event_id,
        |    TRY_CAST(coalesce(json_extract_string(props, '$.k'), '0') AS INT) AS k
        |  FROM events)
        |WHERE k IS NOT NULL ORDER BY event_id LIMIT 2000""".stripMargin,
    // Roundtrip identity for the DSv2 WRITE path: the oracle
    // aggregates the PARQUET table — the query must get identical
    // results back out of its graftsink commit cycle.
    "q_sink_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(o_orderkey) AS lo_id, max(o_orderkey) AS hi_id
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
