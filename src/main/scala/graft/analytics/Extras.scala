package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Coverage extensions beyond the reference surface: pivot, grouping
  * sets, (correlated) subqueries — exercising Catalyst decorrelation —
  * deterministic array aggregation, range-frame and distribution
  * window functions, exact quantiles. All oracle-checked.
  *
  * Determinism notes: collect_list order is nondeterministic → always
  * sort_array before emitting (string-joined, so the driver compare
  * sees scalars); percent_rank/cume_dist are rank-ratio formulas —
  * identical doubles in both engines; ntile gets a unique tiebreak in
  * its window ordering; quantile interpolation is rounded to 4 digits
  * (both engines interpolate linearly but in their own expression
  * trees).
  */
object Extras {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_pivot" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))))
        .select(col("l_returnflag"),
          col("F").cast("double").as("qty_f"),
          col("O").cast("double").as("qty_o"))
        .orderBy(col("l_returnflag"))),

    "q_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // Scalar subquery (decimal-exact mean so both engines agree).
    "q_scalar_subquery" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_v
          |WHERE o_totalprice > (
          |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          |  FROM orders_v) * 1.9
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // Correlated LATERAL subquery with ORDER BY + LIMIT — the top-N-
    // per-row join shape. Catalyst decorrelates the limit into a
    // row_number over a window partitioned by the correlation key, so
    // the physical plan is one shuffle on c_custkey — no per-customer
    // re-execution, which is what makes LATERAL viable at 100 TB.
    "q_lateral_topn" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer_v c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_v o
          |         WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
    }),

    // Correlated scalar subquery — Catalyst decorrelates to agg+join.
    "q_correlated_subquery" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_custkey, o_orderkey, o_totalprice FROM orders_v o
          |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders_v o2
          |                      WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_custkey, o_orderkey""".stripMargin)
    }),

    "q_array_agg" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          concat_ws(",", sort_array(collect_list(col("o_orderkey")))).as("keys"))
        .orderBy(col("o_custkey"))),

    // RANGE frame: orders within $1000 below, same priority.
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice")).rangeBetween(-1000L, 0L)
      Tables(s, dir, "orders")
        .withColumn("n_similar", count(lit(1)).over(w))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          col("n_similar"))
        .orderBy(col("o_orderkey"))
    }),

    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
      val wTie = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(4).over(wTie).as("quartile"))
        .orderBy(col("o_orderkey"))
    }),

    // Unpivot/melt: wide → long (Dataset.unpivot; oracle expresses the
    // same reshaping as a UNION ALL, the portable form).
    "q_unpivot" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"),
          col("value"))
        .limit(3000)),

    // Histogram: fixed-width value buckets (floor-div keeps the
    // bucketing identical across engines).
    "q_histogram" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .select(floor(col("o_totalprice") / lit(50000.0)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))),

    // Ordered string aggregation (listagg / string_agg).
    "q_string_agg" -> ((s, dir) => {
      Tables(s, dir, "nation").createOrReplaceTempView("nation_v")
      s.sql(
        """SELECT n_regionkey,
          |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
          |FROM nation_v GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // Generated date dimension joined against facts (calendar gaps kept).
    "q_date_series" -> ((s, dir) => {
      val days = s.range(1).select(explode(sequence(
        lit("1995-03-01").cast("date"), lit("1995-03-14").cast("date"),
        expr("interval 1 day"))).as("day"))
      val daily = Tables(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      days.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
        .orderBy(col("day"))
    }),

    // Time-interval RANGE frame: each event's trailing-1-hour event
    // count for its user — RANGE BETWEEN INTERVAL ... PRECEDING, the
    // event-time sliding frame that ROWS frames can't express (the
    // frame width is wall-clock, not row-count). One shuffle on
    // user_id; per-user sort is the window's own; nothing global.
    "q_window_time_range" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_v")
      s.sql(
        """SELECT event_id, user_id, ts,
          |  count(*) OVER (PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |    AS n_last_hour
          |FROM events_v
          |ORDER BY user_id, ts, event_id""".stripMargin)
    }),

    // Null-safe equi-join (<=>): NULL keys MATCH each other, unlike
    // plain equality which drops them — the semantic CDC/dimension
    // reconciliation needs when "unknown" is a joinable value. Keys
    // are derived nullable buckets over the tiny nation dim; the plan
    // is a broadcast join on the null-safe predicate.
    "q_join_nullsafe" -> ((s, dir) => {
      def keyed(alias: String) = Tables(s, dir, "nation")
        .select(col("n_nationkey").as(s"${alias}_key"),
          when(col("n_regionkey") === 0, lit(null).cast("long"))
            .otherwise(col("n_regionkey")).as(s"${alias}_rk"))
      keyed("a").join(keyed("b"), col("a_rk") <=> col("b_rk"))
        .where(col("a_key") < col("b_key"))
        .select(col("a_key"), col("b_key"),
          coalesce(col("a_rk"), lit(-1L)).as("rk"))
        .orderBy(col("a_key"), col("b_key"))
    }),

    // Higher-moment statistics per group — mean/variance/skewness/
    // kurtosis derived from power sums, NOT the built-in skewness()/
    // kurtosis() aggregates (whose merge order and formulas differ
    // across engines). Prices are scaled ONCE to exact integer cents
    // (the established DECIMAL(18,2) money cast), so every power up
    // to x⁴ and its corpus sum fits DECIMAL(38,0) EXACTLY — there is
    // no double→decimal fractional rounding anywhere for engines to
    // disagree on (a first cut casting double powers to DECIMAL(38,10)
    // hit exactly that: decimal-boundary ties broke differently).
    // Standardized moments are scale-invariant, so skew/kurt come
    // straight from the cent sums; mean/variance rescale at the end.
    // round(6) absorbs the last ulp of pow().
    "q_moments" -> ((s, dir) => {
      val xc = (dec(col("o_totalprice")) * 100).cast("decimal(38,0)")
      val t = Tables(s, dir, "orders").select(col("o_orderpriority"),
        xc.as("x"))
        .select(col("o_orderpriority"), col("x"),
          (col("x") * col("x")).as("x2"))
        .select(col("o_orderpriority"), col("x"), col("x2"),
          (col("x2") * col("x")).as("x3"), (col("x2") * col("x2")).as("x4"))
      def dsum(c: org.apache.spark.sql.Column) = sum(c).cast("double")
      val agg = t.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("n"), dsum(col("x")).as("s1"),
          dsum(col("x2")).as("s2"), dsum(col("x3")).as("s3"),
          dsum(col("x4")).as("s4"))
      val m = col("s1") / col("n")
      val m2 = col("s2") / col("n") - m * m
      val m3 = col("s3") / col("n") - lit(3.0) * m * (col("s2") / col("n")) +
        lit(2.0) * m * m * m
      val m4 = col("s4") / col("n") - lit(4.0) * m * (col("s3") / col("n")) +
        lit(6.0) * m * m * (col("s2") / col("n")) - lit(3.0) * m * m * m * m
      // Magnitude-gated round for variance (~2e10 dollar²): DuckDB's
      // round(x, 6) goes through x*1e6, which blows past 2^53 and
      // mis-rounds, while Spark rounds exactly via BigDecimal. Above
      // 1e9 the 6-decimal round is below double ulp anyway, so both
      // engines emit the RAW double there — bit-identical since it is
      // derived from identical sums — and round only small values.
      val rawVar = m2 / lit(10000.0)
      agg.select(col("o_orderpriority"), col("n").cast("long").as("n"),
          round(m / lit(100.0), 6).as("mean"),
          when(abs(rawVar) < 1e9, round(rawVar, 6)).otherwise(rawVar)
            .as("variance"),
          round(m3 / pow(m2, 1.5), 6).as("skewness"),
          round(m4 / (m2 * m2) - lit(3.0), 6).as("kurtosis"))
        .orderBy(col("o_orderpriority"))
    }),

    // Exact rolling median over a trailing 7-row window of DAILY
    // PARTIALS — the robust-smoothing counterpart of a moving average.
    // Facts collapse to (group, day) decimal-exact totals FIRST, so
    // the median window runs over the calendar-bounded grid, never
    // the fact table (the same discipline as q_gap_fill). Spark
    // forbids median() with a window frame, so the median is spelled
    // out: collect the ≤7-element frame, sort, take the middle (mean
    // of the two middles when even — one addition and halving,
    // identical in both engines, matching DuckDB's framed median()).
    "q_rolling_median" -> ((s, dir) => {
      val daily = Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          col("o_orderdate").cast("date").as("day"))
        .agg(moneySum(col("o_totalprice")).as("total"))
      val w = Window.partitionBy(col("prio")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      val arr = array_sort(collect_list(col("total")).over(w))
      val n = size(arr)
      val med = when(n % 2 === 1,
          element_at(arr, floor((n + 1) / 2).cast("int")))
        .otherwise((element_at(arr, floor(n / 2).cast("int")) +
          element_at(arr, floor(n / 2).cast("int") + 1)) / 2.0)
      daily.select(col("prio"), col("day"), round(med, 6).as("med7"))
        .orderBy(col("prio"), col("day"))
    }),

    // Pearson correlation + population covariance per group — like
    // q_moments, derived from exact integer-cent cross sums rather
    // than the built-in corr()/covar_pop() (engine-defined merge
    // order): Σx, Σy, Σxy, Σx², Σy² all fit DECIMAL(38,0) exactly in
    // cents, the closed-form runs in identical double op order, corr
    // is scale-invariant so cents need no rescale, covariance divides
    // back to dollar² at the end. round(6) absorbs sqrt() ulp.
    "q_correlation" -> ((s, dir) => {
      val xc = (dec(col("l_quantity")) * 100).cast("decimal(38,0)")
      val yc = (dec(col("l_extendedprice")) * 100).cast("decimal(38,0)")
      val t = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), xc.as("x"), yc.as("y"))
      def d(c: org.apache.spark.sql.Column) = sum(c).cast("double")
      val agg = t.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          d(col("x")).as("sx"), d(col("y")).as("sy"),
          d(col("x") * col("y")).as("sxy"),
          d(col("x") * col("x")).as("sxx"),
          d(col("y") * col("y")).as("syy"))
      val cov = (col("sxy") - col("sx") * col("sy") / col("n")) / col("n")
      val corr = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy")))
      agg.select(col("l_returnflag"), col("n").cast("long").as("n"),
          round(cov / lit(10000.0), 6).as("covar"),
          round(corr, 6).as("corr"))
        .orderBy(col("l_returnflag"))
    }),

    // Forward-fill over a generated (group × day) grid — the
    // time-series gap-repair idiom (`last_value IGNORE NULLS`): days
    // with no orders inherit the most recent observed daily total;
    // days before a group's first observation stay NULL. The grid is
    // calendar-bounded (groups × days), never corpus-sized, and the
    // fill is one window per group — the shuffle carries the tiny
    // grid, not the fact table (facts collapse to daily partials
    // first). Totals go through the decimal money sum so the filled
    // doubles are bit-identical across engines.
    "q_gap_fill" -> ((s, dir) => {
      val days = s.range(1).select(explode(sequence(
        lit("1995-03-01").cast("date"), lit("1995-03-14").cast("date"),
        expr("interval 1 day"))).as("day"))
      val prios = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("prio")).distinct()
      val daily = Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          col("o_orderdate").cast("date").as("day"))
        .agg(moneySum(col("o_totalprice")).as("total"))
      val w = Window.partitionBy(col("prio")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.crossJoin(prios)
        .join(daily, Seq("prio", "day"), "left")
        .select(col("prio"), col("day"),
          last(col("total"), ignoreNulls = true).over(w).as("filled_total"))
        .orderBy(col("prio"), col("day"))
    }),

    // Exact per-user EWMA (α = 1/2) — the online-feature recursion no
    // window function expresses: each row depends on the previous
    // RESULT, not a frame of inputs. Computed with the secondary-sort
    // pattern: repartition on the group key, sortWithinPartitions on
    // (group, time), then ONE streaming mapPartitions pass holding
    // O(1) state that resets at group boundaries — no per-group
    // collect, no window sort, group size unbounded. α = 1/2 keeps
    // every step exact in binary floating point, so the oracle's
    // recursive CTE replays the identical operation sequence
    // bit-for-bit.
    "q_ewma" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("value"))
        .as[(Long, Long, Double)]
        .mapPartitions { it =>
          var user = Long.MinValue
          var ewma = 0.0
          it.map { case (u, e, x) =>
            ewma = if (u == user) 0.5 * x + 0.5 * ewma else x
            user = u
            (u, e, x, ewma)
          }
        }
        .toDF("user_id", "event_id", "value", "ewma")
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Conditional aggregates: count_if / bool_and / bool_or / sum(CASE).
    "q_conditional_agg" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("count_if(o_totalprice > 300000)").as("n_big"),
          expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
          expr("bool_or(o_totalprice > 490000)").as("any_huge"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"))
        .orderBy(col("o_orderpriority"))),

    // Null semantics: nullif / coalesce / IS DISTINCT FROM.
    "q_null_semantics" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("DEFAULT"))
            .as("seg_defaulted"),
          expr("c_mktsegment IS DISTINCT FROM 'BUILDING'").as("not_building"))
        .orderBy(col("c_custkey")).limit(1000)),

    // first/last values over an explicit full-partition frame.
    "q_window_firstlast" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Map type surface: JSON → map<string,int> → exploded key/value rows.
    "q_map_explode" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
          explode(from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
            .as(Seq("key", "value")))
        .orderBy(col("event_id"), col("key")).limit(2000)),

    // Schema-free profiling of a semi-structured column: flatten the
    // JSON map and roll up per-key presence + numeric stats — the
    // "what is actually IN props?" pass that precedes schema design,
    // run without ever declaring one. One explode + one partial+final
    // aggregate; cardinality is the KEY space, not the row count.
    // Values are parsed as STRINGS and coerced per entry — a
    // map<string,int> parse would null the whole record's map when ANY
    // value fails to parse, silently dropping its good keys. The
    // coercion is regex-gated to strict integral strings because the
    // engines' native string→int casts disagree on fractions (DuckDB
    // rounds '5.5'→6, Spark truncates); non-integral values survive as
    // nulls (n - n_int counts them), overflow nulls out via try_cast
    // on both sides.
    "q_json_profile" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(explode(from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))
          .as(Seq("k", "vs")))
        // \A..\z, not ^..$: Java's $ matches BEFORE a trailing newline
        // (so "5\n" would pass the gate and cast to 5) while DuckDB's
        // regexp_full_match rejects it — \z pins the true end on both.
        .withColumn("v",
          when(col("vs").rlike("\\A-?[0-9]+\\z"), expr("try_cast(vs AS int)")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), count(col("v")).as("n_int"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"),
          round(sum(col("v")).cast("double") / count(col("v")), 6).as("avg_v"))
        .orderBy(col("k"))),

    // Higher-order array functions over the embedding vectors.
    "q_array_lambda" -> ((s, dir) => {
      val v = col("embedding").cast("array<double>")
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          size(filter(v, x => x > 0)).as("n_pos"),
          round(sqrt(aggregate(zip_with(v, v, (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)), 6).as("l2_norm"))
        .orderBy(col("vec_id"))
    }),

    // Sketch-based quantiles (KLL-style percentile_approx) — the scale
    // path where the exact percentile's per-group sort is too hot: the
    // sketch merges associatively (map-side partial per partition, one
    // tiny final merge), bounded memory at any row count. Approximate
    // ⇒ no SQL oracle (rows-only); error vs the exact percentile is
    // asserted in SketchSpec.
    "q_approx_quantile" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr(
          "percentile_approx(l_quantity, array(0.5D, 0.9D, 0.99D), 10000)")
          .as("qs"))
        .select(col("l_returnflag"),
          element_at(col("qs"), 1).as("p50"),
          element_at(col("qs"), 2).as("p90"),
          element_at(col("qs"), 3).as("p99"))
        .orderBy(col("l_returnflag"))),

    "q_quantiles" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, array(0.5D, 0.9D, 0.99D))").as("qs"))
        .select(col("l_returnflag"),
          round(element_at(col("qs"), 1), 4).as("p50"),
          round(element_at(col("qs"), 2), 4).as("p90"),
          round(element_at(col("qs"), 3), 4).as("p99"))
        .orderBy(col("l_returnflag"))),

    // EXISTS correlated subquery — decorrelates to a left-semi join
    // (the SQL-surface twin of q_join_semi; Catalyst must prove it).
    "q_exists_subquery" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey, c_mktsegment FROM customer_v c
          |WHERE EXISTS (SELECT 1 FROM orders_v o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // NOT IN with a nullable subquery column — three-valued-logic
    // semantics force Spark's null-aware anti join (a plain anti join
    // would be WRONG if the subquery ever yielded a NULL; the
    // nullif() keeps the column nullable so the planner must prove
    // null-awareness without degenerating the result to empty).
    "q_not_in" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey FROM customer_v
          |WHERE c_custkey NOT IN
          |  (SELECT nullif(o_custkey, -1) FROM orders_v
          |   WHERE o_totalprice > 450000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Positional explode: token + its 0-based position (the UDTF
    // surface with ordinality — order must survive the explode).
    "q_posexplode" -> ((s, dir) =>
      Tables(s, dir, "documents").where(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("token"))
        .orderBy(col("doc_id"), col("pos"))),

    // Per-group OLS regression (y = extendedprice on x = quantity) from
    // exact integer-cent sums — the q_correlation discipline extended
    // to the regression triple: Σx, Σy, Σxy, Σx², Σy² accumulate in
    // DECIMAL(38,0) (order-free), then slope/intercept/R² derive in
    // identical double formula order in both engines. Slope is a
    // cents/cents ratio (scale-invariant), the intercept rescales once
    // at the end, R² is the squared correlation. One partial+final
    // aggregate — no second pass, no window.
    "q_regression" -> ((s, dir) => {
      val xc = (dec(col("l_quantity")) * 100).cast("decimal(38,0)")
      val yc = (dec(col("l_extendedprice")) * 100).cast("decimal(38,0)")
      val t = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), xc.as("x"), yc.as("y"))
      def d(c: org.apache.spark.sql.Column) = sum(c).cast("double")
      val agg = t.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          d(col("x")).as("sx"), d(col("y")).as("sy"),
          d(col("x") * col("y")).as("sxy"),
          d(col("x") * col("x")).as("sxx"),
          d(col("y") * col("y")).as("syy"))
      val cxy = col("n") * col("sxy") - col("sx") * col("sy")
      val cxx = col("n") * col("sxx") - col("sx") * col("sx")
      val cyy = col("n") * col("syy") - col("sy") * col("sy")
      val slope = cxy / cxx
      agg.select(col("l_returnflag"), col("n").cast("long").as("n"),
          round(slope, 6).as("slope"),
          round((col("sy") - slope * col("sx")) / col("n") / lit(100.0), 6)
            .as("intercept"),
          round(cxy * cxy / (cxx * cyy), 6).as("r2"))
        .orderBy(col("l_returnflag"))
    }),

    // IQR-fence outlier counts per group. Exactness: quartiles are
    // computed over integer CENTS, where linear interpolation at
    // f ∈ {.25,.75} is exact in double (k/4 × integer spacing adds two
    // mantissa bits), so `a + f·(b−a)` and `(1−f)·a + f·b` give the
    // SAME double in any engine — no ulp drift for the fence
    // comparison to trip over. Two passes: a 5-row quartile aggregate
    // broadcast back, then a map-side flag+count.
    "q_outlier_iqr" -> ((s, dir) => {
      val cents = (dec(col("o_totalprice")) * 100).cast("double")
      val t = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"), cents.as("x"))
      val qs = t.groupBy(col("prio"))
        .agg(expr("percentile(x, array(0.25D, 0.75D))").as("q"))
        .select(col("prio"), element_at(col("q"), 1).as("q1"),
          element_at(col("q"), 2).as("q3"))
        .withColumn("iqr", col("q3") - col("q1"))
        .withColumn("lo", col("q1") - lit(1.5) * col("iqr"))
        .withColumn("hi", col("q3") + lit(1.5) * col("iqr"))
      t.join(broadcast(qs), "prio")
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"),
          round(first(col("q1")) / lit(100.0), 2).as("q1"),
          round(first(col("q3")) / lit(100.0), 2).as("q3"),
          sum(when(col("x") < col("lo"), 1L).otherwise(0L)).as("n_low"),
          sum(when(col("x") > col("hi"), 1L).otherwise(0L)).as("n_high"))
        .orderBy(col("prio"))
    }),

    // Discrete percentiles (the value AT rank ⌈p·n⌉, no interpolation)
    // per group, computed scale-aware: one within-group sort window
    // (row_number + count over the same partition) and a rank filter —
    // never a per-group collect. Equal values make the row_number
    // tie-break immaterial: whichever duplicate wins the rank, the
    // VALUE emitted is the same.
    "q_percentile_disc" -> ((s, dir) => {
      val w = Window.partitionBy(col("prio")).orderBy(col("x"))
      val wc = Window.partitionBy(col("prio"))
      val ranked = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"),
          dec(col("o_totalprice")).as("x"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
      // one window pass for all three percentiles: each row emits the
      // p-values whose rank it holds (a rank can serve several p's in
      // tiny groups, hence explode rather than three filtered scans)
      ranked
        .select(col("prio"), col("x"),
          explode(expr(
            "filter(array(0.25D, 0.5D, 0.9D), p -> ceil(p * n) = rn)")).as("p"))
        .select(col("prio"), col("p"), col("x").cast("double").as("value"))
        .orderBy(col("prio"), col("p"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM orders) * 1.9
        |ORDER BY o_orderkey""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_time_range" ->
      """SELECT event_id, user_id, ts,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS n_last_hour
        |FROM events
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_join_nullsafe" ->
      """WITH k AS (SELECT n_nationkey AS key,
        |    CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS rk
        |  FROM nation)
        |SELECT a.key AS a_key, b.key AS b_key,
        |  coalesce(a.rk, -1) AS rk
        |FROM k a JOIN k b ON a.rk IS NOT DISTINCT FROM b.rk
        |WHERE a.key < b.key
        |ORDER BY a.key, b.key""".stripMargin,
    "q_moments" ->
      """WITH c AS (SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS x
        |  FROM orders),
        |t AS (SELECT o_orderpriority, x, x * x AS x2 FROM c),
        |t2 AS (SELECT o_orderpriority, x, x2, x2 * x AS x3, x2 * x2 AS x4 FROM t),
        |ag AS (SELECT o_orderpriority,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1,
        |    CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(x3) AS DOUBLE) AS s3,
        |    CAST(sum(x4) AS DOUBLE) AS s4
        |  FROM t2 GROUP BY o_orderpriority)
        |SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
        |  round((s1 / n) / 100.0, 6) AS mean,
        |  CASE WHEN abs((s2 / n - (s1 / n) * (s1 / n)) / 10000.0) < 1e9
        |    THEN round((s2 / n - (s1 / n) * (s1 / n)) / 10000.0, 6)
        |    ELSE (s2 / n - (s1 / n) * (s1 / n)) / 10000.0 END AS variance,
        |  round((s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
        |    / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
        |  round((s4 / n - 4.0 * (s1 / n) * (s3 / n) + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        |    / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3.0, 6)
        |    AS kurtosis
        |FROM ag ORDER BY o_orderpriority""".stripMargin,
    "q_rolling_median" ->
      """WITH daily AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1, 2)
        |SELECT prio, day,
        |  round(median(total) OVER (PARTITION BY prio ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
        |FROM daily ORDER BY prio, day""".stripMargin,
    "q_correlation" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS y
        |  FROM lineitem),
        |ag AS (SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(((sxy - sx * sy / n) / n) / 10000.0, 6) AS covar,
        |  round((n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr
        |FROM ag ORDER BY l_returnflag""".stripMargin,
    "q_gap_fill" ->
      """WITH days AS (
        |  SELECT CAST(unnest(generate_series(DATE '1995-03-01',
        |    DATE '1995-03-14', INTERVAL 1 DAY)) AS DATE) AS day),
        |prios AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
        |daily AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1, 2)
        |SELECT p.prio, days.day,
        |  last_value(daily.total IGNORE NULLS) OVER (
        |    PARTITION BY p.prio ORDER BY days.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
        |FROM days CROSS JOIN prios p
        |  LEFT JOIN daily ON daily.prio = p.prio AND daily.day = days.day
        |ORDER BY p.prio, days.day""".stripMargin,
    "q_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "q_array_agg" ->
      """SELECT o_custkey, count(*) AS n,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS keys
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_similar
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_dist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pct_rank,
        |  cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cume,
        |  ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure, value LIMIT 3000""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_ewma" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, value, rn, value AS ewma
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.event_id, o.value, o.rn,
        |    0.5 * o.value + 0.5 * r.ewma
        |  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, event_id, value, ewma
        |FROM r ORDER BY user_id, event_id""".stripMargin,
    "q_string_agg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_date_series" ->
      """WITH days AS (
        |  SELECT CAST(unnest(generate_series(DATE '1995-03-01',
        |    DATE '1995-03-14', INTERVAL 1 DAY)) AS DATE) AS day),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT days.day, coalesce(daily.n, 0) AS n_orders
        |FROM days LEFT JOIN daily ON days.day = daily.day
        |ORDER BY days.day""".stripMargin,
    "q_conditional_agg" ->
      """SELECT o_orderpriority,
        |  CAST(count_if(o_totalprice > 300000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 490000) AS any_huge,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_null_semantics" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_defaulted,
        |  c_mktsegment IS DISTINCT FROM 'BUILDING' AS not_building
        |FROM customer ORDER BY c_custkey LIMIT 1000""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_map_explode" ->
      """SELECT event_id, k AS key,
        |  TRY_CAST(json_extract_string(props, '$.' || k) AS INT) AS value
        |FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
        |ORDER BY event_id, key LIMIT 2000""".stripMargin,
    "q_json_profile" ->
      """WITH kv0 AS (SELECT k, json_extract_string(props, '$.' || k) AS vs
        |  FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)),
        |kv AS (SELECT k, CASE WHEN regexp_full_match(vs, '-?[0-9]+')
        |    THEN TRY_CAST(vs AS INT) END AS v FROM kv0)
        |SELECT k, count(*) AS n, CAST(count(v) AS BIGINT) AS n_int,
        |  min(v) AS min_v, max(v) AS max_v,
        |  round(CAST(sum(v) AS DOUBLE) / count(v), 6) AS avg_v
        |FROM kv GROUP BY k ORDER BY k""".stripMargin,
    "q_array_lambda" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INT) AS n_pos,
        |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
        |  round(quantile_cont(l_quantity, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_not_in" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, -1) FROM orders
        |   WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    // DuckDB lacks WITH ORDINALITY; two parallel unnests zip row-wise.
    "q_posexplode" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 20)
        |SELECT doc_id,
        |  CAST(unnest(generate_series(1, len(toks))) - 1 AS INT) AS pos,
        |  unnest(toks) AS token
        |FROM t ORDER BY doc_id, pos""".stripMargin,
    "q_regression" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS y
        |  FROM lineitem),
        |ag AS (SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / 100.0, 6)
        |    AS intercept,
        |  round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM ag ORDER BY l_returnflag""".stripMargin,
    "q_outlier_iqr" ->
      """WITH t AS (SELECT o_orderpriority AS prio,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DOUBLE) AS x
        |  FROM orders),
        |q AS (SELECT prio, quantile_cont(x, 0.25) AS q1,
        |    quantile_cont(x, 0.75) AS q3 FROM t GROUP BY prio),
        |f AS (SELECT prio, q1, q3,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
        |SELECT t.prio, count(*) AS n,
        |  round(f.q1 / 100.0, 2) AS q1, round(f.q3 / 100.0, 2) AS q3,
        |  CAST(sum(CASE WHEN t.x < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN t.x > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM t JOIN f USING (prio)
        |GROUP BY t.prio, f.q1, f.q3 ORDER BY t.prio""".stripMargin,
    "q_percentile_disc" ->
      """WITH t AS (SELECT o_orderpriority AS prio,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x FROM orders),
        |r AS (SELECT prio, x,
        |    row_number() OVER (PARTITION BY prio ORDER BY x) AS rn,
        |    count(*) OVER (PARTITION BY prio) AS n FROM t),
        |p AS (SELECT unnest(CAST([0.25, 0.5, 0.9] AS DOUBLE[])) AS p)
        |SELECT r.prio, p.p, CAST(r.x AS DOUBLE) AS value
        |FROM r JOIN p ON ceil(p.p * r.n) = r.rn
        |ORDER BY prio, p""".stripMargin
  )
}
