package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Statistical analytics beyond moments/correlation (reference: the
  * dashboard's aggregate cards generalize to distribution statistics;
  * cf. README.md:84-96 — the engine carries the full family the
  * Metabase cards sample from):
  *
  *  - q_gini: per-group Gini concentration index. The rank-weighted
  *    formula G = Σ(2i−n−1)·x_(i) / (n·Σx) needs every element's
  *    GLOBAL rank within its group, but a fact-sized window partition
  *    is the q_batch_number scale-killer — so ranks are assembled with
  *    the bucket-stitch pattern (q_sequence_gaps): value-range buckets
  *    rank locally (bounded window partitions), a bucket-summary
  *    window (≤ #buckets rows) prefix-sums the offsets, and
  *    global rank = offset + local rank. Ties need no tiebreak: equal
  *    x values make Σ(2i−n−1)x invariant under any tie order.
  *    Numerator and denominator accumulate in DECIMAL(38,0) cents
  *    (exact, order-free); the final division runs in identical double
  *    formula order in both engines.
  *  - q_mannwhitney: Mann-Whitney U rank-sum test between two
  *    samples, exact under the midrank tie convention by carrying
  *    2×rank sums as integers; ranks assemble through the same
  *    bucket-stitch as q_gini, so no fact-sized window exists.
  *  - q_chisq_cells: χ² contingency cells for event_type × customer
  *    segment. Observed counts are one hash aggregate over the
  *    broadcast-enriched stream; the margins are two tiny re-aggregates
  *    of the |cells| frame (never the facts) cross-joined back.
  *    Expected counts and contributions are emitted PER CELL — no
  *    global double sum exists for engines to disagree on.
  */
object Stats {
  type Q = (SparkSession, String) => DataFrame

  /** Value-range bucket width for gini rank assembly, in cents. */
  private val GiniBucketCents = 1000000L // $10k per bucket

  val queries: Map[String, Q] = Map(
    "q_gini" -> ((s, dir) => {
      val cents = (dec(col("o_totalprice")) * 100).cast("decimal(38,0)")
      val t = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"), cents.as("x"))
        .withColumn("b", (col("x") / lit(GiniBucketCents)).cast("long"))
      // local rank inside each (prio, value-bucket) — bounded partition
      val wLocal = Window.partitionBy(col("prio"), col("b")).orderBy(col("x"))
      val local = t.withColumn("rl", row_number().over(wLocal))
      // per-bucket counts → exclusive prefix offsets (window over the
      // bucket SUMMARY, ≤ #buckets rows per prio)
      val wBuckets = Window.partitionBy(col("prio")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = t.groupBy(col("prio"), col("b"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", sum(col("cnt")).over(wBuckets) - col("cnt"))
        .select(col("prio"), col("b"), col("off"))
      val totals = t.groupBy(col("prio")).agg(count(lit(1)).as("n"))
      val ranked = local.join(offsets, Seq("prio", "b"))
        .join(broadcast(totals), Seq("prio"))
        .withColumn("i", col("off") + col("rl"))
      ranked.groupBy(col("prio"))
        .agg(max(col("n")).as("n"),
          sum((lit(2L) * col("i") - col("n") - lit(1L))
            .cast("decimal(38,0)") * col("x")).as("num"),
          sum(col("x")).as("den"))
        .select(col("prio"), col("n"),
          round(col("num").cast("double") /
            (col("n").cast("double") * col("den").cast("double")), 6).as("gini"))
        .orderBy(col("prio"))
    }),

    // Weighted median (price weighted by quantity) per group: the
    // smallest value whose cumulative weight reaches half the total.
    // Entirely in integers — the halving test is `2·cum ≥ tot`, so
    // there is no double anywhere until the final /100 display
    // division. Cumulative weights assemble with the same bucket
    // stitch as q_gini (local in-bucket cumsum + bucket-summary
    // offsets), keeping every window partition bounded.
    "q_weighted_median" -> ((s, dir) => {
      val xc = (dec(col("l_extendedprice")) * 100).cast("long")
      val t = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("f"), xc.as("x"),
          dec(col("l_quantity")).cast("long").as("w"))
      val vals = t.groupBy(col("f"), col("x")).agg(sum(col("w")).as("vw"))
        .withColumn("b", (col("x") / lit(GiniBucketCents)).cast("long"))
      val wLocal = Window.partitionBy(col("f"), col("b")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wB = Window.partitionBy(col("f")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bucketOff = vals.groupBy(col("f"), col("b")).agg(sum(col("vw")).as("bw"))
        .withColumn("boff", sum(col("bw")).over(wB) - col("bw"))
        .select(col("f"), col("b"), col("boff"))
      val tot = t.groupBy(col("f")).agg(sum(col("w")).as("tot"))
      vals
        .withColumn("cum", sum(col("vw")).over(wLocal))
        .join(bucketOff, Seq("f", "b"))
        .join(broadcast(tot), Seq("f"))
        .where(lit(2L) * (col("boff") + col("cum")) >= col("tot"))
        .groupBy(col("f"))
        .agg(min(col("x")).as("mx"), max(col("tot")).as("tot"))
        .select(col("f").as("l_returnflag"),
          (col("mx").cast("double") / lit(100.0)).as("wmedian"),
          col("tot").as("total_weight"))
        .orderBy(col("l_returnflag"))
    }),

    // Mann-Whitney U (rank-sum test) between two order-priority
    // samples. Ranks use the midrank (average-rank) tie convention;
    // everything stays EXACT by carrying 2×rank sums as integers
    // (midranks are halves): per distinct value, 2·avgrank =
    // 2·off + c + 1 where off = #strictly-smaller elements and c =
    // tie count. Offsets assemble scale-safe like q_gini: per-value
    // counts → value-bucket local prefix sums + a bucket-summary
    // prefix window (global, but over ≤ price-range/bucket-width
    // rows — ContractSpec-exempt with that bound). The only doubles
    // are the final /2 and the U formula, identical in both engines.
    "q_mannwhitney" -> ((s, dir) => {
      val cents = (dec(col("o_totalprice")) * 100).cast("long")
      val t = Tables(s, dir, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderpriority").as("prio"), cents.as("x"))
        .cache() // feeds the value index and the per-group counts
      val vals = t.groupBy(col("x")).agg(count(lit(1)).as("c"))
        .withColumn("b", (col("x") / lit(GiniBucketCents)).cast("long"))
      val wLocal = Window.partitionBy(col("b")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wB = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bucketOff = vals.groupBy(col("b")).agg(sum(col("c")).as("bc"))
        .withColumn("boff", sum(col("bc")).over(wB) - col("bc"))
        .select(col("b"), col("boff"))
      val offs = vals
        .withColumn("loff", coalesce(sum(col("c")).over(wLocal), lit(0L)))
        .join(broadcast(bucketOff), Seq("b"))
        .select(col("x"), col("c"), (col("boff") + col("loff")).as("off"))
      val gcnt = t.groupBy(col("prio"), col("x")).agg(count(lit(1)).as("cg"))
      gcnt.join(offs, "x")
        .groupBy(col("prio"))
        .agg(sum(col("cg")).as("n"),
          sum((lit(2L) * col("off") + col("c") + lit(1L))
            .cast("decimal(38,0)") * col("cg")).as("doubled"))
        .select(col("prio"), col("n"),
          (col("doubled").cast("double") / lit(2.0)).as("rank_sum"),
          (col("doubled").cast("double") / lit(2.0) -
            col("n").cast("double") * (col("n").cast("double") + lit(1.0)) /
              lit(2.0)).as("u"))
        .orderBy(col("prio"))
    }),

    // Two-proportion z-test (A/B conversion): converters = customers
    // of a segment with ≥1 purchase event. All counts are exact
    // integers from one left join + conditional aggregate; the z
    // statistic derives in one mirrored double expression tree, so
    // even sqrt() feeds on identical inputs in both engines.
    "q_ab_test" -> ((s, dir) => {
      val conv = Tables(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val segs = Tables(s, dir, "customer")
        .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val per = segs.join(conv, col("c_custkey") === col("user_id"), "left")
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), count(col("user_id")).as("x"))
      val one = per.agg(
        sum(when(col("seg") === "BUILDING", col("n"))).as("n1"),
        sum(when(col("seg") === "BUILDING", col("x"))).as("x1"),
        sum(when(col("seg") === "AUTOMOBILE", col("n"))).as("n2"),
        sum(when(col("seg") === "AUTOMOBILE", col("x"))).as("x2"))
      def d(c: String) = col(c).cast("double")
      val pp = (d("x1") + d("x2")) / (d("n1") + d("n2"))
      val z = (d("x1") / d("n1") - d("x2") / d("n2")) /
        sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / d("n1") + lit(1.0) / d("n2")))
      one.select(col("n1"), col("x1"), col("n2"), col("x2"),
        round(z, 6).as("z"))
    }),

    // Winsorized mean (clamp at p05/p95, then average): the clamped
    // boundary values are interpolated DOUBLES, so a naive sum would
    // be accumulation-order-dependent. Binary fixed-point makes it
    // exact: floor(clamped·2²⁰ + 0.5) is deterministic in any engine
    // (×2²⁰ is exact, floor is exact), the scaled longs sum in
    // decimal, and one mirrored division chain converts back. The
    // clamp comparisons are safe: interpolated cutpoints either equal
    // a data value exactly (f=0 — same in both engines) or fall
    // strictly between adjacent cents, ulp drift notwithstanding.
    "q_winsorized_mean" -> ((s, dir) => {
      val cents = (dec(col("o_totalprice")) * 100).cast("double")
      val t = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"), cents.as("x"))
      val qs = t.groupBy(col("prio"))
        .agg(expr("percentile(x, array(0.05D, 0.95D))").as("q"))
        .select(col("prio"), element_at(col("q"), 1).as("lo"),
          element_at(col("q"), 2).as("hi"))
      val clamped = least(greatest(col("x"), col("lo")), col("hi"))
      val fixed = floor(clamped * lit(1048576.0) + lit(0.5)).cast("decimal(38,0)")
      t.join(broadcast(qs), "prio")
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(fixed).as("sfix"))
        .select(col("prio"), col("n"),
          round(col("sfix").cast("double") / col("n").cast("double") /
            lit(1048576.0) / lit(100.0), 4).as("wins_mean"))
        .orderBy(col("prio"))
    }),

    // Equi-DEPTH histogram (decile buckets): boundaries from one exact
    // percentile aggregate, bucket assignment as a map-side lambda
    // count of strictly-smaller boundaries — no window, no sort, two
    // passes of which the second is map-only + a 10-row aggregate.
    "q_histogram_equidepth" -> ((s, dir) => {
      val cents = (dec(col("o_totalprice")) * 100).cast("double")
      val t = Tables(s, dir, "orders").select(cents.as("x"))
      val bnds = t.agg(expr(
        "percentile(x, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
        .as("bnds"))
      t.crossJoin(broadcast(bnds))
        .select(expr("size(filter(bnds, b -> b < x))").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    "q_chisq_cells" -> ((s, dir) => {
      val dim = broadcast(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")))
      // |segments|×|types| rows feeding four consumers (cells + both
      // margins + total) — cache so the fact join runs once
      val cells = Tables(s, dir, "events")
        .join(dim, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("event_type").as("typ"))
        .agg(count(lit(1)).as("obs"))
        .cache()
      val segTot = cells.groupBy(col("seg")).agg(sum(col("obs")).as("seg_tot"))
      val typTot = cells.groupBy(col("typ")).agg(sum(col("obs")).as("typ_tot"))
      val total = cells.agg(sum(col("obs")).as("total"))
      val e = col("seg_tot").cast("double") * col("typ_tot").cast("double") /
        col("total").cast("double")
      cells.join(broadcast(segTot), "seg")
        .join(broadcast(typTot), "typ")
        .crossJoin(broadcast(total))
        .withColumn("expected", e)
        .select(col("seg"), col("typ"), col("obs"),
          round(col("expected"), 6).as("expected"),
          round((col("obs").cast("double") - col("expected")) *
            (col("obs").cast("double") - col("expected")) / col("expected"), 6)
            .as("contrib"))
        .orderBy(col("seg"), col("typ"))
    }),

    // Population Stability Index drift audit — the standard production
    // check that a feature's distribution hasn't shifted between a
    // reference window and the current one (PSI < 0.1 stable, > 0.25
    // drifted). Reference = the stream's first 7 days, current = its
    // last 7; `value` is binned into 10 fixed-width buckets over the
    // GLOBAL min/max so both sides share bin edges. Counts are
    // +1-smoothed (Laplace) so empty bins stay finite, the per-bin ln
    // term is rounded to 12 digits (absorbing last-ulp libm drift, the
    // q_tfidf precedent) and summed in DECIMAL — partition-order free,
    // hash-exact. Plan shape at 100 TB: two scalar aggregates
    // broadcast back (bounds), one hash agg on the 10-value bin key
    // with map-side partials, then arithmetic on a 10-row frame. The
    // 10-row spine join guarantees every bin row exists even when a
    // bucket is empty on both sides.
    "q_drift_psi" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(expr("unix_micros(ts)").as("us"), col("value"))
      val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      // Window edges are CLAMPED to the stream's midpoint so ref/cur
      // are disjoint BY CONSTRUCTION even when the stream spans less
      // than 2×7 days — otherwise rows satisfying both predicates
      // would silently count as ref-only and skew p_cur. Integer
      // microsecond arithmetic, replayed verbatim by the oracle.
      val mid = col("lo") + floor((col("hi") - col("lo")) / 2).cast("long")
      val tagged = ev.crossJoin(broadcast(bounds))
        .withColumn("side",
          when(col("us") < least(col("lo") + PsiWindowUs, mid), "ref")
            .when(col("us") >= greatest(col("hi") - PsiWindowUs, mid), "cur"))
        .where(col("side").isNotNull)
        .withColumn("bin",
          when(col("mx") > col("mn"),
            least(lit(9L), floor((col("value") - col("mn")) /
              (col("mx") - col("mn")) * 10)).cast("int"))
            .otherwise(lit(0)))
      val counts = tagged.groupBy(col("bin"))
        .agg(sum(when(col("side") === "ref", 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("side") === "cur", 1L).otherwise(0L)).as("n_cur"))
      psiFrame(s, counts)
    }),

    // Two-sample Kolmogorov–Smirnov drift test — the nonparametric
    // complement to q_drift_psi over the SAME ref/cur time-window
    // split: D = sup |ecdf_ref − ecdf_cur| evaluated on a fixed
    // 20-bin grid over the global value range (binned ecdf IS the
    // production form at scale — the exact statistic needs a global
    // sort of both samples; the grid version bounds the sup scan to
    // 20 rows and is what every monitoring system ships). Counts stay
    // BIGINT through the cumsum; the single global window runs over
    // the 20-row bin summary (bounded-summary contract, ContractSpec
    // whitelist). Rejection at α=0.05 uses c(α)=1.358 ·
    // √(1/n1 + 1/n2) — the overflow-free form of √((n1+n2)/(n1·n2));
    // both D and the critical value round to 6 BEFORE the comparison
    // so the verdict bit matches the oracle.
    "q_ks_test" -> ((s, dir) => {
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Tables(s, dir, "events")
        .select(expr("unix_micros(ts)").as("us"), col("value"))
      val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      val mid = col("lo") + floor((col("hi") - col("lo")) / 2).cast("long")
      val tagged = ev.crossJoin(broadcast(bounds))
        .withColumn("side",
          when(col("us") < least(col("lo") + PsiWindowUs, mid), "ref")
            .when(col("us") >= greatest(col("hi") - PsiWindowUs, mid), "cur"))
        .where(col("side").isNotNull)
        .withColumn("bin",
          when(col("mx") > col("mn"),
            least(lit(19L), floor((col("value") - col("mn")) /
              (col("mx") - col("mn")) * 20)).cast("int"))
            .otherwise(lit(0)))
      val counts = tagged.groupBy(col("bin"))
        .agg(sum(when(col("side") === "ref", 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("side") === "cur", 1L).otherwise(0L)).as("n_cur"))
      val cum = counts
        .withColumn("c_ref", sum(col("n_ref")).over(w))
        .withColumn("c_cur", sum(col("n_cur")).over(w))
      val tot = counts.agg(sum(col("n_ref")).as("t_ref"),
        sum(col("n_cur")).as("t_cur"))
      // ungrouped max (one row even over an empty stream — the oracle's
      // `d` CTE shape, so a degenerate corpus yields matching NULLs,
      // not a 0-row vs 1-row hash mismatch); the critical value uses
      // 1/t1 + 1/t2, never the t1·t2 product, which would overflow
      // BIGINT past ~3e9 events per window
      val d = cum.crossJoin(broadcast(tot))
        .agg(max(abs(col("c_ref").cast("double") / col("t_ref") -
          col("c_cur").cast("double") / col("t_cur"))).as("d_raw"))
      d.crossJoin(broadcast(tot))
        .select(col("t_ref").as("n_ref"), col("t_cur").as("n_cur"),
          round(col("d_raw"), 6).as("d_stat"),
          round(lit(1.358) * sqrt(lit(1.0) / col("t_ref") +
            lit(1.0) / col("t_cur")), 6).as("d_crit"))
        .withColumn("drifted", col("d_stat") > col("d_crit"))
    }),

    // Streaming deployment of the PSI monitor: micro-batch 1 of the
    // ts-range-staged event stream FIXES the reference histogram and
    // its bin edges; every later batch folds its counts into an
    // O(bins) accumulated state (a 10-row versioned table — this is
    // the entire streaming state, regardless of stream length). The
    // drained state yields the same smoothed-PSI frame as the batch
    // op via the shared [[psiFrame]], and the oracle replays the
    // ts-split + ref-edge binning in SQL — streaming ≡ batch is
    // hash-checked, the same pairing discipline as q_stream_mv_merge.
    "q_stream_drift" -> ((s, dir) => {
      val work = graft.util.WorkDirs.temp("graft_stream_drift")
      psiFrame(s, graft.streaming.Streams.driftIngest(s, dir, work))
    })
  )

  /** Shared smoothed-PSI output frame over per-bin (n_ref, n_cur)
    * counts — the single formula both q_drift_psi (batch time-window
    * counts) and q_stream_drift (accumulated micro-batch counts) emit,
    * so the pair cannot drift. The 10-row spine guarantees every bin
    * row exists; counts are +1 (Laplace) smoothed; each ln term is
    * rounded to 12 digits (absorbing last-ulp libm drift, the q_tfidf
    * precedent) and summed in DECIMAL — partition-order free.
    */
  private[graft] def psiFrame(s: SparkSession, counts: DataFrame): DataFrame = {
    val bins = s.range(10).select(col("id").cast("int").as("bin"))
    val full = bins.join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = full.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"))
    val terms = full.crossJoin(broadcast(tot))
      .withColumn("p_ref",
        (col("n_ref") + 1).cast("double") / (col("t_ref") + 10).cast("double"))
      .withColumn("p_cur",
        (col("n_cur") + 1).cast("double") / (col("t_cur") + 10).cast("double"))
      .withColumn("term", round((col("p_cur") - col("p_ref")) *
        log(col("p_cur") / col("p_ref")), 12))
    val psi = terms.agg(sum(col("term").cast("decimal(24,12)")).as("psi"))
    terms.crossJoin(broadcast(psi))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
        round(col("term"), 6).as("psi_term"),
        round(col("psi").cast("double"), 6).as("psi_total"))
      .orderBy(col("bin"))
  }

  /** PSI reference/current window width: 7 days in microseconds. */
  val PsiWindowUs = 604800000000L

  /** SQL replay of [[psiFrame]]: from a CTE `cnt(bin, n_ref, n_cur)`
    * to the final ordered select — shared verbatim by the q_drift_psi
    * and q_stream_drift oracles, exactly as the Spark pair shares
    * [[psiFrame]].
    */
  private[graft] def sqlPsiTail: String =
    """bins AS (SELECT CAST(unnest(range(10)) AS INT) AS bin),
      |f AS (SELECT bins.bin, COALESCE(n_ref, 0) AS n_ref,
      |    COALESCE(n_cur, 0) AS n_cur
      |  FROM bins LEFT JOIN cnt ON bins.bin = cnt.bin),
      |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
      |  CAST(sum(n_cur) AS BIGINT) AS t_cur FROM f),
      |tm AS (SELECT bin, n_ref, n_cur,
      |    CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + 10 AS DOUBLE) AS p_ref,
      |    CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + 10 AS DOUBLE) AS p_cur
      |  FROM f CROSS JOIN tot),
      |tm2 AS (SELECT *,
      |  round((p_cur - p_ref) * ln(p_cur / p_ref), 12) AS term FROM tm),
      |psi AS (SELECT sum(CAST(term AS DECIMAL(24,12))) AS psi FROM tm2)
      |SELECT bin, n_ref, n_cur, round(p_ref, 6) AS p_ref,
      |  round(p_cur, 6) AS p_cur, round(term, 6) AS psi_term,
      |  round(CAST(psi AS DOUBLE), 6) AS psi_total
      |FROM tm2 CROSS JOIN psi ORDER BY bin""".stripMargin

  val oracles: Map[String, String] = Map(
    // Same bounds→tag→bin→smooth→ln-term chain; DECIMAL term sum.
    "q_drift_psi" ->
      s"""WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
         |b AS (SELECT min(us) AS lo, max(us) AS hi,
         |  min(value) AS mn, max(value) AS mx FROM ev),
         |tg AS (SELECT CASE
         |    WHEN us < least(lo + $PsiWindowUs, lo + (hi - lo) // 2) THEN 'ref'
         |    WHEN us >= greatest(hi - $PsiWindowUs, lo + (hi - lo) // 2)
         |      THEN 'cur' END AS side,
         |  CASE WHEN mx > mn THEN CAST(least(9,
         |      CAST(floor((value - mn) / (mx - mn) * 10) AS BIGINT)) AS INT)
         |    ELSE 0 END AS bin
         |  FROM ev CROSS JOIN b),
         |cnt AS (SELECT bin,
         |    CAST(sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |    CAST(sum(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
         |  FROM tg WHERE side IS NOT NULL GROUP BY bin),
         |$sqlPsiTail""".stripMargin,
    // Same bounds→tag split at 20 bins, BIGINT cumsum, double sup scan.
    "q_ks_test" ->
      s"""WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
         |b AS (SELECT min(us) AS lo, max(us) AS hi,
         |  min(value) AS mn, max(value) AS mx FROM ev),
         |tg AS (SELECT CASE
         |    WHEN us < least(lo + $PsiWindowUs, lo + (hi - lo) // 2) THEN 'ref'
         |    WHEN us >= greatest(hi - $PsiWindowUs, lo + (hi - lo) // 2)
         |      THEN 'cur' END AS side,
         |  CASE WHEN mx > mn THEN CAST(least(19,
         |      CAST(floor((value - mn) / (mx - mn) * 20) AS BIGINT)) AS INT)
         |    ELSE 0 END AS bin
         |  FROM ev CROSS JOIN b),
         |cnt AS (SELECT bin,
         |    CAST(sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |    CAST(sum(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
         |  FROM tg WHERE side IS NOT NULL GROUP BY bin),
         |cum AS (SELECT bin,
         |    sum(n_ref) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_ref,
         |    sum(n_cur) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_cur
         |  FROM cnt),
         |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
         |  CAST(sum(n_cur) AS BIGINT) AS t_cur FROM cnt),
         |d AS (SELECT max(abs(CAST(c_ref AS DOUBLE) / t_ref -
         |    CAST(c_cur AS DOUBLE) / t_cur)) AS d_raw
         |  FROM cum CROSS JOIN tot)
         |SELECT t_ref AS n_ref, t_cur AS n_cur, round(d_raw, 6) AS d_stat,
         |  round(CAST(1.358 AS DOUBLE) * sqrt(CAST(1.0 AS DOUBLE) / t_ref +
         |    CAST(1.0 AS DOUBLE) / t_cur), 6) AS d_crit,
         |  round(d_raw, 6) > round(CAST(1.358 AS DOUBLE) *
         |    sqrt(CAST(1.0 AS DOUBLE) / t_ref + CAST(1.0 AS DOUBLE) / t_cur), 6)
         |    AS drifted
         |FROM d CROSS JOIN tot""".stripMargin,
    // ts-range shard split (shard 0 = reference, integer third) and
    // reference-fixed bin edges with [0,9] clamping, then the shared
    // PSI tail — replays the streaming ingest end-state exactly.
    "q_stream_drift" ->
      s"""WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
         |b AS (SELECT min(us) AS lo, max(us) + 1 AS hi1 FROM ev),
         |sp AS (SELECT lo, greatest(1, hi1 - lo) AS span FROM b),
         |r AS (SELECT value FROM ev CROSS JOIN sp
         |  WHERE us < lo + span // 3),
         |c AS (SELECT value FROM ev CROSS JOIN sp
         |  WHERE us >= lo + span // 3),
         |e AS (SELECT min(value) AS mn, max(value) AS mx FROM r),
         |rb AS (SELECT CASE WHEN mx > mn THEN
         |    CAST(greatest(0, least(9,
         |      CAST(floor((value - mn) / (mx - mn) * 10) AS BIGINT))) AS INT)
         |  ELSE 0 END AS bin FROM r CROSS JOIN e),
         |cb AS (SELECT CASE WHEN mx > mn THEN
         |    CAST(greatest(0, least(9,
         |      CAST(floor((value - mn) / (mx - mn) * 10) AS BIGINT))) AS INT)
         |  ELSE 0 END AS bin FROM c CROSS JOIN e),
         |rc AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_ref FROM rb GROUP BY bin),
         |cc AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_cur FROM cb GROUP BY bin),
         |cnt AS (SELECT COALESCE(rc.bin, cc.bin) AS bin,
         |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
         |  FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin),
         |$sqlPsiTail""".stripMargin,
    // Plain per-group rank formulation — Σ(2i−n−1)x is tie-order
    // invariant, so the bucket-stitched ranks agree exactly.
    "q_gini" ->
      """WITH c AS (SELECT o_orderpriority AS prio,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS x
        |  FROM orders),
        |r AS (SELECT prio, x,
        |    row_number() OVER (PARTITION BY prio ORDER BY x) AS i,
        |    count(*) OVER (PARTITION BY prio) AS n FROM c)
        |SELECT prio, CAST(max(n) AS BIGINT) AS n,
        |  round(CAST(sum((2 * i - n - 1) * x) AS DOUBLE) /
        |    (CAST(max(n) AS DOUBLE) * CAST(sum(x) AS DOUBLE)), 6) AS gini
        |FROM r GROUP BY prio ORDER BY prio""".stripMargin,
    "q_ab_test" ->
      """WITH conv AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase'),
        |a AS (SELECT c_mktsegment AS seg, count(*) AS n,
        |    count(conv.user_id) AS x
        |  FROM customer LEFT JOIN conv ON c_custkey = conv.user_id
        |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN seg = 'BUILDING' THEN n END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN seg = 'BUILDING' THEN x END) AS BIGINT) AS x1,
        |    CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN n END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN x END) AS BIGINT) AS x2
        |  FROM a)
        |SELECT n1, x1, n2, x2,
        |  round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |    / sqrt(((CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE))
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
        |      * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE))
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
        |      * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 6)
        |    AS z
        |FROM t""".stripMargin,
    "q_winsorized_mean" ->
      """WITH t AS (SELECT o_orderpriority AS prio,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DOUBLE) AS x
        |  FROM orders),
        |q AS (SELECT prio, quantile_cont(x, 0.05) AS lo,
        |    quantile_cont(x, 0.95) AS hi FROM t GROUP BY prio),
        |f AS (SELECT t.prio,
        |    CAST(floor(least(greatest(t.x, q.lo), q.hi) * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0)) AS fx
        |  FROM t JOIN q USING (prio))
        |SELECT prio, count(*) AS n,
        |  round(CAST(sum(fx) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    / 1048576.0 / 100.0, 4) AS wins_mean
        |FROM f GROUP BY prio ORDER BY prio""".stripMargin,
    "q_histogram_equidepth" ->
      """WITH t AS (SELECT
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DOUBLE) AS x
        |  FROM orders),
        |b AS (SELECT quantile_cont(x,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bnds FROM t)
        |SELECT CAST(len(list_filter(b.bnds, v -> v < t.x)) AS INT) AS bucket,
        |  count(*) AS n
        |FROM t CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_median" ->
      """WITH t AS (SELECT l_returnflag AS f,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS w
        |  FROM lineitem),
        |v AS (SELECT f, x, sum(w) AS vw FROM t GROUP BY 1, 2),
        |c AS (SELECT f, x, vw,
        |    sum(vw) OVER (PARTITION BY f ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(vw) OVER (PARTITION BY f) AS tot FROM v)
        |SELECT f AS l_returnflag,
        |  CAST(min(CASE WHEN 2 * cum >= tot THEN x END) AS DOUBLE) / 100.0
        |    AS wmedian,
        |  CAST(max(tot) AS BIGINT) AS total_weight
        |FROM c GROUP BY f ORDER BY f""".stripMargin,
    // Plain global-rank formulation: rank() = off + 1, so per row
    // 2·rk + c − 1 = 2·off + c + 1 — the stitched form's exact term.
    "q_mannwhitney" ->
      """WITH t AS (SELECT o_orderpriority AS prio,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |r AS (SELECT prio, x, rank() OVER (ORDER BY x) AS rk,
        |    count(*) OVER (PARTITION BY x) AS c FROM t)
        |SELECT prio, count(*) AS n,
        |  CAST(sum(2 * rk + c - 1) AS DOUBLE) / 2.0 AS rank_sum,
        |  CAST(sum(2 * rk + c - 1) AS DOUBLE) / 2.0
        |    - CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) + 1.0) / 2.0
        |    AS u
        |FROM r GROUP BY prio ORDER BY prio""".stripMargin,
    "q_chisq_cells" ->
      """WITH cells AS (SELECT c.c_mktsegment AS seg, e.event_type AS typ,
        |    count(*) AS obs
        |  FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |  GROUP BY 1, 2),
        |st AS (SELECT seg, sum(obs) AS seg_tot FROM cells GROUP BY seg),
        |tt AS (SELECT typ, sum(obs) AS typ_tot FROM cells GROUP BY typ),
        |n AS (SELECT sum(obs) AS total FROM cells),
        |x AS (SELECT cells.seg, cells.typ, cells.obs,
        |    CAST(st.seg_tot AS DOUBLE) * CAST(tt.typ_tot AS DOUBLE)
        |      / CAST(n.total AS DOUBLE) AS expected
        |  FROM cells JOIN st USING (seg) JOIN tt USING (typ) CROSS JOIN n)
        |SELECT seg, typ, CAST(obs AS BIGINT) AS obs,
        |  round(expected, 6) AS expected,
        |  round((CAST(obs AS DOUBLE) - expected) * (CAST(obs AS DOUBLE) - expected)
        |    / expected, 6) AS contrib
        |FROM x ORDER BY seg, typ""".stripMargin
  )
}
