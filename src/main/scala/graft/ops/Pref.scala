package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextFns._
import TextAnalysis._

/** Preference-data analytics — the RLHF/eval side of a training-data
  * pipeline: assemble deterministic preference pairs (the DPO/RM
  * training shape: same "prompt", a chosen and a rejected response)
  * and rate the competing sources from the pairwise outcomes with a
  * Bradley–Terry pass (the Chatbot-Arena-style leaderboard; Bradley &
  * Terry 1952, the MM update of Hunter 2004).
  *
  * No reference counterpart (the reference's 289-line covid ETL has no
  * preference surface) — this family exists for the LLM-pipeline
  * charter in SURVEY §0.
  *
  * Determinism: the judge is the corpus quality score, compared in
  * integer ppm (floor(score·10⁶) — the q_importance_sample
  * discipline), ties broken by doc_id; matchmaking is the seeded h60
  * hash, so every re-run draws the same pairs. The Bradley–Terry
  * iteration is integer micro-unit arithmetic end to end (the
  * q_priority_sample discipline): no double ever reaches an output
  * column or an order-sensitive sum.
  *
  * Scale shape: one hash-partitioned window ranks each matchmaking
  * bucket (corpus/B rows per bucket; in production B scales with the
  * corpus — the constant here pins the oracle convention), the
  * odd/even pairing self-join reuses the same (bucket, pid) key, and
  * everything after the pair table is |sources|-sized aggregates with
  * map-side partials and broadcast joins. Nothing quadratic, no
  * global window, no global sort before the presentation ORDER BY.
  */
object Pref {
  type Q = (SparkSession, String) => DataFrame

  /** Matchmaking-bucket floor — the bucket count at every gated SF
    * (≤ 50k docs through sf1, where n/1024 < 64), so the oracle draw
    * there never moves.
    */
  val PairBuckets = 64L

  /** Bucket count for an n-doc corpus: max(64, n/1024) — the
    * [[Similarity.semSeedCount]] precedent (r11 verdict item 5). A
    * bare constant made each bucket's ranking window corpus/64 — the
    * q_knn_graph bare-label disease at 100 TB; growing the count with
    * the corpus bounds every window partition at ~1024 rows at any
    * scale. The ORACLE replays the same greatest(64, count/1024)
    * formula, so the gate stays hash-exact even at a scale where the
    * count departs the floor.
    */
  def pairBuckets(n: Long): Long = math.max(PairBuckets, n / 1024L)

  /** The deterministic pair table: per bucket, docs rank by seeded
    * hash and adjacent ranks (1,2), (3,4), … face off; the higher
    * integer quality score (tie → lower doc_id) is `chosen`. The last
    * unpaired doc of an odd bucket sits out. Session-materialized
    * (Scratch, billed as `shared_pref_pairs` in Bench) and shared by
    * both queries, so the leaderboard can never drift from the pair
    * dump and the score/window chain runs once per corpus — exactly
    * what a production run does: the pair table IS the dataset
    * artifact, the leaderboard is a report over it.
    */
  private[graft] def prefPairs(s: SparkSession, dir: String): DataFrame = {
    // metadata-only count sizing the bucket space (the probeSampled
    // discipline); part of the Scratch key so a corpus crossing a
    // bucket boundary can never serve a stale draw
    val b = pairBuckets(Tables(s, dir, "documents").count())
    Scratch.materialize(s, s"pref_pairs|$dir|b$b")(
      buildPrefPairs(s, dir, b))
  }

  private def buildPrefPairs(s: SparkSession, dir: String,
      nBuckets: Long): DataFrame = {
    val lt = lower(col("text"))
    val scored = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("n_tok"),
        nMatches(lt, EnPat).as("n_stop"),
        nMatches(col("text"), PunctPat).as("n_punct"),
        nMatches(col("text"), DigitPat).as("n_digit"),
        length(col("text")).as("len"))
      .select(col("doc_id"), col("source"),
        floor(qualityScore(col("n_tok"), col("n_stop"), col("n_punct"),
          col("n_digit"), col("len")) * 1000000).as("score_ppm"),
        h60(concat(lit("pair:"), col("doc_id").cast("string"))).as("h"))
    val ranked = scored
      .withColumn("bucket", col("h") % nBuckets)
      .withColumn("rb", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))))
      .withColumn("pid", expr("(rb - 1) div 2"))
    val a = ranked.where(col("rb") % 2 === 1)
      .select(col("bucket"), col("pid"), col("doc_id").as("a_doc"),
        col("source").as("a_src"), col("score_ppm").as("a_ppm"))
    val b = ranked.where(col("rb") % 2 === 0)
      .select(col("bucket"), col("pid"), col("doc_id").as("b_doc"),
        col("source").as("b_src"), col("score_ppm").as("b_ppm"))
    val aWins = col("a_ppm") > col("b_ppm") ||
      (col("a_ppm") === col("b_ppm") && col("a_doc") < col("b_doc"))
    a.join(b, Seq("bucket", "pid"))
      .select(col("bucket"), col("pid"),
        when(aWins, col("a_doc")).otherwise(col("b_doc")).as("chosen_doc"),
        when(aWins, col("a_src")).otherwise(col("b_src")).as("chosen_src"),
        when(aWins, col("a_ppm")).otherwise(col("b_ppm")).as("chosen_ppm"),
        when(aWins, col("b_doc")).otherwise(col("a_doc")).as("rejected_doc"),
        when(aWins, col("b_src")).otherwise(col("a_src")).as("rejected_src"),
        when(aWins, col("b_ppm")).otherwise(col("a_ppm")).as("rejected_ppm"))
      .withColumn("margin_ppm", col("chosen_ppm") - col("rejected_ppm"))
  }

  val queries: Map[String, Q] = Map(
    // The preference-pair assembly pass — the dataset a reward model /
    // DPO run trains on, dumped pair-for-pair so the gate certifies
    // the draw, the judge decision, and the margins.
    "q_pref_pairs" -> ((s, dir) =>
      prefPairs(s, dir).orderBy(col("bucket"), col("pid"))),

    // Arena leaderboard: cross-source games from the pair table, one
    // exact win-rate column, and two Bradley–Terry MM iterations from
    // a uniform start, all in integer ppm. With s⁰ uniform the first
    // iteration is s¹_i = 2·W_i/N_i (scaled ×10⁶); the second folds
    // the opponent matrix: s²_i = W_i / Σ_j n_ij/(s¹_i + s¹_j), each
    // term floored to an exact micro-unit BIGINT so the Σ is
    // order-free. Overflow headroom: terms are ≤ games·10¹², so the
    // BIGINT budget holds to ~10⁶ games per source pair ×10⁶ —
    // beyond that, lift the micro scale or pre-divide n_ij.
    "q_arena_bt" -> ((s, dir) =>
      btFromGames(prefPairs(s, dir)
        .where(col("chosen_src") =!= col("rejected_src"))
        .select(col("chosen_src").as("w"), col("rejected_src").as("l")))
        .orderBy(col("source"))))

  /** Leaderboard from a (w, l) game log: per-source games/wins, exact
    * win rate, and the two integer-ppm Bradley–Terry MM iterations
    * described on q_arena_bt. Factored so the spec can pin the MM
    * arithmetic on a crafted game log.
    */
  private[ops] def btFromGames(g: DataFrame): DataFrame = {
    val d = g.select(col("w").as("src"), col("l").as("opp"),
        lit(1L).as("win"))
      .unionAll(g.select(col("l").as("src"), col("w").as("opp"),
        lit(0L).as("win")))
    val m = d.groupBy(col("src"), col("opp"))
      .agg(count(lit(1)).as("n"), sum(col("win")).as("wi"))
    val per = m.groupBy(col("src"))
      .agg(sum(col("n")).as("n_games"), sum(col("wi")).as("n_wins"))
    val s1 = per.select(col("src"),
      expr("(2 * n_wins * 1000000) div greatest(n_games, 1)").as("s1_ppm"))
    val t = m
      .join(broadcast(s1), Seq("src"))
      .join(broadcast(s1.select(col("src").as("opp"),
        col("s1_ppm").as("s1_opp"))), Seq("opp"))
      .groupBy(col("src"))
      .agg(sum(expr(
        "(n * 1000000000000) div greatest(s1_ppm + s1_opp, 1)"))
        .as("t_sum"))
    per.join(broadcast(s1), Seq("src")).join(broadcast(t), Seq("src"))
      .select(col("src").as("source"), col("n_games"), col("n_wins"),
        expr("(n_wins * 1000000) div greatest(n_games, 1)").as("win_ppm"),
        col("s1_ppm"),
        expr("(n_wins * 1000000000000) div greatest(t_sum, 1)")
          .as("bt_ppm"))
  }

  /** CTE chain shared by both oracles — the verbatim DuckDB replay of
    * [[prefPairs]]: relations `pp` (pair rows).
    */
  private def sqlPairCtes: String =
    s"""m AS (SELECT doc_id, source,
       |    CAST(len(${sqlTokens("text")}) AS INT) AS n_tok,
       |    CAST(len(regexp_extract_all(lower(text), '$EnPat')) AS INT) AS n_stop,
       |    CAST(len(regexp_extract_all(text, '$PunctPat')) AS INT) AS n_punct,
       |    CAST(len(regexp_extract_all(text, '$DigitPat')) AS INT) AS n_digit,
       |    CAST(length(text) AS INT) AS len
       |  FROM documents),
       |sc AS (SELECT doc_id, source,
       |    CAST(floor((${sqlScore("n_tok", "n_stop", "n_punct", "n_digit",
             "len")}) * 1000000) AS BIGINT) AS score_ppm,
       |    ${sqlH60("'pair:' || CAST(doc_id AS VARCHAR)")} AS h
       |  FROM m),
       |nb AS (SELECT greatest($PairBuckets,
       |    CAST(count(*) AS BIGINT) // 1024) AS b FROM documents),
       |rk AS (SELECT sc.*, h % b AS bucket,
       |    row_number() OVER (PARTITION BY h % b
       |      ORDER BY h, doc_id) AS rb
       |  FROM sc CROSS JOIN nb),
       |pa AS (SELECT bucket, (rb - 1) // 2 AS pid, doc_id AS a_doc,
       |    source AS a_src, score_ppm AS a_ppm FROM rk WHERE rb % 2 = 1),
       |pb AS (SELECT bucket, (rb - 1) // 2 AS pid, doc_id AS b_doc,
       |    source AS b_src, score_ppm AS b_ppm FROM rk WHERE rb % 2 = 0),
       |pp AS (SELECT bucket, pid,
       |    CASE WHEN a_ppm > b_ppm OR (a_ppm = b_ppm AND a_doc < b_doc)
       |      THEN a_doc ELSE b_doc END AS chosen_doc,
       |    CASE WHEN a_ppm > b_ppm OR (a_ppm = b_ppm AND a_doc < b_doc)
       |      THEN a_src ELSE b_src END AS chosen_src,
       |    greatest(a_ppm, b_ppm) AS chosen_ppm,
       |    CASE WHEN a_ppm > b_ppm OR (a_ppm = b_ppm AND a_doc < b_doc)
       |      THEN b_doc ELSE a_doc END AS rejected_doc,
       |    CASE WHEN a_ppm > b_ppm OR (a_ppm = b_ppm AND a_doc < b_doc)
       |      THEN b_src ELSE a_src END AS rejected_src,
       |    least(a_ppm, b_ppm) AS rejected_ppm,
       |    greatest(a_ppm, b_ppm) - least(a_ppm, b_ppm) AS margin_ppm
       |  FROM pa JOIN pb USING (bucket, pid))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pref_pairs" ->
      s"""WITH $sqlPairCtes
         |SELECT bucket, pid, chosen_doc, chosen_src, chosen_ppm,
         |  rejected_doc, rejected_src, rejected_ppm, margin_ppm
         |FROM pp ORDER BY bucket, pid""".stripMargin,
    "q_arena_bt" ->
      s"""WITH $sqlPairCtes,
         |g AS (SELECT chosen_src AS w, rejected_src AS l FROM pp
         |  WHERE chosen_src <> rejected_src),
         |d AS (SELECT w AS src, l AS opp, 1 AS win FROM g
         |  UNION ALL SELECT l, w, 0 FROM g),
         |mm AS (SELECT src, opp, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(win) AS BIGINT) AS wi
         |  FROM d GROUP BY src, opp),
         |per AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_games,
         |    CAST(sum(wi) AS BIGINT) AS n_wins
         |  FROM mm GROUP BY src),
         |s1 AS (SELECT src,
         |    (2 * n_wins * 1000000) // greatest(n_games, 1) AS s1_ppm
         |  FROM per),
         |ts AS (SELECT mm.src, CAST(sum(
         |      (n * 1000000000000) // greatest(a.s1_ppm + b.s1_ppm, 1))
         |      AS BIGINT) AS t_sum
         |  FROM mm JOIN s1 a ON mm.src = a.src JOIN s1 b ON mm.opp = b.src
         |  GROUP BY mm.src)
         |SELECT per.src AS source, n_games, n_wins,
         |  (n_wins * 1000000) // greatest(n_games, 1) AS win_ppm,
         |  s1_ppm,
         |  (n_wins * 1000000000000) // greatest(t_sum, 1) AS bt_ppm
         |FROM per JOIN s1 ON per.src = s1.src JOIN ts ON per.src = ts.src
         |ORDER BY source""".stripMargin)
}
