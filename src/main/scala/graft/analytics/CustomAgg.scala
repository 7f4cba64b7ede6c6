package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.WelfordVar

/** SURVEY.md §2.9c — the typed custom aggregate surface, registered as
  * an oracle-checked query. The merge order across partitions is
  * nondeterministic, so outputs are rounded to 4 digits; DuckDB's
  * avg/var_samp agree to ~1e-12 relative, far inside the rounding.
  */
object CustomAgg {
  type Q = (SparkSession, String) => DataFrame

  private val welford = udaf(WelfordVar)

  val queries: Map[String, Q] = Map(
    // TypedImperativeAggregate surface: bottom-k-by-hash deterministic
    // per-group sampling (functions/BottomKIds) — one pass, O(k) state,
    // merge-order independent; the oracle computes the same sample as
    // a window rank over the shared md5 hash.
    "q_sample_bottomk" -> ((s, dir) => {
      Tables(s, dir, "documents").createOrReplaceTempView("docs_v")
      s.sql(
        """SELECT lang, pos, doc_id FROM (
          |  SELECT lang, posexplode(sample) AS (pos, doc_id) FROM (
          |    SELECT lang, bottom_k_ids(h60(text), doc_id, 5) AS sample
          |    FROM docs_v GROUP BY lang))
          |ORDER BY lang, pos""".stripMargin)
    }),

    "q_agg_custom" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(welford(col("l_quantity")).as("w"))
        .select(col("l_returnflag"),
          round(col("w.mean"), 4).as("mean_qty"),
          round(col("w.var_samp"), 4).as("var_qty"))
        .orderBy(col("l_returnflag"))),

    // Exact heavy hitters in two passes — the production shape for hot
    // keys at 100 TB: pass 1 is the Misra-Gries sketch
    // (functions/MisraGries, one O(k)-state aggregate, map-side
    // combinable) whose guarantee makes recall 100% for any item with
    // freq > n/k; pass 2 recounts ONLY the ≤k candidates exactly and
    // applies the threshold as the integer test cnt·k > n. The final
    // output is deterministic and exact — the sketch prunes, it never
    // decides. The driver collect is the ≤k candidate array (bounded,
    // documented); threshold n rides along the same scan.
    "q_heavy_hitters" -> ((s, dir) => {
      val k = 24 // < |brands| so the sketch genuinely decrements; threshold still selective
      val t = Tables(s, dir, "part").select(col("p_brand").as("item"))
      val sketch = t.agg(expr(s"mg_topk(item, $k)").as("cands"))
        .select(explode(col("cands.item")).as("item"))
        .collect().map(_.getString(0)).toSeq
      val n = t.count()
      t.where(col("item").isin(sketch: _*))
        .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * lit(k.toLong) > lit(n))
        .orderBy(col("item"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sample_bottomk" ->
      """WITH h AS (SELECT lang, doc_id,
        |  CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS hh FROM documents),
        |r AS (SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn FROM h)
        |SELECT lang, CAST(rn - 1 AS INT) AS pos, doc_id FROM r
        |WHERE rn <= 5 ORDER BY lang, pos""".stripMargin,
    "q_agg_custom" ->
      """SELECT l_returnflag, round(avg(l_quantity), 4) AS mean_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // The sketch's 100%-recall guarantee (freq > n/k ⇒ candidate) plus
    // the exact recount make the 2-pass result identical to the plain
    // HAVING form at any partitioning.
    "q_heavy_hitters" ->
      """SELECT p_brand AS item, count(*) AS cnt FROM part
        |GROUP BY 1
        |HAVING count(*) * 24 > (SELECT count(*) FROM part)
        |ORDER BY item""".stripMargin
  )
}
