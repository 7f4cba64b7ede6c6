package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Error bounds for the approximate (sketch-backed, rows-only)
  * queries — the correctness contract the DuckDB oracle can't carry.
  */
class SketchSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_approx_distinct is within HLL rsd of the exact counts") {
    val approx = Relational.queries("q_approx_distinct")(spark, dir).head()
    val exact = Relational.queries("q_count_distinct")(spark, dir).head()
    // rsd 0.01 requested; allow 5 sigma
    val (a, e) = (approx.getLong(0).toDouble, exact.getLong(0).toDouble)
    assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
  }

  test("q_hll_rollup: day-sketch union matches direct sketch, tracks exact") {
    import org.apache.spark.sql.functions._
    val merged = Relational.queries("q_hll_rollup")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // union-of-daily-partials must equal the sketch built in one shot
    // over the same rows (sketch merge is lossless at equal lgK)...
    val direct = graft.Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct, s"merged $merged != direct $direct")
    // ...and both track the exact distinct count inside HLL error
    val exact = graft.Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    exact.foreach { case (t, e) =>
      assert(math.abs(merged(t).toDouble - e) / e <= 0.01,
        s"$t: sketch ${merged(t)} vs exact $e") }
  }

  test("q_approx_quantile tracks the exact percentile per group") {
    val approx = Extras.queries("q_approx_quantile")(spark, dir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = Extras.queries("q_quantiles")(spark, dir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    // accuracy 10000 ⇒ rank error ≤ 1/10000; values are integral
    // quantities 1..50, so approx must land within one value step
    exact.foreach { case (g, eqs) =>
      approx(g).zip(eqs).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 1.0, s"group $g: approx $a vs exact $e")
      }
    }
  }
}
