package graft.plans

import org.apache.spark.sql.classic
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.analytics.TemporalJoins

/** The native broadcast as-of join: plan shape + exact equivalence
  * with the composed window form.
  */
class AsOfPlanSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = TemporalJoins.queries(name)(spark, dir)
    df.collect() // force planning through AQE's final plan
    df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan.toString
  }

  test("q_asof_native plans through BroadcastAsOfJoinExec with a broadcast exchange") {
    val plan = executedPlan("q_asof_native")
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    // zero-probe-shuffle invariant: the left (events) subtree — the
    // text between the join node and the right side's
    // BroadcastExchange — must carry no shuffle of any kind
    val joinIdx = plan.indexOf("BroadcastAsOfJoin")
    val bcIdx = plan.indexOf("BroadcastExchange", joinIdx)
    assert(bcIdx > joinIdx, plan)
    val probeSubtree = plan.substring(joinIdx, bcIdx)
    assert(!probeSubtree.contains("Exchange"), plan)
    assert(!probeSubtree.contains("SortMergeJoin"), plan)
  }

  test("native as-of join ≡ composed window form, row for row") {
    val native = TemporalJoins.queries("q_asof_native")(spark, dir).collect()
    val composed = TemporalJoins.queries("q_asof_join")(spark, dir).collect()
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (a, b) => assert(a == b) }
  }

  test("unmatched, null-key and null-time probe rows keep nulls (left outer)") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(100L), Some(10L)), // matched
      (2L, Some(5L), Some(10L)),   // key exists, all right times too late
      (3L, Some(100L), None),      // null probe time
      (4L, None, Some(10L)),       // null key
      (5L, Some(100L), Some(99L))  // key absent on right
    ).toDF("id", "t", "k")
    val right = Seq(
      (10L, 50L, 1L), (10L, 50L, 2L), (10L, 70L, 1L), (10L, 200L, 9L)
    ).toDF("rk", "rt", "payload")
    val out = AsOfJoin.broadcastAsOf(left, right,
        Seq("k"), Seq("rk"), "t", "rt", Seq("payload"))
      .select($"id", $"rt", $"payload").orderBy($"id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
    assert(out(0) == ((1L, 70L, 1L))) // max time wins over tiebreak
    assert(out(1) == ((2L, null, null)))
    assert(out(2) == ((3L, null, null)))
    assert(out(3) == ((4L, null, null)))
    assert(out(4) == ((5L, null, null)))
  }

  test("tiebreak picks the max payload among equal times") {
    import spark.implicits._
    val left = Seq((1L, 60L, 10L)).toDF("id", "t", "k")
    val right = Seq((10L, 50L, 1L), (10L, 50L, 7L), (10L, 50L, 3L))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.broadcastAsOf(left, right,
        Seq("k"), Seq("rk"), "t", "rt", Seq("payload"))
      .select(col("payload")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L))
  }
}
