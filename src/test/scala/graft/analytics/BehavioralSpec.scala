package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Invariants for the behavioral/warehouse-maintenance queries. */
class BehavioralSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("gaps-and-islands sessionization ≡ session_window sessions") {
    // Same 30-min gap rule: batch window pass and the streaming-shaped
    // session_window aggregate must find the identical session set
    // (session_window's end is last-event + gap, so compare on start).
    val gi = Behavioral.queries("q_sessionize")(spark, dir)
      .select("user_id", "start_ts", "n_events").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1), r.getLong(2))).toSet
    val sw = Temporal.queries("q_stream_session")(spark, dir)
      .select("user_id", "sess_start", "n").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1), r.getLong(2))).toSet
    assert(gi == sw)
  }

  test("funnel stage counts are positive and monotone non-increasing") {
    val r = Behavioral.queries("q_funnel")(spark, dir).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"($v, $c, $p)")
    assert(p > 0)
  }

  test("transition matrix rows are proper conditional distributions") {
    val rows = Behavioral.queries("q_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-9)  // P(·|from) sums to 1
    }
    // pair count conservation: transitions = events - distinct users
    val ev = graft.Tables(spark, dir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == expected)
  }

  test("schema-evolution union null-fills exactly the absent columns") {
    val out = graft.analytics.WindowsSetsScalars.queries("q_union_evolve")(spark, dir)
    val n = graft.Tables(spark, dir, "orders").count()
    assert(out.count() == n)
    assert(out.columns.toSeq == Seq("key", "total", "prio"))
    assert(out.where(out("total").isNull === out("prio").isNull).count() == 0)
  }

  test("merge emits all three actions and inserts exactly the missing keys") {
    val rows = Behavioral.queries("q_merge_upsert")(spark, dir)
      .select("key", "action").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byAction = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      .withDefaultValue(Set.empty[Long])
    // ("keep" only appears when a snapshot key has no qualifying orders —
    // true at sf0.01, not at tiny sf0.001 where every customer is active)
    assert(byAction.keySet.subsetOf(Set("keep", "insert", "update")))
    assert(byAction("insert").nonEmpty && byAction("update").nonEmpty)
    // inserts are precisely change-batch keys absent from the snapshot
    assert(byAction("insert").forall(_ % 7 == 0))
    assert((byAction("keep") ++ byAction("update")).forall(_ % 7 != 0))
  }
}
