package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Semantics checks for the market-basket family on crafted baskets
  * (the oracle gate covers driver testdata; these pin the A-priori
  * prune, the thresholds, and the in-row pair generator on inputs we
  * control).
  */
class BasketsSpec extends AnyFunSuite with SparkSpec {

  /** Write crafted lineitem/orders tables, return the dir. */
  private def basketDir(items: Seq[(Long, Long)], custOf: Long => Long): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("baskets").toString
    items.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    items.map(_._1).distinct.map(ok => (ok, custOf(ok))).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("assoc rules: A-priori prune drops infrequent items, ratios exact") {
    // items 1,2 in 25 baskets (frequent); item 3 in 5 (pruned);
    // duplicate (basket,item) rows must not inflate support.
    val items = (1L to 25L).flatMap(ok => Seq(ok -> 1L, ok -> 1L, ok -> 2L)) ++
      (1L to 5L).map(ok => ok -> 3L)
    val dir = basketDir(items, identity)
    val rows = Baskets.queries("q_assoc_rules")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 2L, 25L))
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("assoc rules: in-row pair generator matches a plain self-join") {
    import spark.implicits._
    // 40 baskets over a rotating 5-item-wide window of 8 items — every
    // item lands in exactly 25 baskets (≥ MinSupp, so the prune is a
    // no-op and the plain self-join is the full reference answer).
    val items = (1L to 40L).flatMap(ok => (0 until 5).map(i => ok -> ((ok + i) % 8)))
    val dir = basketDir(items, identity)
    val got = Baskets.queries("q_assoc_rules")(spark, dir)
      .select("p1", "p2", "n_both")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bi = items.distinct.toDF("ok", "pk")
    val selfJoin = bi.as("a").join(bi.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk"), col("b.pk")).agg(count(lit(1)).as("n"))
      .where(col("n") >= Baskets.MinPair)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == selfJoin && got.nonEmpty)
  }

  test("cooccur: cosine exact, MinBoth threshold enforced") {
    // 4 customers all buy {100, 200}; two also buy 300 (pair count 2 <
    // MinBoth). One order per customer.
    val items = (1L to 4L).flatMap(ok => Seq(ok -> 100L, ok -> 200L)) ++
      (1L to 2L).map(ok => ok -> 300L)
    val dir = basketDir(items, identity)
    val rows = Baskets.queries("q_cooccur")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((100L, 200L, 4L, 1.0)))
  }

  test("cooccur: df cap derives from the measured distribution (Zipfian head capped)") {
    // Zipfian corpus: head item 1 sits in 8000 baskets — its df² (64M)
    // alone blows PairBudget, so the derived cap lands at DfCapFloor
    // and the head is dropped BEFORE the pair join. The torso pair
    // (items 10, 20, df = 5 each) is far under the floor and must
    // survive with its exact cosine. Head pairs (1,10)/(1,20) co-occur
    // 5 ≥ MinBoth times but may not appear.
    val items = (1L to 8000L).map(ok => ok -> 1L) ++
      (1L to 5L).flatMap(ok => Seq(ok -> 10L, ok -> 20L))
    val dir = basketDir(items, identity)
    import spark.implicits._
    val deg = items.map { case (ok, pk) => (ok, pk) }.distinct.toDF("ck", "pk")
      .groupBy("pk").agg(count(lit(1)).as("n"))
    assert(Baskets.cooccurDfCap(deg) == Baskets.DfCapFloor,
      "derived cap should hit the floor on a Zipfian head")
    val rows = Baskets.queries("q_cooccur")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((10L, 20L, 5L, 1.0)))
  }

  test("cooccur: uniform corpus derives a no-op cap (dispatch keeps everything)") {
    // the flat-df testdata shape: every df far below both budget and
    // floor — the derived cap must not drop anything (cap ≥ every df).
    val items = (1L to 4L).flatMap(ok => Seq(ok -> 100L, ok -> 200L))
    val dir = basketDir(items, identity)
    import spark.implicits._
    val deg = items.distinct.toDF("ck", "pk")
      .groupBy("pk").agg(count(lit(1)).as("n"))
    assert(Baskets.cooccurDfCap(deg) >= 4L)
    assert(Baskets.queries("q_cooccur")(spark, dir).count() == 1)
  }

  test("cooccur: incidence is per customer, not per order") {
    // One customer with 3 orders, each containing {7, 8}: distinct
    // (customer, item) incidence must count the pair ONCE per customer
    // — so it stays under MinBoth and the result is empty.
    val items = (1L to 3L).flatMap(ok => Seq(ok -> 7L, ok -> 8L))
    val dir = basketDir(items, _ => 42L)
    assert(Baskets.queries("q_cooccur")(spark, dir).isEmpty)
  }
}
