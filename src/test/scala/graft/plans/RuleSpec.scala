package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** RewriteTop1PerGroup: plan-shape and equivalence checks. */
class RuleSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def top1(desc: Boolean = false): DataFrame = {
    val order = if (desc) Seq(col("value").desc_nulls_last, col("event_id"))
    else Seq(col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
    graft.Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"))
  }

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  private def hasMinBy(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.aggregateExpressions.exists(_.exists {
          case _: org.apache.spark.sql.catalyst.expressions.aggregate.MinBy => true
          case _ => false
        }) => a
    }.nonEmpty

  test("rn=1 over asc keys rewrites to a sort-free min_by aggregate") {
    val df = top1()
    assert(!hasWindow(df), "Window survived the rewrite")
    assert(hasMinBy(df), "no MinBy aggregate in the rewritten plan")
  }

  test("rewrite is result-equivalent to the window execution") {
    val withRule = top1().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    spark.conf.set("spark.graft.rewriteTop1PerGroup", "false")
    try {
      val woRule = top1()
      assert(hasWindow(woRule), "kill switch ignored")
      val expected = woRule.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(withRule.sameElements(expected))
    } finally spark.conf.set("spark.graft.rewriteTop1PerGroup", "true")
  }

  test("unsupported shapes keep their Window") {
    // rn <= 2 is not top-1
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val top2 = graft.Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
    assert(hasWindow(top2))
    // descending double (nullable, NaN-ordering hazard) bails out
    assert(hasWindow(top1(desc = true)))
  }

  test("extra filter conjuncts survive above the rewrite") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val df = graft.Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("event_type"))
    assert(!hasWindow(df) && hasMinBy(df))
    assert(df.collect().forall(_.getString(2) == "view"))
  }
}
