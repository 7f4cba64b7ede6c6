package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SourcesSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("S4/S5: create-if-not-exists external table, idempotent") {
    assert(!Warehouse.tableExists(spark, "orders_ext"))
    Warehouse.createIfNotExists(spark, "orders_ext", s"$dir/orders.parquet")
    Warehouse.createIfNotExists(spark, "orders_ext", s"$dir/orders.parquet") // no-op
    assert(Warehouse.tableExists(spark, "orders_ext"))
    assert(spark.table("orders_ext").count() == 1500)
  }

  test("S11: DDL bootstrap runs a script idempotently") {
    val ddl = Seq(
      s"CREATE TABLE IF NOT EXISTS nation_ext USING parquet LOCATION '$dir/nation.parquet'",
      "", // blank lines tolerated
      s"CREATE TABLE IF NOT EXISTS region_ext USING parquet LOCATION '$dir/region.parquet'")
    Warehouse.bootstrapDdl(spark, ddl)
    Warehouse.bootstrapDdl(spark, ddl) // re-run must not fail (unlike the reference's CREATE INDEX)
    assert(spark.table("nation_ext").count() == 25)
  }

  test("spark.sql front door over registered testdata views") {
    Warehouse.registerTestdata(spark, dir)
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n == 6000)
  }

  test("bucketed co-located join plans without an exchange") {
    Bucketing.writeBucketed(
      graft.Tables(spark, dir, "orders"), "orders_b", "o_orderkey")
    Bucketing.writeBucketed(
      graft.Tables(spark, dir, "lineitem"), "lineitem_b", "l_orderkey")
    // at sf0.001 the planner (rightly) broadcasts the tiny table and
    // skips bucketing; force the merge path to expose the co-location
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "lineitem_b", "orders_b",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      assert(joined.count() == 6000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
