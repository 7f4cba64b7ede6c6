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

  test("compaction rewrites many small files to few, preserving data") {
    val out = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val orders = graft.Tables(spark, dir, "orders")
    orders.repartition(37).write.parquet(out) // fragmented table
    assert(Layout.fileCount(spark, out) == 37)
    // decimal sum: a double sum is accumulation-order-dependent and
    // the whole point of compaction is changing the partition layout
    def checksum() = spark.read.parquet(out)
      .agg(graft.util.Exact.moneySum(col("o_totalprice"))).head().getDouble(0)
    val before = checksum()
    Layout.compact(spark, out, 2)
    assert(Layout.fileCount(spark, out) == 2)
    val after = checksum()
    assert(spark.read.parquet(out).count() == 1500)
    assert(before == after)
  }

  test("sorted write clusters key ranges into single files") {
    val out = java.nio.file.Files.createTempDirectory("sorted").toString + "/t"
    Layout.writeSorted(graft.Tables(spark, dir, "orders"), out, "o_orderkey", 10)
    // all rows of a narrow key range land in ONE file's band — the
    // clustering that makes parquet min/max stats selective (row-group
    // skipping happens inside the reader; this asserts the layout that
    // enables it)
    val q = spark.read.parquet(out).filter(col("o_orderkey").between(100, 110))
    assert(q.count() == 11)
    val picked = q.select(input_file_name()).distinct().count()
    assert(picked == 1, s"range rows spread over $picked files, want 1")
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
