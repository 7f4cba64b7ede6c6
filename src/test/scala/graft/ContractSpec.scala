package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry. */
class ContractSpec extends AnyFunSuite with SparkSpec {

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("inventory is complete and named q_*") {
    assert(SparkEntry.queries.size >= 50)
    assert(SparkEntry.queries.keys.forall(_.startsWith("q_")))
    // every query is oracle-checked unless deliberately rows-only
    val rowsOnly = Set("q_approx_distinct", "q_sim_ann", "q_multimodal_features")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries missing an oracle: $missing")
  }

  test("entry() smoke: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query plans and returns a non-empty schema (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir) // builders that iterate also execute here
      assert(df.columns.nonEmpty, s"$name has no output columns")
      assert(df.queryExecution.optimizedPlan != null, s"$name failed to plan")
    }
  }

  test("oracle SQL strings are DuckDB-side only (no spark-isms)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.toLowerCase.contains("parquet."), s"$k embeds a path")
    }
  }
}
