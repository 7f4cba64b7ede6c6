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
    val rowsOnly = Set("q_approx_distinct", "q_approx_quantile", "q_sim_ann",
      "q_hll_rollup")
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

  test("plan lint: no cartesian product, no unbounded global window") {
    val dir = "/root/testdata/sf0.001"
    // Global (partition-less) windows funnel all rows through one task.
    // Allowed only where the input is provably bounded and documented
    // at the use site: q_topk_other ranks ≤ brand-cardinality (~25)
    // pre-aggregated rows; q_batch_number prefix-sums one row per
    // shuffle partition (≤ defaultParallelism).
    // q_sequence_gaps' global window runs over the per-bucket summary
    // (keyspace/B rows), not the data — see its scaladoc bound.
    // q_mannwhitney's global window runs over the value-BUCKET summary
    // (≤ price-range/bucket-width rows), not the data — see Stats.
    // q_zipf ranks the TakeOrdered top-1000 token frame, never the
    // vocabulary or the corpus.
    val boundedGlobalWindow = Set("q_topk_other", "q_batch_number",
      "q_sequence_gaps", "q_mannwhitney", "q_zipf")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // concrete plan tree (AQE wraps stages and hides children from collect)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.foreach { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        val cartesian = plan.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }
        assert(cartesian.isEmpty,
          s"$name plans a non-broadcast cartesian product")
        val globalWindows = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        assert(boundedGlobalWindow(name) || globalWindows.isEmpty,
          s"$name plans a global single-partition window")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("plan lint: global sorts only as the final presentation sort") {
    import org.apache.spark.sql.execution.{SparkPlan, SortExec}
    val dir = "/root/testdata/sf0.001"
    // A global SortExec is presentation (the deterministic ORDER BY the
    // oracle compare needs) when it sits on the root path — nothing but
    // row-preserving unary nodes above it. A global sort BELOW a join,
    // aggregate, or window is a scale bug: it range-shuffles the whole
    // input to establish an order later operators destroy anyway.
    // Top-k queries must compile to TakeOrderedAndProject, never
    // sort-then-limit (CollectLimit over a global sort is allowed: it
    // IS the presentation when a limit caps the output).
    def presentationPath(p: SparkPlan): Seq[SparkPlan] = p match {
      case s: SortExec => s +: presentationPath(s.child)
      case u if u.children.size == 1 &&
          (u.isInstanceOf[org.apache.spark.sql.execution.ProjectExec] ||
           u.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec] ||
           u.isInstanceOf[org.apache.spark.sql.execution.InputAdapter] ||
           u.isInstanceOf[org.apache.spark.sql.execution.CollectLimitExec] ||
           u.isInstanceOf[org.apache.spark.sql.execution.GlobalLimitExec] ||
           u.isInstanceOf[org.apache.spark.sql.execution.LocalLimitExec] ||
           u.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) =>
        u +: presentationPath(u.children.head)
      case other => Seq(other)
    }
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.foreach { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        val allGlobal = plan.collect { case s: SortExec if s.global => s }
        val onRoot = presentationPath(plan)
          .collect { case s: SortExec if s.global => s }.toSet
        val buried = allGlobal.filterNot(onRoot)
        assert(buried.isEmpty,
          s"$name buries a global sort mid-plan (feeds computation, " +
            s"not presentation): ${buried.map(_.sortOrder.mkString(","))}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Canonically-equal exchange subtrees still present as SEPARATE
    * nodes after Spark's reuse rule ran: each one re-executes the same
    * expensive subtree (shuffle/broadcast + everything below it) — the
    * duplicate-subplan bug class (a builder helper called twice
    * instead of shared/cached defeats reuse the moment the two call
    * sites drift). With exchange reuse ON, identical subtrees collapse
    * into ReusedExchangeExec (not matched here), so anything this
    * returns is a duplicate that reuse could NOT merge — nondeterminism
    * or accidental plan drift between the copies.
    */
  private def duplicateExchanges(
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeExec, ShuffleExchangeExec}
    val ex = plan.collect {
      case e: ShuffleExchangeExec => e: org.apache.spark.sql.execution.SparkPlan
      case e: BroadcastExchangeExec => e
    }
    ex.groupBy(_.canonicalized).collect {
      case (c, copies) if copies.size > 1 =>
        s"${copies.size}x ${c.nodeName}: ${c.simpleString(60)}"
    }.toSeq
  }

  test("plan lint: no duplicate expensive subtree survives exchange reuse") {
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.foreach { case (name, fn) =>
        val dups = duplicateExchanges(fn(spark, dir).queryExecution.executedPlan)
        assert(dups.isEmpty,
          s"$name executes the same exchange subtree twice: ${dups.mkString("; ")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("plan lint detector catches a seeded duplicate subtree") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val reuse = spark.conf.get("spark.sql.exchange.reuse")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // Disabling reuse simulates the failure mode where the optimizer
      // cannot merge the two copies — the detector must still see them.
      spark.conf.set("spark.sql.exchange.reuse", "false")
      def agg = Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val seeded = agg.join(agg.withColumnRenamed("n", "n2"),
        Seq("o_orderpriority"))
      val dups = duplicateExchanges(seeded.queryExecution.executedPlan)
      assert(dups.nonEmpty, "detector missed a duplicated aggregate subtree")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.exchange.reuse", reuse)
    }
  }

  test("oracle SQL strings are DuckDB-side only (no spark-isms)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.toLowerCase.contains("parquet."), s"$k embeds a path")
    }
  }
}
