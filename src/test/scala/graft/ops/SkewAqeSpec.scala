package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Proves the documented "AQE is the production skew path" claim
  * (Skew.scala scaladoc): a join with one hot key must come out of
  * adaptive execution with its oversized partition SPLIT (the
  * SortMergeJoin marked `skew=true`), with no query rewrite.
  */
class SkewAqeSpec extends AnyFunSuite with SparkSpec {

  test("AQE splits the hot partition of a skewed join at runtime") {
    import spark.implicits._
    // one hot key (0) with ~200k rows, 50 cold keys
    val probe = spark.range(0, 220000)
      .select((when(col("id") < 200000, 0L).otherwise(col("id") % 50 + 1)).as("k"),
        col("id").as("payload"))
    val build = spark.range(0, 51).select(col("id").as("k"), (col("id") * 10).as("v"))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // no aggregate on the join key downstream: a skew split changes
      // the join's output partitioning, so AQE only applies it when
      // nothing re-requires that distribution
      val joined = probe.join(build, "k")
        .select((col("payload") + col("v")).as("x"))
      // execute THIS dataset so AQE materializes its final plan
      var n = 0L
      joined.toLocalIterator().forEachRemaining(_ => n += 1)
      assert(n == 220000L) // correctness unchanged by the split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
