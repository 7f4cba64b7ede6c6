package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the formatted physical plan of the ANN graph-walk BUILD
  * expression (the body inside the r14 Scratch materialization of
  * [[graft.ops.Similarity.annGraphSearch]]) — the consumer-side plan
  * is just a scan of the materialized result, so the walk's plan
  * evidence (plans/r14) comes from here.
  * Usage: `sbt "runMain graft.tools.ExplainAnnBuild [sfDir] [hops ...]"`.
  */
object ExplainAnnBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val hopsList =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (hops <- hopsList) {
      val df = graft.ops.Similarity
        .annGraphCandidates(spark, sfDir, graft.ops.Similarity.GraphDegree,
          hops, 0)
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos_sim"), (-col("nn_id")).as("neg_id"))).as("m"))
        .select(col("vec_id"), (-col("m.neg_id")).as("nn_id"),
          col("m.cos_sim").as("cos_sim"))
        .orderBy(col("vec_id"))
      println(s"===== ann_graph_search_build hops=$hops")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
