package graft.streaming

import org.apache.spark.sql.SparkSession

/** Drain-floor A/B — round-9 follow-up to the round-8 staging memo:
  * the ~1.8 s/twin foreachBatch floor × 24 twins is the biggest bench
  * block, and the remaining suspects are query start/stop + the idle
  * progress-poll `processAllAvailable` pays per drain. Measures two
  * representative twins (forget: near-zero per-batch work — the pure
  * floor; watermark: real per-batch partials) under the default drain
  * and under `Trigger.AvailableNow` + awaitTermination
  * ([[Streams.AvailableNowConf]]), 3 reps each on pre-staged private
  * work dirs (staging excluded from the timer). Results →
  * BENCH_SCALING "Round-9 drain floor".
  */
object DrainAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(twin: String, mode: String): Double = {
      spark.conf.set(Streams.AvailableNowConf,
        (mode == "availableNow").toString)
      val work = graft.util.WorkDirs.temp(s"drain_ab_$twin")
      twin match {
        case "forget" => Streams.forgetStage(spark, sfDir, work, 3)
        case "watermark" =>
          // same canonical staging the production twin uses
          val docs = graft.Tables(spark, sfDir, "documents")
            .select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("text"),
              org.apache.spark.sql.functions.col("source"))
          Streams.stageShards(docs, work, 3, keyCol = "doc_id")
      }
      val t0 = System.nanoTime()
      val df = twin match {
        case "forget" => Streams.forgetRun(spark, sfDir, work)
        case "watermark" => Streams.watermarkRun(spark, work)
      }
      val n = df.count()
      require(n > 0, s"$twin drained nothing")
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warm-up (one un-timed drain per twin)
    run("forget", "default"); run("watermark", "default")
    for (twin <- Seq("forget", "watermark");
         mode <- Seq("default", "availableNow");
         rep <- 1 to 3) {
      val t = run(twin, mode)
      println(f"""{"twin":"$twin","mode":"$mode","rep":$rep,"wall_s":$t%.3f}""")
    }
    spark.conf.unset(Streams.AvailableNowConf)
    spark.stop()
  }
}
