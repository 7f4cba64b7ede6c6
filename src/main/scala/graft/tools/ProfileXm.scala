package graft.streaming

import org.apache.spark.sql.SparkSession

// Temporary profiler for the streaming crossmodal guard's stage costs.
object ProfileXm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); ()
        }
      })
    def snap(name: String): Unit =
      println(s"XMPROF $name jobs=${jobs.get} stages=${stages.get}")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"XMPROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val work = java.nio.file.Files.createTempDirectory("xmprof").toString
    t("stage")(Streams.crossmodalStage(spark, dir, work, 3))
    snap("afterStage")
    val out = t("run")(Streams.crossmodalRun(spark, dir, work))
    snap("afterRun")
    t("collect")(out.collect().length)
    snap("afterCollect")
    spark.stop()
  }
}
