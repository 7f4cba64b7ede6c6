package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming-twin A/B measurement harness for the optimization rounds
  * (guide §1: measure first; §2.6: overlap independent jobs). Runs a
  * chosen twin's drain with a chosen conf on vs off, interleaved
  * (A,B,A,B,...) with a fresh work dir per rep and staging excluded
  * from the timer, so host weather (2-3x swings between windows on
  * this box) cancels instead of biasing one arm.
  *
  * Env: `AB_TWIN` = release | crossmodal | thetaDelta | ngramTheta |
  * theta (default release); `AB_CONF` = aqe | parwrites (default aqe);
  * `AB_REPS` (default 3).
  * Usage: `SPARK_GRAFT_SF_DIR=... AB_TWIN=crossmodal AB_CONF=aqe
  *   sbt "runMain graft.streaming.ProfileRelease"`.
  */
object ProfileRelease {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val twin = sys.env.getOrElse("AB_TWIN", "release")
    val abConf = sys.env.getOrElse("AB_CONF", "aqe")
    val reps = sys.env.getOrElse("AB_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stage(work: String): Unit = twin match {
      case "release" => Streams.releaseStage(spark, sfDir, work, 3)
      case "crossmodal" => Streams.crossmodalStage(spark, sfDir, work, 3)
      case "thetaDelta" => Streams.thetaDeltaStage(spark, sfDir, work, 3)
      case "ngramTheta" => Streams.thetaStage(spark, sfDir, work, 3)
      case "theta" => Streams.thetaStage(spark, sfDir, work, 3)
      case "contamination" => Streams.contaminationStage(spark, sfDir, work, 3)
      case "outliers" => Streams.outliersStage(spark, sfDir, work, 3)
      case "doremi" => Streams.doremiStage(spark, sfDir, work, 3)
      case "drift" => Streams.driftStage(spark, sfDir, work, 3)
    }
    def run(work: String): org.apache.spark.sql.DataFrame = twin match {
      case "release" => Streams.releaseRun(spark, sfDir, work)
      case "crossmodal" => Streams.crossmodalRun(spark, sfDir, work)
      case "thetaDelta" => Streams.thetaDeltaRun(spark, sfDir, work)
      case "ngramTheta" => Streams.ngramThetaRun(spark, sfDir, work)
      case "theta" => Streams.thetaRun(spark, sfDir, work)
      case "contamination" => Streams.contaminationRun(spark, sfDir, work)
      case "outliers" => Streams.outliersRun(spark, sfDir, work)
      case "doremi" => Streams.doremiRun(spark, work)
      case "drift" => Streams.driftRun(spark, work)
    }
    def rep(mode: Boolean): Double = {
      abConf match {
        // mode=true is the CANDIDATE arm (aqe off / parwrites on)
        case "aqe" =>
          spark.conf.set("spark.sql.adaptive.enabled", (!mode).toString)
        case "parwrites" =>
          spark.conf.set(Streams.ParWritesConf, mode.toString)
      }
      val work = graft.util.WorkDirs.temp(s"${twin}_ab")
      stage(work)
      val t0 = System.nanoTime()
      run(work).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset(Streams.ParWritesConf)
      // Bench's inter-entry hygiene, so reps stay independent
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      t
    }

    rep(mode = true) // warm-up drain (untimed)
    val walls = scala.collection.mutable.Map(
      true -> List.empty[Double], false -> List.empty[Double])
    for (r <- 1 to reps; mode <- Seq(true, false)) {
      val t = rep(mode)
      walls(mode) = t :: walls(mode)
      System.err.println(f"[ab] twin=$twin conf=$abConf rep=$r cand=$mode wall=$t%.3f s")
    }
    for (mode <- Seq(true, false))
      System.err.println(f"[ab] twin=$twin conf=$abConf cand=$mode median=${
        walls(mode).sorted.apply(walls(mode).size / 2)}%.3f s  all=${
        walls(mode).reverse.map(w => f"$w%.2f").mkString(",")}")
    spark.stop()
  }
}
