package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted-vs-AQE skew-join A/B — the measured backing for Skew.scala's
  * "for skewed JOINS, prefer AQE" scaladoc claim. Two datasets:
  *
  *  - the REAL sf tables (lineitem ⋈ orders — TPC-H-uniform keys, so
  *    no skew): what blanket salting costs when the data did not need
  *    it (build side ×Salt through the exchange) vs the plain join
  *    AQE runs. Both sides get shuffle_hash + broadcasts disabled so
  *    the comparison is exchange-vs-exchange, not exchange-vs-
  *    broadcast.
  *  - a SYNTHETIC hot-key corpus (the SkewAqeSpec shape, scaled: 90%
  *    of probe rows on one key): the case salting exists for, vs
  *    AQE's runtime split of the oversized partition
  *    (skewedPartitionThreshold scaled down to fire at harness data
  *    volumes, exactly like the spec; the executed plan is checked
  *    for `skew=true` so the AQE row measures a real split, not a
  *    silent no-op).
  *
  * Prints one JSON line per case: wall seconds, shuffle MB written,
  * whether a skew split materialized. Results recorded in
  * BENCH_SCALING.md ("Round-9 skew A/B").
  */
object SkewAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val synRows = sys.env.getOrElse("SKEWAB_ROWS", "2200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) { shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
        }
      })

    def withConfs[T](confs: Seq[(String, String)])(body: => T): T = {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    def measure(name: String, df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val d = df
      val sh0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      // materialize through the dataset's OWN QueryExecution (a write
      // spawns a fresh one, so the AQE-final plan — where skew=true
      // lives — would never be observable on `d`)
      val n = d.queryExecution.executedPlan.execute().count()
      val wall = (System.nanoTime() - t0) / 1e9
      val mb = (shuffleBytes.get() - sh0) / 1e6
      val skew = d.queryExecution.executedPlan.toString.contains("skew=true")
      println(f"""{"case":"$name","wall_s":$wall%.3f,"shuffle_mb":$mb%.1f,"rows":$n,"skew_split":$skew}""")
    }

    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    // the spec's scaled-down split thresholds: production keeps the
    // 256MB defaults; harness partitions are ~1MB so the hot partition
    // must be declarable as skewed at this volume
    val skewConfs = noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

    // ---- real tables (uniform keys: what blanket salting costs) ----
    withConfs(noBroadcast) {
      measure("real_salted",
        graft.ops.Skew.queries("q_skew_salted_join")(spark, sfDir))
      measure("real_aqe_plain", {
        val li = graft.Tables(spark, sfDir, "lineitem")
        val ords = graft.Tables(spark, sfDir, "orders")
        li.hint("shuffle_hash")
          .join(ords, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(graft.util.Exact.discounted(col("l_extendedprice"),
            col("l_discount"))).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_orderstatus"))
      })
    }

    // ---- synthetic hot key (the case salting exists for) ----
    val hot = (synRows * 9) / 10
    def probe = spark.range(0, synRows)
      .select(when(col("id") < hot, 0L).otherwise(col("id") % 50 + 1).as("k"),
        col("id").as("payload"))
    def dim = spark.range(0, 51).select(col("id").as("k"), (col("id") * 10).as("v"))
    val salt = graft.ops.Skew.Salt
    withConfs(noBroadcast) {
      measure("syn_salted", {
        val p = probe.withColumn("salt_l", pmod(col("payload"), lit(salt)))
        val d = dim.withColumn("salt_r",
          explode(array((0 until salt).map(i => lit(i)): _*)))
        p.hint("shuffle_hash").join(d,
            p("k") === d("k") && col("salt_l") === col("salt_r"))
          .select((col("payload") + col("v")).as("x"))
      })
    }
    withConfs(skewConfs) {
      measure("syn_aqe", {
        probe.hint("shuffle_hash").join(dim, "k")
          .select((col("payload") + col("v")).as("x"))
      })
    }
    spark.stop()
  }
}
