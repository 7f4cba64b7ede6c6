package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-vs-horizon pin for the span-exact family — the measured
  * backing for the K = log₂(horizon) scaling claim: the SAME corpus
  * (sf0.1, ≤100-token docs) built at suffix horizons 128 / 512 / 1024
  * (7 / 9 / 10 doubling rounds; the Scratch keys embed the horizon,
  * so each run builds its own rank + group tables). On a corpus whose
  * docs all fit the smallest horizon the CENSUS must be identical at
  * every horizon (extra rounds relabel already-separated ranks) —
  * asserted, so the A/B doubles as a correctness check of the
  * conf-driven round derivation. Results recorded in BENCH_SCALING.md
  * ("Round-10 wall vs horizon").
  */
object HorizonAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var base: Seq[String] = null
    for (h <- Seq(128, 512, 1024)) {
      spark.conf.set(graft.ops.SpanExact.SpanSaMaxLenConf, h.toString)
      val t0 = System.nanoTime()
      val rows = graft.ops.SpanExact
        .queries("q_span_dedup_exact")(spark, sfDir)
        .collect().map(_.toString).toSeq
      val sec = (System.nanoTime() - t0) / 1e9
      if (base == null) base = rows
      require(rows == base,
        s"census at horizon $h differs from the 128 baseline")
      println(f"""{"horizon":$h,"rounds":${31 - Integer.numberOfLeadingZeros(h)},"rows":${rows.size},"census_equal":true,"sec":$sec%.1f}""")
    }
    spark.conf.unset(graft.ops.SpanExact.SpanSaMaxLenConf)
    spark.stop()
  }
}
