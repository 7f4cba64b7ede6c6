package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md /
  * FIXTURES.md §3). One parquet file per table under `\$dir/`.
  *
  * All engine queries read through here so the scan options (and any
  * future source abstraction — bucketed layout, partitioned warehouse)
  * have a single seam.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.Registry.ensure(spark) // native exprs available everywhere
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read nanos as long and truncate to micros —
      // exactly what DuckDB's micro-precision TIMESTAMP does, so the
      // oracle sees identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Spread a narrow scan across the cluster before an explode-style
    * fan-out. A small parquet file (one row group) scans as a single
    * partition, which would serialize everything downstream of it; a
    * 100 TB input already has thousands of splits, in which case this
    * is a no-op — the condition, not the repartition, is the contract.
    * The shuffle moves only the pre-explode rows (docs, not shingles),
    * which is the cheap side of the amplification.
    */
  def fanout(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
