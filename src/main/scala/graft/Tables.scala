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
      // events.ts has shipped as three different parquet physical types
      // across testdata generations: TIMESTAMP(NANOS) (rejected by the
      // vectorized reader — read as long via nanosAsLong and truncate),
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark 4 infers
      // TIMESTAMP_NTZ when inferTimestampNTZ is on), and plain
      // TIMESTAMP(MICROS). Normalize ALL of them to session-TZ
      // TimestampType here, the single read seam, so every downstream
      // operator (`unix_micros`, watermarks, typed Timestamp encoders)
      // sees one type regardless of the file generation or the NTZ
      // inference flag. Sessions run UTC, so the NTZ→TZ cast is a
      // value-preserving relabel of the same micros — identical to what
      // DuckDB's micro-precision naive TIMESTAMP gives the oracle.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val out = raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
        case TimestampType => raw
        case other => throw new IllegalStateException(
          s"events.ts read as unsupported type $other — extend the " +
            "Tables normalization for this testdata generation")
      }
      // Loud boundary guard: a future type drift must fail HERE, not as
      // eight operators silently vanishing from the correctness run
      // (round 3's failure mode).
      require(out.schema("ts").dataType == TimestampType,
        s"events.ts normalization failed: ${out.schema("ts").dataType}")
      out
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
