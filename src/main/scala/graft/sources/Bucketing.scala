package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) joins — the zero-shuffle path for repeated
  * fact⋈fact joins at 100 TB: both tables hash-bucketed and sorted on
  * the join key at write time, so every subsequent join/aggregation on
  * that key skips its Exchange entirely (Spark native bucketing, no
  * Hive required). Bucket counts should be sized so one bucket of the
  * larger table fits an executor core's memory (e.g. 100 TB lineitem /
  * 4096 buckets ≈ 25 GB... pick 32768) — and must MATCH between tables
  * for co-location.
  */
object Bucketing {

  /** Persist a table bucketed+sorted on `key` into the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key. With matching
    * bucket specs the plan is SortMergeJoin with NO Exchange on either
    * side (asserted in BucketingSpec).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
