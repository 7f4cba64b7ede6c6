package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.util.Exact._

case class UserTotal(user_id: Long, n: Long)

/** SURVEY.md §2.8 — genuinely-streaming execution of the window
  * semantics that Temporal exposes in batch form (the two are asserted
  * equal in StreamingSpec). File-source streams drained synchronously
  * into a memory sink; in production the same plans run continuously
  * with a checkpointLocation and a real sink.
  *
  * events.ts is TIMESTAMP(NANOS) parquet — the stream reads it as long
  * (nanosAsLong) and truncates to micros, same as [[graft.Tables]].
  */
object Streams {

  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-source basePath must be a directory; glob-filter the table
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Streaming tumbling 1-hour aggregation with a 1-hour watermark,
    * drained to a memory table.
    */
  def tumblingToTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(table).start()
    q.processAllAvailable()
    q.stop()
    spark.table(table)
  }

  /** Custom keyed state via mapGroupsWithState: per-user running event
    * totals (the KeyValueGroupedDataset stateful surface).
    */
  def userTotalsToTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    import spark.implicits._
    val perUser = eventsStream(spark, dir)
      .select(col("user_id").cast("long"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          UserTotal(user, n)
      }
    val q = perUser.toDF().writeStream.outputMode("update")
      .format("memory").queryName(table).start()
    q.processAllAvailable()
    q.stop()
    spark.table(table)
  }
}
