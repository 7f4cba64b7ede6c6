package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Catalog-facing source/sink parity (SURVEY.md §2.1):
  *  - S4 existence check  → `spark.catalog.tableExists`
  *  - S5 create-if-not-exists (the reference PUTs an ES index with
  *    shard settings; here: external parquet table over a location —
  *    layout is the parquet files' partitioning, not shard counts)
  *  - S11 DDL bootstrap — idempotent, unlike the reference's
  *    `CREATE INDEX` without IF NOT EXISTS that fails on re-run
  *    (scripts/postgres_db_scripts.sql:17-19).
  */
object Warehouse {

  /** S4: does the table exist in the session catalog? */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** S5: external parquet table over an existing location, create only
    * if absent. Safe to call on every run (the reference re-creates
    * its index guarded by a HEAD check, ingest_csv_to_elastic.py:36-55).
    */
  def createIfNotExists(spark: SparkSession, name: String, location: String,
      schema: Option[StructType] = None): Unit = {
    val cols = schema.map(s => s"(${s.toDDL})").getOrElse("")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $name $cols USING parquet LOCATION '$location'")
  }

  /** S11: run a DDL script (every statement idempotent by contract). */
  def bootstrapDdl(spark: SparkSession, statements: Seq[String]): Unit =
    statements.map(_.trim).filter(_.nonEmpty).foreach(spark.sql(_))

  /** Register every testdata table as a temp view so `spark.sql` users
    * can query by name (the engine's `spark.sql(...)` front door).
    */
  def registerTestdata(spark: SparkSession, dir: String): Unit =
    graft.Tables.all.foreach { t =>
      graft.Tables(spark, dir, t).createOrReplaceTempView(t)
    }
}
