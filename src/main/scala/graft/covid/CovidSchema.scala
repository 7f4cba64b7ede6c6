package graft.covid

import org.apache.spark.sql.types._

/** Typed row of the warehouse table — mirror of `covid_cases`
  * (reference: scripts/postgres_db_scripts.sql:1-8).
  */
case class CovidCase(date: java.sql.Date, state: String, county: String,
    new_cases: Int, new_deaths: Int)

/** Schemas for the covid pipeline (FIXTURES.md §1).
  *
  * The source CSV (the public data.world "COVID-19 Activity" dataset,
  * reference README.md:113) is schema-on-read: ~14 columns, all
  * strings (the reference lets Elasticsearch dynamic-map them,
  * ingest_csv_to_elastic.py:47-54; we pin the same shape explicitly —
  * never infer on a 100 TB scan).
  */
object CovidSchema {
  /** The five columns the transform consumes (dags/ETL.py:97-101). */
  val usedColumns: Seq[String] = Seq(
    "REPORT_DATE", "PROVINCE_STATE_NAME", "COUNTY_NAME",
    "PEOPLE_POSITIVE_NEW_CASES_COUNT", "PEOPLE_DEATH_NEW_COUNT")

  /** Pass-through columns (ingested untouched, dropped at transform —
    * ingest_csv_to_elastic.py:104-108).
    */
  val passthroughColumns: Seq[String] = Seq(
    "COUNTRY_SHORT_NAME", "COUNTRY_ALPHA_3_CODE", "COUNTRY_ALPHA_2_CODE",
    "CONTINENT_NAME", "COUNTY_FIPS_NUMBER", "PEOPLE_POSITIVE_CASES_COUNT",
    "PEOPLE_DEATH_COUNT", "REPORT_DATE_ISO", "DATA_SOURCE_NAME")

  val csvSchema: StructType =
    StructType((usedColumns ++ passthroughColumns)
      .map(StructField(_, StringType, nullable = true)))

  val warehouseSchema: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("state", StringType),
    StructField("county", StringType),
    StructField("new_cases", IntegerType),
    StructField("new_deaths", IntegerType)))
}
