package graft.covid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's transform stage (dags/ETL.py:91-107) as one
  * declarative projection — P1 project/rename, P2 clean, P3 int
  * coercion with default, P4 malformed-row drop. Runs as a map-only
  * stage inside whole-stage codegen; no shuffle.
  *
  * Edge semantics pinned in TransformSpec (SURVEY.md §7.3):
  *  - `int(rec.get(k, 0))` triad: key missing/null → 0; `"12"` → 12;
  *    present-but-unparseable (`""`, `"abc"`, `"12.5"`) → whole row
  *    dropped (the reference's try/except-continue, dags/ETL.py:103-105).
  *    Under Spark 4's default ANSI mode a plain cast throws like
  *    Python's int(); `try_cast` yields null instead, so the triad
  *    splits into `when(isNull, 0)` + a not-null filter on the cast.
  *  - String cleaning: engine mode is `initcap(trim(x))`; Python
  *    `str.title()` differs on apostrophes/digits ("o'brien" →
  *    "O'Brien" vs initcap "O'brien"). `pythonTitleParity = true`
  *    switches to a UDF reproducing Python exactly (dags/ETL.py:98-99)
  *    — off the codegen path, so reserved for strict-parity runs.
  *  - Date must parse as yyyy-MM-dd or the row is dropped (Postgres
  *    would have rejected it on INSERT, dags/ETL.py:136-139).
  */
object Transform {
  /** Python str.title(): a cased char is uppercased iff the previous
    * char is not a letter; all other letters lowercased.
    */
  private[covid] def pythonTitle(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevLetter = false
    s.foreach { c =>
      sb.append(if (c.isLetter && !prevLetter) c.toUpper else c.toLower)
      prevLetter = c.isLetter
    }
    sb.toString
  }

  private val pythonTitleUdf = udf((s: String) =>
    if (s == null) null else pythonTitle(s))

  def apply(raw: DataFrame, pythonTitleParity: Boolean = false): DataFrame = {
    def clean(c: Column): Column =
      if (pythonTitleParity) pythonTitleUdf(trim(c)) else initcap(trim(c))
    // Spark 4 runs ANSI mode by default (plain cast THROWS on malformed
    // input, like Python's int()); try_cast restores null-on-error so
    // the triad's drop path stays declarative.
    def intOrDefault(name: String): Column =
      when(col(name).isNull, lit(0)).otherwise(expr(s"try_cast($name AS INT)"))

    raw.select(
        expr("try_cast(trim(REPORT_DATE) AS DATE)").as("date"),
        clean(col("PROVINCE_STATE_NAME")).as("state"),
        clean(col("COUNTY_NAME")).as("county"),
        intOrDefault("PEOPLE_POSITIVE_NEW_CASES_COUNT").as("new_cases"),
        intOrDefault("PEOPLE_DEATH_NEW_COUNT").as("new_deaths"))
      .where(col("date").isNotNull &&
        col("new_cases").isNotNull && col("new_deaths").isNotNull)
  }
}
