package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact-arithmetic helpers for oracle parity.
  *
  * Summing raw doubles is accumulation-order-dependent, and Spark's
  * partial/final aggregation order differs from DuckDB's — so any
  * `sum(double)` would hash-mismatch in the driver's DuckDB compare.
  * We cast to DECIMAL(18,2) first (exact, order-independent), sum in
  * decimal, and cast the final result back to double (exact for values
  * < 2^53 cents). The oracle SQL does the same cast, so both engines
  * produce bit-identical doubles.
  */
object Exact {
  /** Money/quantity column → exact decimal cents. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a double column, returned as double. */
  def moneySum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact `price * (1 - discount)` in decimal arithmetic. Discounts are
    * 2-decimal values; computing `1.0 - discount` in double and casting
    * the *product* to decimal rounds differently than DuckDB at cent
    * boundaries — casting each factor first makes the multiply exact in
    * both engines. Oracle mirror:
    * `CAST(x AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2)))`.
    */
  def discounted(price: Column, discount: Column): Column =
    dec(price) * (lit(1.0).cast(DecimalType(4, 2)) - discount.cast(DecimalType(4, 2)))
}
