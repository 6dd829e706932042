package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-stable numeric aggregation.
  *
  * Why this exists: double addition is not associative, so `SUM(double)`
  * differs in low bits between engines (and between partition orders —
  * also a nondeterminism hazard at cluster scale). All money-ish testdata
  * columns are 2-decimal by construction, so we cast to DECIMAL before
  * aggregating: decimal arithmetic is exact, hence order-insensitive and
  * bit-identical to the DuckDB oracle. The final cast back to double is
  * a single correctly-rounded conversion, identical in both engines.
  *
  * This mirrors how a production pipeline at 100 TB should aggregate money
  * anyway: exact decimal, never float.
  */
object Num {
  /** 2-decimal money/ratio cast. Precision 12 keeps Spark's and DuckDB's
    * decimal-multiply precision rules inside 38 digits for up to a triple
    * product. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Literal 1 as a small decimal so `1 - x` stays in exact decimal. */
  val oneDec: Column = lit(1).cast(DecimalType(3, 2))

  /** Exact SUM of a 2-decimal double column, returned as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact-sum average as double: CAST(SUM(dec) AS DOUBLE) / COUNT(*). */
  def avgMoney(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(lit(1))
}
