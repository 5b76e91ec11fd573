package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Helpers that make float aggregates bit-identical between Spark and the
  * DuckDB oracle.
  *
  * Summing doubles is order-dependent, and Spark's partial aggregation
  * order differs from DuckDB's scan order, so `SUM(double)` hash-compares
  * unreliably. The corpus money/rate columns are 2-decimal values, so we
  * cast to exact DECIMAL before aggregating (decimal addition is
  * associative — any order gives the same result), then cast the final
  * value back to DOUBLE. Both engines round-trip the same exact decimal to
  * the same double.
  *
  * At 100 TB this costs nothing extra: decimal sums still use partial
  * (map-side) aggregation and whole-stage codegen; only the per-row cast
  * is added.
  */
object Exact {
  /** money / quantity values < 10^7 with 2 decimals */
  val M: DecimalType = DecimalType(9, 2)
  /** 1±discount / 1±tax factors with 2 decimals */
  val F: DecimalType = DecimalType(4, 2)

  def m(c: Column): Column = c.cast(M)
  def f(c: Column): Column = c.cast(F)

  /** order-independent SUM of a 2-decimal double column, as DOUBLE */
  def dsum(c: Column): Column = sum(m(c)).cast(DoubleType)

  /** SQL fragment mirrors (DuckDB side) */
  def sqlM(e: String): String = s"CAST($e AS DECIMAL(9,2))"
  def sqlF(e: String): String = s"CAST($e AS DECIMAL(4,2))"
  def sqlDsum(e: String): String = s"CAST(SUM(${sqlM(e)}) AS DOUBLE)"
}
