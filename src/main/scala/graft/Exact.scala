package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType}

/** Cross-engine-exact aggregation helpers.
  *
  * Summing doubles is order-dependent, so a distributed Spark sum and a
  * single-threaded DuckDB oracle sum can differ in the last ULPs and fail a
  * hash compare. We route money/quantity arithmetic through exact decimals
  * (inputs in the test data carry <=2 fractional digits) and cast the final
  * result back to double, which is deterministic on both engines regardless
  * of partitioning or evaluation order. This also mirrors what a production
  * engine does at 100 TB: exact decimal partial aggregates are
  * shuffle-order-insensitive, so map-side combine stays safe.
  *
  * The SQL-side twin of `dsum(c)` is
  * `CAST(SUM(CAST(c AS DECIMAL(12,2))) AS DOUBLE)`.
  */
object Exact {
  val D: DecimalType = DecimalType(12, 2)

  def dec(c: Column): Column = c.cast(D)

  /** Order-insensitive sum of a <=2-fractional-digit double column. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-insensitive average (double division of exact sum by count). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Reference output-type contract: AVG projects to REAL (float).
    * See /root/reference/src/qp/utils/Attribute.java:113-121. */
  def ravg(c: Column): Column = davg(c).cast(FloatType)

  /** Reference output-type contract: COUNT projects to INT. */
  def icount(c: Column): Column = count(c).cast(IntegerType)

  /** Exact revenue term: price * (1 - discount) in decimal arithmetic. */
  def revenue(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(D) - dec(discount))

  /** SQL twins for the oracle side (DuckDB). */
  def sqlDec(c: String): String = s"CAST($c AS DECIMAL(12,2))"
  def sqlDsum(c: String): String = s"CAST(SUM(${sqlDec(c)}) AS DOUBLE)"
  def sqlDavg(c: String): String = s"(${sqlDsum(c)} / COUNT($c))"
  def sqlRavg(c: String): String = s"CAST(${sqlDavg(c)} AS REAL)"
  def sqlRevenue(price: String, discount: String): String =
    s"(${sqlDec(price)} * (CAST(1 AS DECIMAL(12,2)) - ${sqlDec(discount)}))"
}
