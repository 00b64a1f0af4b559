package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Reusable HyperLogLog distinct-count aggregate (m = 256 registers)
  * over 60-bit portable hashes — the grouped generalization of p40's
  * declarative register build (graft.queries.Pipeline, gate key
  * p40_hll_distinct): `GROUP BY lang, source` gets one 256-byte-scale
  * sketch per group in a single keyed shuffle, where the declarative
  * form would need a (group, bucket) aggregation plus a second keyed
  * pass. Buffers are vectors of register maxima, so partials merge by
  * elementwise MAX — associative, commutative, map-side combinable —
  * the same contract as any built-in aggregate.
  *
  * Semantics are BIT-IDENTICAL to p40 (property-tested against it):
  * bucket = low 8 hash bits, rho = trailing-zero rank of the remaining
  * 52 bits (w = 0 → 53), harmonic sum kept as the exact integer
  * Σ 2^(53 − M_j) so no floating-point summation order can perturb the
  * estimate; the only double math is one division (and the standard
  * linear-counting branch below 2.5m, decided from the same integers),
  * then one HALF_UP rounding to 4 decimals exactly like Spark's
  * `round`. Input hashes come from [[Hash60]] / Portable.h60, so a SQL
  * oracle twin reproduces the registers — and the estimate — bit for
  * bit. A group with no input evaluates to 0.0 (all 256 registers
  * empty → linear counting of v = m).
  *
  * The reference engine has no sketches at all; its aggregate surface
  * is the five scalar folds of SURVEY §2.6 — a mergeable vector-state
  * aggregate is the Catalyst-idiomatic extension point for
  * bounded-state distinct counting at 100 TB (the register table for
  * ANY corpus size is 256 longs per group).
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllAgg._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument (a 60-bit portable hash), " +
        s"got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Long]
      val bucket = (hv & (M - 1)).toInt
      val w = hv >>> P
      val rho =
        if (w == 0L) RhoMax else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    // exact integer harmonic sum: empty register (mj=0) contributes 2^53
    var sInt = 0L
    var empty = 0L
    var i = 0
    while (i < M) {
      val mj = buf(i)
      if (mj == 0) empty += 1L
      sInt += 1L << (RhoMax - mj)
      i += 1
    }
    val raw = RawNum / sInt.toDouble
    val est =
      if (raw <= 2.5 * M && empty > 0) M.toDouble * math.log(M.toDouble / empty)
      else raw
    // 4-decimal HALF_UP, identical to Spark round(est, 4) / DuckDB round
    new JBigDecimal(java.lang.Double.toString(est))
      .setScale(4, RoundingMode.HALF_UP).doubleValue()
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = false

  override def prettyName: String = "hll_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}

object HllAgg {
  // identical to Pipeline's p40 constants (both derive from M = 256)
  private[graft] val M = 256
  private[graft] val P = Integer.numberOfTrailingZeros(M)
  private[graft] val RhoMax = 61 - P
  private[graft] val RawNum: Double =
    0.7213 / (1.0 + 1.079 / M) * (M.toDouble * M) * (1L << RhoMax).toDouble

  /** Column API: `hllAgg(hv)` — 60-bit portable hashes in, 4-decimal
    * distinct-count estimate out. */
  def hllAgg(c: Column): Column =
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
