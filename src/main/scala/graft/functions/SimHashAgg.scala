package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash aggregate: folds a group's 60-bit feature hashes into
  * one 32-bit fingerprint with a 32-counter buffer — the custom
  * `TypedImperativeAggregate` replacement for the declarative form's
  * features×32 explode + two keyed shuffles
  * (`explode(sequence(0,31))` → `groupBy(doc, j)` → `groupBy(doc)`).
  * Update is 32 integer adds on one row (no row multiplication at all),
  * partials merge by vector addition — map-side combine applies like
  * any aggregate — and eval packs the counter signs into the
  * fingerprint. Semantics are bit-identical to the explode form (and so
  * to the DuckDB oracle): vote = ±1 per bit per input ROW — the
  * aggregate itself has multiset semantics, and per-DISTINCT-feature
  * voting is the CALLER's responsibility (`Pipeline.simhashFeatures`
  * dropDuplicates upstream; any other caller of the SQL-registered
  * `simhash_agg` must dedup likewise if it wants set semantics). Tie
  * (counter 0) sets the bit, and a group with NO non-null input packs
  * to 0 (the explode form's NULL votes fall through its CASE to 0) —
  * the buffer's 33rd slot counts inputs to tell that apart from a
  * genuine all-ties group.
  *
  * The reference's aggregates are all scalar fold-style
  * (/root/reference/src/qp/operators/Aggregate.java analogue per
  * SURVEY §2.6); a vector-state aggregate is the Catalyst-idiomatic
  * extension point for sketches that a sort-based engine has no slot
  * for.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val Bits = 32

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.sql}")

  // slots 0-31: bit counters; slot 32: non-null input count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Long]
      var j = 0
      while (j < Bits) {
        buf(j) += 2L * ((hv >>> j) & 1L) - 1L
        j += 1
      }
      buf(Bits) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j <= Bits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(Bits) == 0L) return 0L
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (buf(j) >= 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((Bits + 1) * 8)
    var j = 0
    while (j <= Bits) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Bits + 1)
    var j = 0
    while (j <= Bits) { buf(j) = bb.getLong(); j += 1 }
    buf
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def prettyName: String = "simhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

object SimHashAgg {
  /** Column API: `simhashAgg(hv)` — 64-bit feature hashes in (low 32
    * bits voted on), packed 32-bit fingerprint out. */
  def simhashAgg(c: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
