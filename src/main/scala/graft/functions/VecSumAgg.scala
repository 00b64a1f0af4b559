package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Elementwise per-dimension SUM + COUNT over an integral-array column
  * in one map-side pass — [[VecMinMaxAgg]]'s companion for the MEAN
  * family (centroid builds): the grouped
  * `posexplode → groupBy(key, dim) → sum/count` chain shuffles
  * corpus×dims narrow rows; this buffer holds the per-dimension sums
  * and counts (two dims-length long arrays) and partials merge by
  * elementwise addition, so a keyed aggregation moves one
  * ~dims·16-byte buffer per (task, key) instead. Exact integer
  * arithmetic end to end — the int8-code centroid builds stay
  * oracle-exact through it.
  *
  * Semantics match the explode form (VecSumAggSpec): each dimension
  * sums over the vectors that HAVE that index, null elements and null
  * arrays are skipped, empty input yields two empty arrays. Output:
  * struct(sums array<long>, counts array<long>).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumAgg.Buf]
    with UnaryLike[Expression] {

  import VecSumAgg._

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral array, got ${t.sql}")
  }

  override def createAggregationBuffer(): Buf =
    new Buf(new Array[Long](0), new Array[Long](0))

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = buf.grow(n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = elemType match {
          case ByteType => arr.getByte(i).toLong
          case ShortType => arr.getShort(i).toLong
          case IntegerType => arr.getInt(i).toLong
          case _ => arr.getLong(i)
        }
        b.sums(i) += x
        b.counts(i) += 1L
      }
      i += 1
    }
    b
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val b = b1.grow(b2.sums.length)
    var i = 0
    while (i < b2.sums.length) {
      b.sums(i) += b2.sums(i)
      b.counts(i) += b2.counts(i)
      i += 1
    }
    b
  }

  override def eval(buf: Buf): Any = {
    // trailing never-populated dims drop, matching the explode form
    var n = buf.sums.length
    while (n > 0 && buf.counts(n - 1) == 0L) n -= 1
    val sums = new Array[Any](n)
    val counts = new Array[Any](n)
    var i = 0
    while (i < n) {
      sums(i) = buf.sums(i); counts(i) = buf.counts(i)
      i += 1
    }
    InternalRow(new GenericArrayData(sums), new GenericArrayData(counts))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val n = buf.sums.length
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) {
      bb.putLong(buf.sums(i)); bb.putLong(buf.counts(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new Buf(new Array[Long](n), new Array[Long](n))
    var i = 0
    while (i < n) {
      b.sums(i) = bb.getLong(); b.counts(i) = bb.getLong()
      i += 1
    }
    b
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType), nullable = false),
    StructField("counts", ArrayType(LongType), nullable = false)))

  override def nullable: Boolean = false

  override def prettyName: String = "vec_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): VecSumAgg = copy(child = newChild)
}

object VecSumAgg {

  /** Growable elementwise state: parallel (sums, counts) arrays. */
  final class Buf(var sums: Array[Long], var counts: Array[Long]) {
    def grow(n: Int): Buf = {
      if (n <= sums.length) return this
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
      this
    }
  }

  /** Column API: `vecSum(v)` over an integral array column →
    * struct(sums, counts) of per-dimension totals. */
  def vecSum(c: Column): Column =
    ColumnBridge.column(
      VecSumAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
