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

/** Elementwise per-dimension min/max over an embedding column in ONE
  * map-side pass — the statistics stage of scalar quantization
  * (graft.queries.Pipeline.buildQuantizedVectors) as a mergeable
  * vector-state aggregate, replacing the declarative
  * `posexplode → groupBy(i) → min/max → re-pack` chain. The explode
  * form shuffles corpus×dims narrow rows to key the per-dimension
  * aggregation; this buffer IS the per-dimension state (two
  * dims-length double arrays), partials merge elementwise — so at any
  * corpus size the only thing that moves is one ~2·dims·8-byte buffer
  * per task, the same bounded-partials contract as [[HllAgg]]/[[MgAgg]].
  *
  * Semantics are EXACTLY the explode form's (A/B-asserted in
  * VecMinMaxAggSpec): each dimension aggregates over the vectors that
  * HAVE that index (ragged inputs shrink no one else's range), null
  * elements and null arrays are skipped, float inputs are widened to
  * double before comparison (min/max commute with the widening — both
  * are monotone), and a group with no input yields two empty arrays.
  * Output: struct(mns array<double>, mxs array<double>).
  */
case class VecMinMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMinMaxAgg.Buf]
    with UnaryLike[Expression] {

  import VecMinMaxAgg._

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Buf = new Buf(
    new Array[Double](0), new Array[Double](0), new Array[Boolean](0))

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
          case FloatType => arr.getFloat(i).toDouble
          case _ => arr.getDouble(i)
        }
        if (!b.seen(i)) {
          b.seen(i) = true; b.mns(i) = x; b.mxs(i) = x
        } else {
          if (x < b.mns(i)) b.mns(i) = x
          if (x > b.mxs(i)) b.mxs(i) = x
        }
      }
      i += 1
    }
    b
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val b = b1.grow(b2.mns.length)
    var i = 0
    while (i < b2.mns.length) {
      if (b2.seen(i)) {
        if (!b.seen(i)) {
          b.seen(i) = true; b.mns(i) = b2.mns(i); b.mxs(i) = b2.mxs(i)
        } else {
          if (b2.mns(i) < b.mns(i)) b.mns(i) = b2.mns(i)
          if (b2.mxs(i) > b.mxs(i)) b.mxs(i) = b2.mxs(i)
        }
      }
      i += 1
    }
    b
  }

  override def eval(buf: Buf): Any = {
    // dimensions nobody populated (possible only with ragged nulls at
    // the tail) are dropped from the right, matching the explode form
    // where an index with no values simply has no group
    var n = buf.mns.length
    while (n > 0 && !buf.seen(n - 1)) n -= 1
    val mns = new Array[Any](n)
    val mxs = new Array[Any](n)
    var i = 0
    while (i < n) {
      mns(i) = if (buf.seen(i)) buf.mns(i) else null
      mxs(i) = if (buf.seen(i)) buf.mxs(i) else null
      i += 1
    }
    InternalRow(new GenericArrayData(mns), new GenericArrayData(mxs))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val n = buf.mns.length
    val bb = ByteBuffer.allocate(4 + n * 17)
    bb.putInt(n)
    var i = 0
    while (i < n) {
      bb.put(if (buf.seen(i)) 1.toByte else 0.toByte)
      bb.putDouble(buf.mns(i)); bb.putDouble(buf.mxs(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new Buf(new Array[Double](n), new Array[Double](n),
      new Array[Boolean](n))
    var i = 0
    while (i < n) {
      b.seen(i) = bb.get() == 1
      b.mns(i) = bb.getDouble(); b.mxs(i) = bb.getDouble()
      i += 1
    }
    b
  }

  override def dataType: DataType = StructType(Seq(
    StructField("mns", ArrayType(DoubleType), nullable = false),
    StructField("mxs", ArrayType(DoubleType), nullable = false)))

  override def nullable: Boolean = false

  override def prettyName: String = "vec_minmax"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMinMaxAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecMinMaxAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): VecMinMaxAgg = copy(child = newChild)
}

object VecMinMaxAgg {

  /** Growable elementwise state: parallel (mns, mxs, seen) arrays. */
  final class Buf(var mns: Array[Double], var mxs: Array[Double],
      var seen: Array[Boolean]) {
    def grow(n: Int): Buf = {
      if (n <= mns.length) return this
      val m2 = java.util.Arrays.copyOf(mns, n)
      val x2 = java.util.Arrays.copyOf(mxs, n)
      val s2 = java.util.Arrays.copyOf(seen, n)
      mns = m2; mxs = x2; seen = s2
      this
    }
  }

  /** Column API: `vecMinMax(v)` over an `array<float>`/`array<double>`
    * column → struct(mns, mxs) of per-dimension extrema. */
  def vecMinMax(c: Column): Column =
    ColumnBridge.column(
      VecMinMaxAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
