package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch: a bounded-state (≤ k counters)
  * aggregate returning the CANDIDATE set of frequent items — every item
  * whose true frequency exceeds n/(k+1) of the n processed rows is
  * guaranteed present, and at most k items are ever held per task, no
  * matter the corpus size. The vocabulary never shuffles: partials carry
  * ≤ k (token, count) entries each, merged with the Agarwal et al.
  * "Mergeable Summaries" rule (pointwise sum, subtract the (k+1)-th
  * largest count, drop non-positives), which preserves the n/(k+1) error
  * bound — associative, commutative, map-side combinable like any
  * built-in aggregate.
  *
  * The candidate CONTENTS below the guarantee threshold depend on
  * partition order (inherent to the sketch), so a deterministic gate
  * uses the two-phase shape (gate key p70_heavy_hitters): sketch →
  * broadcast candidates → exact recount of candidates only → threshold
  * filter. Items above the threshold are structurally guaranteed into
  * the candidate set, so the FILTERED output equals the exact heavy-
  * hitter set on any partitioning.
  *
  * The reference engine's aggregate surface is five scalar folds
  * (ref:src/qp/utils/Attribute.java:113-121); a bounded-state frequency
  * sketch is the Catalyst-idiomatic extension for finding hot tokens /
  * boilerplate / spam n-grams in a 100 TB corpus without a
  * full-vocabulary shuffle.
  */
case class MgAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_sketch requires a string column, got ${child.dataType.sql}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"mg_sketch requires k >= 1 counters, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1L)
        case None if buf.size < k =>
          // clone: the incoming UTF8String may alias a reused row buffer
          buf.update(t.clone(), 1L)
        case None =>
          // classic MG step: a full sketch and a new item decrement ALL
          // counters (amortized O(1) — each k-wide decrement is paid for
          // by k prior increments)
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      // mergeable-summaries compaction: subtract the (k+1)-th largest
      // count from every counter; at most k stay positive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      buf.mapValuesInPlace((_, c) => c - sub)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val toks = buf.keys.toArray
    java.util.Arrays.sort(toks, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(toks.asInstanceOf[Array[Any]])
  }

  override def serialize(
      buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "mg_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MgAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MgAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MgAgg =
    copy(child = newChild)
}

object MgAgg {
  /** Column API: `mgAgg(token, k)` — candidate heavy tokens out, as a
    * sorted array<string>; guaranteed to contain every token with
    * frequency > n/(k+1). */
  def mgAgg(c: Column, k: Int): Column =
    ColumnBridge.column(
      MgAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
