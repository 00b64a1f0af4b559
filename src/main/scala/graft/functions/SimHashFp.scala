package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared input checking for the one-pass shingle-scan scalar family
  * ([[SimHashFp]], [[ShingleIdSet]]): string text + foldable positive
  * integer width. */
private[functions] trait ShingleScanExpr { self: Expression =>
  def child: Expression
  def w: Expression

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string first argument, got ${child.dataType.sql}")
    else if (w.dataType != IntegerType || !w.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integer width, got ${w.sql}")
    else {
      val v = w.eval()
      if (v == null || v.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName width must be >= 1, got $v")
      else TypeCheckResult.TypeCheckSuccess
    }

  protected lazy val width: Int = w.eval().asInstanceOf[Int]
}

/** Native one-pass SimHash document fingerprint (32-bit, in a bigint):
  * per-DISTINCT w-shingle feature, vote ±1 on each of the low 32 bits of
  * the feature's 60-bit id ([[Hash60]] semantics); bit j of the
  * fingerprint is set iff its counter is ≥ 0 (tie sets the bit — the
  * [[SimHashAgg]] rule). NULL for docs with fewer than w tokens, which
  * the declarative form drops from its groupBy — callers filter.
  *
  * Value-identical (SimHashFpSpec) to the three-stage pipeline it
  * replaces — shingle explode → h60 → dropDuplicates(doc, hv) →
  * SimHashAgg groupBy — whose distinct + aggregate shuffles this
  * deletes: the fingerprint build becomes a map-only projection,
  * embarrassingly parallel over input splits at corpus scale. The
  * explode form remains the DuckDB oracle twin and the A/B baseline
  * (Pipeline.simhashFpExplode).
  */
case class SimHashFp(child: Expression, w: Expression)
  extends Expression with CodegenFallback with ShingleScanExpr {

  override def children: Seq[Expression] = Seq(child, w)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "simhash_fp"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val ids = MinHashSigImpl.shingleIdSet(
      v.asInstanceOf[UTF8String].getBytes, width)
    if (ids == null) return null
    val counters = new Array[Long](32)
    var i = 0
    while (i < ids.length) {
      val hv = ids(i)
      var j = 0
      while (j < 32) {
        counters(j) += 2L * ((hv >>> j) & 1L) - 1L
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (counters(j) >= 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashFp =
    copy(child = newChildren(0), w = newChildren(1))
}

object SimHashFp {
  /** `simhashFp(col("text"), 3)` — NULL for docs with < w tokens. */
  def simhashFp(text: Column, w: Int): Column =
    ColumnBridge.column(SimHashFp(ColumnBridge.expression(text), Literal(w)))
}

/** Native sorted-distinct w-shingle id set (`array<bigint>` of [[Hash60]]
  * values) — the map-only replacement for explode → h60 →
  * dropDuplicates → collect_set wherever an operator needs a document's
  * feature SET (containment dedup's set table, probe lists). Sorted
  * ascending, so `slice(st, 1, k)` IS the k smallest ids — no
  * `array_sort` needed downstream. NULL for docs with fewer than w
  * tokens; callers filter, matching the explode form where such docs
  * emit no rows.
  */
case class ShingleIdSet(child: Expression, w: Expression)
  extends Expression with CodegenFallback with ShingleScanExpr {

  override def children: Seq[Expression] = Seq(child, w)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "shingle_id_set"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val ids = MinHashSigImpl.shingleIdSet(
      v.asInstanceOf[UTF8String].getBytes, width)
    if (ids == null) null else new GenericArrayData(ids)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleIdSet =
    copy(child = newChildren(0), w = newChildren(1))
}

object ShingleIdSet {
  /** `shingleIdSet(col("text"), 3)` — NULL for docs with < w tokens. */
  def shingleIdSet(text: Column, w: Int): Column =
    ColumnBridge.column(ShingleIdSet(ColumnBridge.expression(text), Literal(w)))
}
