package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The IVF coarse-assign argmax as ONE native expression: pick the
  * broadcast codebook centroid with the best cosine to the probe,
  * under EXACTLY the batch `ivfAssigned` window order — csim DESC
  * NULLS LAST, cent_id ASC — including the degenerate edges the
  * streaming fold pinned (a NULL csim, from a zero-norm/NaN side, a
  * NULL centroid, or a PER-ROW dimension mismatch, wins only against
  * nothing or another NULL, by smaller cent_id; a fully-degenerate
  * probe therefore lands in the smallest cell, not nowhere). Returns
  * the cell id, or NULL only for an empty codebook.
  *
  * The payload is a RAGGED matrix (per-row offsets and dims), because
  * the replaced fold's dim rule was per centroid — `vdot` is NULL on
  * a length mismatch — so a codebook that degrades to mixed dims must
  * keep every row scorable against probes of ITS dim, and a NULL or
  * null-element centroid simply never wins (NativeScanSpec pins both
  * against the driver reference).
  *
  * Native for the [[SemanticScan]] reasons: the previous
  * crossJoin(broadcast(one-row-codebook-array)) memcpied the whole
  * codebook into every probe row and interpreted the argmax lambda
  * per centroid; here the codebook ships once per executor and the
  * argmax is one compiled loop. */
case class CentroidArgmax(left: Expression, right: Expression,
    bc: Broadcast[CentroidArgmax.Codebook])
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, double), got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "centroid_argmax"

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def eval(input: InternalRow): Any = {
    val idx = bc.value
    if (idx.ids.isEmpty) return null
    val vAny = left.eval(input)
    val nrmAny = right.eval(input)
    // a degenerate probe (NULL vector/norm or a null element) makes
    // EVERY csim NULL — the fold's NULL-pair clause elects the
    // smallest cent_id (ids are sorted ascending)
    if (vAny == null || nrmAny == null) return idx.ids(0)
    val va = vAny.asInstanceOf[ArrayData]
    val n = va.numElements()
    var k = 0
    var nullElem = false
    while (k < n && !nullElem) { nullElem = va.isNullAt(k); k += 1 }
    if (nullElem) return idx.ids(0)
    val pnrm = nrmAny.asInstanceOf[Double]
    val vf = va.toFloatArray()
    var has = false
    var bid = 0L
    var bNull = true
    var bsim = 0.0
    var i = 0
    while (i < idx.ids.length) {
      // per-row dim rule: vdot is NULL on a length mismatch
      val simNullDim = idx.dims(i) != n
      var dot = 0.0
      if (!simNullDim) {
        val off = idx.offs(i)
        var j = 0
        while (j < n) {
          dot += vf(j).toDouble * idx.flat(off + j).toDouble
          j += 1
        }
      }
      val den = pnrm * idx.nrms(i)
      val q = dot / den
      // the finite check covers Inf operands (Inf-poisoned embeddings)
      // and finite/subnormal overflow: a non-finite q would make
      // round6's BigDecimal.valueOf THROW; treat it as the csim-NULL
      // degenerate it is (same election rule as NaN/zero-norm rows)
      val simNull = simNullDim || den == 0.0 || dot.isNaN || den.isNaN ||
        !java.lang.Double.isFinite(q)
      val sim = if (simNull) 0.0 else round6(q)
      val id = idx.ids(i)
      val better = !has ||
        (!simNull && (bNull || sim > bsim || (sim == bsim && id < bid))) ||
        (simNull && bNull && id < bid)
      if (better) { has = true; bid = id; bNull = simNull; bsim = sim }
      i += 1
    }
    bid
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CentroidArgmax {
  /** Ragged codebook: ids sorted ascending; per-row (offset, dim)
    * into the concatenated float data; norms with NaN marking a NULL
    * norm; a NULL centroid stores dim −1 (matches no probe). */
  case class Codebook(ids: Array[Long], nrms: Array[Double],
      flat: Array[Float], offs: Array[Int], dims: Array[Int])
    extends Serializable

  /** Build a [[Codebook]] from (cent_id, cvOrNull, nrmOrNaN) rows
    * sorted by cent_id; null ELEMENTS store as NaN (dot → NaN → csim
    * NULL — the null-intolerant vdot's outcome). */
  def codebook(rows: Seq[(Long, Option[Seq[java.lang.Float]], Double)])
      : Codebook = {
    val ids = rows.map(_._1).toArray
    val nrms = rows.map(_._3).toArray
    val dims = rows.map(_._2.map(_.length).getOrElse(-1)).toArray
    val offs = new Array[Int](rows.length)
    var off = 0
    var i = 0
    val flat = Array.newBuilder[Float]
    while (i < rows.length) {
      offs(i) = off
      rows(i)._2.foreach { v =>
        v.foreach(f =>
          flat += (if (f == null) Float.NaN else f.floatValue()))
        off += v.length
      }
      i += 1
    }
    Codebook(ids, nrms, flat.result(), offs, dims)
  }

  /** Column API: assign `v` (with its precomputed norm) to its best
    * codebook cell. */
  def centroidArgmax(s: SparkSession, v: Column, nrm: Column,
      idx: Codebook): Column =
    ColumnBridge.column(CentroidArgmax(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm),
      s.sparkContext.broadcast(idx)))
}
