package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Native dot product of two integral-array vectors — the integer twin
  * of [[VectorDot]], for the QUANTIZED similarity path (p42): int8 codes
  * are carried as `array<tinyint>` (1 byte per element in Tungsten rows
  * and in the persisted index — the 8× storage claim of scalar
  * quantization made literal), and the candidate scan ranks by this
  * integer score, so the wide phase of a quantized ANN query runs a
  * tight primitive loop inside whole-stage codegen with no floating
  * point and no lambda dispatch. Each side may independently be any
  * integral element type (tinyint/smallint/int/bigint) — the k-means
  * path dots int8 codes against bigint centroid means — with every
  * product and the accumulator in 64-bit. Semantics match the
  * interpreted `aggregate(zip_with(a, b, _*_), 0L, _+_)` form exactly:
  * mismatched lengths and null elements return null (zip_with null-pads
  * the shorter array). Overflow is the caller's contract, as with any
  * BIGINT SQL arithmetic: int8 codes cap each product at 2^14, so a
  * vector would need 2^49 dimensions to overflow.
  */
case class VectorDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(e @ (ByteType | ShortType | IntegerType | LongType), _) =>
      Some(e)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two integral-element array arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "vector_dot_long"

  override def nullable: Boolean = true

  private lazy val leftElem = elemType(left.dataType).get
  private lazy val rightElem = elemType(right.dataType).get

  private def getLong(x: ArrayData, et: DataType, k: Int): Long = et match {
    case ByteType    => x.getByte(k).toLong
    case ShortType   => x.getShort(k).toLong
    case IntegerType => x.getInt(k).toLong
    case _           => x.getLong(k)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var k = 0
    while (k < n) {
      if (x.isNullAt(k) || y.isNullAt(k)) return null
      acc += getLong(x, leftElem, k) * getLong(y, rightElem, k)
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      // CodeGenerator.getValue emits the element-type-specific primitive
      // accessor (getByte/getShort/getInt/getLong); the (long) widening
      // keeps every product and the accumulator 64-bit
      val av = CodeGenerator.getValue(a, leftElem, k)
      val bv = CodeGenerator.getValue(b, rightElem, k)
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
         |  if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; break; }
         |  $acc += (long) $av * (long) $bv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDotLong {
  /** Column API: `vdotl(qa, qb)` — integral arrays in, long out. */
  def vdotl(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDotLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
