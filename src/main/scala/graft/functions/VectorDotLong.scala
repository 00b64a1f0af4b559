package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native dot product of two long-array vectors — the integer twin of
  * [[VectorDot]], for the QUANTIZED similarity path (p42): int8 codes are
  * carried as long arrays, and the candidate scan ranks by this integer
  * score, so the wide phase of a quantized ANN query runs a tight
  * primitive loop inside whole-stage codegen with no floating point and
  * no lambda dispatch. Semantics match the interpreted
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` form exactly: products and
  * the accumulator are 64-bit, mismatched lengths and null elements
  * return null (zip_with null-pads the shorter array). Overflow is the
  * caller's contract, as with any BIGINT SQL arithmetic: int8 codes
  * cap each product at 2^14, so a vector would need 2^49 dimensions to
  * overflow.
  */
case class VectorDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "vector_dot_long"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var k = 0
    while (k < n) {
      if (x.isNullAt(k) || y.isNullAt(k)) return null
      acc += x.getLong(k) * y.getLong(k)
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
         |  if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getLong($k) * $b.getLong($k);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDotLong {
  /** Column API: `vdotl(qa, qb)` — long arrays in, long out. */
  def vdotl(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDotLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
