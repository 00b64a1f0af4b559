package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two float-array embeddings, accumulated in
  * double left-to-right.
  *
  * This is the one hot loop in the ANN/similarity operators where Spark's
  * built-ins genuinely fall short: `aggregate(zip_with(a, b, _*_), ...)`
  * expresses the same math, but higher-order array functions are
  * interpreted per element (lambda dispatch + boxing), while this
  * expression compiles to a tight primitive `for` loop inside whole-stage
  * codegen. Semantics match the interpreted form and the DuckDB oracle
  * exactly: each float is widened to double, products are summed in array
  * order, so results are bit-identical. Mismatched lengths return null,
  * exactly like the interpreted form (`zip_with` null-pads the shorter
  * array and the null product nulls the fold).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  // A null ELEMENT nulls the whole result, matching the interpreted
  // aggregate(zip_with(...)) form and DuckDB's list arithmetic.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var k = 0
    while (k < n) {
      if (x.isNullAt(k) || y.isNullAt(k)) return null
      acc += x.getFloat(k).toDouble * y.getFloat(k).toDouble
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
         |double $acc = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
         |  if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.getFloat($k) * (double) $b.getFloat($k);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column API: `vdot(embA, embB)` — float arrays in, double out. */
  def vdot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** NULL-safe round-6 cosine from a dot product and a norm product —
    * the ONE house spelling of `round(num/den, 6)` for similarity
    * ranking. A zero denominator (a zero-norm vector on either side)
    * yields NULL instead of an ANSI DIVIDE_BY_ZERO crash; NULL is
    * exactly what DuckDB's `/` returns for x/0.0, and both engines
    * rank NULL LAST under the house (sim DESC, id ASC) order, so a
    * zero-norm vector sorts behind every real similarity on both
    * engines alike. RrfPropertySpec pins the behavior on generated
    * zero-norm corpora; the `when` branch evaluates lazily, so the
    * division itself never executes on the zero row.
    *
    * A NaN INPUT (a poisoned embedding propagates NaN through the dot
    * or the norm) also maps to NULL — never NaN out. Without this,
    * the degenerate-similarity convention forked by path: batch
    * windows rank NaN FIRST (Spark's NaN-greatest double ordering)
    * while the streaming fold's NULL sentinel ranks LAST, breaking
    * the documented batch/stream row identity on NaN-poisoned
    * vectors. With it, every degenerate cosine — zero-norm OR
    * NaN-poisoned — is NULL on both paths and ranks last everywhere
    * (Round12OpsSpec pins the identity on a NaN-poisoned corpus).
    *
    * Adjudicated scope of the NaN branch: it is an ENGINE-side
    * robustness convention. The DuckDB oracle fragments keep native
    * `round(NaN) = NaN`, so op-vs-oracle identity is defined over
    * FINITE inputs — which is the oracle's entire input domain (the
    * driver's parquet embeddings are finite by construction; the
    * zero-norm case, which the gate CAN exercise, agrees exactly:
    * both engines yield NULL for x/0.0). NaN behavior is pinned by
    * the engine's own specs instead of the cross-engine gate. */
  def cos6(num: Column, den: Column): Column = {
    import org.apache.spark.sql.functions.{isnan, lit, round, when}
    round(when(den =!= lit(0.0) && !isnan(num) && !isnan(den),
      num / den), 6)
  }
}
