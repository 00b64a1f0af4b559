package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Membership probe against a SORTED long array by binary search —
  * O(log n) per probe where `array_contains` scans O(n).
  *
  * The hot consumer is the streaming verbatim-leak scanner
  * ([[graft.streaming.Streams.substringContamMatches]]): every token
  * position of every arriving document probes the broadcast eval-slice
  * shingle-hash set, so a 200-token doc against a 10⁵-gram eval suite
  * pays 2·10⁷ comparisons linearly but only ~3·10³ with the search —
  * the difference between "benchmark-sized eval sets only" and an
  * actual deployment posture. Catalyst has no binary-search primitive
  * and a higher-order-function emulation would interpret per element,
  * so this is one of the places a native expression genuinely earns
  * its keep (the [[VectorDot]] rule).
  *
  * CONTRACT: the array must be sorted ascending with no nulls — the
  * producer is always `array_sort(collect_list(...))` over non-null
  * hashes, built once on the static side. Semantics match
  * `array_contains(arr, key)` exactly on such input
  * (SortedContainsSpec pins the equivalence property); null array or
  * null key yield null like any null-intolerant binary expression. */
case class SortedContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "sorted_contains"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val key = b.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = arr.getLong(mid)
      if (v == key) return true
      else if (v < key) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val v = ctx.freshName("v")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements() - 1;
         |${ev.value} = false;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  long $v = $a.getLong($mid);
         |  if ($v == $b) { ${ev.value} = true; break; }
         |  else if ($v < $b) { $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedContains {
  /** Column API: `sortedContains(sortedArr, key)`. */
  def sortedContains(arr: Column, key: Column): Column =
    ColumnBridge.column(SortedContains(
      ColumnBridge.expression(arr), ColumnBridge.expression(key)))
}
