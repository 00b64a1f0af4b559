package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[Hash60]], shared by the interpreted and generated
  * paths. One MessageDigest per thread — `getInstance` per row would
  * pay a provider lookup on the hottest scalar in the pipeline family. */
object Hash60Impl {
  private val tl = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes): bytes 0-7 big-endian, low nibble
    * dropped — exactly `conv(substring(md5hex, 1, 15), 16, 10)`. */
  def h60(bytes: Array[Byte]): Long = {
    val md = tl.get()
    md.reset()
    val dg = md.digest(bytes)
    val v = ((dg(0) & 0xFFL) << 56) | ((dg(1) & 0xFFL) << 48) |
      ((dg(2) & 0xFFL) << 40) | ((dg(3) & 0xFFL) << 32) |
      ((dg(4) & 0xFFL) << 24) | ((dg(5) & 0xFFL) << 16) |
      ((dg(6) & 0xFFL) << 8) | (dg(7) & 0xFFL)
    v >>> 4
  }
}

/** Native 60-bit portable hash — `conv(substring(md5(s), 1, 15), 16, 10)`
  * without the 32-char hex string materialization and base-16 re-parse
  * per row. This is the single hottest scalar in the pipeline family
  * (every shingle/span/gram row in p02/p03/p12/p37/p38/p52... flows
  * through it), so it goes digest → bits directly; the value is
  * bit-identical to the string form, which remains the DuckDB oracle
  * twin (`Portable.sqlH60`).
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Impl.h60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hash60Impl.h60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  def h60native(c: Column): Column =
    ColumnBridge.column(Hash60(ColumnBridge.expression(c)))
}
