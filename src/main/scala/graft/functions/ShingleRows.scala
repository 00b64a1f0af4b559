package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native w-shingle generator — the UDTF-category Catalyst extension:
  * one output row per w-word window of a space-tokenized string, built
  * as a `Generator` so the tokenize + slide + join pipeline is ONE pass
  * over the input bytes with zero intermediate materialization.
  *
  * The declarative forms pay for structure this operator never builds:
  * `Portable.shingles` materializes a token ARRAY, a position array and
  * a shingle array per row; the `explode(sequence)` + `element_at` form
  * (Pipeline.shingleRowsOf) materializes the token array and re-executes
  * a w-way `concat_ws` per output row. Here each input row is scanned
  * once for separator positions and every emitted shingle is a zero-copy
  * `UTF8String.fromBytes` slice of the input's byte array — valid
  * because tokens are the segments between single 0x20 bytes (0x20 is
  * never a UTF-8 continuation byte), so the w tokens re-joined with " "
  * are EXACTLY the input bytes from the start of token i to the end of
  * token i+w-1. Semantics are bit-identical to
  * `explode(transform(sequence(...), i -> concat_ws(" ", slice(t,i,w))))`
  * over `split(text, " ")` (empty segments between consecutive spaces
  * included), property-tested in ShingleRowsSpec.
  *
  * Registered as SQL table function `shingle_rows(text, w)` (usable in
  * `LATERAL VIEW`) via [[GraftExtensions]]. Like every custom Generator
  * it plans through interpreted GenerateExec — Spark codegens only its
  * built-in collection generators — so adoption on a hot path is decided
  * by measurement (PLANS.md), not assumed.
  *
  * Reference context: shingling backs the near-dedup family (SURVEY §2
  * pipeline ops); the reference engine has no row-generating operator at
  * all (closest is Project, /root/reference/src/qp/operators/Project.java).
  */
case class ShingleRows(child: Expression, w: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, w)

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

  private lazy val width: Int = w.eval().asInstanceOf[Int]

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def prettyName: String = "shingle_rows"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // Separator positions; tokens are the nSep+1 segments between them
    // (split-with-limit−1 semantics: leading/trailing/empty segments kept).
    var nSep = 0
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nSep += 1; i += 1 }
    val numTokens = nSep + 1
    if (numTokens < width) return Iterator.empty
    val seps = new Array[Int](nSep)
    var j = 0
    i = 0
    while (i < n) { if (bytes(i) == 0x20) { seps(j) = i; j += 1 }; i += 1 }
    val wl = width
    new Iterator[InternalRow] {
      private var t = 0
      private val last = numTokens - wl
      override def hasNext: Boolean = t <= last
      override def next(): InternalRow = {
        val st = if (t == 0) 0 else seps(t - 1) + 1
        val lastTok = t + wl - 1
        val en = if (lastTok == numTokens - 1) n else seps(lastTok)
        t += 1
        new GenericInternalRow(
          Array[Any](UTF8String.fromBytes(bytes, st, en - st)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleRows =
    copy(child = newChildren(0), w = newChildren(1))
}

object ShingleRows {
  /** Generator column: `df.select(col("doc_id"), shingleRows(col("text"), 3))`
    * yields one `shingle` row per window. */
  def shingleRows(text: Column, w: Int): Column =
    ColumnBridge.column(ShingleRows(ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(w)))
}
