package graft.functions

import java.security.MessageDigest
import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[MinHashSig]] — the whole p02 sketch for one document in
  * ONE pass over the text bytes, with no intermediate rows or strings.
  *
  * Semantics are bit-identical to the declarative pipeline it replaces
  * (explode w-shingle rows → md5 hex → `conv` the 60/40-bit halves →
  * groupBy doc with 12 `min(hashFam_i)` + `collect_set(h1)`), which
  * remains the DuckDB oracle twin and the equivalence-spec baseline
  * (MinHashSigSpec):
  *
  *   - tokens are `split(text, " ")` segments (empty segments between
  *     consecutive separators included — same byte-scan tokenization as
  *     [[ShingleRows]], property-tested there);
  *   - each w-window's joined-by-" " shingle string is EXACTLY the input
  *     bytes from the start of token i to the end of token i+w−1, so the
  *     digest runs over a byte RANGE of the input — no shingle string,
  *     hex string, or base-16 re-parse is ever materialized;
  *   - h1/h2 are the first 60 / next 40 bits of the md5 digest (the
  *     `substr(md5hex, 1, 15)` / `substr(md5hex, 16, 10)` halves),
  *     extracted from the digest bytes like [[Hash60Impl.h60]];
  *   - `sig(i) = min over windows of (x²+x+i) mod p, x = (h1+i·h2) mod p`
  *     (Portable.hashFamFrom — duplicate windows cannot change a min);
  *   - `shset` = the distinct h1s, sorted ascending (collect_set's order
  *     is engine-internal; every consumer intersects, so any order is
  *     legal and sorted is the deterministic choice), `n` = |shset|.
  *
  * A document with fewer than w tokens returns NULL — the caller filters
  * it, matching the declarative form where such docs emit no shingle rows
  * and so vanish from the groupBy.
  *
  * Why this exists: the A/B in PLANS.md showed the shingle *producer* is
  * not the bottleneck — the per-shingle-row digest + the 12-min/
  * collect_set ObjectHashAggregate are. This expression deletes both: the
  * sketch stage becomes a map-only projection (scan → project → filter),
  * with NO shuffle and NO aggregation — at cluster scale the signature
  * build is embarrassingly parallel over input splits, which is the plan
  * a 100 TB corpus needs.
  */
object MinHashSigImpl {
  private val tl = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  val HashP: Long = Portable.HashP

  /** Null iff the text has fewer than w tokens. */
  def compute(bytes: Array[Byte], w: Int, k: Int): InternalRow = {
    val n = bytes.length
    var nSep = 0
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nSep += 1; i += 1 }
    val numTokens = nSep + 1
    if (numTokens < w) return null
    val seps = new Array[Int](nSep)
    var j = 0
    i = 0
    while (i < n) { if (bytes(i) == 0x20) { seps(j) = i; j += 1 }; i += 1 }

    val md = tl.get()
    val mins = new Array[Long](k)
    Arrays.fill(mins, Long.MaxValue)
    val numWindows = numTokens - w + 1
    val h1s = new Array[Long](numWindows)
    var t = 0
    while (t < numWindows) {
      val st = if (t == 0) 0 else seps(t - 1) + 1
      val lastTok = t + w - 1
      val en = if (lastTok == numTokens - 1) n else seps(lastTok)
      md.reset()
      md.update(bytes, st, en - st)
      val dg = md.digest()
      val h1 = (((dg(0) & 0xFFL) << 56) | ((dg(1) & 0xFFL) << 48) |
        ((dg(2) & 0xFFL) << 40) | ((dg(3) & 0xFFL) << 32) |
        ((dg(4) & 0xFFL) << 24) | ((dg(5) & 0xFFL) << 16) |
        ((dg(6) & 0xFFL) << 8) | (dg(7) & 0xFFL)) >>> 4
      val h2 = ((dg(7) & 0xFL) << 36) | ((dg(8) & 0xFFL) << 28) |
        ((dg(9) & 0xFFL) << 20) | ((dg(10) & 0xFFL) << 12) |
        ((dg(11) & 0xFFL) << 4) | ((dg(12) & 0xFFL) >>> 4)
      h1s(t) = h1
      var fi = 0
      while (fi < k) {
        val x = (h1 + fi * h2) % HashP
        val m = (x * x + x + fi) % HashP
        if (m < mins(fi)) mins(fi) = m
        fi += 1
      }
      t += 1
    }

    Arrays.sort(h1s)
    var distinct = if (numWindows == 0) 0 else 1
    i = 1
    while (i < numWindows) {
      if (h1s(i) != h1s(i - 1)) { h1s(distinct) = h1s(i); distinct += 1 }
      i += 1
    }
    val shset = if (distinct == numWindows) h1s
      else Arrays.copyOf(h1s, distinct)

    new GenericInternalRow(Array[Any](
      new GenericArrayData(mins), new GenericArrayData(shset), distinct))
  }

  /** Sorted-distinct 60-bit shingle ids (the `shset` component alone,
    * for consumers that need the feature SET but no signature —
    * [[ShingleIdSet]], [[SimHashFp]]); null iff the text has fewer than
    * w tokens. Same scan, same digest, same bit extraction as
    * [[compute]]. */
  def shingleIdSet(bytes: Array[Byte], w: Int): Array[Long] = {
    val n = bytes.length
    var nSep = 0
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nSep += 1; i += 1 }
    val numTokens = nSep + 1
    if (numTokens < w) return null
    val seps = new Array[Int](nSep)
    var j = 0
    i = 0
    while (i < n) { if (bytes(i) == 0x20) { seps(j) = i; j += 1 }; i += 1 }

    val md = tl.get()
    val numWindows = numTokens - w + 1
    val h1s = new Array[Long](numWindows)
    var t = 0
    while (t < numWindows) {
      val st = if (t == 0) 0 else seps(t - 1) + 1
      val lastTok = t + w - 1
      val en = if (lastTok == numTokens - 1) n else seps(lastTok)
      md.reset()
      md.update(bytes, st, en - st)
      val dg = md.digest()
      h1s(t) = (((dg(0) & 0xFFL) << 56) | ((dg(1) & 0xFFL) << 48) |
        ((dg(2) & 0xFFL) << 40) | ((dg(3) & 0xFFL) << 32) |
        ((dg(4) & 0xFFL) << 24) | ((dg(5) & 0xFFL) << 16) |
        ((dg(6) & 0xFFL) << 8) | (dg(7) & 0xFFL)) >>> 4
      t += 1
    }

    Arrays.sort(h1s)
    var distinct = if (numWindows == 0) 0 else 1
    i = 1
    while (i < numWindows) {
      if (h1s(i) != h1s(i - 1)) { h1s(distinct) = h1s(i); distinct += 1 }
      i += 1
    }
    if (distinct == numWindows) h1s else Arrays.copyOf(h1s, distinct)
  }
}

/** Native one-pass MinHash sketch: `struct<sig array<bigint>,
  * shset array<bigint>, n int>` of a document's w-word shingles under the
  * k-member portable hash family — see [[MinHashSigImpl]] for the exact
  * contract. Reference context: backs the near-dedup family (SURVEY §2
  * pipeline ops); the reference engine has no hashing operator at all
  * (its DISTINCT is sort-based,
  * /root/reference/src/qp/operators/Project.java:122-296).
  */
case class MinHashSig(child: Expression, w: Expression, k: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, w, k)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string first argument, got ${child.dataType.sql}")
    else if (w.dataType != IntegerType || !w.foldable ||
        k.dataType != IntegerType || !k.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable integer width and family size")
    else {
      val wv = w.eval()
      val kv = k.eval()
      if (wv == null || wv.asInstanceOf[Int] < 1 ||
          kv == null || kv.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName width and family size must be >= 1, got $wv, $kv")
      else TypeCheckResult.TypeCheckSuccess
    }

  private lazy val width: Int = w.eval().asInstanceOf[Int]
  private lazy val fam: Int = k.eval().asInstanceOf[Int]

  override def dataType: DataType = MinHashSig.schema

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashSigImpl.compute(
      v.asInstanceOf[UTF8String].getBytes, width, fam)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren(0), w = newChildren(1), k = newChildren(2))
}

object MinHashSig {
  val schema: StructType = new StructType()
    .add("sig", ArrayType(LongType, containsNull = false), nullable = false)
    .add("shset", ArrayType(LongType, containsNull = false), nullable = false)
    .add("n", IntegerType, nullable = false)

  /** `minhashSig(col("text"), 3, 12)` — NULL for docs with < w tokens. */
  def minhashSig(text: Column, w: Int, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text),
      Literal(w), Literal(k)))
}
