package graft.queries

import graft.SparkSpec

/** The variable-length substring-strip core (p131) on an engineered
  * corpus that SEPARATES it from the fixed-grid policies: a copied
  * block planted OFF the SpanW window grid, at a different alignment
  * in each copy, is invisible to p114's aligned windows but stripped
  * (non-keeper copy only) by the stride-1 substring pass; a short
  * duplicated phrase below the token gate survives both. */
class SubstringStripSpec extends SparkSpec {

  import spark.implicits._

  private def toks(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  // the 30-token copied block (exactly MinSubTokens = 30)
  private val block = toks("blk", 30)
  // the 15-token shared phrase (>= SpanW, < MinSubTokens)
  private val phrase = toks("ph", 15)

  // doc 1 (keeper): 5 unique tokens, block at positions 6..35, 5-token
  // tail — block start 6 is OFF the window grid (not ≡ 1 mod 10)
  private val docA = s"${toks("a", 5)} $block ${toks("za", 5)}"
  // doc 2: 3 unique tokens, block at positions 4..33, 7-token tail —
  // a DIFFERENT off-grid alignment, so no aligned window of doc 2
  // matches any aligned window of doc 1
  private val docB = s"${toks("b", 3)} $block ${toks("zb", 7)}"
  // docs 3/4: the short phrase at two alignments
  private val docC = s"${toks("c", 4)} $phrase ${toks("zc", 4)}"
  private val docD = s"${toks("d", 2)} $phrase ${toks("zd", 6)}"

  private def fixture =
    Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")

  test("p131 strips the off-grid non-keeper block copy that p114 " +
      "cannot see, and keeps the short phrase") {
    val out = Pipeline.substringStripOf(fixture)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

    // keeper copy untouched, reconstructs byte-identically
    assert(out(1L) == ((40L, 0L, 0L, 40L, md5Hex(docA))),
      s"keeper doc must survive whole: ${out(1L)}")
    // non-keeper copy: exactly the 30 block tokens excised, text
    // reassembled around the hole in order
    assert(out(2L) == ((40L, 1L, 30L, 10L,
      md5Hex(s"${toks("b", 3)} ${toks("zb", 7)}"))),
      s"non-keeper block copy must lose exactly the block: ${out(2L)}")
    // the 15-token phrase is duplicated but below the 30-token gate
    assert(out(3L)._3 == 0L && out(4L)._3 == 0L,
      s"short phrase must survive both copies: ${out(3L)} ${out(4L)}")
    assert(out(4L)._5 == md5Hex(docD))
  }

  test("p114's aligned windows are blind to the same fixture — the " +
      "distinguishing case") {
    val out = Pipeline.runStripOf(fixture)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(out.forall(r => r._3 == 0L && r._4 == 0L),
      s"p114 must drop nothing here: ${out.toSeq}")
    // and p75 (every-duplicated-window excision) is equally blind
    val p75 = Pipeline.spanStrip(fixture)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(p75.forall(_._3 == 0L),
      s"p75 must drop nothing here: ${p75.toSeq}")
  }

  test("the strip is partition-independent: 13-way repartition " +
      "changes nothing") {
    // census counts are exact aggregates and every window is keyed by
    // doc_id with a total order — a partitioning that changed any row
    // would mean order-sensitive state leaked in somewhere
    val base = Pipeline.substringStripOf(fixture)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    val rep = Pipeline.substringStripOf(fixture.repartition(13))
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    assert(rep == base, s"partitioning leaked into the result")
  }

  test("within-doc self-repetition past the gate is excised down to " +
      "the keeper prefix") {
    // one doc: a 10-token motif repeated 5 times (50 tokens). Stride-1
    // shingles repeat with period 10, every start from 11 on is a
    // non-keeper duplicate (run extent 40 >= 30) — the cleaned doc
    // keeps exactly the first motif copy.
    val motif = toks("m", 10)
    val doc = Seq.fill(5)(motif).mkString(" ")
    val out = Pipeline.substringStripOf(
        Seq((7L, doc)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long, String)].collect().head
    assert(out == ((7L, 50L, 1L, 40L, 10L, md5Hex(motif))),
      s"self-repetition must collapse to the keeper motif: $out")
  }
}
