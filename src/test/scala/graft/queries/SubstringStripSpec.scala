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

  test("the production 50-token gate keeps a 30-49-token block the " +
      "default gate drops — the p132 substring_50 boundary") {
    // a 35-token copied block: inside [MinSubTokens, ProdSubTokens)
    val blk35 = toks("g", 35)
    val keeper = s"${toks("k", 4)} $blk35 ${toks("zk", 4)}"
    val copy = s"${toks("x", 6)} $blk35 ${toks("zx", 2)}"
    val df = Seq((1L, keeper), (2L, copy)).toDF("doc_id", "text")
    val at30 = Pipeline.substringStripOf(df)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(at30(2L) == 35L && at30(1L) == 0L,
      s"the 35-token block must be dropped at the 30 gate: $at30")
    val at50 = Pipeline.substringStripOf(df, Pipeline.ProdSubTokens)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(at50.forall(r => r._4 == 0L && r._6 ==
        md5Hex(if (r._1 == 1L) keeper else copy)),
      s"the 35-token block must SURVIVE the 50 gate whole: ${at50.toSeq}")
    // and a 50-token block crosses both gates
    val blk50 = toks("h", 50)
    val df50 = Seq((1L, s"${toks("p", 3)} $blk50"),
      (2L, s"${toks("q", 5)} $blk50")).toDF("doc_id", "text")
    val at50b = Pipeline.substringStripOf(df50, Pipeline.ProdSubTokens)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(at50b(2L) == 50L && at50b(1L) == 0L,
      s"a 50-token block must be dropped even at the 50 gate: $at50b")
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
