package graft.queries

import graft.SparkSpec

/** The C4-style span-strip core (p75), the Gopher rule gate core (p76)
  * and the DSIR importance-weight core (p77) on engineered corpora:
  * duplicated spans must lose every copy but the first-position one
  * with order-preserving reconstruction, each Gopher rule's FAIL branch
  * must fire (the driver corpus never trips the mean-word-length
  * bound), and DSIR weights must rank a disjoint target vocabulary
  * above the background. */
class SpanStripGopherSpec extends SparkSpec {

  import spark.implicits._

  // a 10-token span (SpanW = 10) plus distinct filler
  private def span(tag: String): String =
    (0 until 10).map(i => s"$tag$i").mkString(" ")

  test("span strip: only the first-position copy of a shared span survives") {
    val shared = span("dup")
    val docs = Seq(
      // doc 1: [shared][own1] + 3-token tail — keeper of `shared` (min pos)
      (1L, s"$shared ${span("own1")} tail1 tail2 tail3"),
      // doc 2: [own2][shared] — its `shared` window is dropped
      (2L, s"${span("own2")} $shared"),
      // doc 3: [shared] alone, fully stripped, no tail
      (3L, shared),
      // doc 4: shorter than one window — zero spans, untouched
      (4L, "short text only")).toDF("doc_id", "text")
    val out = Pipeline.spanStrip(docs)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    assert(out(1L)._1 == 2 && out(1L)._2 == 0 && out(1L)._3 == 23)
    assert(out(2L) == ((2L, 1L, 10L,
      md5Hex(span("own2"))))) // shared window excised, own kept in place
    assert(out(3L) == ((1L, 1L, 0L, md5Hex("")))) // fully stripped
    assert(out(4L) == ((0L, 0L, 3L, md5Hex("short text only"))))
    // keeper doc reconstructs byte-identically: shared + own1 + tail
    assert(out(1L)._4 ==
      md5Hex(s"$shared ${span("own1")} tail1 tail2 tail3"))
  }

  test("gopher rules: every rule's fail branch fires") {
    val pass = "the a " + (0 until 48).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, pass), // 50 distinct words, 2 stopwords, mean len in bounds
      (2L, "the a short doc"), // fails r_words (4 < 50)
      (3L, "the a " + (0 until 48) // fails r_mean_len: 12-char words
        .map(i => f"wordwordw$i%03d").mkString(" ")),
      (4L, (0 until 50) // no stopwords
        .map(i => s"word$i").mkString(" ")),
      (5L, "the a " + Seq.fill(48)("word").mkString(" ")) // dup unigrams
    ).toDF("doc_id", "text")
    val out = Pipeline.gopherRules(docs)
      .as[(Long, Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6, r._7))).toMap

    assert(out(1L) == ((1, 1, 1, 1, 1)))
    assert(out(2L)._1 == 0 && out(2L)._5 == 0)
    assert(out(3L) == ((1, 0, 1, 1, 0))) // mean word length 12 > 10
    assert(out(4L) == ((1, 1, 0, 1, 0)))
    // 50 words, 3 distinct → dup frac 47/50 > 0.55
    assert(out(5L) == ((1, 1, 1, 0, 0)))
  }

  test("dsir: target-vocabulary docs outweigh off-target docs") {
    import org.apache.spark.sql.functions.col
    // target docs share one vocabulary, raw background another; a
    // mixed doc sits between
    val target = (0L until 10L)
      .map(i => (i, "alpha beta gamma delta alpha beta", "wiki"))
    val raw = (100L until 130L)
      .map(i => (i, "noise$ junk$ filler$ blob$ noise$ junk$", "web"))
    val mixed = Seq((500L, "alpha beta noise$ junk$", "web"))
    val docs = (target ++ raw ++ mixed).toDF("doc_id", "text", "source")
    val w = Pipeline.dsirWeights(docs, col("source") === "wiki")
      .as[(Long, Int, Long, Long, Int)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(w(0L) > w(500L) && w(500L) > w(100L),
      s"weights not ordered target > mixed > raw: $w")
    // off-target docs are decisively rejected: every gram pays the full
    // -qlog2(cr+1) penalty, >10 bits (65536 = 1 bit in q16) below the
    // target docs. (The target docs' own sign hovers near zero at this
    // corpus size — Laplace smoothing with B=8192 dominates 50 grams —
    // so the spec pins the RANKING and the separation, not the sign.)
    assert(w(0L) - w(100L) > 10L * 65536L,
      s"target/raw separation too small: ${w(0L)} vs ${w(100L)}")
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
}
