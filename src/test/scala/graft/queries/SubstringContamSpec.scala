package graft.queries

import graft.SparkSpec

/** The substring-level decontamination core (p133) on an engineered
  * split, plus its cross-instrument relation to p92 on the driver
  * corpus: a 30-token eval block copied OFF-GRID into a train doc
  * fires `verbatim_leak`; a 15-token overlap is measured but stays
  * under the gate; p133's flags are a strict refinement of p92's
  * any-shared-5-gram screen. */
class SubstringContamSpec extends SparkSpec {

  import spark.implicits._

  private def toks(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("an off-grid 30-token eval block fires verbatim_leak; a " +
      "15-token overlap is measured but not flagged") {
    val evalToks = (0 until 40).map(i => s"e$i")
    // doc 7 is the eval slice (7 % 29 == 7); 1/2/3 are train
    val docs = Seq(
      (7L, evalToks.mkString(" ")),
      // 30-token eval block at train positions 4..33 — off-grid
      (1L, s"${toks("a", 3)} ${evalToks.slice(5, 35).mkString(" ")} " +
        toks("za", 4)),
      // 15-token eval overlap: measured, under the 30-token gate
      (2L, s"${toks("b", 2)} ${evalToks.take(15).mkString(" ")} " +
        toks("zb", 3)),
      // clean train doc: the grid row survives with zeros
      (3L, toks("c", 12))).toDF("doc_id", "text")
    val out = Pipeline.substringContamOf(docs)
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"train rows only: $out")
    // doc 1: 37 tokens → 28 starts; block-internal starts 4..24 (21)
    assert(out(1L) == ((28L, 21L, 30L, 1)),
      s"off-grid 30-token block must flag: ${out(1L)}")
    // doc 2: 20 tokens → 11 starts; phrase-internal starts 3..8 (6)
    assert(out(2L) == ((11L, 6L, 15L, 0)),
      s"15-token overlap must measure but not flag: ${out(2L)}")
    assert(out(3L) == ((3L, 0L, 0L, 0)),
      s"clean doc keeps its zero row: ${out(3L)}")
  }

  test("on the driver corpus, p133's leaks are a subset of p92's " +
      "flags (a long verbatim overlap always shares 5-grams)") {
    val sf = "/root/testdata/sf0.01"
    val leaks = Pipeline.queries("p133_substring_contam")(spark, sf)
      .filter("verbatim_leak = 1").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(leaks.nonEmpty, "fixture corpus must carry at least one leak")
    val p92 = Pipeline.queries("p92_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(leaks.subsetOf(p92),
      s"p133 must refine p92, got leaks ${leaks -- p92} outside p92")
    // and the refinement is PROPER on this corpus or trivially equal —
    // record which, so a corpus change that breaks the relation screams
    assert(leaks.size <= p92.size)
  }
}
