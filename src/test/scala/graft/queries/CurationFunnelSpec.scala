package graft.queries

import graft.SparkSpec

/** The composed curation funnel (p78) on an engineered corpus where
  * each stage has exactly one designated victim: a rule-failing doc
  * falls at the Gopher gate, an exact copy falls at content-hash dedup
  * (and therefore never reaches the sketch stage), and a near-dup falls
  * at the MinHash+Jaccard stage — everything else survives to the end
  * with token counts conserved per stage. */
class CurationFunnelSpec extends SparkSpec {

  import spark.implicits._

  // 60 distinct 4-letter-ish words incl. two stopwords: passes every
  // Gopher rule (>=50 words, mean word length in [3,10], >=2 stopwords,
  // repetition under 55%)
  private def passing(tag: String): String =
    (Seq("the", "of") ++ (1 to 58).map(i => f"$tag$i%02d")).mkString(" ")

  private def nWords(s: String): Long = s.split(" ").length.toLong

  test("each funnel stage drops exactly its designated victim") {
    val base = passing("aa")
    val docs = Seq(
      1L -> base,                    // survives all stages
      2L -> (base + " zzzb"),        // near-dup of 1 (Jaccard 58/61): dropped at stage 3
      3L -> base,                    // exact copy of 1: dropped at stage 2
      4L -> "too short",             // fails the word-count rule: dropped at stage 1
      5L -> passing("xq")            // distinct vocabulary: survives all stages
    ).toDF("doc_id", "text")

    val out = Pipeline.curationFunnel(docs)
      .as[(Int, String, Long, Long)].collect()
      .map(r => r._2 -> ((r._1, r._3, r._4))).toMap

    val all = Seq(base, base + " zzzb", base, "too short", passing("xq"))
    assert(out("raw") == ((0, 5L, all.map(nWords).sum)))
    // stage 1 loses only doc 4
    assert(out("gopher_rules") == ((1, 4L,
      all.map(nWords).sum - nWords("too short"))))
    // stage 2 loses only doc 3 (the exact copy; doc 1 is the keeper)
    assert(out("exact_dedup") == ((2, 3L,
      nWords(base) + nWords(base + " zzzb") + nWords(passing("xq")))))
    // stage 3 loses only doc 2 (higher-id member of the near-dup pair)
    assert(out("near_dedup") == ((3, 2L,
      nWords(base) + nWords(passing("xq")))))
  }

  test("empty corpus yields a four-stage all-zero census") {
    val out = Pipeline.curationFunnel(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
      .as[(Int, String, Long, Long)].collect()
    assert(out.length == 4)
    assert(out.forall(r => r._3 == 0L && r._4 == 0L))
  }
}
