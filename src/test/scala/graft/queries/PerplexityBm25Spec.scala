package graft.queries

import graft.SparkSpec

/** The unsupervised LM filter core (p73) and the BM25 retrieval core
  * (p74): on engineered corpora they must actually RANK — fluent text
  * lands in the head tercile and garbage in the tail, and a planted
  * near-copy of a probe doc retrieves at rank 1. (The driver corpus's
  * synthetic text gives the oracle gate exactness; these specs give the
  * operators their semantics.) */
class PerplexityBm25Spec extends SparkSpec {

  import spark.implicits._

  private val chain = Seq("alpha", "beta", "gamma", "delta", "epsilon")

  test("perplexity terciles: trained text heads, unseen text tails") {
    val fluentText = (chain ++ chain ++ chain).mkString(" ")
    val train = (0L until 30L)
      .map(i => (i, fluentText, false))
    val holdout = Seq(
      (100L, fluentText, true), // every bigram seen 90 times
      (101L, (chain ++ Seq("zeta", "eta", "theta", "iota", "kappa"))
        .mkString(" "), true), // half seen, half unseen
      (102L, "qq1 qq2 qq3 qq4 qq5 qq6 qq7 qq8 qq9", true)) // all unseen
    val docs = (train ++ holdout).toDF("doc_id", "text", "is_test")
    val buckets = Pipeline.perplexityDocBuckets(docs)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(buckets == Map(100L -> "head", 101L -> "middle", 102L -> "tail"),
      s"buckets did not rank by fluency: $buckets")
  }

  test("bm25: a planted near-copy of the probe retrieves at rank 1") {
    val probeText = chain.mkString(" ")
    val half = chain.take(3).mkString(" ") // shares 2 of the 4 bigrams
    val noise = (1L until 58L)
      .map(i => (i, (0 until 5).map(j => s"t${i}w$j").mkString(" ")))
    val docs = (Seq(
      0L -> probeText,
      500L -> probeText, // full copy: shares all 4 probe bigrams
      501L -> (half + " x1 x2 x3")) ++ noise).toDF("doc_id", "text")
    val top = Pipeline.bm25TopDocs(docs, probeMax = 1L)
      .as[(Long, Long, Int, Long)].collect().sortBy(_._3)
    assert(top.map(_._2).toSeq == Seq(500L, 501L),
      s"expected the full copy then the half copy: ${top.mkString(", ")}")
    assert(top.head._4 > top(1)._4, "full copy must outscore the half copy")
  }
}
