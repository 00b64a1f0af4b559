package graft.queries

import org.apache.spark.sql.functions.{col, concat_ws}

import graft.{SparkSpec, Tables}

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

  test("per-lang terciles: a globally-worse language still heads its best") {
    // language A: one fixed fluent chain (every holdout A doc scores
    // low). language B: noisier text — EVERY B doc scores worse than
    // every A doc under its own LM, so a global cut would condemn all
    // of B to middle/tail; the per-language cut must still split B into
    // head/middle/tail within its own distribution.
    val fluentA = (chain ++ chain ++ chain).mkString(" ")
    val trainA = (0L until 30L).map(i => (i, "aa", fluentA, false))
    // B's training text cycles word sets so bigram counts stay modest
    def bText(i: Long) = (0 until 10)
      .map(j => s"b${(i + j) % 7}").mkString(" ")
    val trainB = (200L until 230L).map(i => (i, "bb", bText(i), false))
    val holdout = Seq(
      (100L, "aa", fluentA, true),
      (300L, "bb", bText(3), true),              // B's most fluent: seen text
      (301L, "bb", ("b0 b1 " + "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"), true),
      (302L, "bb", "qq1 qq2 qq3 qq4 qq5 qq6 qq7 qq8 qq9", true))
    val docs = (trainA ++ trainB ++ holdout)
      .toDF("doc_id", "lang", "text", "is_test")
    val census = Pipeline.perplexityByLangCensus(docs)
      .as[(String, String, Long, Long, Long)].collect()
    val byLang = census.groupBy(_._1)
    // A's single holdout doc heads its own (degenerate) distribution
    assert(byLang("aa").exists(r => r._2 == "head" && r._3 == 1L))
    // B's three holdout docs spread across ALL three buckets within B —
    // the per-language cut at work even though every B score is worse
    // than every A score
    val bBuckets = byLang("bb").map(r => r._2 -> r._3).toMap
    assert(bBuckets == Map("head" -> 1L, "middle" -> 1L, "tail" -> 1L),
      s"B not split within its own distribution: $bBuckets")
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

  test("bm25Postings sums reproduce bm25TopDocs scores exactly") {
    // the two functions carry PARALLEL copies of the Okapi arithmetic
    // (the query path computes terms inline; the index path
    // precomputes them per posting); a drift between them would be
    // rank-masked downstream (RRF consumes ranks only) — so pin the
    // SCORES equal on the driver corpus: for every (probe, doc) row
    // bm25TopDocs emits, the sum of the probe's matching postings'
    // term_q must equal score_q
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val post = Pipeline.bm25Postings(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val probeTerms = Pipeline
      .bigramPairs(docs.filter(col("doc_id") < 10))
      .select(col("doc_id"),
        concat_ws(" ", col("prev"), col("cur")).as("token"))
      .distinct().collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (p, ts) => p -> ts.map(_._2).toSet }
    val top = Pipeline.bm25TopDocs(
        docs.repartition(spark.sparkContext.defaultParallelism),
        probeMax = 10L)
      .as[(Long, Long, Int, Long)].collect()
    assert(top.nonEmpty, "fixture corpus must retrieve something")
    top.foreach { case (probe, doc, _, scoreQ) =>
      // toSeq first: two tokens can contribute IDENTICAL term_q values
      // for one doc, and a Set.flatMap would collapse them before the sum
      val replay = probeTerms.getOrElse(probe, Set.empty).toSeq
        .flatMap(t => post.get((t, doc))).sum
      assert(replay == scoreQ,
        s"postings sum $replay != query-path score $scoreQ " +
          s"for probe $probe doc $doc — the parallel arithmetic drifted")
    }
  }
}
