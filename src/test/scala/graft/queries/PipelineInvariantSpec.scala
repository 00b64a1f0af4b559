package graft.queries

import graft.SparkSpec

/** Structural invariants of the round-6 pipeline operators, checked on
  * the real sf0.001 tables — properties that must hold on ANY corpus,
  * complementing the hand-computed minis. */
class PipelineInvariantSpec extends SparkSpec {

  private def run(name: String) = Pipeline.queries(name)(spark, sf)

  test("p44: a bloom filter never false-negatives a true duplicate") {
    val rows = run("p44_bloom_prefilter").collect()
      .map(r => (r.getAs[Int]("bloom_hit"), r.getAs[Int]("is_dup")))
    rows.foreach { case (hit, dup) =>
      assert(dup == 0 || hit == 1, s"false negative: hit=$hit dup=$dup")
    }
  }

  test("p43: OOV is a rate over occurrences") {
    run("p43_vocab_oov").collect().foreach { r =>
      val (tok, oov, rate) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate"))
      assert(oov >= 0 && oov <= tok)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("p45: Simpson diversity lies in [0, 1) and counts are positive") {
    run("p45_diversity_score").collect().foreach { r =>
      assert(r.getAs[Long]("n_ch") > 0 && r.getAs[Long]("n_tok") > 0)
      Seq("char_simpson", "token_simpson").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v < 1.0, s"$c=$v out of range")
      }
    }
  }

  test("p46: admission never exceeds the population or the cap logic") {
    run("p46_mixture_sample").collect().foreach { r =>
      assert(r.getAs[Long]("n_docs_kept") <= r.getAs[Long]("n_docs_in"))
      val rate = r.getAs[Double]("keep_rate")
      assert(rate > 0.0 && rate <= 1.0)
    }
  }

  test("p47: quantized centroids stay inside the int8 code range") {
    run("p47_quantized_centroids").collect().foreach { r =>
      val cq = r.getAs[Double]("centroid_q")
      assert(cq >= -128.0 && cq <= 127.0)
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("p50: every purchase window contains at least itself") {
    val rows = run("p50_interval_join_binned").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_overlap") >= 1L))
  }

  test("p51: quantized log-probs are non-positive; identical docs tie") {
    val rows = run("p51_lm_fluency").collect()
    rows.foreach { r =>
      if (!r.isNullAt(2)) assert(r.getAs[Double]("lm_score") <= 0.0)
      assert(r.getAs[Long]("n_bigrams") >= 0L)
    }
  }

  test("p52: containment lies in (0,1] and never pairs a doc with itself") {
    run("p52_containment_dedup").collect().foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Long]("doc_a") != r.getAs[Long]("doc_b"))
    }
  }

  test("p53: cells partition the vector corpus exactly") {
    val total = run("p53_kmeans_cells").collect()
      .map(_.getAs[Long]("n_members")).sum
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(total == n)
  }

  test("p54: trailing counts are >= 1 and the sum covers the event itself") {
    run("p54_sliding_window").collect().foreach { r =>
      assert(r.getAs[Long]("n_trailing") >= 1L)
    }
  }

  test("p42: per-probe re-ranked sims are descending with dense ranks") {
    val byProbe = run("p42_ann_quantized").collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rnk"),
        r.getAs[Double]("sim")))
      .groupBy(_._1)
    byProbe.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      val sims = sorted.map(_._3).toSeq
      assert(sims == sims.sorted.reverse)
    }
  }
}
