package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The supervised naive-Bayes classifier core (p71): on a corpus whose
  * classes have separable vocabularies it must actually LEARN — the
  * held-out confusion census comes out diagonal. (The driver corpus's
  * lang labels are uncorrelated with its text, so the oracle gate checks
  * exactness, and this spec checks learning.) */
class NbClassifierSpec extends SparkSpec {

  import spark.implicits._

  // three "languages" with disjoint core vocabulary plus shared noise
  private val vocab = Map(
    "aa" -> Seq("alpha", "apple", "anchor", "arrow"),
    "bb" -> Seq("bravo", "berry", "bridge", "bottle"),
    "cc" -> Seq("carol", "cedar", "copper", "candle"))

  private def corpus = (0L until 120L).map { i =>
    val cls = Seq("aa", "bb", "cc")((i % 3).toInt)
    val core = vocab(cls)
    // deterministic word mix: 8 core words + 2 shared noise words
    val words = (0 until 8).map(j => core((i + j).toInt % core.size)) ++
      Seq("the", "and")
    (i, cls, words.mkString(" "), i % 10 == 9)
  }.toDF("doc_id", "lang", "text", "is_test")

  test("separable classes classify diagonally on the holdout") {
    val census = Pipeline.nbClassifyCensus(corpus)
      .as[(String, String, Long)].collect()
    val total = census.map(_._3).sum
    val right = census.filter(c => c._1 == c._2).map(_._3).sum
    assert(total == 12L, s"expected 12 holdout docs, got $total")
    assert(right == total,
      s"confusion census not diagonal: ${census.sortBy(c => (c._1, c._2)).mkString(", ")}")
  }

  test("an all-noise holdout doc falls back to the prior's argmax") {
    // class "aa" has double the training docs -> largest prior; a doc of
    // only shared-noise tokens must land there deterministically
    val skewed = corpus.filter(!col("is_test"))
      .union(corpus.filter(col("lang") === "aa" && !col("is_test"))
        .withColumn("doc_id", col("doc_id") + 1000L))
      .union(Seq((5000L, "cc", "the and the and", true))
        .toDF("doc_id", "lang", "text", "is_test"))
    val census = Pipeline.nbClassifyCensus(skewed)
      .as[(String, String, Long)].collect()
    assert(census.toSeq == Seq(("cc", "aa", 1L)),
      s"expected the noise doc to take the max-prior class: ${census.mkString(", ")}")
  }

  test("calibration: separable docs land in high-margin bins, all correct") {
    val rows = Pipeline.nbCalibration(corpus)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._2).sum == 12L, "every holdout doc binned once")
    // disjoint core vocabularies give every doc a decisive margin: no
    // doc may land in the zero-confidence bin, and accuracy must be
    // perfect in every populated bin (the diagonal census, refined)
    assert(rows.forall(_._1 > 0L),
      s"separable doc in the no-margin bin: ${rows.mkString(", ")}")
    rows.foreach { case (bin, n, correct, acc) =>
      assert(correct == n && acc == 1.0, s"bin $bin: $correct/$n")
    }
  }

  test("calibration: label noise surfaces as lower accuracy, not a crash") {
    // flip two training labels so the model is imperfect; the audit must
    // still bin every holdout doc and report a fraction, not fail
    val noisy = corpus.withColumn("lang",
      when(col("doc_id").isin(0L, 1L), lit("cc")).otherwise(col("lang")))
    val rows = Pipeline.nbCalibration(noisy)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._2).sum == 12L)
    rows.foreach { case (bin, n, correct, acc) =>
      assert(correct <= n && bin >= 0L && bin <= Pipeline.CalMaxBin)
      assert(math.abs(acc - correct.toDouble / n) < 1e-6)
    }
  }
}
