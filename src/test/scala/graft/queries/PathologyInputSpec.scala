package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pathological-CONTENT robustness (the sibling of EmptyInputSpec's
  * empty-TABLE contract): every division-bearing operator family runs
  * without crashing on a corpus of empty texts, 1-token docs,
  * stopword-only docs, one-token-repeated docs, and a zero-norm
  * 64-dim embedding. This is exactly the input class that crashed the
  * cosine family under Spark 4 ANSI before round-13's cos6 guard
  * (DIVIDE_BY_ZERO on a zero-norm vector) — kept green mechanically
  * so the next ratio expression can't reintroduce it. The full
  * all-p-query sweep lives in graft.tools.PathologyProbe (round-13
  * run: failures=0); this spec pins the families where data-derived
  * denominators live. */
object PathologyInputSpec {
  lazy val dir: String = {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val d = Files.createTempDirectory("graft-pathology-spec").toString
    val texts = Seq("", "x", "x y", "the", "the the the the",
      "a b c d e f g h i j")
    (0 until 35).map { i =>
      (i.toLong, texts(i % texts.length), "en", s"src${i % 3}",
        texts(i % texts.length).length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    (0 until 35).map(i => (i.toLong,
        if (i == 3) Seq.fill(64)(0f)
        else (0 until 64).map(x => ((i * 7 + x * 3) % 9 - 4).toFloat),
        i.toLong % 5))
      .toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    graft.Tables.names.filterNot(Set("documents", "embeddings")).foreach {
      t =>
        spark.read.parquet(s"${graft.SparkSpec.Sf}/$t.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$d/$t.parquet")
    }
    d
  }
}

class PathologyInputSpec extends SparkSpec {

  // the division-bearing families: per-doc text ratios, cosine/ANN
  // (incl. the zero-norm vector), retrieval, and the substring family
  private val names = Seq(
    "p04_ann_cosine_topk", "p05_ann_lsh_bucketed", "p06_text_stats",
    "p07_lang_profile", "p13_cosine_neardup", "p20_ann_ivf",
    "p37_span_dedup", "p38_decontamination", "p42_ann_quantized",
    "p49_semantic_neardup", "p51_lm_fluency", "p72_ann_recall",
    "p73_perplexity_buckets", "p74_bm25_retrieval", "p75_span_strip",
    "p76_gopher_rules", "p92_decontaminate", "p94_semdedup_prune",
    "p95_tokenizer_fertility", "p104_ann_multiprobe",
    "p106_perplexity_by_lang", "p114_run_strip", "p125_ann_ivf2",
    "p126_semantic_decontam", "p127_rrf_fusion", "p129_rrf_ivf_audit",
    "p131_substring_strip", "p132_strip_policy_matrix",
    "p133_substring_contam", "p134_contam_surgery")

  names.foreach { name =>
    test(s"$name survives pathological content") {
      // contract: no crash; rows are whatever the op's semantics say
      Pipeline.queries(name)(spark, PathologyInputSpec.dir)
        .write.mode("overwrite").format("noop").save()
    }
  }
}
