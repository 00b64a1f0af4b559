package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Session, SparkEntry, Tables}

/** Scaling-evidence probe: blow the driver tables up N× (shifted ids,
  * half-exact / half-perturbed document copies so every dedup family
  * gets real work, shifted users so per-user event volume stays
  * constant) and time representative operators at 1× and N×. A plan
  * that holds should scale near-linearly in input for the linear ops
  * and near-linearly in clusters for the pair ops — superlinear growth
  * here is the local smoke signal of a shape that dies at 100 TB.
  *
  *   sbt "runMain graft.tools.ScaleProbe <sfDir> [mult] [workDir]"
  */
object ScaleProbe {
  private val Queries = Seq(
    "p01_exact_dedup", "p02_minhash_neardup", "p37_span_dedup",
    "p39_inverted_index", "p43_vocab_oov", "p51_lm_fluency",
    "p04_ann_cosine_topk", "p42_ann_quantized", "p11_events_sessions",
    "p54_sliding_window",
    // round-7 additions: the tokenizer rounds (vocab-bounded after one
    // corpus shuffle) and the batch-vs-index near-dedup
    "p62_bpe_merges", "p65_incremental_neardup",
    // round-8 additions: bounded-state sketch, trained classifier,
    // LM bucketing, inverted-postings retrieval, span removal with
    // doc reconstruction, hashed-feature importance weights
    "p70_heavy_hitters", "p71_nb_classifier", "p73_perplexity_buckets",
    "p74_bm25_retrieval", "p75_span_strip", "p77_dsir_weights",
    // round-9 additions: cluster reweighting (p32's components + ε),
    // zero-shuffle propensity sampling, integer 3σ feed anomaly, and
    // the bounded-heap CDC compaction
    "p82_soft_dedup_weights", "p83_quality_sampling",
    "p84_hourly_anomaly", "p85_upsert_latest", "p88_dup_pagerank",
    // round-10 additions: profiler (digest-keyed shuffle), schema-driven
    // FK discovery, benchmark decontamination, SemDeDup prune,
    // tokenizer fertility, kNN label eval
    "p89_table_profile", "p90_fk_discovery", "p92_decontaminate",
    "p94_semdedup_prune", "p95_tokenizer_fertility", "p96_knn_label_eval",
    // round-10 (cont.): provenance keeper policy (pair-graph consumer),
    // codebook drift monitor, source mirror matrix, composed dataset card
    "p99_provenance_reps", "p100_embedding_drift", "p101_source_mirror",
    "p102_dataset_card", "p103_nb_calibration", "p104_ann_multiprobe",
    "p105_training_order", "p106_perplexity_by_lang",
    "p107_padding_audit", "p108_novelty_curve", "p109_decontam_release",
    "p110_health_report", "p111_dedup_threshold_curve",
    "p112_dup_spectrum", "p113_dup_run_lengths", "p114_run_strip",
    "p115_skew_audit", "p117_dedup_agreement", "p118_source_scorecard",
    "p119_dedup_savings", "p120_budget_allocation", "p121_freq_spectrum",
    "p122_cusum_drift", "p123_drift_changepoint", "p124_psi_baseline_drift",
    // round-12 additions: the two remaining fixed-bucket pairwise
    // families, now corpus-scaled (p13's sign bits) / capped (p12),
    // and the two-level IVF hierarchy audit
    "p12_simhash_pairs", "p13_cosine_neardup", "p125_ann_ivf2",
    "p126_semantic_decontam", "p127_rrf_fusion", "p128_index_staleness",
    "p129_rrf_ivf_audit", "p130_contam_by_source",
    // round-13 additions: stride-1 exact-substring removal + the
    // cross-split verbatim-leak screen (corpus-token row volume by
    // design — the Lee et al. cost class) and the three-policy matrix
    "p131_substring_strip", "p132_strip_policy_matrix",
    "p133_substring_contam", "p134_contam_surgery",
    // round-14 addition: the IVF-served fused list (cell-keyed ANN)
    "p135_rrf_ivf_serving",
    // round-17 additions: the two hot-cell SALTED self-joins (r16's
    // saltedCellSelfJoin fix was measured as sf10 wall-time; the
    // scaling RATIO is the evidence the fix holds a decade up) and
    // the IVF-served semantic screen beside its exact twin
    "p33_knn_graph", "p136_semantic_decontam_ivf")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse("/tmp/graft-scaleprobe")
    // optional 4th arg: comma-separated op names (local iteration on a
    // subset; the full list is the per-round record). Unknown names
    // fail loudly — a typo must not become an empty, silent run.
    val only = args.lift(3).map(_.split(",").toSet)
    only.foreach { o =>
      val unknown = o -- Queries.toSet
      require(unknown.isEmpty,
        s"unknown ScaleProbe ops: ${unknown.mkString(", ")}")
    }
    val spark = Session.local()
    build(spark, sfDir, mult, work)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String, dir: String): Double = {
      val q = SparkEntry.queries(name)
      time(q(spark, dir).write.mode("overwrite").format("noop").save())
    }
    println(f"SCALEPROBE mult=$mult")
    Queries.filter(n => only.forall(_.contains(n))).foreach { name =>
      run(name, sfDir) // warmup + 1x
      val t1 = (1 to 2).map(_ => run(name, sfDir)).min
      val tn = (1 to 2).map(_ => run(name, work)).min
      println(f"SCALE $name%-24s t1=$t1%6.2f t$mult=$tn%6.2f " +
        f"ratio=${tn / t1}%5.2f (linear=$mult.0)")
    }
    spark.stop()
  }

  /** Writes mult× copies of documents / embeddings / events with
    * disjoint id spaces per copy. Document copy k keeps the text for
    * even k (exact dups) and perturbs the tail token for odd k
    * (near-dups), so exact-hash, MinHash, and span dedup all see real
    * duplicate structure at scale. */
  def build(spark: SparkSession, sfDir: String, mult: Int,
      work: String): Unit = {
    def blow(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(k => f(df, k)).reduce(_ unionAll _)

    val docs = Tables.documents(spark, sfDir)
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    blow(docs, (d, k) => d
      .withColumn("doc_id", col("doc_id") + lit(k * maxDoc))
      .withColumn("text",
        if (k % 2 == 0) col("text")
        else concat(col("text"), lit(s" scaleprobe$k"))))
      .write.mode(SaveMode.Overwrite).parquet(s"$work/documents.parquet")

    val emb = Tables.embeddings(spark, sfDir)
    val maxVec = emb.agg(max("vec_id")).head.getLong(0) + 1
    blow(emb, (d, k) =>
      if (k == 0) d
      else d.filter(col("vec_id") >= 16) // keep ONE copy of the codebook ids
        .withColumn("vec_id", col("vec_id") + lit(k * maxVec)))
      .write.mode(SaveMode.Overwrite).parquet(s"$work/embeddings.parquet")

    // events: raw read (ts stays a nanos long exactly like the driver
    // layout); shifted users keep per-user volume constant
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val maxEv = ev.agg(max("event_id")).head.getLong(0) + 1
    val maxUser = ev.agg(max("user_id")).head.getLong(0) + 1
    blow(ev, (d, k) => d
      .withColumn("event_id", col("event_id") + lit(k * maxEv))
      .withColumn("user_id", col("user_id") + lit(k * maxUser)))
      .write.mode(SaveMode.Overwrite).parquet(s"$work/events.parquet")

    // small relational tables pass through untouched for catalog reads
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$work/$t.parquet")
    }
  }
}
