package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Exact._
import graft.Stage.StageOps
import graft.Tables
import graft.functions.Portable._
import graft.functions.VectorDot.vdot
import graft.functions.VectorDotLong.vdotl


/** Large-scale training-data-pipeline operators over the `documents`,
  * `embeddings` and `events` tables: deduplication (exact, MinHash+LSH,
  * SimHash), similarity search (brute-force + LSH-bucketed ANN), text
  * analysis (tokens / quality / language-ID / fingerprints), multimodal
  * binary-column plumbing, and JSON/struct event analytics.
  *
  * Scale design rules applied throughout (the 100 TB contract):
  *  - every candidate-pair generator is BUCKETED — pairs are only formed
  *    inside an LSH band bucket or sign bucket, never via an all-pairs
  *    cross join;
  *  - no `collect()`, no driver-side state, no UDFs — everything is
  *    Catalyst expressions (codegen'd) over exploded rows, so each stage
  *    is a map or a keyed shuffle that partitions by doc/vec id;
  *  - hashes are engine-portable (`graft.functions.Portable.h60`) so every
  *    probabilistic operator still has an EXACT DuckDB oracle twin: same
  *    hash → same buckets → same candidates → same output, bit for bit.
  */
object Pipeline extends PipelineOracles {


  // ---- registry ----------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "p111_dedup_threshold_curve" -> p111DedupThresholdCurve,
    "p112_dup_spectrum" -> p112DupSpectrum,
    "p113_dup_run_lengths" -> p113DupRunLengths,
    "p114_run_strip" -> p114RunStrip,
    "p115_skew_audit" -> p115SkewAudit,
    "p116_lsh_planner" -> p116LshPlanner,
    "p117_dedup_agreement" -> p117DedupAgreement,
    "p118_source_scorecard" -> p118SourceScorecard,
    "p119_dedup_savings" -> p119DedupSavings,
    "p120_budget_allocation" -> p120BudgetAllocation,
    "p121_freq_spectrum" -> p121FreqSpectrum,
    "p122_cusum_drift" -> p122CusumDrift,
    "p123_drift_changepoint" -> p123DriftChangepoint,
    "p124_psi_baseline_drift" -> p124PsiBaselineDrift,
    "p125_ann_ivf2" -> p125AnnIvf2,
    "p126_semantic_decontam" -> p126SemanticDecontam,
    "p127_rrf_fusion" -> p127RrfFusion,
    "p128_index_staleness" -> p128IndexStaleness,
    "p129_rrf_ivf_audit" -> p129RrfIvfAudit,
    "p130_contam_by_source" -> p130ContamBySource,
    "p131_substring_strip" -> p131SubstringStrip,
    "p132_strip_policy_matrix" -> p132StripPolicyMatrix,
    "p133_substring_contam" -> p133SubstringContam,
    "p134_contam_surgery" -> p134ContamSurgery,
    "p135_rrf_ivf_serving" -> p135RrfIvfServing,
    "p136_semantic_decontam_ivf" -> p136SemanticDecontamIvf,
    "p137_health_report_ivf" -> p137HealthReportIvf,
    "p67_temperature_mix" -> p67TemperatureMix,
    "p66_bpe_apply" -> p66BpeApply,
    "p65_incremental_neardup" -> p65IncrementalNearDedup,
    "p64_bpe_by_lang" -> p64BpeMergesByLang,
    "p63_snapshot_diff" -> p63SnapshotDiff,
    "p62_bpe_merges" -> p62BpeMerges,
    "p61_bmp_real_bytes" -> p61BmpRealBytes,
    "p68_bmp_imageio_decode" -> p68BmpImageioDecode,
    "p69_wav_audio_decode" -> p69WavAudioDecode,
    "p70_heavy_hitters" -> p70HeavyHitters,
    "p71_nb_classifier" -> p71NbClassifier,
    "p72_ann_recall" -> p72AnnRecall,
    "p73_perplexity_buckets" -> p73PerplexityBuckets,
    "p74_bm25_retrieval" -> p74Bm25Retrieval,
    "p75_span_strip" -> p75SpanStrip,
    "p76_gopher_rules" -> p76GopherRules,
    "p77_dsir_weights" -> p77DsirWeights,
    "p78_curation_funnel" -> p78CurationFunnel,
    "p79_source_quota_cap" -> p79SourceQuotaCap,
    "p80_mixture_epochs" -> p80MixtureEpochs,
    "p81_source_drift_psi" -> p81SourceDriftPsi,
    "p82_soft_dedup_weights" -> p82SoftDedupWeights,
    "p83_quality_sampling" -> p83QualitySampling,
    "p84_hourly_anomaly" -> p84HourlyAnomaly,
    "p85_upsert_latest" -> p85UpsertLatest,
    "p86_image_resize" -> p86ImageResize,
    "p87_ref_integrity" -> p87RefIntegrity,
    "p88_dup_pagerank" -> p88DupPagerank,
    "p89_table_profile" -> p89TableProfile,
    "p90_fk_discovery" -> p90FkDiscovery,
    "p91_upsert_tombstones" -> p91UpsertTombstones,
    "p92_decontaminate" -> p92Decontaminate,
    "p93_dedup_recall" -> p93DedupRecall,
    "p94_semdedup_prune" -> p94SemdedupPrune,
    "p95_tokenizer_fertility" -> p95TokenizerFertility,
    "p96_knn_label_eval" -> p96KnnLabelEval,
    "p97_weighted_sample" -> p97WeightedSample,
    "p98_leakage_free_split" -> p98LeakageFreeSplit,
    "p99_provenance_reps" -> p99ProvenanceReps,
    "p100_embedding_drift" -> p100EmbeddingDrift,
    "p101_source_mirror" -> p101SourceMirror,
    "p102_dataset_card" -> p102DatasetCard,
    "p103_nb_calibration" -> p103NbCalibration,
    "p104_ann_multiprobe" -> p104AnnMultiprobe,
    "p105_training_order" -> p105TrainingOrder,
    "p106_perplexity_by_lang" -> p106PerplexityByLang,
    "p107_padding_audit" -> p107PaddingAudit,
    "p108_novelty_curve" -> p108NoveltyCurve,
    "p109_decontam_release" -> p109DecontamRelease,
    "p110_health_report" -> p110HealthReport,
    "p60_pack_whole_docs" -> p60PackWholeDocs,
    "p59_shingle_vocab" -> p59ShingleVocab,
    "p57_hll_groups" -> p57HllGroups,
    "p58_wav_real_bytes" -> p58WavRealBytes,
    "p01_exact_dedup" -> p01ExactDedup,
    "p02_minhash_neardup" -> p02MinhashNearDup,
    "p03_simhash_fingerprint" -> p03SimhashFingerprint,
    "p04_ann_cosine_topk" -> p04AnnCosineTopk,
    "p05_ann_lsh_bucketed" -> p05AnnLshBucketed,
    "p06_text_stats" -> p06TextStats,
    "p07_lang_profile" -> p07LangProfile,
    "p08_multimodal_stub" -> p08MultimodalStub,
    "p09_events_props" -> p09EventsProps,
    "p10_events_hourly" -> p10EventsHourly,
    "p11_events_sessions" -> p11EventsSessions,
    "p12_simhash_pairs" -> p12SimhashPairs,
    "p13_cosine_neardup" -> p13CosineNearDup,
    "p14_frame_sample" -> p14FrameSample,
    "p15_asof_join" -> p15AsofJoin,
    "p16_range_join" -> p16RangeJoin,
    "p17_tfidf_topterms" -> p17TfidfTopTerms,
    "p18_bigram_top" -> p18BigramTop,
    "p19_train_val_split" -> p19TrainValSplit,
    "p20_ann_ivf" -> p20AnnIvf,
    "p21_winnow_fingerprint" -> p21WinnowFingerprint,
    "p22_langid_ngram" -> p22LangidNgram,
    "p23_curation" -> p23Curation,
    "p24_cms_counts" -> p24CmsCounts,
    "p25_pmi_collocations" -> p25PmiCollocations,
    "p26_funnel" -> p26Funnel,
    "p32_dup_clusters" -> p32DupClusters,
    "p33_knn_graph" -> p33KnnGraph,
    "p34_retention_cohorts" -> p34RetentionCohorts,
    "p35_token_counts" -> p35TokenCounts,
    "p36_incremental_dedup" -> p36IncrementalDedup,
    "p27_doc_chunking" -> p27DocChunking,
    "p28_token_shards" -> p28TokenShards,
    "p29_edit_neardup" -> p29EditNearDup,
    "p30_stratified_sample" -> p30StratifiedSample,
    "p31_repetition_score" -> p31RepetitionScore,
    "p37_span_dedup" -> p37SpanDedup,
    "p38_decontamination" -> p38Decontamination,
    "p39_inverted_index" -> p39InvertedIndex,
    "p40_hll_distinct" -> p40HllDistinct,
    "p41_cluster_reps" -> p41ClusterReps,
    "p42_ann_quantized" -> p42AnnQuantized,
    "p43_vocab_oov" -> p43VocabOov,
    "p44_bloom_prefilter" -> p44BloomPrefilter,
    "p45_diversity_score" -> p45DiversityScore,
    "p46_mixture_sample" -> p46MixtureSample,
    "p47_quantized_centroids" -> p47QuantizedCentroids,
    "p48_hist_quantiles" -> p48HistQuantiles,
    "p49_semantic_neardup" -> p49SemanticNearDup,
    "p50_interval_join_binned" -> p50IntervalJoinBinned,
    "p51_lm_fluency" -> p51LmFluency,
    "p52_containment_dedup" -> p52ContainmentDedup,
    "p53_kmeans_cells" -> p53KmeansCells,
    "p54_sliding_window" -> p54SlidingWindow,
    "p55_dup_graph_hops" -> p55DupGraphHops,
    "p56_pii_redact" -> p56PiiRedact,
  )
}
