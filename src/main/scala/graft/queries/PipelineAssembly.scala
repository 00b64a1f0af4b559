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

/** Training-set assembly: train/val splits (leakage-free), context
  * chunking, token shards, whole-doc packing, training order,
  * padding audit, novelty curve.
  *
  * Implementation module of [[Pipeline]] (mixed into the one public
  * object; members are package-private to graft.queries). Split from
  * the former monolith in round 12 with zero behavior change. */
trait PipelineAssembly extends PipelineCuration {


  /** Deterministic train/val/test split: each doc's bucket comes from the
    * portable content-independent hash of its id — 80/10/10, stable across
    * runs, engines, and cluster sizes (no RNG, no sampling drift), which
    * is what reproducible dataset curation needs. Pure map + one small
    * count shuffle. */
  private[queries] def p19TrainValSplit: Q = (s, d) => {
    val bucket = h60(col("doc_id").cast(StringType)) % 10
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
  }


  // ---- training-set assembly (chunking / packing / sampling) -------------

  // Context-window chunking: 32-token chunks every 24 tokens (8-token
  // overlap so no boundary-spanning phrase is lost to a hard cut).
  private[queries] val ChunkTokens = 32

  private[queries] val ChunkStride = 24


  /** Chunking expressions shared STRUCTURALLY by batch p27 and the
    * streaming chunker (graft.streaming.Streams.chunkStream) — the same
    * batch/stream unification contract as the quality gate. Stateless
    * explode, so it runs identically per-microbatch. */
  private[graft] def chunkRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")), lit(ChunkStride))).as("i"))
      // a start whose chunk would add no new tokens (the previous chunk
      // already reached end-of-doc) is pure duplication in a training
      // corpus: keep start i only if it is the first or extends coverage,
      // i.e. i + overlap <= n  (previous chunk ends at i + overlap - 1
      // when truncated; the kept tail chunk always reaches the last token)
      .filter(col("i") === 1 ||
        col("i") + lit(ChunkTokens - ChunkStride) <= size(col("t")))
      .select(col("doc_id"),
        ((col("i") - 1) / lit(ChunkStride)).cast(LongType).as("chunk_id"),
        concat_ws(" ", slice(col("t"), col("i"), lit(ChunkTokens)))
          .as("chunk_text"),
        size(slice(col("t"), col("i"), lit(ChunkTokens))).cast(LongType)
          .as("n_tok"))


  /** Fixed-size token chunking for context-window preparation: each doc
    * explodes into overlapping 32-token chunks on a 24-token stride. Pure
    * map-side explode — no shuffle at all; at 100 TB this is one linear
    * pass whose output partitioning inherits the input's. The trailing
    * partial chunk is kept (short tail beats silently dropped tokens in
    * a training corpus). */
  private[queries] def p27DocChunking: Q = (s, d) =>
    chunkRows(docsBalanced(s, d))


  // Token-budget sharding: ~4096 tokens per shard, 100 docs per cumsum
  // range (ranges only bound the prefix-sum fan-in, not shard size).
  private[queries] val ShardTokens = 4096L

  private[queries] val RangeDocs = 100L


  /** Token-budget sharding for training-data assembly: docs in doc_id
    * order are packed into consecutive shards of ~4096 tokens by running
    * token count (documents split at shard boundaries — the
    * boundary-splitting packing regime, where no capacity is wasted).
    * The running sum is the textbook distributed prefix sum, not a
    * single-partition global window over the corpus: per-doc counts
    * aggregate into coarse doc_id ranges, only the range table (100×
    * smaller) passes through the ordered window, and each doc's global
    * cumsum is its range offset plus an in-range window partitioned by
    * range. The single-task stage is thus reduced 100×, not eliminated —
    * at a scale where corpus/100 range rows overwhelm one task or the
    * broadcast, the same offset trick recurses on the range table for
    * another 100× per level. */
  /** (doc_id, n, cum): per-doc token counts with the GLOBAL inclusive
    * running sum in doc_id order, via the range-offset distributed
    * prefix sum described above — shared by both packing regimes (p28
    * boundary-splitting shards, p60 whole-doc packs). */
  private[graft] def docCumTokens(docs: DataFrame): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("n"))
      .withColumn("rng", floor(col("doc_id") / lit(RangeDocs)))
    val offsets = perDoc.groupBy("rng").agg(sum(col("n")).as("rn"))
      .withColumn("off", coalesce(
        sum(col("rn")).over(Window.orderBy("rng")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("rng", "off")
    perDoc.join(broadcast(offsets), "rng")
      .withColumn("cum", col("off") +
        sum(col("n")).over(Window.partitionBy("rng").orderBy("doc_id")))
      .select("doc_id", "n", "cum")
  }


  /** The p28 core over any (doc_id, text) frame — budget-parametric so
    * the property suite can exercise multi-shard packing (token
    * conservation, shard-size bounds) on small corpora. */
  private[graft] def tokenShards(docs: DataFrame,
      budget: Long = ShardTokens): DataFrame =
    docCumTokens(docs)
      .groupBy(((col("cum") - 1) / lit(budget)).cast(LongType)
        .as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))


  /** Whole-document sequence packing — the NO-SPLIT regime next to
    * p28's boundary-splitting one: each doc lands entirely in the pack
    * its starting offset falls in (`(cum−n) div budget`, i.e. greedy
    * concatenation cut at the first doc boundary at/after each budget
    * multiple). Training pipelines use this when documents must stay
    * contiguous in a sequence; the price is overflow — the straddling
    * doc's tail past the budget — reported per pack. Same distributed
    * prefix sum as p28; a pack id is absent when one huge doc straddles
    * its entire budget span. */
  private[graft] def packWholeDocs(docs: DataFrame,
      budget: Long = ShardTokens): DataFrame =
    docCumTokens(docs)
      .groupBy(((col("cum") - col("n")) / lit(budget)).cast(LongType)
        .as("pack"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        max(col("cum")).as("end_cum"))
      .withColumn("overflow_tokens",
        greatest(lit(0L), col("end_cum") - (col("pack") + 1) * lit(budget)))
      .drop("end_cum")


  private[queries] def p60PackWholeDocs: Q = (s, d) =>
    packWholeDocs(Tables.documents(s, d))


  private[queries] def p28TokenShards: Q = (s, d) =>
    tokenShards(Tables.documents(s, d))


  /** Leakage-free train/val/test split — the dedup-aware split the
    * near-dup machinery exists to enable: assigning splits by document
    * hash (p19's rule) lets near-duplicate pairs straddle train and
    * eval, which is exactly the train-test leakage Lee et al. 2022
    * measured in real corpora; splitting by near-dup CLUSTER (every doc
    * inherits its p32 component's hash bucket, singletons are their own
    * cluster) makes a straddling pair IMPOSSIBLE by construction. Both
    * methods are emitted side by side with their per-split censuses and
    * measured leaked-pair counts — 0 for the cluster split (the audit
    * proves the construction), the doc-hash baseline's count is the
    * leakage being fixed. Cost on top of the pair-graph/label
    * artifacts: one doc-keyed left join, two map-side split
    * assignments, two censuses, and two pair-keyed leak audits (the
    * pair list is the LSH-bounded artifact, never corpus²). */
  private[queries] def p98LeakageFreeSplit: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_toks"))
    val lbl = dupClusterLabels(s, d).select(col("doc_id"), col("cluster_id"))
    def splitOf(b: Column): Column =
      when(b < 8, "train").when(b === 8, "val").otherwise("test")
    def bucket(c: Column): Column =
      pmod(h60(concat(lit("split:"), c.cast(StringType))), lit(10L))
    val assigned = docs.join(lbl, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split_doc", splitOf(bucket(col("doc_id"))))
      .withColumn("split_cluster", splitOf(bucket(col("cluster_id"))))
      .staged // read 4×: two censuses + two leak audits
    val pairs = nearDupPairs(s, d).select("doc_a", "doc_b")
    def leaks(c: String): DataFrame = pairs
      .join(assigned.select(col("doc_id").as("doc_a"), col(c).as("sa")),
        "doc_a")
      .join(assigned.select(col("doc_id").as("doc_b"), col(c).as("sb")),
        "doc_b")
      .filter(col("sa") =!= col("sb"))
      .agg(count(lit(1)).as("leak_pairs"))
    def census(c: String, method: String): DataFrame = assigned
      .groupBy(col(c).as("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .crossJoin(leaks(c)) // 1-row scalar side
      .select(lit(method).as("method"), col("split"), col("n_docs"),
        col("n_tokens"), col("leak_pairs"))
    census("split_doc", "doc_hash")
      .union(census("split_cluster", "cluster_hash"))
  }


  /** Corpus novelty curve — diminishing returns of data made visible:
    * for each tenth of the corpus in arrival (doc_id) order, the
    * fraction of its docs' distinct 8-grams occurring for the FIRST
    * time (no earlier doc carries them). This is the curve every
    * data-scaling argument implicitly draws: early deciles are nearly
    * all novel, late deciles mostly repeat — a tail still showing high
    * novelty means the source is undersampled, a flat-zero tail means
    * crawl saturation, and the knee is where marginal data stops
    * paying for itself. Grams are the map-only native per-doc-distinct
    * sets (p92's expression); first occurrence is one MIN per gram —
    * the only corpus-keyed shuffle; deciles derive from a broadcast
    * 1-row max; the fraction follows p107's exact-ppm rule. */
  private[queries] def p108NoveltyCurve: Q = (s, d) => {
    val grams = docsBalanced(s, d)
      .select(col("doc_id"),
        graft.functions.ShingleIdSet.shingleIdSet(col("text"), ContamW)
          .as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), explode(col("st")).as("g"))
      .staged // read twice: the first-occurrence MIN + the decile census
    val first = grams.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    val mx = grams.agg((max(col("doc_id")) + 1).as("m"))
    grams.join(first, "g")
      .crossJoin(broadcast(mx)) // 1-row scalar side
      .withColumn("decile", expr("(doc_id * 10) div m"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_frac",
        ldiv(col("n_novel") * lit(1000000L), col("n_grams"))
          .cast(DoubleType) / lit(1000000.0))
  }


  /** Padding-efficiency audit — the measured case for length-sorted
    * batching: with fixed-size batches padded to their longest member
    * (the standard training collate), the padded-slot fraction is
    * computed under BOTH orders — arrival (doc_id) and length-sorted —
    * side by side, so the data pipeline can show (not assert) what
    * sorted bucketing saves before anyone reorders a corpus. Lengths
    * cap at the context size. Both global ranks use the p105 two-level
    * shape with no global sort: arrival buckets by doc_id range
    * (p28's rule), and the length-sorted rank buckets by the LENGTH
    * VALUE itself — at most `PadCtx` distinct buckets, so the offsets
    * table is context-size-bounded and each within-bucket window
    * orders one length class. Output: two summary rows. */
  private[graft] val PadCtx = 64L

  private[graft] val PadBatch = 8L

  private[queries] def p107PaddingAudit: Q = (s, d) => {
    val lens = Tables.documents(s, d)
      .select(col("doc_id"),
        least(size(tokens(col("text"))).cast(LongType), lit(PadCtx))
          .as("len"))
    def twoLevelRank(rng: Column): DataFrame = {
      val keyed = lens.withColumn("rng", rng)
      val offsets = keyed.groupBy("rng").agg(count(lit(1)).as("rn"))
        .withColumn("off", coalesce(
          sum(col("rn")).over(Window.orderBy("rng")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("rng", "off")
      keyed.join(broadcast(offsets), "rng")
        .withColumn("rank", col("off") +
          row_number().over(Window.partitionBy("rng")
            .orderBy("doc_id")) - 1)
    }
    def audit(ranked: DataFrame, name: String): DataFrame = ranked
      .withColumn("batch", expr(s"rank div $PadBatch"))
      .groupBy("batch")
      .agg(count(lit(1)).as("bsz"), max(col("len")).as("mx"),
        sum(col("len")).as("tok"))
      .agg(count(lit(1)).as("n_batches"),
        coalesce(sum(col("tok")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("bsz") * col("mx") - col("tok")), lit(0L))
          .as("padded_slots"))
      .select(lit(name).as("strategy"), col("n_batches"), col("n_tokens"),
        col("padded_slots"),
        // parts-per-million by exact floor division, THEN one IEEE
        // division by 1e6 — a round(x, 6) here hit an exact round-half
        // tie that Spark (HALF_UP) and DuckDB resolve differently; the
        // integer quotient cannot tie. ldiv's 2^53 envelope holds to
        // ~8e9 padded slots per run; beyond that, pre-scale the counts
        // (the fraction is scale-invariant, p81's rule)
        when(col("padded_slots") + col("n_tokens") === 0,
          lit(null).cast(DoubleType))
          .otherwise(ldiv(col("padded_slots") * lit(1000000L),
            col("padded_slots") + col("n_tokens")).cast(DoubleType)
            / lit(1000000.0)).as("waste_frac"))
    // arrival rank buckets by doc_id range; length-sorted rank buckets
    // by the length value (global order = (len, doc_id))
    audit(twoLevelRank(expr(s"doc_id div $RangeDocs")), "arrival")
      .union(audit(twoLevelRank(col("len")), "length_sorted"))
  }


  /** Deterministic training-order export — the reproducible global
    * shuffle a training run needs: every doc gets a SEEDED portable-hash
    * key, its global rank under (key, doc_id) becomes the training step,
    * and fixed-size batches fall out as step div B — the run manifest
    * that makes a data order re-creatable across reruns, engines, and
    * partitionings (rand() or zipWithIndex give neither). The global
    * rank is the two-level distributed pattern of p28's prefix sum
    * applied to ORDER rather than token mass: the uniform hash key is
    * range-bucketed by its top bits (64 ranges here; more bits at
    * scale), per-range counts cumulate in a 64-row broadcast, and each
    * doc ranks only within its range — no global sort, no
    * range-partitioned shuffle of the corpus, window state bounded by
    * range size. */
  private[graft] val OrderBatch = 64L

  private[graft] val OrderRanges = 64L

  private[queries] def p105TrainingOrder: Q = (s, d) =>
    trainingOrderOf(Tables.documents(s, d))


  /** The p105 core over any frame with a `doc_id` column — the property
    * suite feeds it repartitioned inputs to prove the order is
    * partition-independent. */
  private[graft] def trainingOrderOf(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"))
      .withColumn("hkey",
        h60(concat(lit("order:"), col("doc_id").cast(StringType))))
      .withColumn("rng", expr(s"hkey div ${(1L << 60) / OrderRanges}"))
    val offsets = keyed.groupBy("rng").agg(count(lit(1)).as("rn"))
      .withColumn("off", coalesce(
        sum(col("rn")).over(Window.orderBy("rng")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("rng", "off")
    keyed.join(broadcast(offsets), "rng")
      .withColumn("step", col("off") +
        row_number().over(Window.partitionBy("rng")
          .orderBy("hkey", "doc_id")) - 1)
      .withColumn("batch", expr(s"step div $OrderBatch"))
      .select("doc_id", "step", "batch")
  }
}
