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
object Pipeline extends QueryModule {

  // MinHash configuration: 12 hashes in 6 bands of 2 rows. P(candidate) =
  // 1-(1-j^2)^6 — misses a j=0.9 near-dup with p≈5e-5, keeps the j≈0.03
  // background at ≈0.5%, which the exact-Jaccard verify then discards.
  // Hashes are a quadratic family derived from one md5 per shingle
  // (Portable.hashFam), so extra hashes cost only integer arithmetic.
  private[graft] val NumHashes = 12
  private[graft] val BandRows = 2
  private[graft] val NumBands = NumHashes / BandRows
  private[graft] val ShingleW = 3
  private[graft] val JaccardThreshold = 0.5

  /** LSH bucket-size cap: a band bucket larger than this is dropped
    * before pair generation. Hot buckets are the one place banded LSH
    * goes quadratic — an adversarial spam cluster of m near-identical
    * docs otherwise emits m² candidate pairs. Capping bounds any
    * bucket's pair fan-out at Cap² while leaving every honest bucket
    * (orders of magnitude below the cap at any corpus size, because
    * buckets hold near-dup CLUSTERS, not random collisions) untouched.
    * The oracles apply the identical cap, so it is exact, not a fudge. */
  private val MaxBucket = 1000

  private[graft] def capBuckets(bands: DataFrame): DataFrame = {
    // The hot-bucket list is tiny (empty on honest corpora), so the cap
    // costs one map-side-combinable count plus an anti-join — NOT a
    // window over every band row, which would add a full sort-shuffle
    // per consumer (measured 2x on p02). The anti-join is deliberately
    // UN-hinted: AQE broadcasts the hot list while it is small, and on
    // the pathological corpus where it is not (millions of distinct spam
    // clusters), a hint would force the unbounded list through the
    // driver — the failure the cap exists to prevent.
    val hot = bands.groupBy("band", "bkey").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > MaxBucket)
      .select("band", "bkey")
    bands.join(hot, Seq("band", "bkey"), "left_anti")
  }

  /** Candidate pairs from a (doc_id, band, bkey) table: bucket-capped
    * keyed self-join, each unordered pair once — the single pair
    * generator shared by p02 (6×2-row bands) and p29 (2×1-row bands).
    * `materialize` checkpoints the capped bands so the self-join's two
    * sides read one materialization instead of re-running the upstream
    * band build — A/B-timed per caller (wins for p02's explode+count
    * subtree, loses for p29 whose expensive subtree is already
    * checkpointed). SQL twin: `sqlCappedCand`, appended after a `bands`
    * CTE. */
  private def candidatePairs(bands: DataFrame,
      materialize: Boolean): DataFrame = {
    val capped0 = capBuckets(bands)
    val capped = if (materialize) capped0.staged else capped0
    capped.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
      .join(capped.select(col("band"), col("bkey"), col("doc_id").as("doc_b")),
        Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  private[graft] val Stopwords = Seq("the", "a", "of", "and", "to", "in",
    "is", "on", "for", "with")

  /** Quality-gate scoring columns and thresholds, shared STRUCTURALLY by
    * the batch curation composite (p23) and the streaming quality gate
    * (graft.streaming.Streams.qualityGate) so batch and stream cannot
    * silently diverge. */
  private[graft] val QualityMinStopRatio = 0.05
  private[graft] val QualityMinTokens = 5L

  private[graft] def withQualityScores(df: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    df.withColumn("n_tokens", size(t).cast(LongType))
      .withColumn("stop_ratio",
        size(filter(t, x => x.isin(Stopwords: _*))) / size(t))
  }

  private[graft] def qualityFilter(df: DataFrame): DataFrame =
    df.filter(col("stop_ratio") >= QualityMinStopRatio &&
      col("n_tokens") >= QualityMinTokens)

  /** `documents` rebalanced across the cluster before expensive per-row
    * work. The driver-provided table is one parquet row group, so the
    * scan stage gets ONE task regardless of split size — and every
    * text-pipeline operator multiplies each row into dozens of
    * shingle/token/window rows and hashes them. Shuffling the raw docs
    * first costs bytes-of-input once and buys cores× parallelism on the
    * explode+digest work that dominates; with properly-split input (many
    * files / row groups) the exchange is still just one linear pass.
    * Applied only where A/B timing showed the map side dominates (shingle
    * explodes, per-window hashing, interpreted char-gram HOFs);
    * aggregation-bound ops (exact dedup, corpus profile) skip it — their
    * own groupBy exchange rebalances and the extra shuffle just loses. */
  private def docsBalanced(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).repartition(s.sparkContext.defaultParallelism)

  // ---- deduplication -----------------------------------------------------

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * One keyed shuffle on a 256-bit digest; map-side combine applies.
    * Reference has only sort-based whole-row dedup
    * (/root/reference/src/qp/operators/Project.java:122-296) — content-hash
    * dedup is the scale-path generalization. */
  private def p01ExactDedup: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Non-distinct w-shingle rows built with codegen'd `element_at` over
    * the exploded position index — measured ~3.5x faster than exploding
    * the interpreted `transform`+`slice` HOF array (`Portable.shingles`),
    * because every expression here stays inside whole-stage codegen.
    * Duplicate shingles within a doc are emitted; consumers must be
    * multiset-safe (min / collect_set are). */
  private def shingleRows(s: SparkSession, d: String, w: Int): DataFrame =
    shingleRowsOf(docsBalanced(s, d), w)

  /** The same shingle build over ANY (doc_id, text) DataFrame — shared
    * with the streaming decontamination gate, which feeds a document
    * STREAM through it (every expression here is stateless, so the
    * transform is streaming-legal as-is). */
  private[graft] def shingleRowsOf(docs: DataFrame, w: Int): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(when(size(col("t")) >= w,
          sequence(lit(1), size(col("t")) - (w - 1)))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until w).map(k => element_at(col("t"), col("i") + k)): _*)
        .as("shingle"))

  /** Near-dedup via banded MinHash LSH, verified with exact n-gram
    * Jaccard. Candidate pairs are formed ONLY inside an LSH band bucket —
    * a keyed self-join, never an all-pairs cross join — then exact
    * Jaccard via `array_intersect` of the carried shingle-id sets. Every
    * hash is portable (md5-based), so the DuckDB oracle reproduces the
    * identical candidate set and the identical output. */
  /** The p02 sketch table (doc_id, sig, shset, n), checkpointed.
    * Sketch stage: MAP-ONLY — scan → one native [[graft.functions
    * .MinHashSig]] projection → filter. The whole per-doc sketch (12
    * family mins + distinct 60-bit shingle ids) is computed in one pass
    * over the text bytes with no shingle rows, no hex strings, and no
    * aggregation; docs with < w tokens return NULL and are filtered,
    * matching the declarative form where they emit no shingle rows. The
    * round-7 A/B (PLANS.md) showed the shingle PRODUCER is not the
    * bottleneck — the per-row digest expressions and the 12-min/
    * collect_set ObjectHashAggregate are; this deletes both, and with
    * them the sketch's only shuffle. At 100 TB the signature build is
    * embarrassingly parallel over input splits — the plan a corpus-scale
    * dedup needs. The declarative explode+groupBy form (the DuckDB
    * oracle's literal shape) is retained below as the equivalence-spec
    * baseline (MinHashSigSpec).
    * Materialized once (the single-query analogue of writing the signature
    * table between pipeline stages): the band explode and both sides of
    * the candidate-pair join read the checkpoint, not a re-scan. The
    * blocks live until the session stops — a per-doc-row footprint, the
    * deliberate cost of not recomputing the sketch three times; a
    * long-lived service would write/read a real signature table instead
    * (which is exactly how p65 treats the existing-corpus side). */
  private[graft] def minhashSig(s: SparkSession, d: String): DataFrame =
    minhashSigOf(docsBalanced(s, d))

  /** The sketch build over any (doc_id, text) frame — the unit the
    * streaming gate's static side and the spec corpora share. Stateless
    * per-row expression, so it is streaming-legal as-is. */
  private[graft] def minhashSigOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhashSig(
          col("text"), ShingleW, NumHashes).as("ms"))
      .filter(col("ms").isNotNull)
      .select(col("doc_id"), col("ms.sig").as("sig"),
        col("ms.shset").as("shset"), col("ms.n").as("n"))
      .staged

  /** The pre-native declarative sketch (explode shingle rows → md5 hex →
    * conv the 60/40-bit halves → groupBy doc with 12 mins +
    * collect_set) — the literal shape of the DuckDB oracle SQL, kept as
    * the equivalence-test baseline (MinHashSigSpec) and the A/B
    * comparison point (MinHashSigBench). */
  private[graft] def minhashSigOfDeclarative(docs: DataFrame): DataFrame = {
    val sh = shingleRowsOf(docs, ShingleW)
      .withColumn("dg", md5(col("shingle")))
      .withColumn("h1", conv(substring(col("dg"), 1, 15), 16, 10).cast(LongType))
      .withColumn("h2", conv(substring(col("dg"), 16, 10), 16, 10).cast(LongType))
    val aggs = (0 until NumHashes).map(i =>
      min(hashFamFrom(i, col("h1"), col("h2"))).as(s"m$i")) :+
      collect_set(col("h1")).as("shset")
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"m$i")): _*).as("sig"),
        col("shset"), size(col("shset")).as("n"))
  }

  /** Band rows (carry..., band, bkey) off any frame with a `sig` array
    * column — the ONE band-key builder, shared by the batch sketch and
    * the streaming gate so their keys can never desynchronize. */
  private[graft] def bandRowsOf(sig: DataFrame,
      carry: Seq[String] = Seq("doc_id")): DataFrame =
    sig.select(carry.map(col) :+
        posexplode(transform(sequence(lit(0), lit(NumBands - 1)),
          b => concat_ws(",", transform(
            slice(col("sig"), b * BandRows + 1, lit(BandRows)),
            x => x.cast(StringType))))): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")

  private def p02MinhashNearDup: Q = (s, d) => nearDupPairs(s, d)

  /** The near-dup pair graph (doc_a, doc_b, jaccard) as a session-cached
    * artifact: built once per (session, dataset), checkpointed, and
    * consumed by every pair-graph operator (p02 itself, p32 clustering,
    * p55 hops, p88 PageRank — and through p32, p41/p82). This is the
    * production shape — at 100 TB the signature/pair tables are persisted
    * parquet side-tables written by the corpus build and read by all
    * downstream curation jobs, not recomputed per query. */
  private[graft] def nearDupPairs(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cached(s, d, "neardup_pairs") {
      graft.Artifacts.stage(s, buildNearDupPairs(s, d))
    }

  private def buildNearDupPairs(s: SparkSession, d: String): DataFrame = {
    val docs = minhashSig(s, d)
    val bands = bandRowsOf(docs)
    val cand = candidatePairs(bands, materialize = true)
    // Verify stage: exact Jaccard via array_intersect of the carried
    // shingle sets, computed only for candidate pairs; the tiny candidate
    // list broadcasts, so the corpus is never shuffled here.
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("shset").as("sa"),
        col("n").as("na")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("shset").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("ninter", size(array_intersect(col("sa"), col("sb"))))
      .select(col("doc_a"), col("doc_b"),
        (col("ninter").cast(DoubleType) /
          (col("na") + col("nb") - col("ninter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  /** SimHash document fingerprint (32-bit): per feature-hash bit
    * position, sum the ±1 votes of all features, take the sign. Features
    * are w-word shingles, not bare tokens — on a narrow vocabulary every
    * doc contains nearly every token, so token-level fingerprints
    * collapse (measured: 654 of 125k doc pairs at hamming 0), while
    * shingle-level cleanly separates the planted near-dups (hamming ≤5)
    * from background (≥6). MAP-ONLY since the native one-pass
    * [[graft.functions.SimHashFp]]: the whole fingerprint (distinct
    * features → 32 votes → sign pack) computes inside one projection —
    * no shingle rows, no distinct or aggregate shuffle, linear in corpus
    * size with no pairwise work at all. */
  private def simhashFp(s: SparkSession, d: String): DataFrame =
    docsBalanced(s, d)
      .select(col("doc_id"),
        graft.functions.SimHashFp.simhashFp(col("text"), ShingleW)
          .as("simhash"))
      .filter(col("simhash").isNotNull)

  /** The pre-native aggregate form — shingle rows → distinct features →
    * [[graft.functions.SimHashAgg]] — kept as the equivalence-test
    * baseline (SimHashFpSpec); the native one-pass [[graft.functions
    * .SimHashFp]] above deletes its distinct + aggregate shuffles, making
    * the fingerprint build map-only. */
  private[graft] def simhashFpAgg(s: SparkSession, d: String): DataFrame =
    simhashFeatures(s, d)
      .groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhashAgg(col("hv")).as("simhash"))

  /** Per-doc DISTINCT shingle-feature hashes; the dedup runs on the
    * 60-bit shingle id (collision-equivalent to deduping the strings,
    * same negligible-collision contract as p02's verify stage) so the
    * fast codegen'd shingle build can emit duplicates. Consumed by the
    * native [[graft.functions.SimHashAgg]] — 32 counter updates per
    * feature ROW, one keyed shuffle of 32-counter partials — instead of
    * the declarative features×32 explode + two keyed shuffles
    * (retained in [[simhashFpExplode]] as the A/B baseline; both forms
    * are bit-identical to the DuckDB oracle). */
  private[graft] def simhashFeatures(s: SparkSession, d: String): DataFrame =
    shingleRows(s, d, ShingleW)
      .select(col("doc_id"), h60(col("shingle")).as("hv"))
      .dropDuplicates("doc_id", "hv")

  /** The pre-SimHashAgg declarative form, kept as the A/B benchmark
    * baseline (graft.tools.SimHashBench) and cross-checked equal in
    * SimHashAggSpec. */
  private[graft] def simhashFpExplode(s: SparkSession, d: String): DataFrame =
    simhashFeatures(s, d)
      .select(col("doc_id"), col("hv"),
        explode(sequence(lit(0), lit(31))).as("j"))
      .groupBy("doc_id", "j")
      .agg(sum(expr("2 * (shiftright(hv, j) & 1) - 1")).as("s"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN s >= 0 THEN shiftleft(CAST(1 AS BIGINT), j)" +
        " ELSE CAST(0 AS BIGINT) END")).as("simhash"))

  private def p03SimhashFingerprint: Q = (s, d) => simhashFp(s, d)

  /** SimHash near-dup pairs: band the 32-bit fingerprint into 4 bytes;
    * only docs sharing a band byte are candidates, then keep pairs within
    * hamming distance 3 — the distance the 4-band pigeonhole actually
    * guarantees (any pair differing in ≤3 bits leaves at least one band
    * intact), so the output is COMPLETE at its advertised threshold.
    * Distances 4-5 would only be found when their bits happen to spare a
    * band; emitting them would be a recall lottery. Same
    * bucketed-not-all-pairs shape as the MinHash path, over a 4x smaller
    * sketch. */
  private def p12SimhashPairs: Q = (s, d) => {
    val fp = simhashFp(s, d).staged
    val bands = fp.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey", expr("shiftright(simhash, band * 8) & 255"))
    bands.select(col("band"), col("bkey"),
        col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
      .join(bands.select(col("band"), col("bkey"),
        col("doc_id").as("doc_b"), col("simhash").as("sh_b")),
        Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(IntegerType))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
  }

  // ---- similarity search -------------------------------------------------

  /** Brute-force cosine top-k: the correctness baseline for ANN. The probe
    * set (5 vectors) is broadcast against one scan of the corpus — a
    * broadcast nested loop that is linear in corpus size. Top-k is
    * two-phase: a salted local top-k bounds any reducer's input to k×salts
    * rows per probe (a single per-probe window would funnel the whole
    * corpus through one reducer per probe), then the global top-k ranks
    * the survivors — provably the same rows, so the oracle is single-phase
    * SQL. Similarity is rounded to 6 decimals BEFORE ranking so engine
    * summation-order noise (≈1e-15) can never flip an ordering. */
  private def p04AnnCosineTopk: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(vdot(col("v"), col("v"))))
    val probes = e.select(col("vec_id").as("probe_id"), col("v").as("pv"),
      col("nrm").as("pnrm")).filter(col("probe_id") < 5)
    val sims = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(vdot(col("pv"), col("v")) / (col("pnrm") * col("nrm")), 6).as("sim"))
    val local = Window.partitionBy(col("probe_id"), pmod(hash(col("vec_id")), lit(64)))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val global = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    sims.withColumn("lrnk", row_number().over(local))
      .filter(col("lrnk") <= 10)
      .withColumn("rnk", row_number().over(global))
      .filter(col("rnk") <= 10)
      .select("probe_id", "vec_id", "rnk", "sim")
  }

  /** Embedding dimensionality of the corpus (TESTDATA.md: 64-float
    * vectors at every scale factor). The random hyperplanes below are
    * declared at this width; a production build reads it from the table
    * schema once at plan time. */
  private[graft] val AnnDim = 64

  /** splitmix64 finalizer (Steele et al., public) — the deterministic
    * per-(plane, dim) coin for the hyperplane signs. Runs at PLAN time
    * only; the resulting constants are embedded in both engines. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hyperplane `plane` as Rademacher ±1 coefficients (Achlioptas 2003's
    * database-friendly projections): a full-rank random direction, unlike
    * the axis-aligned bit-sampling this family replaced — p72's monitor
    * measured the first-8-dims sign bucket at ≈0.03 mean recall@3 because
    * dense-embedding mass is spread across ALL dimensions and the first
    * few carry almost no locality. ±1 coefficients (not gaussians) keep
    * the cross-engine contract exact: each product is ±v[i] with NO
    * rounding, so both engines sum bit-identical doubles in array order
    * and the sign can never diverge. */
  private[graft] def hyperplaneSigns(plane: Int): IndexedSeq[Float] =
    (0 until AnnDim).map { j =>
      if (mix64(plane.toLong * 0x100000001B3L + j) < 0) -1f else 1f
    }

  /** Hyperplane count for the ANN sign bucket: 2^4 = 16 buckets,
    * deliberately BUDGET-MATCHED to p20's 16 IVF cells so p72's monitor
    * compares the two index families at the same candidate fraction
    * (~1/16 of the corpus per probe) instead of handing IVF a 16×
    * coverage head start — the flaw in the retired 8-bit bucket, whose
    * 256 buckets searched 0.4% of the corpus and recalled accordingly.
    * Like the IVF codebook, the width grows with the corpus (a p116-style
    * planner would pick it from the target candidate fraction); the
    * measured sweep on this corpus (PLANS.md round 11): 4-bit Charikar
    * single-bucket 0.167 recall@3 at 6.2% candidates, Hamming≤1
    * multi-probe 0.55 at 31%, vs IVF 0.833 at 6.2% — the data-dependent
    * quantizer still wins on weakly-clustered data, and now the monitor
    * proves it fairly. */
  private[graft] val AnnBits = 4

  /** Charikar (2002) random-hyperplane sign bucket of embedding column
    * `v`: bit p = sign(v · r_p) over [[hyperplaneSigns]], as a `bits`-char
    * '0'/'1' string. P(bit differs) = angle/π per hyperplane, so Hamming
    * distance between buckets estimates the angle — the property the
    * multi-probe fan-out (p104) exploits. The dot rides the codegen'd
    * [[graft.functions.VectorDot]] against a constant-folded literal
    * array: one tight fused loop per bit, same plan shape and cost as the
    * old first-k-dims bucket.
    *
    * The [[AnnDim]] contract is enforced LOUDLY: VectorDot returns NULL
    * on a length mismatch or a NULL element, and an `otherwise("0")`
    * would silently absorb that into an all-'0' bucket while the DuckDB
    * twin's `list_sum` skips NULL products and signs the partial dot —
    * an engine divergence latent until the first malformed vector. Each
    * bit instead raises on a NULL dot, so off-contract vectors fail the
    * job instead of polluting one bucket on one engine. */
  private[graft] def signBucket(v: Column, bits: Int): Column =
    concat_ws("", (0 until bits).map { p =>
      val d = vdot(v, array(hyperplaneSigns(p).map(f => lit(f)): _*))
      when(d >= 0, lit("1")).when(d < 0, lit("0"))
        .otherwise(raise_error(concat(
          lit(s"signBucket: embedding violates the $AnnDim-dim " +
            "non-null contract: "), col("vec_id").cast("string"))))
    }: _*)

  /** The DuckDB twin of [[signBucket]], generated from the SAME
    * [[hyperplaneSigns]] constants (the p89 oracle-generation rule: one
    * declared source, two engines, drift impossible). `v` must name a
    * DOUBLE list column in scope. */
  private[graft] def sqlSignBucket(v: String, bits: Int): String =
    (0 until bits).map { p =>
      val coefs = hyperplaneSigns(p)
        .map(f => if (f > 0) "1.0" else "-1.0").mkString(", ")
      s"""(CASE WHEN list_sum(list_transform(generate_series(1, $AnnDim),
         |    i -> $v[i] * list_extract([$coefs], i))) >= 0
         |    THEN '1' ELSE '0' END)""".stripMargin
    }.mkString(" || ")

  /** LSH-bucketed ANN (the scale path): bucket every vector by its
    * Charikar random-hyperplane sign pattern ([[signBucket]], [[AnnBits]]
    * seeded hyperplanes → 2^[[AnnBits]] buckets), then search ONLY within
    * the probe's bucket. Candidate generation is an equi-join on the
    * bucket key: work per probe is |corpus|/2^bits instead of |corpus|,
    * with the bit width the budget knob (see [[AnnBits]]). Deterministic
    * hyperplanes keep the DuckDB oracle exact. */
  private def p05AnnLshBucketed: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(vdot(col("v"), col("v"))))
      .withColumn("bucket", signBucket(col("v"), AnnBits))
    val probes = e.select(col("vec_id").as("probe_id"), col("v").as("pv"),
      col("nrm").as("pnrm"), col("bucket")).filter(col("probe_id") < 20)
    val sims = e.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(vdot(col("pv"), col("v")) / (col("pnrm") * col("nrm")), 6).as("sim"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("probe_id", "vec_id", "rnk", "sim")
  }

  /** IVF (inverted-file) ANN — the second scale path next to p05's LSH.
    * A small coarse-quantizer codebook is broadcast, every vector is
    * assigned to its nearest centroid in one map pass + one keyed argmax,
    * and probes search ONLY their own cell: work per probe is
    * |corpus|/|cells|, and the assignment is reusable across queries
    * (that is the IVF index). The codebook here is the first 16 vectors —
    * a deterministic stand-in for k-means centroids, which keeps the
    * DuckDB oracle bit-exact; a production build would train the codebook
    * offline and broadcast it the same way. */
  /** IVF cell assignment shared by p20 (probe search) and p33 (kNN
    * graph): every vector keyed to its nearest codebook centroid via a
    * broadcast crossJoin + per-vector argmax — one map-side pass, one
    * keyed shuffle for the argmax window. Checkpointed because both
    * consumers read it from two join sides. */
  private def ivfAssigned(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(vdot(col("v"), col("v"))))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("csim").desc, col("cent_id").asc)
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id"),
        round(vdot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 6)
          .as("csim"))
      .withColumn("arnk", row_number().over(wAssign))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id").as("cell"))
      .staged
  }

  private def p20AnnIvf: Q = (s, d) => {
    val assigned = ivfAssigned(s, d)
    val probes = assigned.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pnrm"), col("cell"))
    val sims = assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(vdot(col("pv"), col("v")) / (col("pnrm") * col("nrm")), 6).as("sim"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("probe_id", "vec_id", "rnk", "sim")
  }

  /** kNN graph over ALL vectors, IVF-bucketed: each vector's top-3
    * cosine neighbors searched only within its centroid cell — the
    * |corpus|²→Σ|cell|² candidate reduction that makes a full
    * neighbor-graph build (the input to embedding-space dedup and
    * clustering) tractable. The per-vector top-k window reads at most
    * one cell, so no reducer ever sees more than a cell's worth of
    * candidates; finer codebooks shrink cells as the corpus grows. */
  private def p33KnnGraph: Q = (s, d) => {
    val assigned = ivfAssigned(s, d)
    val sims = assigned.join(
        assigned.select(col("cell"), col("vec_id").as("nbr_id"),
          col("v").as("nv"), col("nrm").as("nnrm")), Seq("cell"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        round(vdot(col("v"), col("nv")) / (col("nrm") * col("nnrm")), 6)
          .as("sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("nbr_id").asc)
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("vec_id", "nbr_id", "rnk", "sim")
  }

  /** Embedding-cosine near-dup pairs, LSH-bucketed: vectors are bucketed
    * by their 4-bit Charikar sign pattern ([[signBucket]], 16 buckets)
    * and only same-bucket pairs are compared — |corpus|²/16 instead of
    * all pairs, and narrower buckets (more sign bits) shrink the work
    * further at larger scale. */
  private def p13CosineNearDup: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(vdot(col("v"), col("v"))))
      .withColumn("bucket", signBucket(col("v"), 4))
    e.select(col("bucket"), col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na"))
      .join(e.select(col("bucket"), col("vec_id").as("vec_b"),
        col("v").as("vb"), col("nrm").as("nb")), Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", round(vdot(col("va"), col("vb")) /
        (col("na") * col("nb")), 6))
      .filter(col("sim") >= 0.40)
      .select("vec_a", "vec_b", "sim")
  }

  // ---- text analysis -----------------------------------------------------

  /** Per-document text metrics: token counts, type/token ratio, mean token
    * length, stopword ratio, a linear quality score, a stopword-based
    * language-ID heuristic, and an md5 content fingerprint. Pure per-row
    * map after the coarse-input rebalance (see docsBalanced) — no keyed
    * shuffle at any scale. All ratios are single divisions of exact
    * integers, so they are bit-identical across engines. */
  private def p06TextStats: Q = (s, d) => {
    val t = tokens(col("text"))
    docsBalanced(s, d).select(
      col("doc_id"),
      size(t).cast(LongType).as("n_tokens"),
      // BPE-ish sub-word count: letter runs, digit runs, other glyphs —
      // the usual pre-tokenizer regex (identical under Java and RE2)
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast(LongType)
        .as("n_regex_tokens"),
      size(array_distinct(t)).cast(LongType).as("n_uniq"),
      (size(array_distinct(t)) / size(t)).as("uniq_ratio"),
      (aggregate(t, lit(0), (a, x) => a + length(x)) / size(t)).as("avg_tok_len"),
      (size(filter(t, x => x.isin(Stopwords: _*))) / size(t)).as("stop_ratio"),
      md5(col("text")).as("fingerprint"))
      .withColumn("quality",
        round((col("stop_ratio") + col("uniq_ratio")) / 2, 6))
      .withColumn("lang_pred",
        when(col("stop_ratio") >= 0.05, lit("en")).otherwise(lit("unk")))
  }

  /** Corpus profile per (lang, source): doc counts, mean chars, total
    * tokens. One keyed shuffle with map-side combine; means are exact
    * integer sums divided once. */
  private def p07LangProfile: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_chars")) / count(lit(1))).as("avg_chars"),
        sum(size(tokens(col("text")))).cast(LongType).as("total_tokens"))

  /** TF-IDF top terms per document. tf and df are exact integer counts
    * (two keyed shuffles with map-side combine); the corpus size joins in
    * as a broadcast scalar; scores are rounded to 4 decimals before the
    * per-doc top-3 ranking so a last-ULP ln() difference between engines
    * can never flip an order. */
  private def p17TfidfTopTerms: Q = (s, d) => {
    val terms = docsBalanced(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") *
        log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= 3)
      .select("doc_id", "rnk", "term", "score")
  }

  /** Top-25 bigrams by DOCUMENT frequency (shingles are per-doc distinct,
    * so `n` counts documents containing the bigram, not raw occurrences —
    * the usual collocation-mining statistic). One counting shuffle with
    * map-side combine, then the same two-phase top-k as the ANN path
    * (salted local rank bounds any reducer before the global rank);
    * deterministic tie-break on the bigram itself. */
  private def p18BigramTop: Q = (s, d) => {
    val counted = docsBalanced(s, d)
      .select(explode(shingles(tokens(col("text")), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
    val local = Window.partitionBy(pmod(hash(col("bigram")), lit(64)))
      .orderBy(col("n").desc, col("bigram").asc)
    val global = Window.partitionBy(lit(1))
      .orderBy(col("n").desc, col("bigram").asc)
    counted
      .withColumn("lrnk", row_number().over(local)).filter(col("lrnk") <= 25)
      .withColumn("rnk", row_number().over(global).cast(IntegerType))
      .filter(col("rnk") <= 25)
      .select("rnk", "bigram", "n")
  }

  /** Rolling-window document fingerprint (winnowing-style k-min sketch):
    * hash every 8-character sliding window of the text and keep each
    * document's 4 smallest window hashes. Two near-identical documents
    * share most windows, so their sketches collide on most slots — the
    * classic plagiarism/near-dup fingerprint (winnowing), with the k-min
    * selection standing in for per-stride minima. Pure map (the window
    * explode) + one keyed top-k per doc; rows scale with text bytes,
    * never with doc pairs. */
  private def p21WinnowFingerprint: Q = (s, d) => {
    val W = 8
    val wins = docsBalanced(s, d)
      .select(col("doc_id"), col("text"),
        explode(when(length(col("text")) >= W,
          sequence(lit(1), length(col("text")) - (W - 1)))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), h60(expr(s"substr(text, i, $W)")).as("whash"))
      .distinct()
    val w = Window.partitionBy("doc_id").orderBy(col("whash").asc)
    wins.withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= 4)
      .select("doc_id", "rnk", "whash")
  }

  private val EnBigrams = Seq("th", "he", "in", "er", "an",
    "re", "on", "at", "en", "nd")
  private val FrBigrams = Seq("le", "de", "es", "en", "on",
    "nt", "qu", "ou", "ai", "eu")

  /** Character-n-gram language ID: score each document's distinct char
    * bigrams against per-language profile sets (the classic Cavnar–Trenkle
    * n-gram profile method, reduced to two tiny profiles) and predict the
    * higher-scoring language. Pure per-row map after the coarse-input
    * rebalance — profiles are literals baked into the expression, so this
    * is one pass at any scale. */
  private def p22LangidNgram: Q = (s, d) => {
    val grams = expr("array_distinct(transform(" +
      "sequence(1, greatest(length(text) - 1, 1)), i -> substr(text, i, 2)))")
    def hits(profile: Seq[String]) =
      size(array_intersect(col("grams"), array(profile.map(lit): _*)))
        .cast(LongType)
    docsBalanced(s, d)
      .withColumn("grams", grams)
      .select(col("doc_id"), col("lang"),
        hits(EnBigrams).as("en_hits"), hits(FrBigrams).as("fr_hits"))
      .withColumn("pred",
        when(col("en_hits") >= col("fr_hits"), lit("en")).otherwise(lit("fr")))
  }

  // ---- multimodal columns ------------------------------------------------

  /** Multimodal binary-column plumbing with a deterministic fake "decode":
    * payload = utf-8 bytes of the text stand in for an opaque media blob
    * (the real image/audio decoder is environment-dependent; the Spark
    * plumbing — binary column, byte slicing, digesting, fixed-size frame
    * math — is the part that must be real and scale). Pure map.
    * NOTE (here and p14): Spark slices BYTES of the payload; DuckDB 1.0
    * has no blob substr, so the oracle slices CHARACTERS of the text —
    * equivalent only while the corpus is ASCII (it is; a multibyte
    * corpus would need a byte-precise oracle). */
  private def p08MultimodalStub: Q = (s, d) => {
    val payload = encode(col("text"), "UTF-8")
    Tables.documents(s, d).select(
      col("doc_id"),
      length(payload).cast(LongType).as("byte_len"),
      lower(hex(substring(payload, 1, 4))).as("magic"),
      md5(payload).as("digest"),
      ceil(length(payload) / lit(16.0)).as("n_frames"))
  }

  /** Frame sampling over the opaque payload: slice the binary into fixed
    * 16-byte frames and feature-extract each (digest + length stand in
    * for the environment-dependent decoder). The explode is a pure map —
    * rows scale with payload bytes, never with doc pairs — which is the
    * shape a video/audio frame pipeline needs at 100 TB. */
  private def p14FrameSample: Q = (s, d) => {
    val payload = encode(col("text"), "UTF-8")
    // Empty-payload guard: sequence(0, -1) would count DOWN in Spark
    // (unlike DuckDB's empty generate_series) and emit phantom frames.
    val frames = when(length(payload) > 0,
      transform(
        sequence(lit(0), ceil(length(payload) / lit(16.0)).cast(IntegerType) - 1),
        k => payload.substr(k * 16 + 1, lit(16))))
      .otherwise(array().cast("array<binary>"))
    docsBalanced(s, d)
      .select(col("doc_id"), posexplode(frames))
      .select(col("doc_id"), col("pos").cast(IntegerType).as("frame_idx"),
        md5(col("col")).as("frame_md5"),
        length(col("col")).cast(IntegerType).as("frame_len"))
  }

  /** REAL bytes through the multimodal path: each document's payload is
    * a VALID 8-bit-PCM WAV — "RIFF" magic, little-endian chunk sizes, a
    * 16-byte fmt block whose sample rate varies per doc, a "data" chunk
    * of the text's utf-8 bytes — built and then PARSED BACK entirely
    * with binary expressions (byte slicing + hex + base-16 conv for the
    * LE integers; nothing text-typed touches the payload between build
    * and parse). The PCM section then rides the mapPartitions decode
    * plumbing ([[graft.operators.MultimodalDecode]]), whose per-frame
    * mean-sample output the oracle reproduces from hex pairs. This is
    * the upgrade of p08/p14's utf-8 stand-in to actual non-text bytes:
    * LE header fields round-trip through the byte encoding, so a
    * byte-order or off-by-one bug anywhere in the binary path flips the
    * hash. Build and parse are one map; the only shuffle is the keyed
    * header↔frames join. */
  // ---- binary-format helpers shared by p58 (WAV) and p61 (BMP) ----------

  /** Little-endian n-byte encoding of a non-negative int column. */
  private def le(v: Column, nBytes: Int): Column = {
    val h = lpad(hex(v), nBytes * 2, "0")
    unhex(concat((0 until nBytes).map(i =>
      substring(h, (nBytes - 1 - i) * 2 + 1, 2)): _*))
  }

  private def tag(t: String): Column = encode(lit(t), "UTF-8")

  /** Parse a little-endian int from `payload` at a 1-based byte offset:
    * hex pairs reassembled most-significant first. */
  private def leInt(payload: Column, startByte: Int, nBytes: Int): Column = {
    val h = hex(substring(payload, startByte, nBytes))
    conv(concat((0 until nBytes).reverse.map(i =>
      substring(h, i * 2 + 1, 2)): _*), 16, 10).cast(IntegerType)
  }

  /** doc_id + a VALID mono 8-bit PCM WAV payload per document: RIFF/fmt/
    * data chunks with little-endian fields, samples = the text's UTF-8
    * bytes, sample rate varying per doc. Shared by p58 (expression-level
    * header parse-back) and p69 (real decode via javax.sound.sampled). */
  private def wavPayloads(s: SparkSession, d: String): DataFrame = {
    val data = encode(col("text"), "UTF-8")
    val len = length(data)
    val rate = (lit(8000) + pmod(col("doc_id"), lit(3)) * 4000)
      .cast(IntegerType)
    docsBalanced(s, d).select(col("doc_id"),
      concat(tag("RIFF"), le(len + 36, 4), tag("WAVE"),
        tag("fmt "), le(lit(16), 4), le(lit(1), 2), le(lit(1), 2),
        le(rate, 4), le(rate, 4), le(lit(1), 2), le(lit(8), 2),
        tag("data"), le(len, 4), data).as("payload"))
  }

  private def p58WavRealBytes: Q = (s, d) => {
    val wav = wavPayloads(s, d)
    // parse the header back from the opaque bytes
    val parsed = wav.select(col("doc_id"), col("payload"),
      lower(hex(substring(col("payload"), 1, 4))).as("riff_hex"),
      lower(hex(substring(col("payload"), 9, 4))).as("wave_hex"),
      leInt(col("payload"), 25, 4).as("sample_rate"),
      leInt(col("payload"), 41, 4).as("data_len"))
    val frames = graft.operators.MultimodalDecode.decodeFrames(
      parsed.select(col("doc_id"),
        col("payload").substr(lit(45), col("data_len")).as("payload")))
      .toDF()
    parsed.select("doc_id", "riff_hex", "wave_hex", "sample_rate", "data_len")
      .join(frames.select(col("doc_id"), col("frame_idx"), col("luma")),
        "doc_id")
      .select(col("doc_id"), col("frame_idx").cast(IntegerType).as("frame_idx"),
        col("riff_hex"), col("wave_hex"), col("sample_rate"), col("data_len"),
        least(lit(16), col("data_len") - col("frame_idx") * 16)
          .cast(IntegerType).as("frame_len"),
        round(col("luma"), 6).as("mean_sample"))
  }

  /** REAL bytes, 2D edition: each document's payload is a VALID 24-bit
    * uncompressed BMP — "BM" magic, 54-byte header with LE32 dims,
    * pixel rows stored BOTTOM-UP and padded to 4-byte stride — built
    * and parsed back entirely with binary expressions. Where p58's WAV
    * exercised 1D little-endian header fields, this exercises the 2D
    * plumbing a real image pipeline needs: computed row offsets off the
    * parsed data-offset, stride = rowBytes rounded up to 4, the
    * bottom-up row flip, and per-row means that must EXCLUDE the
    * padding bytes. Width/height vary per doc so no constant folding
    * can fake the parse. Build + parse + row explode are one map; no
    * shuffle at all. */
  /** doc_id + a VALID 24-bit uncompressed BMP payload per document —
    * "BM" magic, 54-byte header with LE32 dims, pixel rows bottom-up and
    * stride-padded; pixel bytes from the text's UTF-8 hex. Dimensions
    * vary per doc so no constant folding can fake a parse. Shared by p61
    * (expression-level parse-back) and p68 (real decode via ImageIO). */
  private def bmpPayloads(s: SparkSession, d: String): DataFrame = {
    val w = (lit(4) + pmod(col("doc_id"), lit(3))).cast(IntegerType)
    val h = (lit(2) + pmod(col("doc_id"), lit(2))).cast(IntegerType)
    val rowBytes = w * 3
    val stride = ((rowBytes + 3) / 4).cast(IntegerType) * 4
    def repeatCol(s: Column, n: Column) = call_function("repeat", s, n)
    val padHex = repeatCol(lit("00"), stride - rowBytes)
    // pixel bytes: the text's utf-8 hex, truncated/zero-padded to
    // exactly height*rowBytes bytes (deterministic, oracle-computable)
    val needHex = (h * rowBytes) * 2
    val hx = lower(hex(encode(col("text"), "UTF-8")))
    val pixHex = concat(hx.substr(lit(1), needHex),
      repeatCol(lit("0"), greatest(lit(0), needHex - length(hx))))
    // file rows bottom-up: file row r holds image row h-1-r, plus stride
    // padding; binary-concat-folded into the pixel array
    val fileRows = transform(sequence(lit(0), h - 1), r =>
      unhex(concat(
        pixHex.substr((h - 1 - r) * rowBytes * 2 + 1, rowBytes * 2),
        padHex)))
    val pixData = aggregate(fileRows,
      lit(Array.emptyByteArray), (acc, x) => concat(acc, x))
    docsBalanced(s, d).select(col("doc_id"),
      concat(tag("BM"), le(lit(54) + h * stride, 4), le(lit(0), 4),
        le(lit(54), 4),
        le(lit(40), 4), le(w, 4), le(h, 4), le(lit(1), 2), le(lit(24), 2),
        le(lit(0), 4), le(h * stride, 4), le(lit(2835), 4), le(lit(2835), 4),
        le(lit(0), 4), le(lit(0), 4), pixData).as("payload"))
  }

  private def p61BmpRealBytes: Q = (s, d) => {
    val bmp = bmpPayloads(s, d)
    // parse back from the opaque bytes only
    val p = col("payload")
    val parsed = bmp.select(col("doc_id"), p,
      lower(hex(substring(p, 1, 2))).as("magic"),
      leInt(p, 11, 4).as("data_off"),
      leInt(p, 19, 4).as("width"),
      leInt(p, 23, 4).as("height"),
      leInt(p, 29, 2).as("bpp"))
    val rb = col("width") * 3
    val st = ((rb + 3) / 4).cast(IntegerType) * 4
    val rows = parsed
      .select(col("doc_id"), p, col("magic"), col("data_off"),
        col("width"), col("height"), col("bpp"),
        explode(sequence(lit(0), col("height") - 1)).as("file_row"))
      .withColumn("img_row", col("height") - 1 - col("file_row"))
      .withColumn("rowhex", lower(hex(
        p.substr(col("data_off") + col("file_row") * st + 1, rb))))
    val byteVals = transform(sequence(lit(0), rb - 1), j =>
      conv(col("rowhex").substr(j * 2 + 1, lit(2)), 16, 10)
        .cast(LongType))
    rows.select(col("doc_id"), col("img_row"), col("magic"),
      col("width"), col("height"), col("bpp"),
      round(aggregate(byteVals, lit(0L), (a, v) => a + v)
        .cast(DoubleType) / rb, 6).as("row_mean"))
  }

  /** REAL image decode: the valid BMPs of [[bmpPayloads]] go through the
    * JDK's `javax.imageio.ImageIO` ([[graft.operators.MultimodalDecode
    * .decodeImages]]) — an actual registered codec walks the header,
    * stride and bottom-up row order, and the decoded channel bytes are
    * averaged. The oracle recomputes width/height/mean straight from the
    * text's hex, so a decoder-plumbing bug (stride, row flip, channel
    * order, padding leaking into the mean) flips the hash. One map-side
    * decode per partition; no shuffle. */
  private def p68BmpImageioDecode: Q = (s, d) =>
    graft.operators.MultimodalDecode.decodeImages(bmpPayloads(s, d))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_pixel"), 6).as("mean_pixel"))

  /** REAL decode + resize: the valid BMPs of [[bmpPayloads]] decode
    * through ImageIO and then resample to a fixed 2×2 grid by
    * nearest-neighbor index arithmetic ([[graft.operators
    * .MultimodalDecode.resizeImages]]) — the thumbnail/normalization
    * stage of an image pipeline, exercised through a REAL codec. The
    * oracle recomputes each sampled source pixel straight from the
    * text's hex, so an off-by-one in the resample index math, a
    * stride/row-flip bug, or padding leaking into a sampled pixel flips
    * the hash. Map-side decode, rows = docs×4; no shuffle. */
  private def p86ImageResize: Q = (s, d) =>
    graft.operators.MultimodalDecode.resizeImages(bmpPayloads(s, d), 2, 2)
      .toDF()
      .select(col("doc_id"), col("ty"), col("tx"),
        round(col("px_mean"), 6).as("px_mean"))

  /** REAL audio decode: the valid WAVs of [[wavPayloads]] go through the
    * JDK's `javax.sound.sampled.AudioSystem` ([[graft.operators
    * .MultimodalDecode.decodeAudio]]); sample rate / channels / bit
    * depth come from the decoder's AudioFormat — not re-parsed from the
    * bytes — and the mean over the drained PCM samples must equal the
    * mean the oracle computes from the text's bytes directly. */
  private def p69WavAudioDecode: Q = (s, d) =>
    graft.operators.MultimodalDecode.decodeAudio(wavPayloads(s, d))
      .toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("bits"), col("n_samples"),
        round(col("mean_sample"), 6).as("mean_sample"))

  /** Deterministic train/val/test split: each doc's bucket comes from the
    * portable content-independent hash of its id — 80/10/10, stable across
    * runs, engines, and cluster sizes (no RNG, no sampling drift), which
    * is what reproducible dataset curation needs. Pure map + one small
    * count shuffle. */
  private def p19TrainValSplit: Q = (s, d) => {
    val bucket = h60(col("doc_id").cast(StringType)) % 10
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** End-to-end curation composite — the whole "make a training set"
    * path as ONE declarative query: exact-dedup (keep the smallest doc_id
    * per content hash), then score quality and language-gate the
    * survivors, emitting the curated manifest. Dedup runs FIRST so the
    * expensive tokenize/score work and the duplicate rows themselves
    * never ride past the exchange — on a dedup-heavy corpus (the use
    * case) only unique survivors are scored. One keyed shuffle total (the
    * dedup window's, which also lands the scoring map on balanced
    * partitions, so no docsBalanced here); filters and dedup commute
    * because duplicates share text and therefore scores. */
  private def p23Curation: Q = (s, d) => {
    val w = Window.partitionBy(md5(col("text")))
    val survivors = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
    val t = tokens(col("text"))
    qualityFilter(
      withQualityScores(survivors)
        .withColumn("uniq_ratio", size(array_distinct(t)) / size(t))
        .withColumn("quality",
          round((col("stop_ratio") + col("uniq_ratio")) / 2, 6)))
      .filter(col("quality") >= 0.3)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
  }

  /** PMI collocation mining: pointwise mutual information of adjacent
    * word pairs, ln((c12/B) / ((c1/T)(c2/T))) over OCCURRENCE counts
    * (unigram total T, bigram total B) — the classic "which word pairs
    * co-occur far above chance" statistic. Three counting shuffles with
    * map-side combine plus two broadcast scalar totals; scores are
    * rounded to 4 decimals before ranking so a last-ULP ln() difference
    * can never flip an order, and the top-k uses the same salted
    * two-phase pattern as p18. */
  private def p25PmiCollocations: Q = (s, d) => {
    val toks = docsBalanced(s, d).select(explode(tokens(col("text"))).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    // totals come from the tiny aggregated sides (like bTot below), never
    // a second explode pass over the corpus
    val tTot = uni.agg(sum(col("c")).as("t_total"))
    val bi = shingleRows(s, d, 2)
      .groupBy(col("shingle").as("bigram")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val bTot = bi.agg(sum(col("c12")).as("b_total"))
    val scored = bi.filter(col("c12") >= 5)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(bTot))
      .withColumn("pmi", round(log(
        (col("c12").cast(DoubleType) * col("t_total") * col("t_total")) /
          (col("b_total").cast(DoubleType) * col("c1") * col("c2"))), 4))
    val local = Window.partitionBy(pmod(hash(col("bigram")), lit(64)))
      .orderBy(col("pmi").desc, col("bigram").asc)
    val global = Window.partitionBy(lit(1))
      .orderBy(col("pmi").desc, col("bigram").asc)
    scored
      .withColumn("lrnk", row_number().over(local)).filter(col("lrnk") <= 15)
      .withColumn("rnk", row_number().over(global).cast(IntegerType))
      .filter(col("rnk") <= 15)
      .select("rnk", "bigram", "c12", "pmi")
  }

  private val CmsDepth = 4
  private val CmsWidth = 8192
  private val CmsProbes = Seq("the", "a", "of", "and", "to")

  /** Count–Min Sketch term frequencies — the bounded-memory answer to
    * token counting at 100 TB: the sketch table is AT MOST depth×width
    * (4×8192) rows no matter the corpus vocabulary, versus an exact
    * count's shuffle sized by distinct terms. Composed from counting
    * primitives (depth hash rows per term → keyed count), so it stays
    * portable: the same md5-derived buckets make the DuckDB oracle
    * reproduce every counter exactly. Probe estimates take the min over
    * depth counters and are compared against exact counts in the output
    * (CMS never undercounts: est >= exact always). */
  private def p24CmsCounts: Q = (s, d) => {
    def bucket(j: Column, term: Column): Column =
      h60Seeded(j, term) % CmsWidth
    val terms = docsBalanced(s, d)
      .select(explode(tokens(col("text"))).as("term"))
    val cms = terms
      .select(col("term"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
      .select(col("j"), bucket(col("j"), col("term")).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("n"))
    val probeRows = CmsProbes.flatMap(t => (0 until CmsDepth).map(j => (t, j)))
    import s.implicits._
    val pb = probeRows.toDF("term", "j")
      .withColumn("bucket", bucket(col("j"), col("term")))
    val est = pb.join(cms, Seq("j", "bucket"), "left")
      .groupBy("term").agg(min(coalesce(col("n"), lit(0L))).as("est_count"))
    val exact = terms.filter(col("term").isin(CmsProbes: _*))
      .groupBy("term").agg(count(lit(1)).as("exact_count"))
    est.join(exact, Seq("term"), "left")
      .select(col("term"), col("est_count"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"))
  }

  // ---- event analytics (JSON props, time windows, sessions) --------------

  /** Typed extraction from a JSON props column + per-type aggregates.
    * `get_json_object` is a codegen'd expression; the aggregate is one
    * keyed shuffle on a low-cardinality key with map-side combine. */
  private def p09EventsProps: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        dsum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Tumbling 1-hour event-time windows (batch analogue of the streaming
    * windowed aggregation): truncate-then-group is one keyed shuffle and
    * AQE-coalescible; the hour is emitted as a string so both engines
    * agree on type and format. */
  private def p10EventsHourly: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  /** Sessionization: per user, a new session starts after a >10-minute
    * gap. lag + running sum over a (user_id, ts) window — one shuffle
    * keyed on user_id, each partition processed independently, which is
    * exactly how it scales to 10^9 users. Timestamps are compared and
    * emitted in exact epoch microseconds. */
  private def p11EventsSessions: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 600000000L, 1).otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(w))
      .groupBy("user_id", "sess")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
  }

  /** As-of join: each click matched to the latest prior-or-equal purchase
    * of the same user. Spark has no ASOF JOIN operator; the scalable
    * composition is a tagged union + ignore-nulls running `last` over a
    * (user, time)-ordered window — ONE shuffle on user_id and a linear
    * state-free pass per partition, instead of the range-join's
    * candidate-interval explosion. DuckDB's native ASOF LEFT JOIN is the
    * oracle. */
  private def p15AsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
    // purchases keep their event_id so the window order below is TOTAL —
    // two purchases in the same microsecond would otherwise tie and make
    // last(p) pick a shuffle-dependent winner.
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"), col("event_id"),
        struct(col("ts_us").as("p_ts_us"), col("value").as("p_value")).as("p"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(1).as("tag"), col("event_id"),
        lit(null).cast("struct<p_ts_us:bigint,p_value:double>").as("p"))
    // purchase sorts before click at equal ts (tag 0 < 1) → "prior or equal"
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("lastp", last(col("p"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("lastp.p_ts_us").as("p_ts_us"), col("lastp.p_value").as("p_value"))
  }

  /** Range join: for each purchase, count the same user's events inside
    * the following 10 minutes. Planned as an equi-join on user_id with
    * the time range as a post-filter — candidates are bounded per user
    * key, so this shuffles each side once and never builds the
    * interval-overlap cross product a naive range join would. */
  private def p16RangeJoin: Q = (s, d) => {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts_us").as("p_ts"))
    purchases
      .join(ev.select(col("user_id"), col("ts_us")), "user_id")
      .filter(col("ts_us") >= col("p_ts") &&
        col("ts_us") <= col("p_ts") + lit(600000000L))
      .groupBy("p_event_id")
      .agg(count(lit(1)).as("n_follow"))
  }

  /** Conversion funnel: of users whose first click exists, how many made
    * a purchase within 30 minutes of it. Two keyed shuffles on user_id
    * (first-click agg, then purchase match) and a single global roll-up
    * row — per-user work is independent, so the shape holds at any user
    * count. */
  private def p26Funnel: Q = (s, d) => {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min(col("ts_us")).as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"))
    firstClick.join(purchases, Seq("user_id"), "left_outer")
      .withColumn("hit",
        when(col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + lit(1800000000L), 1).otherwise(0))
      .groupBy("user_id").agg(max(col("hit")).as("converted"))
      .agg(
        count(lit(1)).as("n_clickers"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast(DoubleType) / col("n_clickers"), 4))
  }

  // ---- training-set assembly (chunking / packing / sampling) -------------

  // Context-window chunking: 32-token chunks every 24 tokens (8-token
  // overlap so no boundary-spanning phrase is lost to a hard cut).
  private val ChunkTokens = 32
  private val ChunkStride = 24

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
  private def p27DocChunking: Q = (s, d) =>
    chunkRows(docsBalanced(s, d))

  // Token-budget sharding: ~4096 tokens per shard, 100 docs per cumsum
  // range (ranges only bound the prefix-sum fan-in, not shard size).
  private val ShardTokens = 4096L
  private val RangeDocs = 100L

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

  private def p60PackWholeDocs: Q = (s, d) =>
    packWholeDocs(Tables.documents(s, d))

  private def p28TokenShards: Q = (s, d) =>
    tokenShards(Tables.documents(s, d))

  // Edit-distance near-dup: 2 one-row MinHash bands for candidates
  // (P(candidate) = 1-(1-j)^2 — a j=0.9 pair missed with p=1%), then a
  // length prefilter before the Levenshtein verify at relative distance
  // ≤ 0.2 — measured bimodal on the corpus: near-dups ≤0.1, background
  // ≥0.6. The prefilter reuses the SAME bound: edit distance ≥ |len_a −
  // len_b|, so any pair the final filter could accept has a length gap
  // ≤ 0.2·max — an O(1) test that skips the O(d·n) DP for pairs that
  // are provably rejectable, with bit-identical output.
  private val EditRelThreshold = 0.2

  /** Near-dedup verified by exact edit distance — the character-level
    * complement of p02's token-set Jaccard (catches heavy in-place
    * rewording that preserves few shingles yet small char edits).
    * Candidates come ONLY from shared MinHash band buckets, never
    * all-pairs; the O(len²) Levenshtein DP runs solely on
    * length-compatible candidates, and the tiny candidate list broadcasts
    * against the corpus so no text ever shuffles. */
  private def p29EditNearDup: Q = (s, d) => {
    // 2-member sketch off the native one-pass MinHashSig (round-10:
    // map-only, replacing the shingle explode + 2-min groupBy shuffle).
    // Checkpointed like p02's signature table: both sides of the band
    // self-join read the materialized mins, not a re-run of the shingle
    // sketch (2 longs per doc — negligible footprint at any scale).
    val sig = docsBalanced(s, d)
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhashSig(col("text"), ShingleW, 2)
          .as("ms"))
      .filter(col("ms").isNotNull)
      .select(col("doc_id"), col("ms.sig").getItem(0).as("b0"),
        col("ms.sig").getItem(1).as("b1"))
      .staged
    // not materialized (unlike p02's band table): A/B-timed slower here —
    // the sig checkpoint above already truncates the expensive subtree,
    // and a second materialization barrier just serializes the stages.
    val cand = candidatePairs(sig.selectExpr("doc_id",
      "stack(2, 0, b0, 1, b1) AS (band, bkey)"), materialize = false)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
      col("n_chars"))
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta"),
        col("n_chars").as("la")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb"),
        col("n_chars").as("lb")), "doc_b")
      .withColumn("mx", greatest(col("la"), col("lb")))
      .filter(abs(col("la") - col("lb")) <= lit(EditRelThreshold) * col("mx"))
      // Threshold-banded DP (Ukkonen): O(d·n) per pair instead of O(n²),
      // with early exit (-1) the moment a pair provably exceeds the
      // acceptance bound. dist is an integer, so the floor'd threshold
      // keeps exactly the pairs the oracle's `lev <= 0.2*mx` keeps, with
      // identical distances — measured ~5x faster than the full DP on
      // the sf0.1 candidate set.
      .withColumn("dist",
        expr(s"levenshtein(ta, tb, CAST($EditRelThreshold * mx AS INT))")
          .cast(LongType))
      .filter(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"), col("dist"),
        round(col("dist") / col("mx"), 6).as("rel_dist"))
  }

  private val StratumSampleK = 5

  /** Deterministic stratified sampling: the k=5 smallest portable text
    * hashes per (lang, source) stratum — a reproducible uniform draw
    * (md5 is uniform on text) that guarantees every stratum is
    * represented, where p19's global hash split samples proportionally.
    * Two-phase like every top-k in this file (p04/p18): a salted local
    * rank prunes each stratum to salts×k rows before the final stratum
    * window, so a stratum holding most of the corpus (one dominant
    * (lang, source) is the norm in crawl data) never funnels its full
    * volume through a single reducer. The final rank over the pruned
    * rows is the global answer because each salt cell keeps its own
    * k smallest — a stratum winner must be a salt-cell winner. */
  private def p30StratifiedSample: Q = (s, d) => {
    val salts = 32
    val hv = h60(col("text"))
    val wLocal = Window.partitionBy(col("lang"), col("source"), col("salt"))
      .orderBy(col("hv"), col("doc_id"))
    val wFinal = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("hv"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("hv", hv)
      .withColumn("salt", pmod(col("doc_id"), lit(salts.toLong)))
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= StratumSampleK)
      .withColumn("rk", row_number().over(wFinal))
      .filter(col("rk") <= StratumSampleK)
      .select(col("doc_id"), col("lang"), col("source"), col("rk"))
  }

  /** Repetition / boilerplate quality signals (the Gopher-style
    * repetition filters): per-doc distinct-token ratio, top-token
    * dominance, and duplicate-bigram fraction. Two counting aggregations
    * keyed on doc_id (token-level and bigram-level) joined back — every
    * stage is a map-side-combinable groupBy; nothing pairwise, nothing
    * driver-side. */
  private def p31RepetitionScore: Q = (s, d) => {
    val tc = docsBalanced(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val uni = tc.groupBy("doc_id").agg(
      sum(col("c")).as("n"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_cnt"))
    val bi = shingleRows(s, d, 2).groupBy("doc_id").agg(
      count(lit(1)).as("n_bi"),
      countDistinct(col("shingle")).as("n_bi_d"))
    // LEFT join: a 1-token doc has no bigram rows at all, but a
    // repetition filter must still score it (dup_bigram_frac = 0)
    // rather than silently drop it from the output.
    uni.join(bi, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n").as("n_tokens"),
        round(col("n_distinct") / col("n"), 6).as("distinct_ratio"),
        round(col("top_cnt") / col("n"), 6).as("top_token_frac"),
        when(coalesce(col("n_bi"), lit(0L)) > 0,
          round(lit(1.0) - col("n_bi_d") / col("n_bi"), 6))
          .otherwise(0.0).as("dup_bigram_frac"))
  }

  /** Duplicate-cluster resolution: connected components over the p02
    * near-dup pair graph via min-label propagation — the step that turns
    * pairwise matches into per-doc keep/drop decisions (cluster id = the
    * smallest doc_id in the component, `keep` marks the canonical doc).
    * The propagation is the standard BSP pattern (what GraphX Pregel
    * runs): each round is one fully-distributed set of keyed shuffles
    * and the driver only tests whether any label still shrank. Each
    * round also shortcuts through the label graph (lbl ← lbl's lbl, the
    * path-halving step of union-find), so convergence is O(log
    * diameter) rounds — a 50k-doc chain-shaped drift cluster converges
    * in ~17 rounds, not 50k — with a fail-fast cap as the backstop.
    * Labels are checkpointed per round: iterative lineage would
    * otherwise re-run every prior round each action. */
  private def p32DupClusters: Q = (s, d) => dupClusterLabels(s, d)

  /** The connected-component labels over the near-dup graph as a
    * session-cached artifact — the second shared side-table of the dedup
    * family (p32 reports it; p41 and p82 consume it). Reads the
    * [[nearDupPairs]] artifact, so a gate run pays the MinHash+LSH build
    * and the label propagation once each, not once per consumer. */
  private[graft] def dupClusterLabels(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cached(s, d, "dup_cluster_labels") {
      graft.Artifacts.stage(s, buildDupClusters(s, d))
    }

  private def buildDupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = nearDupPairs(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .staged
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
      .staged
    var converged = false
    var rounds = 0
    while (!converged) {
      // 64 halving rounds cover any diameter a 2^64-node graph can hold;
      // hitting the cap means a logic bug, so fail loudly, never hang
      rounds += 1
      require(rounds <= 64, s"label propagation did not converge")
      val viaNeighbor = edges
        .join(labels.select(col("doc_id").as("dst"), col("lbl")), "dst")
        .select(col("src").as("doc_id"), col("lbl"))
      val viaParent = labels
        .join(labels.select(col("doc_id").as("lbl"), col("lbl").as("plbl")),
          "lbl")
        .select(col("doc_id"), col("plbl").as("lbl"))
      val next = labels.union(viaNeighbor).union(viaParent)
        .groupBy("doc_id").agg(min(col("lbl")).as("lbl"))
        .staged
      converged = next
        .join(labels.withColumnRenamed("lbl", "old"), "doc_id")
        .filter(col("lbl") < col("old"))
        .isEmpty
      labels = next
    }
    labels.select(col("doc_id"), col("lbl").as("cluster_id"),
      when(col("lbl") === col("doc_id"), 1).otherwise(0).as("keep"))
  }

  /** Cohort retention matrix: users grouped by first-active day, then
    * distinct active users counted per (cohort, day-offset) — the
    * product-analytics standard. Every stage is a keyed
    * map-side-combinable aggregation: (user, day) dedup, per-user min,
    * a user-keyed join, then the cohort-cell count-distinct (two-phase,
    * so no cell funnels all users through one reducer). */
  private def p34RetentionCohorts: Q = (s, d) => {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = days.groupBy("user_id").agg(min(col("day")).as("cohort"))
    days.join(cohorts, "user_id")
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).cast(LongType).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  // BPE-ish pre-tokenizer: contraction suffixes, letter runs, digit
  // runs, single punctuation marks — the GPT-2 pre-tokenizer family
  // minus its lookahead (which RE2, and therefore the DuckDB twin,
  // cannot express). On the all-lowercase corpus it coincides with
  // whitespace splitting; on punctuated text it splits finer. Second
  // portability condition: Java regex walks UTF-16 code units while RE2
  // walks code points, so `[^a-z0-9 ]` counts a supplementary-plane
  // character (emoji) as 2 tokens vs RE2's 1 — fine on this BMP-only
  // corpus, but a non-BMP corpus needs a code-point-aligned pattern.
  private[graft] val BpeTokenRe =
    "'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Token counting both ways the brief names: whitespace tokens and a
    * BPE-style regex pre-tokenization. Pure per-row map after the input
    * rebalance — regexp_extract_all is a codegen'd expression, no UDF. */
  private def p35TokenCounts: Q = (s, d) =>
    docsBalanced(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeTokenRe), lit(0)))
          .cast(LongType).as("n_bpe_tokens"))

  /** The incremental-ingest contract shared by p36 (exact anti-join
    * dedup) and p44 (bloom prefilter): content-addressed docs, a
    * deterministic 10% hash slice standing in for today's arrivals
    * (`newBatch`), and the distinct content hashes of everything else
    * (`existing` — at production scale the persisted dedup-index table,
    * not a re-scan of all history). One definition so both operators
    * measure the same workload. */
  private def ingestSplit(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d)
      .withColumn("content_hash", sha2(col("text"), 256))
      .withColumn("is_new",
        h60(col("doc_id").cast(StringType)) % 10 === 9)
    (docs.filter(col("is_new")).drop("is_new"),
      docs.filter(!col("is_new")).select(col("content_hash")).distinct())
  }

  /** Incremental dedup — the daily-ingest pattern: the [[ingestSplit]]
    * new batch is deduped against the existing corpus with a hash-keyed
    * anti-join, then within itself (min-id per content hash). Both
    * shuffles are keyed on the content digest. */
  private def p36IncrementalDedup: Q = (s, d) => {
    val (newBatch, existing) = ingestSplit(s, d)
    newBatch
      .join(existing, Seq("content_hash"), "left_anti")
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("batch_dups"))
  }

  private val SpanW = 10

  /** Duplicate-span fraction (the Gopher-family repetition signal at
    * corpus scope): each doc is cut into NON-overlapping 10-token spans,
    * spans are hashed portably, and a doc's score is the fraction of its
    * spans whose hash occurs more than once in the WHOLE corpus
    * (within-doc repeats count too). Linear end to end: one explode, one
    * count keyed on the 60-bit span hash, one hash-keyed join back, one
    * per-doc aggregation — no pairwise work anywhere; the heavy explode
    * runs after the input rebalance. Docs shorter than one span still
    * score (0.0) via the left join. */
  private def p37SpanDedup: Q = (s, d) => {
    val spans = docsBalanced(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(when(size(col("t")) >= SpanW,
          sequence(lit(1), (size(col("t")) / SpanW).cast(IntegerType)))
          .otherwise(array().cast("array<int>"))).as("j"))
      .select(col("doc_id"), h60(concat_ws(" ",
        (0 until SpanW).map(k =>
          element_at(col("t"), (col("j") - 1) * SpanW + k + 1)): _*))
        .as("hv"))
    val cnt = spans.groupBy("hv").agg(count(lit(1)).as("cnt"))
    val perDoc = spans.join(cnt, "hv")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"))
    Tables.documents(s, d).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) > 0,
          round(col("n_dup") / col("n_spans"), 6))
          .otherwise(0.0).as("dup_span_frac"))
  }

  private[graft] val DecontamW = 5
  private val EvalSliceMod = 20L
  private val EvalSliceRem = 3L

  /** Eval-set decontamination — the training-hygiene pass every LLM
    * pipeline runs before training: flag training docs that share any
    * 5-token n-gram with a held-out eval slice (here a deterministic ~5%
    * hash slice of doc ids standing in for the benchmark suite). Gram
    * sets are per-doc-distinct 60-bit hashes; the eval gram table is
    * tiny relative to the corpus, so the deliberately UN-hinted
    * equi-join lets AQE broadcast it and the training side streams
    * map-side — the corpus is never shuffled on the gram key. Every
    * training doc is scored (hit count + flag), so a clean corpus still
    * yields a full audit table rather than an empty result. */
  private def p38Decontamination: Q = (s, d) => {
    val isEval =
      h60(col("doc_id").cast(StringType)) % EvalSliceMod === EvalSliceRem
    // per-doc-distinct grams built MAP-ONLY by the native ShingleIdSet
    // (round-10: replaces the corpus-wide (doc, hv) dropDuplicates
    // shuffle with an in-row dedup + in-memory explode)
    val grams = docsBalanced(s, d)
      .select(col("doc_id"),
        graft.functions.ShingleIdSet.shingleIdSet(col("text"), DecontamW)
          .as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), explode(col("st")).as("hv"))
      .withColumn("is_eval", isEval)
    val evalGrams = grams.filter(col("is_eval")).select("hv").distinct()
      .withColumn("hit", lit(1L))
    val perDoc = grams.filter(!col("is_eval"))
      .join(evalGrams, Seq("hv"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("g"), sum(coalesce(col("hit"), lit(0L))).as("h"))
    Tables.documents(s, d).select("doc_id").filter(!isEval)
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("g"), lit(0L)).as("n_grams"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        when(coalesce(col("h"), lit(0L)) > 0, 1).otherwise(0)
          .as("contaminated"),
        when(coalesce(col("g"), lit(0L)) > 0,
          round(col("h") / col("g"), 6)).otherwise(0.0).as("contam_frac"))
  }

  private val PostingsK = 10

  /** Inverted index with bounded posting lists: exact document frequency
    * per term plus the top-10 postings by (tf DESC, doc_id). The tf and
    * df tables are plain map-side-combinable aggregations; the top-k is
    * the same salted two-phase rank as p30, so a stopword-grade term
    * occurring in most of the corpus prunes to salts×k rows before the
    * final per-term window — no single reducer ever sorts a full posting
    * list, which is what makes per-term state bounded at corpus scale. */
  private def p39InvertedIndex: Q = (s, d) => {
    val salts = 32
    val tf = docsBalanced(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val wLocal = Window.partitionBy(col("term"), col("salt"))
      .orderBy(col("tf").desc, col("doc_id"))
    val wFinal = Window.partitionBy(col("term"))
      .orderBy(col("tf").desc, col("doc_id"))
    tf.withColumn("salt", pmod(col("doc_id"), lit(salts.toLong)))
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= PostingsK)
      .withColumn("rk", row_number().over(wFinal))
      .filter(col("rk") <= PostingsK)
      .join(df, "term")
      .select(col("term"), col("df"), col("rk"), col("doc_id"), col("tf"))
  }

  private val HllM = 256
  // Every other sketch constant derives from HllM so the Spark side and
  // the interpolated oracle move together: p bucket bits, the max rho
  // rank over the remaining 60-p hash bits, and 2^rhoMax — the
  // fixed-point scale of the integer harmonic sum.
  private val HllP = Integer.numberOfTrailingZeros(HllM)
  private val HllRhoMax = 61 - HllP
  private val HllPow: Long = 1L << HllRhoMax
  // alpha_m * m^2 * 2^rhoMax — the numerator of the raw estimate over
  // the integer register sum below; one Scala-folded double constant,
  // injected verbatim into the oracle so both engines divide by the
  // identical value.
  private val HllRawNum: Double =
    0.7213 / (1.0 + 1.079 / HllM) * (HllM.toDouble * HllM) * HllPow.toDouble

  /** HyperLogLog distinct-count sketch over `events.user_id`, built from
    * portable hashes so the DuckDB twin reproduces the registers — and
    * therefore the estimate — bit for bit. bucket = low 8 hash bits
    * (m=256 registers); rho = trailing-zero rank of the remaining 52
    * bits, geometric(1/2), the only property the estimator needs. The
    * register table is one map-side-combinable MAX per bucket, so the
    * full pass over a 100 TB event log reduces to 256 rows. The 2^-M_j
    * harmonic sum is accumulated as the exact integer sum(2^(53-M_j)) —
    * order-insensitive and overflow-free (≤2^61) — so no floating-point
    * summation order can perturb the estimate; the only double math is
    * one division (plus the standard linear-counting branch under 2.5m,
    * decided from the same integers in both engines). The exact count
    * and the sketch's relative error ride along for calibration. */
  private def p40HllDistinct: Q = (s, d) => {
    val regs = Tables.events(s, d)
      .select(h60(col("user_id").cast(StringType)).as("hv"))
      .select(col("hv").bitwiseAND(lit((HllM - 1).toLong)).as("bucket"),
        shiftright(col("hv"), HllP).as("w"))
      .withColumn("rho", when(col("w") === 0, lit(HllRhoMax))
        .otherwise(bit_count(col("w").bitwiseAND(-col("w")) - 1) + 1))
      .groupBy("bucket").agg(max(col("rho")).as("mj"))
    val sketch = regs.agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - mj)")).as("sp"),
        count(lit(1)).as("nb"))
      .select((col("sp") + (lit(HllM.toLong) - col("nb")) *
          lit(HllPow)).as("s_int"),
        (lit(HllM.toLong) - col("nb")).as("v"))
      .withColumn("raw", lit(HllRawNum) / col("s_int").cast(DoubleType))
      .withColumn("est", round(
        when(col("raw") <= lit(2.5 * HllM) && col("v") > 0,
          lit(HllM.toDouble) *
            log(lit(HllM.toDouble) / col("v").cast(DoubleType)))
          .otherwise(col("raw")), 4))
    val exact = Tables.events(s, d)
      .agg(countDistinct(col("user_id")).as("n_exact"))
    sketch.crossJoin(exact)
      .select(col("n_exact"), col("est").as("hll_estimate"),
        round(abs(col("est") - col("n_exact")) / col("n_exact"), 6)
          .as("rel_err"))
  }

  /** Duplicate-cluster representative selection — the step after p32
    * answers "which docs are duplicates of each other": pick ONE doc to
    * keep per cluster, preferring the longest (token count as the quality
    * proxy, min doc_id as the deterministic tiebreak), and report how
    * many members it displaces. One window per cluster plus one keyed
    * aggregation — per-cluster reducer state is a counter, and cluster
    * skew is already bounded upstream by p02's LSH bucket cap. */
  private def p41ClusterReps: Q = (s, d) => {
    val labels = dupClusterLabels(s, d).select(col("doc_id"), col("cluster_id"))
    val toks = Tables.documents(s, d).select(col("doc_id"),
      size(tokens(col("text"))).cast(LongType).as("n_tokens"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    labels.join(toks, "doc_id")
      .withColumn("rnk", row_number().over(w))
      .groupBy("cluster_id")
      .agg(min(when(col("rnk") === 1, col("doc_id"))).as("rep_doc"),
        count(lit(1)).as("n_members"))
  }

  /** Quantized vector table shared by p42 (quantized ANN) and p47
    * (centroid build): per-dimension corpus min/max packed into two
    * broadcast arrays, then every vector mapped to int8 codes in one
    * pass. Checkpointed because consumers read it from multiple join
    * sides — at production scale this is the persisted quantized index. */
  /** The per-session quantized-index artifact — at production scale the
    * persisted int8 index every quantized-path consumer (p42, p47, the
    * k-means state behind p53/p94) reads instead of re-quantizing the
    * corpus; within a session the registry hands them one build. */
  private[graft] def quantizedVectors(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cached(s, d, "quantized_vectors") {
      buildQuantizedVectors(s, d)
    }

  private def buildQuantizedVectors(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
    // per-dim extrema in ONE map-side pass via the native mergeable
    // vector-state aggregate (VecMinMaxAgg; spec-asserted equal to the
    // previous posexplode → groupBy(i) form, which shuffled corpus×dims
    // rows to key the per-dimension aggregation — partials here are two
    // dims-length arrays per task, nothing corpus-sized moves)
    val stats = e
      .agg(graft.functions.VecMinMaxAgg.vecMinMax(col("v")).as("s"))
      .select(col("s").getField("mns").as("mns"),
        col("s").getField("mxs").as("mxs"))
    def quant(x: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0L)).otherwise(
        least(lit(127L),
          floor((x.cast(DoubleType) - mn) * lit(255.0) / (mx - mn)) -
            lit(128L)))
    e.crossJoin(broadcast(stats))
      .withColumn("qv", transform(col("v"), (x, i) =>
        quant(x, element_at(col("mns"), i + 1),
          element_at(col("mxs"), i + 1)))
        // codes are int8 by construction; store them as 1-byte elements
        // so the persisted/staged index and every exchange that carries
        // it pay 1 byte per dimension, not 8 — the storage half of the
        // scalar-quantization claim, literal in the schema
        .cast(ArrayType(ByteType)))
      .withColumn("nrm", sqrt(vdot(col("v"), col("v"))))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("qv"),
        col("mns"), col("mxs"))
      .staged
  }

  /** Int8 scalar quantization + quantized ANN with exact re-rank — the
    * memory-bandwidth scale path for similarity search: the corpus scan
    * reads 1-byte codes (4× less than float32), candidates are ranked by
    * the INTEGER quantized dot product (bit-exact across engines — no
    * float summation anywhere in the wide phase), and only the top-20
    * survivors per probe fetch their float vectors for the exact cosine
    * re-rank. Per-dimension min/max is one tiny two-level aggregation
    * (dims rows) packed into two broadcast arrays; the quantized corpus
    * is checkpointed because the probe and corpus sides both read it —
    * at production scale it is the persisted quantized index. */
  private def p42AnnQuantized: Q = (s, d) => {
    val q = quantizedVectors(s, d)
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pnrm"), col("qv").as("qpv"))
    // native codegen'd integer loop (VectorDotLong) — the wide phase of
    // the quantized scan must not pay interpreted-lambda dispatch. The
    // candidate rows carry ONLY ids + the integer score: the int8 codes
    // are the widest thing the scan-and-rank phases touch, so the 4×
    // bandwidth saving of quantization is real in the plan, not just in
    // the storage format.
    val qdot = vdotl(col("qpv"), col("qv"))
    val cands = q.select(col("vec_id"), col("qv"))
      .crossJoin(broadcast(probes.select(col("probe_id"), col("qpv"))))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), qdot.as("qsim"))
    // same provably-lossless two-phase top-k as p04, keyed on the
    // integer score; only the ≤20 survivors per probe then fetch their
    // float vectors (survivor side broadcast — it is k×probes rows)
    val local = Window
      .partitionBy(col("probe_id"), pmod(hash(col("vec_id")), lit(64)))
      .orderBy(col("qsim").desc, col("vec_id").asc)
    val global = Window.partitionBy("probe_id")
      .orderBy(col("qsim").desc, col("vec_id").asc)
    val rerank = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val survivors = cands
      .withColumn("lrnk", row_number().over(local)).filter(col("lrnk") <= 20)
      .withColumn("qrnk", row_number().over(global)).filter(col("qrnk") <= 20)
      .select("probe_id", "vec_id", "qsim")
    q.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(survivors), "vec_id")
      .join(broadcast(probes.select(col("probe_id"), col("pv"),
        col("pnrm"))), "probe_id")
      .withColumn("sim",
        round(vdot(col("pv"), col("v")) / (col("pnrm") * col("nrm")), 6))
      .withColumn("rnk", row_number().over(rerank).cast(IntegerType))
      .filter(col("rnk") <= 5)
      .select("probe_id", "vec_id", "rnk", "sim", "qsim")
  }

  private val VocabTopK = 16

  /** Vocabulary build + out-of-vocabulary rate: the top-V corpus terms
    * by total occurrence count (two-phase salted top-k, so no reducer
    * sees the full term table), then each (lang, source) slice's OOV
    * rate — the fraction of token OCCURRENCES outside the vocabulary,
    * the signal a tokenizer-training / corpus-mixing step reads. The
    * rate is a micro-average (two exact integer sums, one division), so
    * no floating-point accumulation order exists anywhere. The tiny
    * vocab joins the per-doc term counts un-hinted — AQE broadcasts it. */
  private def p43VocabOov: Q = (s, d) => {
    val occ = docsBalanced(s, d).select(col("doc_id"), col("lang"),
      col("source"), explode(tokens(col("text"))).as("term"))
    val docTf = occ.groupBy("doc_id", "lang", "source", "term")
      .agg(count(lit(1)).as("tf"))
    val corpus = docTf.groupBy("term").agg(sum(col("tf")).as("cnt"))
    val local = Window.partitionBy(pmod(hash(col("term")), lit(64)))
      .orderBy(col("cnt").desc, col("term").asc)
    val global = Window.partitionBy(lit(1))
      .orderBy(col("cnt").desc, col("term").asc)
    val vocab = corpus
      .withColumn("lrnk", row_number().over(local))
      .filter(col("lrnk") <= VocabTopK)
      .withColumn("rnk", row_number().over(global))
      .filter(col("rnk") <= VocabTopK)
      .select(col("term"), lit(1).as("in_vocab"))
    docTf.join(vocab, Seq("term"), "left_outer")
      .groupBy("lang", "source")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("tf")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(lit(0L)))
          .as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast(DoubleType) / col("n_tokens"), 6))
  }

  private val BloomBits = 8192L
  private val BloomK = 3

  /** Bloom-filter dedup prefilter — p36's incremental anti-join, but the
    * index the new batch probes first is BITS, not hashes: k=3 portable
    * positions per content hash, deduped into a position table that is
    * bounded at [[BloomBits]] rows NO MATTER how many documents the
    * corpus holds (vs the distinct-hash index, which grows linearly).
    * Each new doc reports its bloom verdict next to ground truth, so the
    * false-positive rate — the fraction of bloom hits that still need
    * the exact check — is measurable from the output. Both joins are
    * un-hinted: AQE broadcasts the ≤8192-row bit table. */
  private def p44BloomPrefilter: Q = (s, d) => {
    val (newBatch, existing) = ingestSplit(s, d)
    def positions(c: Column): Column = array((0 until BloomK).map(i =>
      h60Seeded(lit(i), c) % lit(BloomBits)): _*)
    val bits = existing
      .select(explode(positions(col("content_hash"))).as("pos")).distinct()
      .withColumn("present", lit(1))
    val probes = newBatch
      .select(col("doc_id"), col("content_hash"),
        explode(positions(col("content_hash"))).as("pos"))
    val verdicts = probes.join(bits, Seq("pos"), "left_outer")
      .groupBy("doc_id", "content_hash")
      .agg(sum(when(col("present").isNull, 1).otherwise(0)).as("miss"))
      .withColumn("bloom_hit",
        when(col("miss") === 0, 1).otherwise(0).cast(IntegerType))
    verdicts.join(existing.withColumn("dup", lit(1)),
        Seq("content_hash"), "left_outer")
      .select(col("doc_id"), col("bloom_hit"),
        when(col("dup").isNull, 0).otherwise(1)
          .cast(IntegerType).as("is_dup"))
  }

  /** Character- and token-level Simpson diversity (1 − Σp²) — the
    * log-free entropy analogue used as a garbage/repetition quality
    * signal: boilerplate and low-quality spans have few distinct
    * symbols, so their diversity collapses. Chosen over Shannon entropy
    * deliberately: Σcnt² and the totals are exact integers, so the score
    * is two integer sums and one division — no `ln`, whose libm rounding
    * differs across engines, and no float accumulation order anywhere.
    * Two keyed counting aggregations (map-side combinable) joined on
    * doc_id; rows scale with text bytes, never with doc pairs. */
  private def p45DiversityScore: Q = (s, d) => {
    def simpson(s2: Column, n: Column): Column =
      round(lit(1.0) - s2.cast(DoubleType) / (n * n).cast(DoubleType), 6)
    val chars = docsBalanced(s, d)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      // Java's split(s, -1) appends a trailing "" that DuckDB's
      // string_split does not produce; both twins filter it
      .filter(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum(col("c")).as("n_ch"),
        sum(col("c") * col("c")).as("s2_ch"))
    val toks = docsBalanced(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum(col("c")).as("n_tok"),
        sum(col("c") * col("c")).as("s2_tok"))
    chars.join(toks, "doc_id")
      .select(col("doc_id"), col("n_ch"),
        simpson(col("s2_ch"), col("n_ch")).as("char_simpson"),
        col("n_tok"), simpson(col("s2_tok"), col("n_tok")).as("token_simpson"))
  }

  private val MixCap = 0.05
  private val MixScale = 1000000L

  /** Source-mixture reweighting (static DoReMi-style downsampling): no
    * source may exceed [[MixCap]] of the corpus's tokens, so each
    * source's keep-rate is min(1, cap/share) and docs are kept by a
    * deterministic hash threshold — the same doc survives on any
    * cluster, any partitioning, any run. Three tiny aggregations (the
    * per-source table is |sources| rows, broadcast back un-hinted) plus
    * one map-side filter; the heavy corpus is scanned once and never
    * shuffled on a data-dependent key. Per-source admissions ride along
    * so the realized mixture is auditable against the target. */
  private def p46MixtureSample: Q = (s, d) => {
    val docTok = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast(LongType).as("n_tok"))
    val bySrc = docTok.groupBy("source")
      .agg(sum(col("n_tok")).as("src_tok"), count(lit(1)).as("n_docs_in"))
    val tot = docTok.agg(sum(col("n_tok")).as("tot_tok"))
    val rates = bySrc.crossJoin(broadcast(tot))
      .withColumn("keep_rate", least(lit(1.0), lit(MixCap) /
        (col("src_tok").cast(DoubleType) / col("tot_tok").cast(DoubleType))))
    val kept = docTok.join(rates.select("source", "keep_rate"), "source")
      .filter(h60(concat(lit("mix:"), col("doc_id").cast(StringType)))
        % lit(MixScale) < floor(col("keep_rate") * lit(MixScale.toDouble)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("n_tok")).as("n_tok_kept"))
    rates.join(kept, Seq("source"), "left_outer")
      .select(col("source"), round(col("keep_rate"), 6).as("keep_rate"),
        col("n_docs_in"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_tok_kept"), lit(0L)).as("n_tok_kept"))
  }

  /** Per-label centroid build over the QUANTIZED codes — the codebook
    * training step the IVF path (p20/p33) consumes. Averaging raw floats
    * distributed-style is order-DEPENDENT (float partial sums differ by
    * merge order, so no two runs — or engines — agree bit-for-bit);
    * averaging the int8 codes is two exact integer aggregates per
    * (label, dim) cell, map-side combinable and identical on any
    * partitioning, the same reason the money pipeline sums decimals.
    * The dequantized float centroid is derived from the integer mean by
    * one fixed arithmetic chain per cell. One explode + one keyed agg —
    * linear, no pairwise work. */
  private def p47QuantizedCentroids: Q = (s, d) => {
    // per-label centroid sums through the native elementwise aggregate:
    // the label-keyed shuffle carries dims-length buffers, and the
    // per-dimension unpack explodes only |labels| result rows (was
    // corpus×dims rows into a (label, dim) aggregation)
    val qv = quantizedVectors(s, d)
    val stats = qv.select("mns", "mxs").limit(1)
    val centroidQ =
      col("s_").cast(DoubleType) / col("n").cast(DoubleType)
    qv.groupBy("label")
      .agg(graft.functions.VecSumAgg.vecSum(col("qv")).as("sc"))
      .crossJoin(broadcast(stats)) // 1-row global min/max arrays
      .select(col("label"), col("mns"), col("mxs"),
        posexplode(zip_with(col("sc").getField("sums"),
          col("sc").getField("counts"),
          (s_, n_) => struct(s_.as("s"), n_.as("n")))).as(Seq("i", "sn")))
      .select(col("label"), col("i"),
        col("sn").getField("n").as("n"),
        col("sn").getField("s").as("s_"),
        element_at(col("mns"), col("i") + 1).as("mn"),
        element_at(col("mxs"), col("i") + 1).as("mx"))
      .select(col("label"), col("i").as("dim"), col("n"),
        round(centroidQ, 6).as("centroid_q"),
        round(col("mn") + (centroidQ + lit(128.0)) *
          (col("mx") - col("mn")) / lit(255.0), 6).as("centroid"))
  }

  private val HistBins = 32L

  /** Mergeable-histogram quantiles over the document length distribution
    * — the corpus-analytics scale pattern: an exact percentile needs a
    * global sort of the column, but a fixed-bin histogram is a ≤32-cell
    * map-side-combinable aggregate whose cells merge associatively
    * across any number of partitions (or days, or clusters), and
    * quantiles read off its CDF with error bounded by one bin width.
    * Binning is pure INTEGER arithmetic (no float rounding to diverge
    * between engines), and the exact percentiles ride along so the
    * approximation error is visible in the output. The CDF window runs
    * over the 32-row histogram, never the corpus. */
  private def p48HistQuantiles: Q = (s, d) => {
    val doc = Tables.documents(s, d).select(col("n_chars"))
    val mm = doc.agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"),
      count(lit(1)).as("n"))
    val hist = doc.crossJoin(broadcast(mm))
      .select(least(lit(HistBins - 1),
        expr(s"(n_chars - mn) * $HistBins div (mx - mn + 1)")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = hist.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(mm))
    def edge(bin: Column): Column =
      col("mn") + (bin + lit(1)).cast(DoubleType) *
        (col("mx") - col("mn") + lit(1)).cast(DoubleType) / lit(HistBins.toDouble)
    val p50 = cdf.filter(col("cum") * 2 >= col("n"))
      .agg(min(col("b")).as("p50_bin"))
    val p90 = cdf.filter(col("cum") * 10 >= col("n") * 9)
      .agg(min(col("b")).as("p90_bin"))
    val exact = doc.agg(
      round(percentile(col("n_chars"), lit(0.5)), 4).as("p50_exact"),
      round(percentile(col("n_chars"), lit(0.9)), 4).as("p90_exact"))
    mm.crossJoin(p50).crossJoin(p90).crossJoin(exact)
      .select(col("n"), col("mn"), col("mx"),
        col("p50_bin"), round(edge(col("p50_bin")), 4).as("p50_approx"),
        col("p50_exact"),
        col("p90_bin"), round(edge(col("p90_bin")), 4).as("p90_approx"),
        col("p90_exact"))
  }

  /** Semantic near-dup (SemDeDup-style): EMBEDDING-space candidates,
    * TEXT-verified — the cross-modal composite modern curation runs.
    * Candidate pairs come from p13's sign-bucketed cosine stage (never
    * all-pairs), then each pair's linked documents (vec_id = doc_id)
    * are checked by exact token Jaccard, so the output carries both the
    * embedding similarity and whether the text agrees. The tiny pair
    * list joins the token-set table un-hinted — AQE broadcasts it, and
    * the corpus is scanned once for token sets, never shuffled on a
    * pair key. */
  private def p49SemanticNearDup: Q = (s, d) => {
    val pairs = p13CosineNearDup(s, d)
    val sets = Tables.documents(s, d).select(col("doc_id"),
      array_distinct(tokens(col("text"))).as("tset"))
    val jaccard = col("ninter").cast(DoubleType) /
      (col("na") + col("nb") - col("ninter")).cast(DoubleType)
    pairs
      .join(sets.select(col("doc_id").as("vec_a"), col("tset").as("ta")),
        "vec_a")
      .join(sets.select(col("doc_id").as("vec_b"), col("tset").as("tb")),
        "vec_b")
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("sim"),
        size(array_intersect(col("ta"), col("tb"))).as("ninter"),
        size(col("ta")).as("na"), size(col("tb")).as("nb"))
      .select(col("doc_a"), col("doc_b"), col("sim"),
        round(jaccard, 6).as("jaccard"),
        (jaccard >= lit(JaccardThreshold)).cast(IntegerType)
          .as("text_confirmed"))
  }

  private val IntervalW = 600000000L // 10 min, microseconds

  /** Interval-overlap join WITHOUT an equi key — the general range join
    * that p16 cannot express (p16 rides the user_id equi key). Every
    * purchase opens a [ts, ts+10min] window; the query counts ALL events
    * from ANY user inside each window. Binning turns it into a keyed
    * equi-join: both sides map to coarse buckets the width of the
    * interval — a point lands in exactly one bucket, an interval in at
    * most two — so candidate pairs exist only bucket-locally and the
    * exact containment filter runs on candidates, never on
    * |intervals|×|events|. Bucket arithmetic is integer `div` (no float
    * division near bucket boundaries), the shuffle key is the bucket, and
    * a skewed bucket salts like any keyed join. This is how Spark's own
    * range-join hints bin under the hood — expressed here with public
    * operators only. */
  private def p50IntervalJoinBinned: Q = (s, d) => {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("ts_us").as("lo"),
        (col("ts_us") + IntervalW).as("hi"))
      .withColumn("bucket", explode(sequence(
        expr(s"lo div $IntervalW"), expr(s"hi div $IntervalW"))))
    val pts = ev.select(col("ts_us"),
      expr(s"ts_us div $IntervalW").as("bucket"))
    iv.join(pts, "bucket")
      .filter(col("ts_us") >= col("lo") && col("ts_us") <= col("hi"))
      .groupBy("p_event_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Bigram-LM fluency score — the CCNet-family "does this read like the
    * corpus" quality signal: each doc's score is the mean quantized
    * conditional log-probability log2 p(w2|w1) over its adjacent token
    * pairs, with the LM being the corpus's own bigram table (the
    * stand-in for CCNet's external wiki LM; every bigram is in-model by
    * construction, so no backoff branch). The quantization is the whole
    * trick: log2 is taken as bit-length — length(bin(cnt)) — so the
    * per-pair term (bitlen(bigram cnt) − bitlen(head-unigram cnt)) and
    * the per-doc sum are EXACT INTEGERS on both engines, with one final
    * division per doc; no libm log whose last-ULP rounding could split
    * the hash gate. Shape: one pair explode, two map-side-combinable
    * counts, two hash-keyed joins back, one keyed agg — all linear in
    * corpus tokens, no pairwise work. */
  private def p51LmFluency: Q = (s, d) => {
    val pairs = docsBalanced(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(when(size(col("t")) >= 2, sequence(lit(1), size(col("t")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"),
        element_at(col("t"), col("i")).as("w1"),
        element_at(col("t"), col("i") + 1).as("w2"))
    // `pairs` is read by three consumers (uni, bi, the occurrence join)
    // but deliberately NOT checkpointed: the recompute is pure codegen
    // map work (split + element_at) and A/B timing showed the
    // materialization costs more than it saves (1.51 s vs 1.59 s at
    // sf0.1) — unlike p02/p52, whose reused subtrees contain a SHUFFLE
    val uni = pairs.groupBy("w1").agg(count(lit(1)).as("cu"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    // the per-pair term joins into the (much smaller) bigram model table
    // first, so the full occurrence table pays ONE keyed join, not two
    val model = bi.join(uni, "w1")
      .select(col("w1"), col("w2"),
        (length(bin(col("cb"))) - length(bin(col("cu"))))
          .cast(LongType).as("q"))
    val perDoc = pairs.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("qsum"))
    Tables.documents(s, d).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("qsum").cast(DoubleType) / col("n_bigrams"), 6)
          .as("lm_score"))
  }

  private val ContainProbeK = 4
  private val ContainDfCap = 1000L
  private val ContainThreshold = 0.9

  /** Containment dedup — the pair class Jaccard-LSH structurally MISSES:
    * a short doc quoted wholesale inside a long one has tiny Jaccard
    * (so p02's MinHash bands rarely collide) but containment
    * |A∩B|/|A| ≈ 1. Blocking therefore cannot use MinHash: instead each
    * doc probes with its [[ContainProbeK]] smallest shingle ids — if
    * A ⊆ B, A's minimum shingle IS in B's set, so the pair surfaces
    * unless that shingle is corpus-hot — against the full shingle index
    * with hot shingles (df > [[ContainDfCap]], boilerplate-grade) dropped,
    * mirroring p02's bucket cap. Candidate volume is Σ_shingle df×probes
    * over rare shingles only, never pairwise; the candidate id list then
    * broadcasts back onto the set table for the exact directional
    * verify, like p02's verify stage. */
  private def p52ContainmentDedup: Q = (s, d) => {
    // per-doc sorted-distinct shingle-id sets, built MAP-ONLY by the
    // native ShingleIdSet expression (round-10: replaces the corpus-wide
    // explode + dedup shuffle + collect_set agg) and materialized once:
    // the set table, the df count, and the index side all read it (the
    // p02 signature-table pattern). The per-shingle ROW view `sh` is now
    // DERIVED from the set table by an in-memory explode — distinct by
    // construction, no shuffle
    val sets0 = docsBalanced(s, d)
      .select(col("doc_id"),
        graft.functions.ShingleIdSet.shingleIdSet(col("text"), ShingleW)
          .as("st"))
      .filter(col("st").isNotNull)
      .staged
    // st is sorted ascending, so slice(st, 1, k) IS the k smallest ids
    val sets = sets0
      .select(col("doc_id"), col("st"), size(col("st")).cast(LongType).as("n"),
        slice(col("st"), 1, ContainProbeK).as("probes"))
    val sh = sets0.select(col("doc_id"), explode(col("st")).as("hv"))
    val rare = sh.groupBy("hv").agg(count(lit(1)).as("df"))
      .filter(col("df") <= ContainDfCap).select("hv")
    val index = sh.join(rare, "hv")
    val cand = sets
      .select(col("doc_id").as("doc_a"), explode(col("probes")).as("hv"))
      .join(index.select(col("hv"), col("doc_id").as("doc_b")), "hv")
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("st").as("sa"),
        col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("st").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("containment", round(
        size(array_intersect(col("sa"), col("sb"))).cast(DoubleType) /
          col("na"), 6))
      .filter(col("containment") >= ContainThreshold)
      .select("doc_a", "doc_b", "na", "nb", "containment")
  }

  private[graft] val KmeansK = 8

  /** Two Lloyd iterations of k-means over the int8-quantized embedding
    * codes — the clustering step of cluster-based curation (SemDeDup
    * family: cluster first, then dedup/prune within cells). Everything
    * is INTEGER-exact on both engines, which a float k-means can never
    * be: distances are integer squared-L2 on the codes (expanded to
    * three native `vector_dot_long` calls), argmin ties break to the
    * smallest cell id via a min-join (no engine-specific arg_min
    * semantics), and the centroid update is an element-wise integer
    * floor-mean (sum − pmod(sum, n)) div n. Per iteration: one
    * broadcast of K tiny centroids × one corpus scan, one keyed argmin
    * agg, one cell-keyed native vec_sum agg (dims-length buffers, not
    * corpus×dims exploded rows) — linear in N×K×dims, the textbook
    * distributed-Lloyd shape; iterations are a driver-side loop over
    * DataFrames, state never leaves the cluster. */
  /** The p53 k-means state, shared with p94's SemDeDup prune step: the
    * quantized code table `qq` (vec_id, qv — a narrow projection of the
    * checkpointed quantized-index artifact, so repeated reads re-scan
    * blocks, never recompute) and the final (vec_id, d2, cell)
    * assignment after two Lloyd iterations — itself a session artifact,
    * since both p53's census and p94's prune consume it. */
  private def kmeansAssign(qq: DataFrame, cents: DataFrame): DataFrame = {
    def sqdist(a: Column, b: Column): Column =
      vdotl(a, a) - lit(2L) * vdotl(a, b) + vdotl(b, b)
    val scored = qq.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        sqdist(col("qv"), col("cv")).as("d2"))
    val best = scored.groupBy("vec_id").agg(min(col("d2")).as("d2"))
    scored.join(best, Seq("vec_id", "d2"))
      .groupBy("vec_id", "d2").agg(min(col("cell")).as("cell"))
  }

  private def kmeansUpdate(qq: DataFrame, assigned: DataFrame): DataFrame =
    // centroid update through the native elementwise-sum aggregate: one
    // cell-keyed shuffle of dims-length buffers (was corpus×dims rows
    // through a (cell, dim) aggregation plus a re-pack sort); the
    // floor-divided mean stays exact — (sx − pmod) is exactly divisible
    // and everything sits far below 2^53, so the double division is
    // IEEE-exact and the cast back lossless
    assigned.join(qq, "vec_id")
      .groupBy("cell")
      .agg(graft.functions.VecSumAgg.vecSum(col("qv")).as("sc"))
      .select(col("cell"), zip_with(
        col("sc").getField("sums"), col("sc").getField("counts"),
        (sx, n) => ((sx - pmod(sx, n)) / n).cast(LongType)).as("cv"))

  /** The trained codebook (cell → centroid codes) behind p53/p94/p100 —
    * exposed as its own artifact because the STREAMING cell-census twin
    * ([[graft.streaming.Streams.cellCensus]]) assigns arriving vectors
    * against exactly this table; at production scale it is the persisted
    * model file of the cell build. */
  private[graft] def kmeansCentroids(s: SparkSession, d: String): DataFrame = {
    val qq = quantizedVectors(s, d).select(col("vec_id"), col("qv"))
    graft.Artifacts.cached(s, d, "kmeans_centroids") {
      val c0 = qq.filter(col("vec_id") < KmeansK)
        .select(col("vec_id").as("cell"), col("qv").as("cv"))
      kmeansUpdate(qq, kmeansAssign(qq, c0))
    }
  }

  private def kmeansState(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val qq = quantizedVectors(s, d).select(col("vec_id"), col("qv"))
    val a2 = graft.Artifacts.cached(s, d, "kmeans_assign") {
      graft.Artifacts.stage(s, kmeansAssign(qq, kmeansCentroids(s, d)))
    }
    (qq, a2)
  }

  private def p53KmeansCells: Q = (s, d) => {
    val (_, a2) = kmeansState(s, d)
    a2.groupBy("cell")
      .agg(count(lit(1)).as("n_members"), sum(col("d2")).as("sum_sqdist"))
  }

  /** SemDeDup semantic pruning (Abbas et al. 2023) — the keep/drop step
    * the p53 cells exist for: within each k-means cell, examples whose
    * pairwise quantized cosine reaches τ are semantic duplicates, and
    * each duplicate group keeps exactly ONE example — the one FURTHEST
    * from its centroid (largest d2: the paper's low-centroid-similarity
    * pick, which biases the kept set toward the cell's diverse rim).
    * The keep rule is pairwise-greedy, as in the released
    * implementation: drop x iff some same-cell neighbor with sim ≥ τ
    * outranks it by (d2 DESC, vec_id ASC) — no connected components, so
    * the decision is one self-join, and the top-ranked member of any
    * duplicate group (indeed of any cell) is never dropped. The
    * similarity gate is integer-exact — cross-multiplied squared cosine
    * over the int8 codes (dot > 0 ∧ 10⁴·dot² ≥ τ²·10⁴·|a|²·|b|²), no
    * division or sqrt anywhere, so the probabilistic-looking op has an
    * exact oracle. τ is calibrated to the QUANTIZED space — the per-dim
    * min/max affine quantization recenters every dimension, deflating
    * cosines (this corpus's within-cell max is ≈0.55 quantized), and
    * SemDeDup tunes τ per embedding space anyway. Work: the cell-keyed
    * self-join is Σ|cell|² like p33's IVF search — at 100 TB the
    * codebook grows with the corpus so cells stay bounded and the pair
    * work never approaches corpus². Output: the per-cell keep/drop
    * census a curation report leads with. */
  private val SemTau2E4 = 2025L // τ = 0.45 (quantized-space) ⇒ τ²·10⁴
  private def p94SemdedupPrune: Q = (s, d) => {
    val (qq, a2) = kmeansState(s, d)
    val m = a2.join(qq, "vec_id")
      // exact-int64 envelope for the cross-multiplied gate below:
      // 10⁴·dot² with |code| ≤ 128 needs dims ≤ ~1850 before 10⁴·(128²·D)²
      // passes 2^63 — enforce in-plan like p84 (assert_true is NULL on
      // pass, so the filter keeps every row and can't be pruned)
      .filter(assert_true(size(col("qv")) <= 1792,
        lit("p94: embedding dims exceed the exact-int64 cosine-gate " +
          "envelope (> 1792 dims); scale the similarity to a wider type"))
        .isNull)
      .withColumn("aa", vdotl(col("qv"), col("qv")))
      .select("vec_id", "cell", "d2", "qv", "aa")
      .staged // read 3×: both self-join sides + the census
    val dropped = m
      .join(m.select(col("cell"), col("vec_id").as("o_id"),
        col("d2").as("o_d2"), col("qv").as("o_qv"), col("aa").as("o_aa")),
        Seq("cell"))
      .filter(col("vec_id") =!= col("o_id"))
      .withColumn("dot", vdotl(col("qv"), col("o_qv")))
      .filter(col("dot") > 0 &&
        lit(10000L) * col("dot") * col("dot") >=
          lit(SemTau2E4) * col("aa") * col("o_aa"))
      .filter(col("o_d2") > col("d2") ||
        (col("o_d2") === col("d2") && col("o_id") < col("vec_id")))
      .select("vec_id").distinct()
    val kept = m.join(dropped, Seq("vec_id"), "left_anti")
      .groupBy("cell").agg(count(lit(1)).as("n_kept"))
    m.groupBy("cell").agg(count(lit(1)).as("n_members"))
      .join(kept, Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_members") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
  }

  /** Trailing-interval sliding aggregate — the per-EVENT "activity in
    * the last 10 minutes" signal (rate limiting, burst detection) that
    * tumbling windows (p10) quantize away: a RANGE frame over the
    * microsecond timestamp gives every event its own exact trailing
    * window. One keyed shuffle on user_id; frame state per partition is
    * the in-frame rows only (bounded by the interval × per-user event
    * rate), and both engines evaluate the identical integer frame
    * bounds. */
  private def p54SlidingWindow: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-600000000L, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("sum_trailing",
        sum(graft.Exact.dec(col("value"))).over(w).cast(DoubleType))
      .select("event_id", "user_id", "ts_us", "n_trailing", "sum_trailing")
  }

  /** Duplicate-graph neighborhood analysis — the structural signal a
    * curation pipeline reads per node of the p02 near-dup graph before
    * deciding cluster handling: degree and distinct ≤2-hop neighborhood
    * size separate tight cliques (2-hop ≈ degree: delete all but one)
    * from template chains and stars (2-hop ≫ degree: the cluster is a
    * family, review the template). One mid-keyed self-join of the
    * symmetric edge list — Σ deg(mid)² work, bounded by p02's LSH
    * bucket cap, never corpus-pairwise — then two exact counting
    * aggregations. */
  private def p55DupGraphHops: Q = (s, d) => {
    val pairs = nearDupPairs(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .distinct().staged
    val within2 = edges.select(col("doc_a").as("src"), col("doc_b").as("mid"))
      .join(edges.select(col("doc_a").as("mid"), col("doc_b").as("dst")),
        "mid")
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .union(edges.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .distinct()
    val deg = edges.groupBy(col("doc_a").as("src"))
      .agg(count(lit(1)).as("degree"))
    within2.groupBy("src").agg(count(lit(1)).as("n_within2"))
      .join(deg, "src")
      .select(col("src").as("doc_id"), col("degree"), col("n_within2"))
  }

  // Both patterns live in the RE2 ∩ Java-regex common subset (no
  // backrefs, no lookaround), like BpeTokenRe — the precondition for
  // the DuckDB twin masking identically.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** PII redaction — the scrubbing pass a training-data pipeline runs
    * before anything else sees the text: emails and phone-shaped
    * numbers are replaced with type tags, and the per-doc match counts
    * ride along for the compliance report. Pure map-side
    * (codegen'd regexp_replace / regexp_extract_all after the input
    * rebalance, no shuffle at all); the driver corpus contains no
    * planted PII, so the gate proves the no-false-positive side and the
    * mini proves the masking side. */
  private def p56PiiRedact: Q = (s, d) =>
    docsBalanced(s, d)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("clean_text"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast(LongType).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
          .cast(LongType).as("n_phones"))

  /** Grouped HLL distinct counting through the REUSABLE native
    * aggregate (graft.functions.HllAgg, SQL-registered as `hll_agg`) —
    * the TypedImperativeAggregate generalization of p40's declarative
    * register build: distinct users per event_type in ONE keyed
    * shuffle of 256-byte mergeable sketches, where the declarative
    * form needs a (group, bucket) aggregation plus a second keyed
    * pass. Property-tested bit-identical to p40's formulation
    * (HllAggPropertySpec); the oracle rebuilds the registers per group
    * in SQL, so the hash match proves the native buffer arithmetic,
    * not just the shape. */
  private def p57HllGroups: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val est = ev
      .select(col("event_type"), h60(col("user_id").cast(StringType)).as("hv"))
      .groupBy("event_type")
      .agg(graft.functions.HllAgg.hllAgg(col("hv")).as("hll_estimate"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(est, "event_type")
      .select(col("event_type"), col("n_exact"), col("hll_estimate"),
        round(abs(col("hll_estimate") - col("n_exact")) / col("n_exact"), 6)
          .as("rel_err"))
  }

  /** Two-phase heavy hitters: which tokens exceed 1/128 of the corpus?
    * Phase 1 runs the native [[graft.functions.MgAgg]] Misra–Gries
    * sketch (k = 256 counters) in ONE aggregation pass alongside the
    * exact total — bounded state, so partials carry ≤ 256 entries per
    * task and the vocabulary NEVER shuffles (a plain
    * `groupBy(token).count` would shuffle every distinct token in a
    * 100 TB corpus just to discard all but the hot ones). Phase 2
    * re-scans with the ≤ 256 candidates broadcast, recounts ONLY them
    * (map-side filter, then a ≤ 256-key shuffle), and keeps tokens with
    * cnt·128 ≥ n. Because MG guarantees every token with frequency
    * > n/257 is in the candidate set, the filtered output is EXACTLY
    * the ≥ n/128 set on any partitioning — sketch nondeterminism below
    * the threshold never reaches the result, which is what makes an
    * exact DuckDB oracle possible for a sketch-powered query. */
  // 256 MG counters guarantee candidates down to 1/257 of the corpus —
  // safely below the 1/128 report threshold
  private val HhSketchK = 256
  private val HhDen = 128

  private def p70HeavyHitters: Q = (s, d) => {
    def toks = docsBalanced(s, d)
      .select(explode(tokens(col("text"))).as("token"))
    val sk = toks.agg(
      count(lit(1)).as("n"),
      graft.functions.MgAgg.mgAgg(col("token"), HhSketchK).as("cands"))
    val cand = sk.select(col("n"), explode(col("cands")).as("token"))
    toks.join(broadcast(cand), "token")
      .groupBy(col("token"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(HhDen) >= col("n"))
      .select(col("token"), col("cnt"))
  }

  /** Supervised curation classifier — multinomial naive Bayes with
    * Laplace smoothing, TRAINED on a deterministic 90% hash slice and
    * APPLIED to the held-out 10%, reported as a language confusion
    * census. The trained-model family the heuristic quality scores
    * (p06/p31/p45) and the fixed-profile language ID (p22) don't cover:
    * the model is LEARNED from labeled data, the way production curation
    * classifiers (fastText/CCNet-style) are.
    *
    * Exactness across engines refines p51's quantized-log trick to 16
    * fractional bits: [[qlog2]] is the piecewise-LINEAR log2
    * (bitlen−1)·2^16 + (x·2^16 div 2^(bitlen−1)) − 2^16 — monotone,
    * pure integer arithmetic (the divisor is a power of two, so even the
    * double-typed division path is IEEE-exact: the quotient has ≤ 17
    * significant bits), and fine enough that the classifier actually
    * classifies (the 1-bit bitlen form predicts one class for
    * everything). Every score is an exact integer sum —
    * score(d, c) = qlog2(docs_c) + Σ_t qlog2(cnt_{c,t}+1)
    * − n_d·qlog2(tot_c + V) — and argmax (score DESC, lang ASC tiebreak,
    * planned through the native top-k operator via the rn=1 rewrite) is
    * engine-independent.
    *
    * Scale shape: training is ONE (lang, token)-keyed count shuffle (the
    * model table — vocab×|classes| rows, a TABLE at 100 TB, not a
    * broadcast); class totals/priors/vocab-size reduce to ≤|classes|-row
    * broadcasts; scoring explodes held-out tokens ×|classes| map-side
    * (|classes| = 5) and pays ONE keyed join against the model, then
    * per-(doc, class) and per-doc aggregations. Nothing corpus-sized is
    * ever windowed globally or collected. */
  /** Piecewise-linear log2 with 16 fractional bits over a positive
    * integer column — exact, monotone, engine-portable (see
    * p71NbClassifier). qlog2(1)=0, qlog2(2)=65536, qlog2(3)=98304. */
  private def qlog2(x: Column): Column = {
    val m = length(bin(x)).cast(LongType)
    val p = pow(lit(2.0), (m - lit(1L)).cast(DoubleType))
    val a = x * lit(65536L)
    val q = ((a - pmod(a, p.cast(LongType))).cast(DoubleType) / p)
      .cast(LongType)
    (m - lit(1L)) * lit(65536L) + q - lit(65536L)
  }

  private def p71NbClassifier: Q = (s, d) =>
    nbClassifyCensus(Tables.documents(s, d)
      .withColumn("is_test",
        pmod(h60(col("doc_id").cast(StringType)), lit(10)) === 9))

  /** The p71 core over any `(doc_id, lang, text, is_test)` frame —
    * NbClassifierSpec feeds a class-separable corpus through it and
    * asserts the census is diagonal (the driver corpus's lang labels are
    * uncorrelated with its text, so the GATE exercises cross-engine
    * exactness while the spec proves the model actually learns). */
  private[queries] def nbClassifyCensus(docs: DataFrame): DataFrame = {
    val pred = nbScored(docs)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cls"))))
      .filter(col("rn") === 1)
      .drop("rn")
    pred.groupBy(col("actual"), col("cls").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** The shared NB scoring core: per-(holdout doc, class) quantized
    * log-posterior rows, consumed by the p71 census and the p103
    * calibration audit. */
  private[queries] def nbScored(docs: DataFrame): DataFrame = {
    def toksOf(df: DataFrame) = df
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("token"))
    val trainToks = toksOf(docs.filter(!col("is_test")))
    // the model: per-(class, token) occurrence counts — one keyed shuffle
    val model = trainToks.groupBy("lang", "token")
      .agg(count(lit(1)).as("cnt"))
    // per-class stats: token totals + doc priors + shared vocab size, all
    // ≤|classes| rows (broadcast-able by AQE at any corpus size)
    val vsize = model.select(countDistinct(col("token")).as("v"))
    val classStats = model.groupBy("lang")
      .agg(sum(col("cnt")).as("tot"))
      .join(docs.filter(!col("is_test")).groupBy("lang")
        .agg(count(lit(1)).as("n_docs")), "lang")
      .crossJoin(vsize)
      .select(col("lang").as("cls"),
        qlog2(col("n_docs")).as("q_prior"),
        qlog2(col("tot") + col("v")).as("q_den"))
    toksOf(docs.filter(col("is_test")))
      .withColumnRenamed("lang", "actual")
      .crossJoin(broadcast(classStats))
      .join(model.withColumnRenamed("lang", "cls"),
        Seq("cls", "token"), "left_outer")
      .groupBy(col("doc_id"), col("actual"), col("cls"),
        col("q_prior"), col("q_den"))
      .agg(count(lit(1)).as("n_tok"),
        sum(qlog2(coalesce(col("cnt"), lit(0L)) + lit(1L))).as("q_num"))
      .select(col("doc_id"), col("actual"), col("cls"),
        (col("q_prior") + col("q_num") - col("n_tok") * col("q_den"))
          .as("score"))
  }

  /** Classifier calibration audit — the reliability diagram a quality
    * classifier must pass before its scores gate a corpus at scale:
    * p71's holdout docs bucketed by decision MARGIN (top-1 minus top-2
    * quantized log-posterior, an exact integer in 2^-16 bits), each
    * bucket reporting its doc count and empirical accuracy. A healthy
    * classifier's accuracy rises with margin; a flat or inverted curve
    * means the scores carry no confidence signal and thresholding on
    * them is arbitrary — the audit that decides whether p71-style
    * filtering is safe to deploy. Margin bins are whole bits capped at
    * [[CalMaxBin]] (a doc with no runner-up class is fully confident →
    * cap bin). Cost on top of the shared scoring core: the per-doc
    * window orders ≤|classes| rows per doc, then everything is ≤bins
    * rows. All counts and the margin are exact integers, so the
    * probabilistic-looking audit has an exact oracle. */
  private[graft] val CalMaxBin = 16L
  private[queries] def nbCalibration(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cls"))
    val perDoc = nbScored(docs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("doc_id")
      .agg(min(when(col("rn") === 1, col("cls"))).as("predicted"),
        min(col("actual")).as("actual"),
        (max(when(col("rn") === 1, col("score"))) -
          coalesce(max(when(col("rn") === 2, col("score"))),
            max(when(col("rn") === 1, col("score")))
              - lit((CalMaxBin + 1) * 65536L))).as("margin_q"))
    perDoc
      .withColumn("bin", least(lit(CalMaxBin), expr("margin_q div 65536")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("predicted") === col("actual"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy",
        round(col("n_correct").cast(DoubleType) / col("n_docs"), 6))
  }

  private def p103NbCalibration: Q = (s, d) =>
    nbCalibration(Tables.documents(s, d)
      .withColumn("is_test",
        pmod(h60(col("doc_id").cast(StringType)), lit(10)) === 9))

  /** Exact long floor-division for non-negative operands — the pmod
    * trick qlog2 uses, factored out: a − (a mod b) is exactly divisible,
    * both sides are below 2^53 everywhere this is called, so the double
    * division is IEEE-exact and the cast back is lossless. DuckDB twin:
    * the `//` operator. */
  private def ldiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)).cast(DoubleType) / b.cast(DoubleType)).cast(LongType)

  private val RecallK = 3

  /** ANN index-quality evaluation — recall@k of BOTH approximate
    * indexes (p05's sign-bucket LSH and p20's IVF cells) against the
    * exact brute-force top-k (p04's baseline) on the identical 20-probe
    * task: the monitoring job a production vector index runs
    * continuously, because approximate indexes degrade SILENTLY as the
    * corpus drifts and the only ground truth is the exact scan — and the
    * side-by-side is how an index variant gets chosen or retired — it
    * retired the first-8-dims bit-sampling bucket (≈0.03 recall@3) in
    * favor of [[signBucket]]'s Charikar hyperplanes. Exact
    * side: one broadcast nested-loop corpus scan with the salted
    * two-phase top-k (no reducer ever holds more than k×salts rows per
    * probe). Approx sides: the same candidate joins p05/p20 run. Hits
    * are inner matches of the (probe, neighbor) rank sets — integer
    * counts, so per-probe recall is exact in both engines. The
    * corpus-sized work is the one exact scan, and its cost is amortized
    * exactly as in production: the eval runs on a probe SAMPLE (20
    * here), never per query. */
  private def p72AnnRecall: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(vdot(col("v"), col("v"))))
      .withColumn("bucket", signBucket(col("v"), AnnBits))
    val probes = e.select(col("vec_id").as("probe_id"), col("v").as("pv"),
      col("nrm").as("pnrm"), col("bucket")).filter(col("probe_id") < 20)
    def sim = round(vdot(col("pv"), col("v")) / (col("pnrm") * col("nrm")), 6)
    def topk(cands: DataFrame): DataFrame = {
      val local = Window
        .partitionBy(col("probe_id"), pmod(hash(col("vec_id")), lit(64)))
        .orderBy(col("sim").desc, col("vec_id").asc)
      val global = Window.partitionBy("probe_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      cands.withColumn("lrnk", row_number().over(local))
        .filter(col("lrnk") <= RecallK)
        .withColumn("rnk", row_number().over(global))
        .filter(col("rnk") <= RecallK)
        .select("probe_id", "vec_id")
    }
    val exact = topk(e.drop("bucket")
      .crossJoin(broadcast(probes.drop("bucket")))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), sim.as("sim")))
    val approxLsh = topk(e.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), sim.as("sim")))
    // the p104 variant under the same monitor: probe-side ×9 fan-out,
    // corpus side unchanged — the recall number that justifies (or
    // retires) the extra probes rides in the same report
    val probeKeys = probes.select(col("probe_id"), col("pv"), col("pnrm"),
      explode(array(col("bucket") +:
        (1 to AnnBits).map(i => flipBit(col("bucket"), i)): _*)).as("bucket"))
    val approxMp = topk(e.join(probeKeys, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), sim.as("sim")))
    val assigned = ivfAssigned(s, d)
    val iprobes = assigned.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pnrm"), col("cell"))
    val approxIvf = topk(assigned.join(iprobes, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), sim.as("sim")))
    exact
      .join(approxLsh.withColumn("hit_lsh", lit(1)),
        Seq("probe_id", "vec_id"), "left_outer")
      .join(approxMp.withColumn("hit_mp", lit(1)),
        Seq("probe_id", "vec_id"), "left_outer")
      .join(approxIvf.withColumn("hit_ivf", lit(1)),
        Seq("probe_id", "vec_id"), "left_outer")
      .groupBy("probe_id")
      .agg(
        sum(coalesce(col("hit_lsh"), lit(0))).cast(LongType).as("n_hits_lsh"),
        sum(coalesce(col("hit_mp"), lit(0))).cast(LongType).as("n_hits_mp"),
        sum(coalesce(col("hit_ivf"), lit(0))).cast(LongType).as("n_hits_ivf"))
      .select(col("probe_id"),
        col("n_hits_lsh"),
        round(col("n_hits_lsh").cast(DoubleType) / lit(RecallK.toDouble), 6)
          .as("recall_lsh"),
        col("n_hits_mp"),
        round(col("n_hits_mp").cast(DoubleType) / lit(RecallK.toDouble), 6)
          .as("recall_mp"),
        col("n_hits_ivf"),
        round(col("n_hits_ivf").cast(DoubleType) / lit(RecallK.toDouble), 6)
          .as("recall_ivf"))
  }

  /** Ordered token bigrams of every doc as (doc_id, prev, cur) rows —
    * occurrence bigrams (NOT the distinct shingle set `shingles` builds),
    * shared by the p73 LM trainer/scorer and p74's phrase-term index.
    * Docs under 2 tokens yield no rows. DuckDB twin: unnest a
    * generate_series over the token list and index `t[i]`/`t[i+1]`. */
  private def bigramPairs(df: DataFrame,
      extra: Seq[String] = Nil): DataFrame = {
    val ex = extra.map(col)
    df.select(col("doc_id") +: ex :+ tokens(col("text")).as("t"): _*)
      .filter(size(col("t")) >= 2)
      .select(col("doc_id") +: ex :+ col("t") :+
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"): _*)
      .select(col("doc_id") +: ex :+
        element_at(col("t"), col("i")).as("prev") :+
        element_at(col("t"), col("i") + 1).as("cur"): _*)
  }

  /** CCNet-style perplexity bucketing — the UNSUPERVISED LM quality
    * filter beside p71's supervised classifier, the other half of the
    * production curation pair: a bigram LM with Laplace smoothing is
    * trained on the 90% hash slice (the same deterministic split p71
    * uses), every held-out doc is scored in quantized bits via the same
    * 16-fractional-bit [[qlog2]] (surprisal is an exact integer sum —
    * qlog2(ctx+V) − qlog2(cnt+1) per bigram), and docs land in
    * head/middle/tail TERCILES of bits-per-token — CCNet's curation
    * signal, lowest perplexity first.
    *
    * Scale shape: training is ONE (prev, cur)-keyed count shuffle (the
    * model); context totals aggregate FROM the model (never a second
    * corpus pass); scoring pays one keyed model join. The tercile
    * cutoffs come from a VALUE-histogram of the quantized score — at
    * most ~2^21 distinct bpt values exist REGARDLESS of corpus size
    * (quantization bounds the value domain), so the cumulative window
    * runs over a bounded table and no global sort of docs happens
    * anywhere. Docs under 2 tokens have no bigrams and are excluded
    * (mirrored in the oracle). */
  private def p73PerplexityBuckets: Q = (s, d) =>
    perplexityCensus(Tables.documents(s, d)
      .withColumn("is_test",
        pmod(h60(col("doc_id").cast(StringType)), lit(10)) === 9))

  /** The p73 census over any `(doc_id, text, is_test)` frame: the
    * per-bucket aggregate of [[perplexityDocBuckets]]. */
  private[queries] def perplexityCensus(docs: DataFrame): DataFrame =
    perplexityDocBuckets(docs)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("bpt_q")).as("min_bpt_q"),
        max(col("bpt_q")).as("max_bpt_q"),
        sum(col("bpt_q")).as("sum_bpt_q"))

  /** The p73 core: every held-out doc scored and tercile-bucketed as
    * (doc_id, bpt_q, bucket) — PerplexityBm25Spec feeds corpora with
    * engineered fluent/garbled holdout docs through it and asserts they
    * land in head/tail. */
  private[queries] def perplexityDocBuckets(docs: DataFrame): DataFrame = {
    val model = bigramPairs(docs.filter(!col("is_test")))
      .groupBy("prev", "cur").agg(count(lit(1)).as("cnt"))
      .staged // read twice: the ctx aggregation and the scoring join
    val ctx = model.groupBy("prev").agg(sum(col("cnt")).as("ctx"))
    val vsize = docs.filter(!col("is_test"))
      .select(explode(tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val scored = bigramPairs(docs.filter(col("is_test")))
      .join(model, Seq("prev", "cur"), "left_outer")
      .join(ctx, Seq("prev"), "left_outer")
      .crossJoin(broadcast(vsize))
      .select(col("doc_id"),
        (qlog2(coalesce(col("ctx"), lit(0L)) + col("v"))
          - qlog2(coalesce(col("cnt"), lit(0L)) + lit(1L))).as("bits_q"))
      .groupBy("doc_id")
      .agg(sum(col("bits_q")).as("bits_q"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), ldiv(col("bits_q"), col("n_bigrams")).as("bpt_q"))
      .staged // read twice: the cutoff histogram and the final bucketing
    val hist = scored.groupBy("bpt_q").agg(count(lit(1)).as("n"))
    val tot = hist.agg(sum(col("n")).as("n_docs"))
    val wCum = Window.orderBy(col("bpt_q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cuts = hist.withColumn("cum", sum(col("n")).over(wCum))
      .crossJoin(broadcast(tot))
      .agg(min(when(col("cum") * 3 >= col("n_docs"), col("bpt_q"))).as("c1"),
        min(when(col("cum") * 3 >= col("n_docs") * 2, col("bpt_q"))).as("c2"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("bpt_q"),
        when(col("bpt_q") <= col("c1"), lit("head"))
          .when(col("bpt_q") <= col("c2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  private val Bm25S = 65536L
  private val Bm25TopK = 10

  /** BM25 keyword retrieval — the lexical-search twin of the ANN family
    * (p04/p05/p20): ten probe docs' term sets retrieve their top-10
    * highest-scoring other documents through the inverted-postings join
    * (p39's index shape, consumed instead of displayed). Terms are word
    * BIGRAMS (phrase indexing): the corpus's unigram vocabulary is a few
    * dozen tokens with near-uniform document frequency, so unigram idf
    * carries no signal — the standard fix when unigrams saturate, and the
    * same move a positional/phrase index makes. Okapi BM25
    * (k1 = 1.2, b = 0.75) is computed ENTIRELY in scaled-integer
    * arithmetic so the oracle replays it bit for bit: idf is
    * qlog2(D+1) − qlog2(df) (≥ 0 always, no negative-idf clamp needed);
    * the length normalization dl/avgdl is quantized to 16 fractional
    * bits as r = (dl·2^16·D) div T; each term contributes
    * (idf_q·tf·⌊2.2·2^16⌋) div (tf·2^16 + (0.3·2^16 + 0.9·r rounded by
    * integer div 10)); the doc score is the exact integer term sum.
    * Every floor-division quotient and product stays below 2^53 at any
    * realistic per-doc length (at extreme D·dl the r product moves to
    * 128-bit/decimal arithmetic — the quantization itself is unchanged).
    *
    * Scale shape: tf is one (doc, token) count shuffle, staged because
    * four consumers read it (dl, df, the query side, the postings side);
    * df·20 ≤ D prunes stopword-class postings BEFORE the join (the
    * impact-pruning production BM25 does at index build), bounding any
    * token's candidate fan-out at D/20; scoring is one postings join +
    * one (probe, doc) keyed sum; top-10 per probe is the salted
    * two-phase window. Nothing is ever all-pairs: work is
    * Σ_{query tokens} df(t), the classic inverted-index bound. */
  private def p74Bm25Retrieval: Q = (s, d) =>
    bm25TopDocs(docsBalanced(s, d), probeMax = 10L)

  /** The p74 core over any `(doc_id, text)` frame, probes = doc_id <
    * probeMax — PerplexityBm25Spec plants a near-copy of a probe doc and
    * asserts it retrieves at rank 1. */
  private[queries] def bm25TopDocs(docsIn: DataFrame,
      probeMax: Long): DataFrame = {
    val tf = bigramPairs(docsIn)
      .select(col("doc_id"),
        concat_ws(" ", col("prev"), col("cur")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .staged
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("d_docs"), sum(col("dl")).as("t_toks"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val qtoks = tf.filter(col("doc_id") < probeMax)
      .select(col("doc_id").as("probe_id"), col("token"))
      .join(df, "token")
      .crossJoin(broadcast(stats))
      .filter(col("df") * 20 <= col("d_docs"))
      .select(col("probe_id"), col("token"),
        (qlog2(col("d_docs") + 1) - qlog2(col("df"))).as("idf_q"),
        col("d_docs"), col("t_toks"))
    val cands = qtoks.join(tf, "token")
      .filter(col("doc_id") =!= col("probe_id"))
      .join(dl, "doc_id")
      .withColumn("r",
        ldiv(col("dl") * lit(Bm25S) * col("d_docs"), col("t_toks")))
      .withColumn("den", col("tf") * lit(Bm25S)
        + ldiv(lit(3L * Bm25S) + lit(9L) * col("r"), lit(10L)))
      .withColumn("term_q",
        ldiv(col("idf_q") * col("tf") * lit(22L * Bm25S / 10L), col("den")))
    val scoredDocs = cands.groupBy("probe_id", "doc_id")
      .agg(sum(col("term_q")).as("score_q"))
    val local = Window
      .partitionBy(col("probe_id"), pmod(hash(col("doc_id")), lit(64)))
      .orderBy(col("score_q").desc, col("doc_id").asc)
    val global = Window.partitionBy("probe_id")
      .orderBy(col("score_q").desc, col("doc_id").asc)
    scoredDocs.withColumn("lrnk", row_number().over(local))
      .filter(col("lrnk") <= Bm25TopK)
      .withColumn("rnk", row_number().over(global).cast(IntegerType))
      .filter(col("rnk") <= Bm25TopK)
      .select("probe_id", "doc_id", "rnk", "score_q")
  }

  // p75: doc_id * 2^20 + span index packs a span's global position into
  // one BIGINT so "first occurrence in corpus order" is a plain MIN —
  // portable to the oracle with no struct/arg-min support needed.
  private val StripPosPack = 1L << 20

  /** C4-style duplicate-span REMOVAL (Raffel et al. 2020 §2.2 discard
    * all but one of any three-sentence span occurring more than once;
    * spans here are the same non-overlapping [[SpanW]]-token windows
    * p37 censuses — the synthetic corpus has no sentence boundaries).
    * Where p37 only *scores* duplication, this op emits the cleaned
    * corpus: exactly one occurrence of every duplicated span survives
    * (the minimum (doc_id, span-index) position — deterministic, so the
    * oracle agrees), and each document is reconstructed in order with
    * its dropped windows excised and its sub-window tail kept.
    *
    * Scale shape: one span-keyed census shuffle (map-side combine), one
    * span-keyed join back, and then ONLY the dropped positions — a
    * sparse (doc_id, window-index) set, not span text — travel through
    * the doc_id-keyed shuffle to reconstruction; the cleaned text is
    * re-derived from the document's own token array with higher-order
    * functions, so reassembly never materializes or sorts span bodies.
    * Output carries an md5 digest of the cleaned text rather than the
    * text itself (at 100 TB the cleaned corpus is written to storage;
    * the audit table stays narrow). */
  private def p75SpanStrip: Q = (s, d) => spanStrip(docsBalanced(s, d))

  /** The shared [[SpanW]]-window machinery of the span family — ONE
    * definition of "what a window is" (tokenization, index explode,
    * h60 span hash, position packing) consumed by p75, p113, and
    * p114, so the three ops are structurally unable to disagree about
    * duplication (their scaladocs promise exactly that). Returns
    * (base, spans): base = (doc_id, t, n, n_spans) for reassembly,
    * spans = (doc_id, j, hv, pos) window rows. */
  private def spanWindowTable(docsIn: DataFrame): (DataFrame, DataFrame) = {
    val base = docsIn
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .withColumn("n_spans", (col("n") / SpanW).cast(IntegerType))
    val spans = base
      .select(col("doc_id"), col("t"),
        explode(when(col("n_spans") >= 1, sequence(lit(1), col("n_spans")))
          .otherwise(array().cast("array<int>"))).as("j"))
      .select(col("doc_id"), col("j"),
        h60(concat_ws(" ", (0 until SpanW).map(k =>
          element_at(col("t"), (col("j") - 1) * SpanW + k + 1)): _*))
          .as("hv"))
      .withColumn("pos", col("doc_id") * lit(StripPosPack) + col("j"))
    (base, spans)
  }

  /** The span family's shared reconstruction: excise each doc's
    * `drop_j` windows and rebuild its token stream in order, keeping
    * the sub-window tail. Extra columns on `drops` (p114's run count)
    * ride through the join untouched. */
  private def spanReassemble(base: DataFrame, drops: DataFrame): DataFrame =
    base.join(drops, Seq("doc_id"), "left_outer")
      .withColumn("dj", coalesce(col("drop_j"), array().cast("array<int>")))
      .withColumn("kept", when(col("n_spans") >= 1,
        filter(sequence(lit(1), col("n_spans")),
          j => !array_contains(col("dj"), j)))
        .otherwise(array().cast("array<int>")))
      .withColumn("clean", concat(
        flatten(transform(col("kept"),
          j => slice(col("t"), (j - 1) * SpanW + 1, lit(SpanW)))),
        slice(col("t"), col("n_spans") * SpanW + 1,
          col("n") - col("n_spans") * SpanW)))

  /** The p75 core over any `(doc_id, text)` frame — SpanStripGopherSpec
    * plants a shared span across documents and asserts only the
    * first-position copy survives and reconstruction preserves order. */
  private[queries] def spanStrip(docsIn: DataFrame): DataFrame = {
    val (base, spans) = spanWindowTable(docsIn)
    val census = spans.groupBy("hv")
      .agg(count(lit(1)).as("cnt"), min(col("pos")).as("keeper"))
    val drops = spans.join(census, "hv")
      .filter(col("cnt") > 1 && col("pos") =!= col("keeper"))
      .groupBy("doc_id").agg(collect_set(col("j")).as("drop_j"))
    spanReassemble(base, drops)
      .select(col("doc_id"),
        col("n_spans").cast(LongType).as("n_spans"),
        size(col("dj")).cast(LongType).as("n_dropped"),
        size(col("clean")).cast(LongType).as("n_tokens_clean"),
        md5(array_join(col("clean"), " ")).as("clean_md5"))
  }

  /** Gopher/MassiveText quality-rule gate (Rae et al. 2021, appendix
    * A1.1), the published heuristic filter every large-scale text
    * pipeline runs before dedup: per document, (1) word count within
    * [50, 100000]; (2) mean word length within [3, 10] characters;
    * (3) at least 2 distinct stop words present; (4) the repetition
    * bound — Gopher's duplicate-line fraction, mapped to duplicate
    * UNIGRAM fraction ≤ 0.55 here because the synthetic corpus has no
    * line structure. Emits the per-document audit flags plus the
    * combined keep bit.
    *
    * Scale shape: pure map — no shuffle, no state, every metric an
    * integer computed from the row's own token array; the mean-length
    * and repetition bounds are cross-multiplied (3n ≤ chars ≤ 10n;
    * 100·(n − distinct) ≤ 55·n) so the gate is integer-exact with no
    * float division to diverge across engines. The ideal 100 TB filter:
    * embarrassingly parallel, codegen'd end to end. */
  private def p76GopherRules: Q = (s, d) => gopherRules(Tables.documents(s, d))

  /** The p76 core over any `(doc_id, text)` frame — SpanStripGopherSpec
    * drives each rule's fail branch with engineered documents (the
    * synthetic corpus never trips the mean-word-length bound). */
  private[queries] def gopherRules(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(col("doc_id"),
        size(t).cast(LongType).as("n_words"),
        length(translate(col("text"), " ", "")).cast(LongType)
          .as("n_letters"),
        size(array_distinct(t)).cast(LongType).as("n_distinct"),
        Stopwords.map(w => when(array_contains(t, w), 1L).otherwise(0L))
          .reduce(_ + _).as("n_stop"))
      .select(col("doc_id"), col("n_words"),
        (col("n_words") >= 50L && col("n_words") <= 100000L)
          .cast(IntegerType).as("r_words"),
        (col("n_letters") >= lit(3L) * col("n_words") &&
          col("n_letters") <= lit(10L) * col("n_words"))
          .cast(IntegerType).as("r_mean_len"),
        (col("n_stop") >= 2L).cast(IntegerType).as("r_stop"),
        ((col("n_words") - col("n_distinct")) * 100L <=
          col("n_words") * 55L).cast(IntegerType).as("r_dup"))
      .withColumn("keep",
        (col("r_words") * col("r_mean_len") * col("r_stop") * col("r_dup"))
          .cast(IntegerType))
  }

  // p77: hashed-feature space size. Feature tables are bounded at this
  // many rows regardless of corpus size — the broadcast that makes
  // scoring map-side.
  private val DsirBuckets = 8192L

  /** DSIR-style importance weighting for data selection (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): every document is weighted by the log likelihood
    * ratio of a TARGET distribution (here the `en` slice standing in
    * for the high-quality corpus) vs the RAW distribution, both
    * estimated over hashed bigram features with Laplace smoothing —
    * the third member of the curation family beside p71's supervised
    * classifier and p73's unsupervised LM. Integer-exact end to end:
    * log p ratios in 16-fractional-bit [[qlog2]], per-feature numerator
    * deltas precomputed, the shared denominator constant folded into
    * one per-doc multiply.
    *
    * Scale shape: the gram explode is map-side; both feature
    * distributions aggregate to at most [[DsirBuckets]] rows (hashing
    * bounds the model, the whole point of DSIR's hashed features), so
    * the scoring join BROADCASTS the model; the only corpus-keyed
    * shuffle is the final per-doc sum. */
  private def p77DsirWeights: Q = (s, d) =>
    dsirWeights(docsBalanced(s, d), col("lang") === "en")

  /** The p77 core over any `(doc_id, text)` frame with an `isTarget`
    * predicate over its columns — SpanStripGopherSpec feeds a corpus
    * whose target docs use a disjoint vocabulary and asserts they
    * outweigh the rest. */
  private[queries] def dsirWeights(docsIn: DataFrame,
      isTarget: Column): DataFrame = {
    val grams = docsIn.withColumn("is_target", isTarget)
      .select(col("doc_id"), col("is_target"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("is_target"), col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(col("doc_id"), col("is_target"),
        pmod(h60(concat_ws(" ",
          element_at(col("t"), col("i")),
          element_at(col("t"), col("i") + 1))), lit(DsirBuckets)).as("f"))
    val cr = grams.groupBy("f").agg(count(lit(1)).as("cr"))
    val ct = grams.filter(col("is_target"))
      .groupBy("f").agg(count(lit(1)).as("ct"))
    val feat = cr.join(ct, Seq("f"), "left_outer")
      .select(col("f"),
        (qlog2(coalesce(col("ct"), lit(0L)) + 1) - qlog2(col("cr") + 1))
          .as("delta_q"))
    val totals = grams.agg(count(lit(1)).as("r_tot"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t_tot"))
    grams.join(broadcast(feat), "f")
      .groupBy("doc_id", "is_target")
      .agg(count(lit(1)).as("n_grams"), sum(col("delta_q")).as("sum_delta"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        col("is_target").cast(IntegerType).as("is_target"),
        col("n_grams"),
        (col("sum_delta") + col("n_grams") *
          (qlog2(col("r_tot") + DsirBuckets)
            - qlog2(col("t_tot") + DsirBuckets))).as("w_q"))
      .withColumn("keep", (col("w_q") > 0L).cast(IntegerType))
  }

  /** End-to-end curation funnel census — the COMPOSED pipeline a
    * pretraining-data run actually executes, reported as the
    * stage-by-stage survivor table every curation report leads with:
    * raw corpus → Gopher rule gate ([[gopherRules]], p76) → exact dedup
    * (p01's content hash, smallest doc_id kept) → near-dedup (p02's
    * banded MinHash + exact-Jaccard verify; of each verified pair the
    * HIGHER-id member is dropped — the greedy first-wins policy, fully
    * deterministic, so the oracle replays the census row for row). Each
    * stage consumes the previous stage's survivors in the canonical
    * cheap-first order: the per-doc rule gate runs on everything, the
    * keyed dedup on rule survivors, and the pairwise-sketch work only on
    * what both earlier gates let through.
    *
    * Scale shape: the rule gate is pure map; exact dedup is ONE
    * digest-keyed shuffle; near-dedup reuses the capped-LSH shapes
    * unchanged (sketch shuffle, banded self-join inside ≤[[MaxBucket]]
    * buckets, broadcast candidate verify) over the thinned survivor
    * set; the census itself is four single-row reductions unioned.
    * Nothing all-pairs, nothing driver-side. */
  private def p78CurationFunnel: Q = (s, d) =>
    curationFunnel(Tables.documents(s, d))

  /** The p78 core over any `(doc_id, text)` frame — CurationFunnelSpec
    * plants a rule-failing doc, an exact duplicate, and a near-dup pair
    * and asserts each stage drops exactly its target. */
  private[queries] def curationFunnel(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"), col("text"),
      size(tokens(col("text"))).cast(LongType).as("n_words"))
    val kept = gopherRules(docs).filter(col("keep") === 1)
      .select("doc_id").join(w, "doc_id")
    val reps = kept
      .groupBy(sha2(col("text"), 256).as("ch"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").join(kept, "doc_id")
      .staged // read 3x (sketch, anti-join, census); subtree has the digest shuffle
    val sig = minhashSigOf(reps.select("doc_id", "text"))
    val dropped = candidatePairs(bandRowsOf(sig), materialize = true)
      .join(sig.select(col("doc_id").as("doc_a"), col("shset").as("sa"),
        col("n").as("na")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("shset").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("ninter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("ninter").cast(DoubleType) /
        (col("na") + col("nb") - col("ninter")) >= JaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val near = reps.join(dropped, Seq("doc_id"), "left_anti")
    def census(no: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_words")), lit(0L)).as("n_tokens"))
        .select(lit(no).as("stage_no"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    census(0, "raw", w)
      .union(census(1, "gopher_rules", kept))
      .union(census(2, "exact_dedup", reps))
      .union(census(3, "near_dedup", near))
  }

  /** Per-language shingle vocabulary profile, rows produced by the
    * native [[graft.functions.ShingleRows]] generator (the UDTF-category
    * Catalyst extension) instead of the explode(sequence)+element_at
    * build: totals via one map-side-combinable groupBy, the top shingle
    * via the row_number()<=1 pattern TopKRewriteRule re-plans onto the
    * bounded-heap operator. ShingleGenBench measured the generator at
    * parity (0.96x) with the codegen'd explode form under the p02 sketch
    * consumer at sf0.1 — digest+agg work dominates — so the generator is
    * surfaced here and via SQL `shingle_rows(...)` while p02 keeps its
    * measured form (PLANS.md). */
  private def p59ShingleVocab: Q = (s, d) => {
    val sh = docsBalanced(s, d)
      .select(col("lang"), graft.functions.ShingleRows.shingleRows(col("text"), ShingleW))
    val counts = sh.groupBy("lang", "shingle").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("lang")
      .agg(sum("cnt").as("n_shingles"), count(lit(1)).as("n_distinct"))
    val top = counts
      .withColumn("rn", row_number().over(Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("shingle"))))
      .filter(col("rn") === 1).drop("rn")
    totals.join(top, "lang")
      .select(col("lang"), col("n_shingles"), col("n_distinct"),
        col("shingle").as("top_shingle"), col("cnt").as("top_cnt"))
  }

  /** Merge rounds learned by p62 — fixed so the oracle can unroll. */
  private val BpeRounds = 3

  /** BPE merge induction — tokenizer training over the corpus. Learns
    * the first `BpeRounds` byte-pair-encoding merges: the word-frequency
    * table is built once (the ONLY corpus-sized stage: one token explode
    * into one keyed shuffle, then checkpointed), and every subsequent
    * stage is vocab-bounded — exactly how production BPE trainers scale,
    * since pair statistics over words×freq are identical to pair
    * statistics over the raw corpus. Each round: adjacent-symbol pairs
    * weighted by word frequency (one vocab-table pass + one keyed
    * shuffle), the argmax pair by (count, pair) — a 1-row
    * TakeOrderedAndProject broadcast, never a driver collect — and the
    * merge applied as a left-to-right fold over each word's symbols
    * (canonical greedy non-overlapping application: a fresh merge result
    * never immediately re-merges as the LEFT side within the round).
    * Words are restricted to lowercase-alpha length≥2 (single-symbol
    * words carry no pairs and never influence merges). The fold seeds
    * the accumulator with the first symbol so no index ever touches an
    * empty array. Output: one row per round — the merged pair and its
    * weighted count at selection time. The DuckDB oracle replays the
    * identical fold via list_reduce over singleton-wrapped symbols
    * (DuckDB 1.0's reduce has no initial-value form; element type =
    * accumulator type = list makes the first element the seed). */
  /** The corpus word-frequency table p62 trains on and p66 tokenizes —
    * one definition so the regex/length filter can never diverge
    * between learn and apply (the SQL side shares sqlBpeChain's wf). */
  private def corpusWordFreq(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]{2,}$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  private def p62BpeMerges: Q = (s, d) =>
    bpeLearnMerges(corpusWordFreq(s, d), BpeRounds)

  /** Canonical leftmost non-overlapping merge of the cross-joined
    * winner pair (a, b) into symbol list `l`, as a seeded fold — shared
    * by the global (p62) and per-key (p64) BPE learners. */
  private val BpeMergeFold =
    """aggregate(
      |  slice(l, 2, size(l) - 1),
      |  array(element_at(l, 1)),
      |  (acc, x) ->
      |    CASE WHEN element_at(acc, size(acc)) = a AND x = b
      |         THEN concat(slice(acc, 1, size(acc) - 1),
      |                     array(concat(a, b)))
      |         ELSE concat(acc, array(x)) END)""".stripMargin

  /** The p62 core over any (w, freq) word table — rounds-parametric so
    * the property suite can check the learned merges against an
    * in-memory canonical BPE trainer on arbitrary corpora. */
  private[graft] def bpeLearnMerges(words: DataFrame, rounds: Int): DataFrame =
    bpeLearnState(words, rounds)._1

  /** The global learner returning BOTH the merge table and the final
    * symbolized vocabulary (w, freq, l) — p62 reports the former, p66
    * tokenizes with the latter. The ≤1-row winner joins back LEFT on a
    * constant key (not a cross join): a winner-less round — no pairs
    * anywhere — leaves every symbol list untouched (NULL never equals
    * in the fold's CASE) instead of emptying the vocabulary, mirrored
    * in the oracle's LEFT JOIN ON TRUE. */
  private[graft] def bpeLearnState(words: DataFrame, rounds: Int)
      : (DataFrame, DataFrame) = {
    val (wins, syms) = bpeLearnRounds(words, rounds)
    (wins.zipWithIndex.map { case (w, i) =>
      w.select(lit(i + 1).as("round"), col("a").as("left_sym"),
        col("b").as("right_sym"), concat(col("a"), col("b")).as("merged"),
        col("cnt"))
    }.reduce(_ union _), syms)
  }

  /** The learner's raw state: each round's ≤1-row winner (a, b, cnt) in
    * rank order — the static merge artifacts the streaming tokenizer
    * joins against — plus the final symbolized vocabulary. */
  private[graft] def bpeLearnRounds(words: DataFrame, rounds: Int)
      : (Seq[DataFrame], DataFrame) = {
    val wf = words
      .withColumn("l", split(col("w"), ""))
      .select("w", "freq", "l")
      .staged
    def winnerOf(syms: DataFrame): DataFrame = syms
      .select(col("freq"),
        explode(when(size(col("l")) >= 2,
          sequence(lit(1), size(col("l")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"),
        col("l"))
      .select(col("freq"), element_at(col("l"), col("i")).as("a"),
        element_at(col("l"), col("i") + 1).as("b"))
      .groupBy("a", "b").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
    val (syms, winners) = (1 to rounds).foldLeft((wf, Seq.empty[DataFrame])) {
      case ((s0, acc), _) =>
        val win = winnerOf(s0).staged
        (bpeApplyMerge(s0, win, Seq("w", "freq", "l")), acc :+ win)
    }
    (winners, syms)
  }

  /** One merge round applied to any frame with a symbol-list column `l`:
    * the ≤1-row winner LEFT-joins on a constant key (winner-less rounds
    * pass rows through — NULL never merges in the fold). Shared by the
    * batch learner and the streaming tokenizer. */
  private[graft] def bpeApplyMerge(syms: DataFrame, win: DataFrame,
      keep: Seq[String]): DataFrame = syms
    .withColumn("k", lit(1))
    .join(broadcast(win.select(col("a"), col("b")).withColumn("k", lit(1))),
      Seq("k"), "left")
    .withColumn("l", expr(BpeMergeFold))
    .select(keep.head, keep.tail: _*)

  /** BPE apply — tokenize the corpus with the merges p62 learned, in
    * the same query: the final symbolized vocabulary (still
    * vocab-bounded — occurrences never re-tokenize, their word does)
    * aggregates to the corpus compression summary. Exact integers end
    * to end: symbol counts before (= characters) and after the merges,
    * weighted by word frequency. */
  private def p66BpeApply: Q = (s, d) => {
    val (_, syms) = bpeLearnState(corpusWordFreq(s, d), BpeRounds)
    syms.agg(
      count(lit(1)).as("n_words"),
      sum(col("freq")).as("n_occurrences"),
      sum(col("freq") * length(col("w"))).as("syms_before"),
      sum(col("freq") * size(col("l"))).as("syms_after"))
      .withColumn("syms_saved", col("syms_before") - col("syms_after"))
  }

  /** Per-language BPE merge induction — one tokenizer per language in a
    * single distributed pass. The same vocab-bounded round structure as
    * p62, but each round's argmax is PER KEY: a (key, pair)-keyed count
    * shuffle, a per-key row_number argmax (which the TopK rewrite plans
    * through the native bounded-heap operator), and the winners — at
    * most one row per language — broadcast into a key-equi-join for the
    * merge fold. No driver loop, no per-language job: 50 languages or
    * 5000 cost the same three rounds. A language whose words run out of
    * pairs simply stops producing winners (the inner join retires its
    * vocabulary, mirrored in the oracle). */
  private def p64BpeMergesByLang: Q = (s, d) =>
    bpeLearnMergesBy(
      Tables.documents(s, d)
        .select(col("lang").as("g"), explode(tokens(col("text"))).as("w"))
        .filter(col("w").rlike("^[a-z]{2,}$"))
        .groupBy("g", "w").agg(count(lit(1)).as("freq")),
      BpeRounds)
      .select(col("g").as("lang"), col("round"), col("left_sym"),
        col("right_sym"), col("merged"), col("cnt"))

  /** The keyed BPE core over any (g, w, freq) word table — the per-key
    * twin of `bpeLearnMerges`, rounds-parametric for the property
    * suite. */
  private[graft] def bpeLearnMergesBy(words: DataFrame, rounds: Int): DataFrame =
    bpeLearnStateBy(words, rounds)._1

  /** The keyed learner returning BOTH the merge table and the final
    * symbolized vocabulary (g, freq, l) — p64 reports the former, p95
    * measures fertility on the latter. The apply step LEFT-joins each
    * round's ≤1-per-key winner (NULL never merges in the fold), so a
    * key that runs out of pairs keeps its vocabulary unchanged instead
    * of losing it. Winners are PROVABLY identical to the former
    * inner-join form: a key lacks a winner only when its vocabulary has
    * no adjacent pair at all, and a pairless vocabulary passed through
    * unchanged still yields no pair next round — so retired keys stop
    * producing winners either way, and the oracle's inner-join replay
    * of p64 still matches. */
  private[graft] def bpeLearnStateBy(words: DataFrame, rounds: Int)
      : (DataFrame, DataFrame) = {
    val wf = words
      .withColumn("l", split(col("w"), ""))
      .select("g", "freq", "l")
      .staged
    def winnersOf(syms: DataFrame): DataFrame = syms
      .select(col("g"), col("freq"),
        explode(when(size(col("l")) >= 2,
          sequence(lit(1), size(col("l")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"),
        col("l"))
      .select(col("g"), col("freq"), element_at(col("l"), col("i")).as("a"),
        element_at(col("l"), col("i") + 1).as("b"))
      .groupBy("g", "a", "b").agg(sum("freq").as("cnt"))
      .withColumn("rn", row_number().over(Window.partitionBy("g")
        .orderBy(col("cnt").desc, col("a"), col("b"))))
      .filter(col("rn") === 1).drop("rn")
    def applyMerge(syms: DataFrame, win: DataFrame): DataFrame = syms
      .join(broadcast(win.select("g", "a", "b")), Seq("g"), "left")
      .withColumn("l", expr(BpeMergeFold))
      .select("g", "freq", "l")
    val (syms, winners) = (1 to rounds).foldLeft((wf, Seq.empty[DataFrame])) {
      case ((s0, acc), r) =>
        val win = winnersOf(s0).staged
        (applyMerge(s0, win), acc :+ win.select(col("g"),
          lit(r).as("round"), col("a").as("left_sym"), col("b").as("right_sym"),
          concat(col("a"), col("b")).as("merged"), col("cnt")))
    }
    (winners.reduce(_ union _), syms)
  }

  /** Incremental NEAR-dedup — the fuzzy twin of p36's exact incremental
    * path: an arriving batch (doc_id ≡ 0 mod 10) is checked against the
    * EXISTING corpus's LSH band index without ever re-pairing the
    * existing corpus with itself. At scale the existing side's sketch
    * and band rows are a stored signature table (here both sides come
    * off one checkpointed sketch build — the single-query analogue);
    * the batch only shuffles on band key, the p02 hot-bucket cap
    * applies to the union before the sides split (one policy, one
    * count), candidates are cross-side only (new × existing, never
    * new × new or existing × existing), and each verified batch doc
    * reports its match count and best existing match (highest Jaccard,
    * lowest doc_id tiebreak) through one per-new-doc window. */
  private def p65IncrementalNearDedup: Q = (s, d) => {
    val sig = minhashSig(s, d)
    val isNew = pmod(col("doc_id"), lit(10)) === 0
    val capped = capBuckets(bandRowsOf(sig)).staged
    val cand = capped.filter(isNew)
      .select(col("band"), col("bkey"), col("doc_id").as("new_id"))
      .join(capped.filter(!isNew)
        .select(col("band"), col("bkey"), col("doc_id").as("old_id")),
        Seq("band", "bkey"))
      .select("new_id", "old_id").distinct()
    val scored = cand
      .join(sig.select(col("doc_id").as("new_id"), col("shset").as("sa"),
        col("n").as("na")), "new_id")
      .join(sig.select(col("doc_id").as("old_id"), col("shset").as("sb"),
        col("n").as("nb")), "old_id")
      .withColumn("ninter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("ninter").cast(DoubleType) /
        (col("na") + col("nb") - col("ninter")))
      .filter(col("jaccard") >= JaccardThreshold)
    scored
      .withColumn("n_dups", count(lit(1)).over(Window.partitionBy("new_id")))
      .withColumn("rn", row_number().over(Window.partitionBy("new_id")
        .orderBy(col("jaccard").desc, col("old_id"))))
      .filter(col("rn") === 1)
      .select(col("new_id"), col("n_dups"), col("old_id").as("best_old"),
        col("jaccard").as("best_jaccard"))
  }

  /** Temperature-based mixture sampling (α = 0.5) — the multilingual
    * balancing rule LLM pipelines use beside p46's cap rule: sample
    * language l with probability ∝ p_l^α, flattening the head so
    * low-resource languages keep presence. Determinism across engines
    * is engineered op by op: shares come from exact integer counts,
    * sqrt/divide/multiply are single correctly-rounded IEEE ops, the
    * normalizer Σ p_l^α is a SORTED-ORDER fold (collect the per-lang
    * terms, sort, left-fold — never an unordered SUM whose float result
    * depends on partitioning), and the admission threshold quantizes
    * through p46's floor(rate × 10^6) integer compare. One count
    * shuffle, a langs-sized broadcast, one hash-filtered count — the
    * corpus is scanned twice and never shuffled on a data key. */
  private def p67TemperatureMix: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n_in"))
    val tot = docs.agg(count(lit(1)).as("n_tot"))
    val scored = byLang.crossJoin(broadcast(tot))
      .withColumn("sc", sqrt(col("n_in").cast(DoubleType) /
        col("n_tot").cast(DoubleType)))
    val z = scored.agg(expr(
      "aggregate(sort_array(collect_list(struct(lang, sc))), " +
        "cast(0.0 as double), (acc, x) -> acc + x.sc)").as("z"))
    val rates = scored.crossJoin(broadcast(z))
      .withColumn("q", col("sc") / col("z"))
      .withColumn("keep_rate", least(lit(1.0),
        (col("q") * floor(col("n_tot").cast(DoubleType) / lit(2.0))) /
          col("n_in").cast(DoubleType)))
    val kept = docs.join(rates.select("lang", "keep_rate"), "lang")
      .filter(h60(concat(lit("tmix:"), col("doc_id").cast(StringType)))
        % lit(MixScale) < floor(col("keep_rate") * lit(MixScale.toDouble)))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_in"),
        round(col("q"), 6).as("target_share"),
        round(col("keep_rate"), 6).as("keep_rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Corpus snapshot diff — the dataset-versioning primitive behind
    * refreshed-crawl curation: classify every document across two corpus
    * versions as added / removed / changed / unchanged and report the
    * per-(lang, status) census. The two versions are deterministic views
    * of the driver corpus (previous = doc_id≢0 mod 7, refreshed =
    * doc_id≢0 mod 5 with every 11th doc's text amended), mirroring
    * p36's hash-sliced batch derivation. Shape: contents reduce to one
    * md5 digest per side at the scan (at 100 TB the digest would be a
    * stored column — bytes never cross the shuffle), ONE doc_id-keyed
    * full outer join, a map-side three-way classification, and a tiny
    * keyed census aggregation. */
  private def p63SnapshotDiff: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val prev = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .select(col("doc_id"), col("lang").as("lang_a"),
        md5(col("text")).as("h_a"))
    val next = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("doc_id"), col("lang").as("lang_b"),
        md5(when(pmod(col("doc_id"), lit(11)) === 0,
          concat(col("text"), lit(" updated")))
          .otherwise(col("text"))).as("h_b"))
    prev.join(next, Seq("doc_id"), "full_outer")
      .select(coalesce(col("lang_a"), col("lang_b")).as("lang"),
        when(col("h_a").isNull, "added")
          .when(col("h_b").isNull, "removed")
          .when(col("h_a") =!= col("h_b"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("lang", "status").agg(count(lit(1)).as("n_docs"))
  }

  /** Per-source quota cap — the RefinedWeb/CCNet-style "at most K
    * documents per domain" step that stops one crawler-friendly site from
    * dominating a training mix. Keeps the `QuotaK` longest documents per
    * source (length as the quality proxy, doc_id as the deterministic
    * tiebreak), through the native bounded-heap top-k operator
    * ([[graft.plans.TopKPerKey]]): each task keeps at most sources×K rows,
    * so the shuffle carries ≤ tasks×sources×K rows and there is no global
    * sort and no full window — the same physical plan q53 measures 1.78×
    * faster than Spark's own WindowGroupLimit path, now exercised as a
    * curation stage rather than a SQL top-k. */
  private[graft] val QuotaK = 20
  private def p79SourceQuotaCap: Q = (s, d) =>
    graft.plans.TopKPerKey.topK(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
      Seq("source"), Seq(("n_chars", false), ("doc_id", true)), QuotaK)

  /** Epoch-materialized mixture: the "N epochs per domain" step of
    * training-mix construction. Each source gets a deterministic epoch
    * count (1–3, keyed on a portable hash of the source name so the DuckDB
    * twin derives the identical plan), and every document materializes one
    * row per epoch with a shard key hashed from (doc_id, epoch) — the
    * deterministic, reproducible global training order. The whole operator
    * is a codegen'd map + explode: ZERO shuffles at any corpus size; at
    * 100 TB the output lands shard-partitioned by a single write-side
    * repartition the consumer chooses. */
  private[graft] val MixEpochMax = 3
  private[graft] val MixShardN = 8
  private def p80MixtureEpochs: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (lit(1L) + pmod(h60(col("source")), lit(MixEpochMax.toLong))).as("epochs"))
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("epochs"))).as("epoch"))
      .select(col("doc_id"), col("source"), col("epoch"),
        pmod(h60(concat(col("doc_id").cast(StringType), lit(":"),
          col("epoch").cast(StringType))), lit(MixShardN.toLong)).as("shard"))

  /** Distribution-drift monitor: population stability index of each
    * source's doc-length distribution against the rest of the corpus over
    * fixed 100-char bins — the standing data-quality alarm a continuously
    * ingested corpus needs (PSI > 0.2 is the classic "investigate" line),
    * here in log2 bits via `qlog2` rather than libm nats so the score is
    * engine-deterministic. With 0.5-per-bin Laplace smoothing, p and q are
    * exact integer ratios — p = (2c+1)/(2T+B), q = (2(gc−c)+1)/(2(N−T)+B)
    * — so log2(p/q) is a qlog2 DELTA of two integer products, and each
    * bin's term is built from single correctly-rounded IEEE ops; the
    * per-source sum runs as a bin-SORTED fold (p67's rule: never an
    * unordered float SUM), making the output bit-identical to the oracle.
    * Scale shape: one (source, bin)-keyed count shuffle over the corpus,
    * then everything is bounded by sources×bins rows (the broadcast bin
    * grid densifies absent bins); no window, no pairwise work. At corpus
    * scale the bin counts would be pre-scaled to proportions (PSI is
    * scale-invariant) to keep the qlog2 products inside a long. */
  private[graft] val PsiMaxBin = 5
  private def p81SourceDriftPsi: Q = (s, d) => {
    val binsB = PsiMaxBin + 1 // number of bins = total smoothing mass ×2
    val binned = Tables.documents(s, d)
      .select(col("source"),
        least(lit(PsiMaxBin.toLong), expr("n_chars div 100")).as("bin"))
    val counts = binned.groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val grid = binned.select("source").distinct()
      .crossJoin(broadcast(s.range(0, PsiMaxBin + 1).toDF("bin")))
    // densified (source, bin, c) is read by three aggregations below —
    // stage it once instead of re-running the scan+groupBy per consumer
    val f = grid.join(counts, Seq("source", "bin"), "left_outer")
      .select(col("source"), col("bin"), coalesce(col("c"), lit(0L)).as("c"))
      .staged
    val tot = f.groupBy("source").agg(sum("c").as("t"))
    val gl  = f.groupBy("bin").agg(sum("c").as("gc"))
    val n   = f.agg(sum("c").as("n"))
    val pn = lit(2L) * col("c") + lit(1L)
    val pd = lit(2L) * col("t") + lit(binsB.toLong)
    val qn = lit(2L) * (col("gc") - col("c")) + lit(1L)
    val qd = lit(2L) * (col("n") - col("t")) + lit(binsB.toLong)
    val dq = (qlog2(pn * qd) - qlog2(qn * pd)).cast(DoubleType)
    val term = (pn.cast(DoubleType) / pd.cast(DoubleType)
      - qn.cast(DoubleType) / qd.cast(DoubleType)) * dq / lit(65536.0)
    f.join(tot, "source").join(gl, "bin").crossJoin(broadcast(n))
      .select(col("source"), col("bin"), term.as("term"))
      .groupBy("source")
      .agg(round(aggregate(
          array_sort(collect_list(struct(col("bin"), col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")), 6).as("psi"))
  }

  /** Soft dedup: reweight near-duplicates instead of dropping them —
    * every document's training weight is 1/|near-dup cluster| (weight 1
    * for singletons), so each distinct content contributes one unit of
    * training mass however many times it was crawled. The cluster labels
    * are p32's connected components over the capped-LSH pair graph; this
    * adds only a cluster-size count and one doc-keyed left join, so the
    * scale story is exactly p32's (bounded by the LSH bucket cap). The
    * weight is a single IEEE division + round, bit-identical across
    * engines. */
  private def p82SoftDedupWeights: Q = (s, d) => {
    val labels = dupClusterLabels(s, d).select(col("doc_id"), col("cluster_id"))
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(labels.join(sizes, "cluster_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("n_members"), lit(1L)).as("n_members"),
        round(lit(1.0) / coalesce(col("n_members"), lit(1L)).cast(DoubleType),
          6).as("weight"))
  }

  /** Deterministic quality-propensity sampling with inverse-propensity
    * weights: each document is accepted with probability proportional to
    * its stopword ratio (the classic cheap English-quality proxy),
    * clamped to [0.05, 1], and the survivors carry weight 1/p so any
    * downstream statistic over the sample is unbiased for the corpus.
    * The coin is a portable hash lane (h60(doc_id) mod 2^20) compared to
    * floor(p·2^20) — reproducible across runs, engines, and partitionings,
    * unlike `rand()`. ZERO shuffles at any corpus size: the whole operator
    * is a codegen'd map + filter, the ideal pre-tokenization thinning
    * stage. Every float step (one division, one clamp, one multiply, one
    * floor) is a single correctly-rounded IEEE op, so the DuckDB twin is
    * bit-exact. */
  private[graft] val SampleLanes = 1048576L // 2^20 hash lanes
  private def p83QualitySampling: Q = (s, d) => {
    val t = tokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(t).cast(LongType).as("n_tokens"),
        size(filter(t, x => x.isin(Stopwords: _*))).cast(LongType).as("n_stop"))
      .withColumn("p_acc", greatest(lit(0.05),
        least(lit(1.0), col("n_stop").cast(DoubleType) / col("n_tokens"))))
      .filter(pmod(h60(col("doc_id").cast(StringType)), lit(SampleLanes))
        < floor(col("p_acc") * lit(SampleLanes.toDouble)))
      .select(col("doc_id"), col("n_tokens"),
        round(col("p_acc"), 6).as("accept_p"),
        round(lit(1.0) / col("p_acc"), 6).as("weight"))
  }

  /** Event-volume anomaly detection: flags the (event_type, hour) cells
    * whose count deviates more than 3σ from that type's own hourly mean —
    * the standing alarm over an ingestion feed. The z² test is cleared of
    * floats entirely: z² > 9 ⟺ (n·c − s)² > 9(n·ss − s²) with s = Σc,
    * ss = Σc² per type, so the gate is exact 64-bit integer arithmetic
    * (at production volumes the counts would be pre-scaled or the test
    * run in doubles; the integer form is what makes the oracle exact).
    * Shape: one (type, hour)-keyed count shuffle over the feed, a
    * per-type aggregate bounded by |types| rows, and a broadcast join
    * back — no window, no sort. */
  private def p84HourlyAnomaly: Q = (s, d) =>
    p84Gate(Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("c")))

  /** The 3σ gate over an (event_type, hour, c) counts frame — split from
    * the scan so the int64-envelope guard is testable with synthetic
    * counts no real fixture could reach. */
  private[graft] def p84Gate(hourly: DataFrame): DataFrame = {
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("n_hours"), sum(col("c")).as("s"),
      sum(col("c") * col("c")).as("ss"), max(col("c")).as("max_c"))
    val dev = col("n_hours") * col("c") - col("s")
    // int64 safety envelope, enforced loudly: with M = max hourly count
    // and n hours, every product the gate forms is bounded by (n·M)² and
    // 9(n·M)², so n·M < 1e9 keeps all of them under Long.Max — a feed
    // beyond it must fail the job (pre-scale the counts), never silently
    // wrap and flip the 3σ verdict. assert_true returns NULL on pass, so
    // the filter keeps every row and cannot be pruned out of the plan.
    hourly.join(broadcast(stats), "event_type")
      .filter(assert_true(col("n_hours") * col("max_c") < lit(1000000000L),
        concat(lit("p84: hourly counts exceed the exact-int64 z² envelope" +
          " (n_hours*max_c >= 1e9) for event_type "), col("event_type")))
        .isNull)
      .filter(col("n_hours") >= 2 &&
        dev * dev > lit(9L) * (col("n_hours") * col("ss") - col("s") * col("s")))
      .select(col("event_type"), col("hour"), col("c"), col("n_hours"),
        (dev * dev).as("dev2"),
        (col("n_hours") * col("ss") - col("s") * col("s")).as("nvar"))
  }

  /** CUSUM drift monitor — the slow-change complement to p84's 3σ
    * spike gate (Page 1954; the control-charts pairing every
    * monitoring text prescribes): a one-sided upper CUSUM over each
    * event type's hourly count series detects a SUSTAINED upward
    * shift that no single hour's z-score would flag. Control-chart
    * discipline: the baseline μ₀/σ₀ come from each type's FIRST-HALF
    * hours (phase I — a drifted tail must never inflate its own
    * baseline, the self-masking failure of a full-series mean) and
    * the CUSUM runs over the second half with reference k = μ₀/8
    * (detects sustained shifts ≥ μ₀/4), alarm at 8σ₀ of cumulated
    * deviation. House integer-exact form: in 8nb-scaled units
    * S_t = max(0, S_{t−1} + 8nb·c_t − 9sb) is an exact int64
    * recurrence and the alarm squares to S² > 4096(nb·ssb − sb²) —
    * one integer compare. Int64 envelope asserts (every hour count
    * < 2.5e8 for exact steps, every S < 2e9 so S² cannot wrap) fail
    * loudly instead of wrapping, p84's rule.
    *
    * Scale shape: one (type, hour) counting shuffle (p84's), then the
    * sequential recurrence runs INSIDE a per-type `aggregate` HOF
    * over that type's collected hour array — hours per type are
    * time-bounded (a year is 8,760 entries), so the fold state is a
    * bounded array, never corpus-sized, and types process in
    * parallel. The oracle computes the identical recurrence as a
    * recursive CTE. */
  private def p122CusumDrift: Q = (s, d) =>
    cusumDriftOf(Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("c")))

  /** Closed hours a type's baseline freezes after — ONE declared
    * phase-I window shared by this batch op and its streaming twin
    * ([[graft.streaming.Streams.cusumDrift]] takes it as its default),
    * so the two are literally the same control chart: CusumTwinSpec
    * drives one series through both paths and asserts identical
    * (c, cusum8nb, alarm) rows. A fixed window (not the series
    * midpoint) is the control-chart deployment form — a stream cannot
    * know its own midpoint. */
  val CusumBaselineHours = 12L

  /** The p122 core over any (event_type, hour, c) frame —
    * Round10dOpsSpec drives a drifting synthetic series through it
    * (every hour 3σ-quiet, the CUSUM loud) and replays the
    * recurrence driver-side. Phase I/II split: baseline moments
    * (nb, sb, ssb) come from each type's FIRST [[CusumBaselineHours]]
    * hours (phase I, frozen — a drifted tail must not inflate its own
    * baseline) and the CUSUM runs over every later hour:
    * S_t = max(0, S_{t−1} + 8nb·c_t − 9sb)
    * (the k = μ₀/8 reference in 8nb-scaled exact integers), alarm
    * when S_t > 8σ₀, squared to S² > 4096(nb·ssb − sb²). Types with
    * no hours beyond the baseline window emit nothing — exactly the
    * streaming twin's phase-I silence. */
  private[graft] def cusumDriftOf(hourly: DataFrame,
      baselineHours: Long = CusumBaselineHours): DataFrame =
    hourly.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("hour"), col("c"))))
        .as("hs"))
      .filter(size(col("hs")) > baselineHours)
      .withColumn("nb", lit(baselineHours))
      .withColumn("sb", expr(
        "aggregate(slice(hs, 1, CAST(nb AS INT)), CAST(0 AS BIGINT)," +
          " (a, x) -> a + x.c)"))
      .withColumn("ssb", expr(
        "aggregate(slice(hs, 1, CAST(nb AS INT)), CAST(0 AS BIGINT)," +
          " (a, x) -> a + x.c * x.c)"))
      .withColumn("cmax", expr(
        "aggregate(hs, CAST(0 AS BIGINT), (a, x) -> greatest(a, x.c))"))
      // int64 envelope, loud — the streaming twin's exact guards
      // (graft.streaming.Streams.cusumDrift), re-derived from the
      // quantities the alarm actually squares rather than a cumulative
      // total that grows forever on healthy feeds: (1) every hour
      // count < 2.5e8 keeps each recurrence step's products exact;
      // (2) every emitted S < 2e9 (checked after the explode, below)
      // keeps S² < 4e18 < 2^63 in the alarm compare. Feeds beyond
      // either must pre-scale.
      .filter(assert_true(
        col("cmax") < lit(250000000L),
        concat(lit("p122: hour count exceeds the exact-int64 CUSUM" +
          " envelope (c >= 2.5e8) for event_type "), col("event_type")))
        .isNull)
      // threshold-side exactness: the alarm compares S^2 (< 4e18 under
      // the envelope above) against 4096*(nb*ssb - sb^2); nb*ssb < 2^50
      // keeps that product under 2^62 so the compare is exact int64 on
      // both sides even for baselines with extreme hourly mass (the
      // 4*n*s envelope alone does not bound it)
      .filter(assert_true(
        col("nb") * col("ssb") < lit(1L << 50),
        concat(lit("p122: baseline moments exceed the exact-int64 alarm" +
          " envelope (nb*ssb >= 2^50) for event_type "), col("event_type")))
        .isNull)
      .select(col("event_type"), col("nb"), col("sb"), col("ssb"),
        explode(expr(
          """aggregate(
            |  slice(hs, CAST(nb AS INT) + 1, size(hs) - CAST(nb AS INT)),
            |  named_struct(
            |    'run', CAST(0 AS BIGINT),
            |    'out', CAST(array() AS
            |      array<struct<hour:string,c:bigint,cusum:bigint>>)),
            |  (acc, x) -> named_struct(
            |    'run', greatest(CAST(0 AS BIGINT),
            |      acc.run + 8 * nb * x.c - 9 * sb),
            |    'out', concat(acc.out, array(named_struct(
            |      'hour', x.hour, 'c', CAST(x.c AS BIGINT),
            |      'cusum', greatest(CAST(0 AS BIGINT),
            |        acc.run + 8 * nb * x.c - 9 * sb))))),
            |  acc -> acc.out)""".stripMargin)).as("r"))
      // streaming-twin S guard: each emitted cusum IS the post-update
      // run, so asserting every row < 2e9 is exactly the per-step
      // check in Streams.cusumDrift. The first violating step is
      // computed exactly (prior S < 2e9, |step| ≤ 9·nb·2.5e8 under
      // cmax), so it cannot wrap before this catches it.
      .filter(assert_true(
        col("r.cusum") < lit(2000000000L),
        concat(lit("p122: CUSUM statistic exceeds the exact-int64 alarm" +
          " envelope (S >= 2e9) for event_type "), col("event_type")))
        .isNull)
      .select(col("event_type"), col("r.hour").as("hour"),
        col("r.c").as("c"), col("r.cusum").as("cusum8nb"),
        when(col("r.cusum") * col("r.cusum") >
          lit(4096L) * (col("nb") * col("ssb") - col("sb") * col("sb")), 1)
          .otherwise(0).cast(IntegerType).as("alarm"))

  /** Drift changepoint estimator — the CUSUM companion report: for
    * each event type whose p122 CUSUM alarms, WHEN did the shift
    * begin? The standard CUSUM changepoint MLE is the hour after the
    * statistic's LAST ZERO before the first alarm (the last reset —
    * everything since has accumulated into the alarm), plus the
    * detection delay in hours. This is the row an on-call pages on:
    * p122 says "drifting", p123 says "since 14:00, detected in 5
    * hours". Types that never alarm emit nothing.
    *
    * Scale shape: runs entirely over p122's phase-II output (types ×
    * bounded hours), per-type windows and keyed self-joins on that
    * bounded frame — the corpus-sized work is p122's one counting
    * shuffle, already paid. */
  private def p123DriftChangepoint: Q = (s, d) =>
    driftChangepointOf(cusumDriftOf(Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("c"))))

  /** The p123 core over any p122-shaped (event_type, hour, c,
    * cusum8nb, alarm) frame — Round10dOpsSpec replays it on the
    * drift fixture where the changepoint is known by construction. */
  private[queries] def driftChangepointOf(cu: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour")
    val rnk = cu.withColumn("rn", row_number().over(w)).staged
    val fa = rnk.filter(col("alarm") === 1)
      .groupBy("event_type").agg(min(col("rn")).as("arn"))
    val lz = rnk.join(fa, "event_type")
      .filter(col("cusum8nb") === 0L && col("rn") < col("arn"))
      .groupBy("event_type").agg(max(col("rn")).as("zrn"))
    val cp = fa.join(lz, Seq("event_type"), "left_outer")
      .select(col("event_type"), col("arn"),
        coalesce(col("zrn") + 1, lit(1)).as("crn"))
    cp.join(rnk.select(col("event_type"), col("rn"),
        col("hour").as("first_alarm_hour")),
        col("rn") === col("arn") && rnk("event_type") === cp("event_type"))
      .drop(rnk("event_type")).drop("rn")
      .join(rnk.select(col("event_type").as("et2"), col("rn"),
        col("hour").as("changepoint_hour")),
        col("rn") === col("crn") && col("et2") === col("event_type"))
      .select(col("event_type"), col("first_alarm_hour"),
        col("changepoint_hour"),
        (col("arn") - col("crn") + 1L).cast(LongType)
          .as("hours_to_detect"))
  }

  /** CDC keep-latest compaction (the read side of an upsert/merge): the
    * events feed is split into a snapshot and a change batch (event_id
    * mod 10 = 9, tagged `from_batch`), and each (user_id, event_type)
    * key resolves to its single latest row by (ts, event_id) — the
    * merge-on-read compaction every changelog-backed table needs. Runs
    * through the native bounded-heap top-k operator with k=1, so each
    * task retains at most one row per key it sees and the shuffle
    * carries ≤ tasks×keys rows instead of the full feed — a window
    * row_number would sort-shuffle every event. Key-count overflow
    * degrades to the operator's spillable-sort fallback, never OOM. */
  private def p85UpsertLatest: Q = (s, d) => {
    val u = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"),
        when(pmod(col("event_id"), lit(10L)) === 9, 1).otherwise(0)
          .as("from_batch"))
    graft.plans.TopKPerKey.topK(u, Seq("user_id", "event_type"),
      Seq(("ts_us", false), ("event_id", false)), 1)
  }

  /** Referential-integrity audit between the document corpus and its
    * embedding index — the reconciliation check a multi-table pipeline
    * runs after every incremental build (every doc embedded? every
    * vector backed by a live doc?). Drift is simulated by hash slices
    * (the p36/p63 pattern): embedding shards `vec_id % 10 = 3` are
    * "lost", documents `doc_id % 13 = 5` are "not yet ingested". Each
    * direction is one keyed LEFT ANTI join — at scale a shuffle join on
    * the id (or a broadcast when one side is small, which AQE decides) —
    * followed by a single-row summary aggregate, so the audit output is
    * category rows, never a data copy. */
  private def p87RefIntegrity: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(13L)) =!= 5)
    val vecs = Tables.embeddings(s, d).select(col("vec_id"))
      .filter(pmod(col("vec_id"), lit(10L)) =!= 3)
    def summarize(ids: DataFrame, idCol: String, category: String) =
      ids.agg(count(lit(1)).as("n_orphans"),
          min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
        .select(lit(category).as("category"), col("n_orphans"),
          col("min_id"), col("max_id"))
    summarize(docs.join(vecs, col("doc_id") === col("vec_id"), "left_anti"),
        "doc_id", "doc_without_vec")
      .unionAll(summarize(
        vecs.join(docs, col("vec_id") === col("doc_id"), "left_anti"),
        "vec_id", "vec_without_doc"))
  }

  /** Integer-exact PageRank over the near-dup graph — graph centrality
    * as a curation signal: within a duplicate cluster, the most-connected
    * document is the best canonical representative (hub of the template
    * family), complementing p41's size-based pick. Two power-iteration
    * rounds with damping 0.85, entirely in scaled integer arithmetic
    * (ranks start at 2^20; contributions are floor-divided by degree,
    * the damped sum is (85·Σ) div 100) so both engines agree bit for bit
    * — a float PageRank can never be oracle-exact. Each round is one
    * edge-keyed join + one dst-keyed sum: the BSP shape GraphX Pregel
    * runs, linear in edges, bounded by the LSH bucket cap like every
    * consumer of the p02 pair graph. */
  private[graft] val PrScale = 1L << 20
  private[graft] val PrBase = PrScale * 15 / 100
  private def p88DupPagerank: Q = (s, d) => {
    val pairs = nearDupPairs(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .staged
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = deg.select(col("src").as("doc_id"), lit(PrScale).as("rank"))
    for (_ <- 1 to 2) {
      ranks = edges.join(deg, "src")
        .join(ranks.select(col("doc_id").as("src"), col("rank")), "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
        .select(col("dst").as("doc_id"),
          (lit(PrBase) + expr("(85 * sc) div 100")).as("rank"))
    }
    ranks.join(deg.select(col("src").as("doc_id"),
        col("outdeg").as("degree")), "doc_id")
      .select(col("doc_id"), col("degree"), col("rank"))
  }

  /** The documents table's column list — the ONE list p89's Spark
    * unpivot, its loud schema check, and its generated DuckDB oracle all
    * derive from, so the two sides can never silently desynchronize
    * (round-9 ADVICE: the oracle used to hand-maintain this list). */
  private[graft] val DocumentsColumns =
    Seq("doc_id", "text", "lang", "source", "n_chars")

  /** Table profiler — the ANALYZE/data-profiling op an ingestion
    * pipeline runs on every new source: per column, row count, null
    * count, exact distinct count, lexicographic min/max (values profiled
    * as strings, binary collation on both engines), and the modal value
    * with its count. The count/distinct/mode shuffle is DIGEST-KEYED:
    * the unpivoted rows are reduced to (column_name, 16-byte md5 digest)
    * before the keyed count, so no full value — in particular no multi-KB
    * `text` payload — ever rides an exchange KEY (the round-9 scale nit);
    * the value itself rides that same aggregate as a min(v) PAYLOAD
    * (constant per digest), so the modal value needs NO second corpus
    * scan — it is read back off the staged per-digest frame, with min(v)
    * over the top-count ties resolving exactly like the oracle's
    * ORDER BY cnt DESC, v ASC;
    * min/max come from a no-unpivot per-column global aggregate whose
    * partials are one value per column per task. Digest collisions are
    * the p01 content-hash assumption (128-bit md5, negligible at any
    * corpus size). Output is |columns| rows, whatever the corpus size. */
  private def p89TableProfile: Q = (s, d) => {
    val df = Tables.documents(s, d)
    val cols = df.columns.toSeq
    require(cols == DocumentsColumns,
      s"documents schema drifted: $cols vs $DocumentsColumns — update " +
        "Pipeline.DocumentsColumns (the p89 oracle regenerates from it)")
    val unpivot = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"),
          col(c).cast(StringType).as("v"))): _*)).as("e"))
      .select(col("e.column_name").as("column_name"), col("e.v").as("v"))
    // ONE corpus scan: the value rides the digest-keyed count as an
    // aggregation PAYLOAD (min(v) — constant per digest, so map-side
    // combine carries one value per (column, digest) per task), never
    // as an exchange key. This replaces the round-11 shape whose modal
    // recovery re-evaluated the unpivot for a second full scan +
    // re-hash of every value: the payload bytes here equal what that
    // join shuffled anyway, and the second scan is gone.
    val grouped = unpivot
      .select(col("column_name"), unhex(md5(col("v"))).as("dg"), col("v"))
      .groupBy("column_name", "dg")
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("v"))
      .staged
    val stats = grouped.groupBy("column_name").agg(
      sum(col("cnt")).as("n_rows"),
      sum(when(col("dg").isNull, col("cnt")).otherwise(lit(0L))).as("n_nulls"),
      count(when(col("dg").isNotNull, lit(1))).as("n_distinct"))
    val minmaxRow = df.agg(
      min(col(cols.head).cast(StringType)).as(s"mn_${cols.head}"),
      cols.tail.flatMap(c => Seq(
        min(col(c).cast(StringType)).as(s"mn_$c"),
        max(col(c).cast(StringType)).as(s"mx_$c"))) :+
        max(col(cols.head).cast(StringType)).as(s"mx_${cols.head}"): _*)
    val minmax = minmaxRow.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"),
          col(s"mn_$c").as("min_value"),
          col(s"mx_$c").as("max_value"))): _*)).as("e"))
      .select("e.*")
    val maxc = grouped.filter(col("dg").isNotNull)
      .groupBy("column_name").agg(max(col("cnt")).as("top_cnt"))
    // modal value straight off the staged frame (no corpus re-scan):
    // min(v) over the digests tied at top_cnt is the oracle's
    // ORDER BY cnt DESC, v ASC resolution, since v is constant per
    // digest under the p01 128-bit collision assumption
    val top = grouped.filter(col("dg").isNotNull)
      .join(broadcast(maxc), "column_name")
      .filter(col("cnt") === col("top_cnt"))
      .groupBy("column_name")
      .agg(min(col("v")).as("top_value"), max(col("top_cnt")).as("top_cnt"))
    stats.join(broadcast(minmax), "column_name").join(top, "column_name")
  }

  /** The FK-discovery domain: every integral and string column of the
    * relational schema, tagged with its type family, derived from the
    * table schemas and mirrored here so the generated oracle and the
    * Spark side can never silently diverge (the Spark side
    * require-checks the live schemas against this list, the p89
    * pattern). Join keys live in the integral and string families;
    * float and timestamp columns are measures with no equality-stable
    * FK semantics, so they are not candidates. */
  private[graft] val FkDomain: Seq[(String, String, String)] = Seq(
    ("region", "r_regionkey", "int"), ("region", "r_name", "str"),
    ("nation", "n_nationkey", "int"), ("nation", "n_name", "str"),
    ("nation", "n_regionkey", "int"),
    ("customer", "c_custkey", "int"), ("customer", "c_name", "str"),
    ("customer", "c_nationkey", "int"), ("customer", "c_mktsegment", "str"),
    ("supplier", "s_suppkey", "int"), ("supplier", "s_name", "str"),
    ("supplier", "s_nationkey", "int"),
    ("part", "p_partkey", "int"), ("part", "p_name", "str"),
    ("part", "p_brand", "str"), ("part", "p_type", "str"),
    ("part", "p_size", "int"),
    ("orders", "o_orderkey", "int"), ("orders", "o_custkey", "int"),
    ("orders", "o_orderstatus", "str"), ("orders", "o_orderpriority", "str"),
    ("lineitem", "l_orderkey", "int"), ("lineitem", "l_partkey", "int"),
    ("lineitem", "l_suppkey", "int"), ("lineitem", "l_linenumber", "int"),
    ("lineitem", "l_returnflag", "str"), ("lineitem", "l_linestatus", "str"))

  /** All ordered cross-table same-family (child, parent) pairs over
    * [[FkDomain]] — the schema-driven candidate enumeration both
    * engines share. */
  private[graft] val FkCandidatePairs
      : Seq[((String, String, String), (String, String, String))] =
    for {
      c <- FkDomain; p <- FkDomain
      if c._1 != p._1 // an FK relates two tables; skip within-table pairs
      if c._3 == p._3 // type-compatible = same family (int↔int, str↔str)
    } yield (c, p)

  /** Join-key (FK) discovery — the schema-inference sibling of p89's
    * profiler, with the candidates ENUMERATED from the schema rather
    * than hand-listed (the round-9 gap): every cross-table ordered pair
    * of integral columns is a candidate, a pair survives iff the parent
    * is exactly unique and the child's exact NDV is ≤ the parent's, and
    * a surviving pair is an FK iff every distinct child value appears in
    * the parent (containment). The catalog's ANALYZE stats (the same
    * NDVs CBO join-reorder reads) prune hopeless pairs before any data
    * moves — with a 2× margin, far beyond HLL error, so the approximate
    * prune can never drop a pair the exact gate would keep; the exact
    * gate computed in-plan from the profiles stays authoritative, which
    * is what keeps the DuckDB twin reproducible. Each column's distinct
    * table is built ONCE and shared by every pair it appears in (the
    * round-9 version re-distincted per pair); each surviving pair costs
    * one keyed LEFT ANTI join of two distinct tables — linear, no
    * pairwise value work — and the summary carries counts so a
    * NEAR-containment (dirty FK) is visible, not just the boolean.
    * Dense-integer key spaces make some containments hold by accident
    * (region keys ⊂ nation keys): reported as found — containment-based
    * discovery over-approximates by design and the ranking/pruning
    * belongs to the consumer, exactly like the published
    * inclusion-dependency miners. */
  private def p90FkDiscovery: Q = (s, d) => {
    import org.apache.spark.sql.types.{ByteType, ShortType}
    val tables: Map[String, DataFrame] = Map(
      "region" -> Tables.region(s, d), "nation" -> Tables.nation(s, d),
      "customer" -> Tables.customer(s, d),
      "supplier" -> Tables.supplier(s, d), "part" -> Tables.part(s, d),
      "orders" -> Tables.orders(s, d), "lineitem" -> Tables.lineitem(s, d))
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    val live = FkDomain.map(_._1).distinct.flatMap(t =>
      tables(t).schema.fields.collect {
        case f if integral(f.dataType) => (t, f.name, "int")
        case f if f.dataType == StringType => (t, f.name, "str")
      })
    require(live == FkDomain,
      s"relational schema drifted: $live vs $FkDomain — update " +
        "Pipeline.FkDomain (the p90 oracle regenerates from it)")
    // approximate prune off the registered catalog's ANALYZE stats —
    // one optimized plan per TABLE (stats carry every column), not per
    // domain column
    graft.sql.SparkSqlRunner.ensureRegistered(s, d)
    val approx: Map[(String, String), (Option[Long], Option[Long])] =
      FkDomain.map(_._1).distinct.flatMap { t =>
        val stats = s.table(t).queryExecution.optimizedPlan.stats
        FkDomain.filter(_._1 == t).map { case (_, c, _) =>
          val nd = stats.attributeStats.collectFirst {
            case (a, cs) if a.name == c => cs.distinctCount.map(_.toLong)
          }.flatten
          (t, c) -> (nd, stats.rowCount.map(_.toLong))
        }
      }.toMap
    def mayBeUnique(k: (String, String, String)): Boolean =
      approx((k._1, k._2)) match {
        case (Some(nd), Some(n)) => nd * 2L >= n
        case _                   => true // no stats → never prune
      }
    def mayContainFewer(c: (String, String, String),
        p: (String, String, String)): Boolean =
      (approx((c._1, c._2))._1, approx((p._1, p._2))._1) match {
        case (Some(cn), Some(pn)) => cn <= pn * 2L
        case _                    => true
      }
    val candidates = FkCandidatePairs.filter { case (c, p) =>
      mayBeUnique(p) && mayContainFewer(c, p)
    }
    // a corpus whose stats prune every pair yields an empty report, not
    // an empty-reduce crash (graceful-degradation contract)
    if (candidates.isEmpty) fkEmptyReport(s)
    else fkContainments(s, tables, candidates)
  }

  private def fkEmptyReport(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("child_col", StringType),
        StructField("parent_col", StringType),
        StructField("n_child_distinct", LongType),
        StructField("n_unmatched", LongType),
        StructField("is_fk", IntegerType))))
  }

  private def fkContainments(s: SparkSession, tables: Map[String, DataFrame],
      candidates: Seq[((String, String, String), (String, String, String))])
      : DataFrame = {
    // ONE stacked distinct-value table over every column any candidate
    // touches, then ONE (family, value)-keyed self-join counting shared
    // values for ALL pairs at once — the SPIDER/BINDER-family
    // inclusion-dependency shape. Per value the join fan-out is bounded
    // by (#columns containing it)² ≤ |domain|², so the whole discovery
    // is two keyed shuffles however many candidate pairs the schema
    // yields (the per-pair anti-join form paid 27 distincts + 78 joins:
    // measured 14.3 → see PLANS.md). Integers stack through a cast to
    // their canonical decimal string, which is injective, so
    // string-equality on the stack is integer-equality on the data.
    // The stack is then reduced to (family, 16-byte md5 digest) BEFORE
    // the distinct and the containment self-join: the discovery only
    // COUNTS shared values, never reads one back, so the engine's
    // digests-on-exchange-keys rule (p89) applies verbatim — no raw
    // value rides the distinct's or the join's exchange, under the
    // same 128-bit collision assumption as p01/p89.
    val needed = candidates.flatMap(cp => Seq(cp._1, cp._2)).distinct
    val stacked = needed.map { case (t, c, fam) =>
        val v = if (fam == "int") col(c).cast(LongType).cast(StringType)
                else col(c)
        tables(t).select(lit(fam).as("fam"), lit(s"$t.$c").as("cid"),
          v.as("v")).filter(col("v").isNotNull)
      }.reduce(_ unionAll _)
      .select(col("fam"), col("cid"), unhex(md5(col("v"))).as("dg"))
      .distinct()
      .staged
    val profile = stacked.groupBy("fam", "cid")
      .agg(count(lit(1)).as("nd"))
    val matched = stacked
      .join(stacked.select(col("fam"), col("cid").as("pcid"), col("dg")),
        Seq("fam", "dg"))
      .filter(col("cid") =!= col("pcid"))
      .groupBy("cid", "pcid").agg(count(lit(1)).as("n_matched"))
    val rowsPerTable = needed.map(_._1).distinct.map(t =>
        tables(t).agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("ptbl"), col("n_rows")))
      .reduce(_ unionAll _)
    val candDf = s.createDataFrame(candidates.map {
        case ((ct, cc, fam), (pt, pc, _)) =>
          (fam, s"$ct.$cc", s"$pt.$pc", pt)
      }).toDF("fam", "ccid", "pcid", "ptbl")
    // every gate joins tiny frames (|columns| / |tables| rows); a column
    // with NO values has no profile row, so the inner joins double as
    // the no-evidence-no-claim gate (EmptyInputSpec: empty tables must
    // yield zero vacuous FK claims)
    candDf
      .join(profile.select(col("fam"), col("cid").as("ccid"),
        col("nd").as("n_child_distinct")), Seq("fam", "ccid"))
      .join(profile.select(col("fam"), col("cid").as("pcid"),
        col("nd").as("parent_nd")), Seq("fam", "pcid"))
      .join(broadcast(rowsPerTable), "ptbl")
      .join(matched.withColumnRenamed("cid", "ccid"),
        Seq("ccid", "pcid"), "left_outer")
      .filter(col("parent_nd") === col("n_rows") && // exact: parent unique
        col("n_child_distinct") <= col("parent_nd")) // exact NDV gate
      .select(col("ccid").as("child_col"), col("pcid").as("parent_col"),
        col("n_child_distinct"),
        (col("n_child_distinct") - coalesce(col("n_matched"), lit(0L)))
          .as("n_unmatched"),
        when(col("n_child_distinct") === coalesce(col("n_matched"), lit(0L)),
          1).otherwise(0).as("is_fk"))
  }

  /** Tombstone-aware CDC compaction — p85 completed with DELETE
    * semantics: change rows whose event_id ≡ 0 (mod 17) are tombstones,
    * and a key whose LATEST row is a tombstone disappears from the
    * compacted view entirely (the delete half of merge-on-read; a stale
    * tombstone under a newer upsert is ignored like any superseded row).
    * Same native bounded-heap top-1 per key as p85 — the tombstone
    * filter is applied AFTER the latest-row resolution, a codegen'd map
    * over ≤ keys rows, so deletes add zero shuffle. */
  private def p91UpsertTombstones: Q = (s, d) => {
    val u = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"),
        when(pmod(col("event_id"), lit(17L)) === 0, 1).otherwise(0)
          .as("is_delete"))
    graft.plans.TopKPerKey.topK(u, Seq("user_id", "event_type"),
        Seq(("ts_us", false), ("event_id", false)), 1)
      .filter(col("is_delete") === 0)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts_us"), col("value"))
  }

  /** Benchmark-decontamination audit — the check every training corpus
    * runs before release: does a training document share a LONG n-gram
    * with the held-out evaluation set? (Tokens leak benchmarks into
    * training data; n-gram overlap is the published detection standard,
    * with widths in the 8–13 range — 8 here.) The eval set is the
    * doc_id ≡ 7 (mod 29) slice, a fixture stand-in for the benchmark
    * suite; per contaminated train doc the report carries its distinct
    * 8-gram count, how many of those appear anywhere in the eval set,
    * and the fraction. Shape: two shingle explodes, per-side distinct,
    * one keyed LEFT SEMI join, two doc-keyed counts. At deploy scale
    * the eval n-gram set is benchmark-sized (MBs against a 100 TB
    * corpus), so AQE broadcasts the semi join and the only real shuffle
    * is doc-keyed; grams travel as portable 60-bit ids, never strings.
    * [[graft.streaming.Streams.contaminationMatches]] is the continuous
    * twin over an arriving document feed. */
  private[graft] val ContamW = 8
  private def p92Decontaminate: Q = (s, d) => {
    // per-doc-distinct gram sets built MAP-ONLY by the native
    // ShingleIdSet (round-10): the train side's (doc_id, g) distinct —
    // previously a corpus-wide shuffle — now happens in-row; only the
    // small eval slice still pays a (post-dedup) global distinct
    val docs = docsBalanced(s, d)
      .select(col("doc_id"),
        graft.functions.ShingleIdSet.shingleIdSet(col("text"), ContamW)
          .as("st"))
      .filter(col("st").isNotNull)
    val evalGrams = docs.filter(pmod(col("doc_id"), lit(29L)) === 7)
      .select(explode(col("st")).as("g")).distinct()
    val trainGrams = docs.filter(pmod(col("doc_id"), lit(29L)) =!= 7)
      .select(col("doc_id"), explode(col("st")).as("g"))
      .staged
    trainGrams.join(evalGrams, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
      .join(trainGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams")),
        "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        round(col("n_contaminated").cast(DoubleType) / col("n_grams"), 6)
          .as("contam_frac"))
  }

  /** Dedup-index quality monitoring — p72's recall@k story for the
    * near-dup family: the capped-LSH index (p02) is probabilistic, and
    * its recall degrades silently as the corpus drifts (band width,
    * shingle length and the bucket cap were tuned for SOME duplicate
    * structure), so a production pipeline continuously compares it to
    * EXACT ground truth on a deterministic sample. Sample = doc_id ≡ 0
    * (mod 2) here (a fixture-sized stand-in — production uses a
    * fixed-size hash sample so the exact side stays bounded at any
    * corpus size); ground truth is all-pairs exact Jaccard WITHIN the
    * sample (a broadcast self-join of sample sketches — |S|² work by
    * design, never corpus-pairwise), found = the p02 pair-graph
    * artifact restricted to sample-internal pairs. One summary row:
    * true/found/hit counts, recall (the number that decays), precision
    * (structurally 1.0 — the LSH index exact-verifies every candidate,
    * so it can only MISS pairs, never invent them; reported so a
    * verify-stage regression is visible too). */
  private def p93DedupRecall: Q = (s, d) => {
    val sig = minhashSig(s, d)
      .filter(pmod(col("doc_id"), lit(2L)) === 0)
      .select(col("doc_id"), col("shset"), col("n"))
    val truth = sig
      .select(col("doc_id").as("doc_a"), col("shset").as("sa"),
        col("n").as("na"))
      .crossJoin(broadcast(sig.select(col("doc_id").as("doc_b"),
        col("shset").as("sb"), col("n").as("nb"))))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("ninter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("ninter").cast(DoubleType) /
        (col("na") + col("nb") - col("ninter")) >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"))
      .staged
    val found = nearDupPairs(s, d)
      .filter(pmod(col("doc_a"), lit(2L)) === 0 &&
        pmod(col("doc_b"), lit(2L)) === 0)
      .select(col("doc_a"), col("doc_b"))
      .staged
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(found.join(truth, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_found"), col("n_hit"),
        when(col("n_true") > 0, round(col("n_hit").cast(DoubleType) /
          col("n_true"), 6)).as("recall"),
        when(col("n_found") > 0, round(col("n_hit").cast(DoubleType) /
          col("n_found"), 6)).as("precision"))
  }

  /** Embedding-quality eval by kNN label agreement — the training-free
    * health check an embedding table gets before anything trusts it
    * (and the monitoring probe that catches a bad re-embedding run):
    * each vector's 3 nearest neighbors (p33's IVF-bucketed exact-cosine
    * graph) vote with their labels, the majority label (count DESC,
    * label ASC on ties) is compared to the vector's own label, and the
    * per-label census reports coverage and accuracy. A label whose
    * accuracy dips marks a region where the embedding space no longer
    * separates the classes — the drift signal for re-training. Votes,
    * argmax, and censuses are exact integers (accuracy is one IEEE
    * division at output); vectors alone in their IVF cell have no
    * neighbors and are reported as unvoted coverage loss, not dropped.
    * Cost beyond the graph build: one vec-keyed count, a per-vec argmax
    * through the native top-k rewrite, and a label join that broadcasts
    * at any corpus size (labels ride with vec ids, never vectors). */
  private def p96KnnLabelEval: Q = (s, d) => {
    val labels = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val votes = p33KnnGraph(s, d)
      .join(labels.select(col("vec_id").as("nbr_id"),
        col("label").as("nbr_label")), "nbr_id")
      .groupBy("vec_id", "nbr_label").agg(count(lit(1)).as("cnt"))
    val pred = votes
      .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("cnt").desc, col("nbr_label").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("nbr_label").as("pred_label"))
    labels.join(pred, Seq("vec_id"), "left")
      .groupBy("label").agg(
        count(lit(1)).as("n_vecs"),
        count(col("pred_label")).as("n_voted"),
        sum(when(col("pred_label") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n_vecs"), col("n_voted"), col("n_correct"),
        when(col("n_voted") > 0,
          round(col("n_correct").cast(DoubleType) / col("n_voted"), 6))
          .as("accuracy"))
  }

  /** Per-language tokenizer fertility audit — the vocabulary-allocation
    * metric the multilingual-tokenizer papers (mT5, XLM-R, NLLB) report
    * before fixing a vocab: symbols emitted per word OCCURRENCE by
    * language under (a) the corpus-wide tokenizer p62 learns — where
    * languages compete for the merge budget, so dominant languages
    * tokenize shorter — and (b) each language's OWN tokenizer (p64's
    * per-key learner), the fertility floor at the same merge budget.
    * The gap per language is the parity cost of sharing one vocabulary,
    * the number that decides vocab-size allocation. Every sum is an
    * exact integer (freq × symbol counts over the vocab-bounded word
    * tables — occurrences never re-tokenize, their vocab word does);
    * fertility itself is one IEEE division + round at output. Cost: the
    * two learners' corpus-sized token explode (shared shape), then
    * everything vocab-bounded; the final join is |languages| rows. */
  private def p95TokenizerFertility: Q = (s, d) => {
    val wl = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]{2,}$"))
      .groupBy("lang", "w").agg(count(lit(1)).as("freq"))
      .staged // read twice: the global-side join and the own-side learner
    val (_, gsyms) = bpeLearnState(corpusWordFreq(s, d), BpeRounds)
    val glob = wl
      .join(gsyms.select(col("w"), size(col("l")).as("gs")), "w")
      .groupBy("lang").agg(
        sum(col("freq")).as("n_occurrences"),
        sum(col("freq") * length(col("w"))).as("syms_char"),
        sum(col("freq") * col("gs")).as("syms_global"))
    val own = bpeLearnStateBy(
        wl.select(col("lang").as("g"), col("w"), col("freq")), BpeRounds)._2
      .groupBy(col("g").as("lang"))
      .agg(sum(col("freq") * size(col("l"))).as("syms_own"))
    glob.join(own, "lang")
      .select(col("lang"), col("n_occurrences"), col("syms_char"),
        col("syms_global"), col("syms_own"),
        round(col("syms_global").cast(DoubleType) / col("n_occurrences"), 6)
          .as("fertility_global"),
        round(col("syms_own").cast(DoubleType) / col("n_occurrences"), 6)
          .as("fertility_own"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * priority sampling) — the one sampling regime p30 (stratified),
    * p46/p67 (rate-based mixtures), and p83 (propensity rejection)
    * don't cover: a FIXED-SIZE sample of K docs with inclusion
    * probability increasing in a per-doc weight (token count here —
    * "sample exactly 10k docs ∝ length" is the everyday corpus-
    * inspection job), without replacement, in one distributed pass.
    * E–S keys each item u^(1/w) and keeps the global top-K;
    * equivalently the K SMALLEST −log2(u)/w. Made engine-portable by
    * the deterministic coin (a 32-bit portable-hash lane — rand() is
    * neither reproducible nor partition-stable) and the quantized log:
    * surprisal_q = 32·2^16 − qlog2(h32+1) is an exact integer and
    * priority = surprisal_q / w one correctly-rounded IEEE division —
    * a monotone piecewise-linear variant of the E–S key that replays
    * bit-identically in the oracle. The plan is a scan feeding
    * TakeOrderedAndProject (per-partition K-heaps, K rows to the final
    * stage) — no global sort, no corpus shuffle; the rank window
    * orders K rows. */
  private val SampleK = 64

  /** The p97 scoring expressions, shared with the streaming reservoir
    * ([[graft.streaming.Streams.weightedReservoir]]) so batch and
    * stream sample by the identical deterministic key. */
  private[graft] def wsampleWeight(text: Column): Column =
    greatest(lit(1L), size(tokens(text)).cast(LongType))
  private[graft] def wsamplePriority(docId: Column, w: Column): Column =
    (lit(32L * 65536L) -
      qlog2(pmod(h60(concat(lit("wsample:"), docId.cast(StringType))),
        lit(4294967296L)) + lit(1L))).cast(DoubleType) / w

  private def p97WeightedSample: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        wsampleWeight(col("text")).as("w"))
      .withColumn("priority", wsamplePriority(col("doc_id"), col("w")))
    scored.orderBy(col("priority").asc, col("doc_id").asc).limit(SampleK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("priority").asc, col("doc_id").asc)))
      .select(col("rnk"), col("doc_id"), col("lang"), col("w"),
        round(col("priority"), 6).as("priority"))
  }

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
  private def p98LeakageFreeSplit: Q = (s, d) => {
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

  /** Per-language perplexity filter — CCNet's ACTUAL form (Wenzek et
    * al. 2020 train one KenLM per language and bucket per language;
    * p73 is the corpus-global simplification): one bigram LM per lang
    * (lang joins every model/context/vocab key), every held-out doc
    * scored against its OWN language's LM, and head/middle/tail
    * terciles cut within each language's distribution — so a language
    * whose text is globally rarer is not wholesale-condemned to the
    * tail, the exact failure mode the per-language design exists to
    * avoid. Same integer-exact machinery as p73 (qlog2 surprisal,
    * value-histogram cutoffs — the histogram is per-(lang, value), so
    * the cumulative window orders a bounded value table, never docs).
    * Languages absent from the training slice produce no scored docs,
    * by construction: no LM, no score. */
  private def p106PerplexityByLang: Q = (s, d) =>
    perplexityByLangCensus(Tables.documents(s, d).withColumn("is_test",
      pmod(h60(col("doc_id").cast(StringType)), lit(10)) === 9))

  /** The p106 core over any `(doc_id, lang, text, is_test)` frame —
    * the property suite feeds it a two-language corpus where one
    * language is globally "worse" and proves the per-language cut
    * still heads its most fluent docs. */
  private[queries] def perplexityByLangCensus(docs: DataFrame): DataFrame = {
    val model = bigramPairs(docs.filter(!col("is_test")), Seq("lang"))
      .groupBy("lang", "prev", "cur").agg(count(lit(1)).as("cnt"))
      .staged // read twice: the ctx aggregation and the scoring join
    val ctx = model.groupBy("lang", "prev").agg(sum(col("cnt")).as("ctx"))
    val vsize = docs.filter(!col("is_test"))
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy("lang").agg(countDistinct(col("tok")).as("v"))
    val scored = bigramPairs(docs.filter(col("is_test")), Seq("lang"))
      .join(model, Seq("lang", "prev", "cur"), "left_outer")
      .join(ctx, Seq("lang", "prev"), "left_outer")
      .join(broadcast(vsize), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        (qlog2(coalesce(col("ctx"), lit(0L)) + col("v"))
          - qlog2(coalesce(col("cnt"), lit(0L)) + lit(1L))).as("bits_q"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("bits_q")).as("bits_q"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("lang"),
        ldiv(col("bits_q"), col("n_bigrams")).as("bpt_q"))
      .staged // read twice: the cutoff histogram and the final census
    val hist = scored.groupBy("lang", "bpt_q").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("lang").orderBy(col("bpt_q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cuts = hist.withColumn("cum", sum(col("n")).over(wCum))
      .join(hist.groupBy("lang").agg(sum(col("n")).as("n_docs")), "lang")
      .groupBy("lang")
      .agg(min(when(col("cum") * 3 >= col("n_docs"), col("bpt_q"))).as("c1"),
        min(when(col("cum") * 3 >= col("n_docs") * 2, col("bpt_q"))).as("c2"))
    scored.join(cuts, "lang")
      .select(col("lang"), col("bpt_q"),
        when(col("bpt_q") <= col("c1"), lit("head"))
          .when(col("bpt_q") <= col("c2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("bpt_q")).as("min_bpt_q"),
        max(col("bpt_q")).as("max_bpt_q"))
  }

  /** Decontamination release gate — p92's detection acted on, the way
    * the published pipelines ship (GPT-3/The Pile drop the overlapping
    * TRAINING documents before release): every train doc carrying any
    * eval 8-gram is removed, and the op emits the before/after/dropped
    * census a release note leads with — doc and token counts, so the
    * cost of the decontamination is a number beside its effect. The
    * flagged list is p92's own output (one shared construction, the
    * p37→p75 detect→act pattern); removal is one doc-keyed LEFT ANTI
    * join; censuses are two bounded aggregates of the staged train
    * projection. */
  private def p109DecontamRelease: Q = (s, d) => {
    val flagged = p92Decontaminate(s, d).select("doc_id")
    val train = Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(29L)) =!= 7)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_toks"))
      .staged // read twice: the before census + the anti-join survivors
    def census(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_toks")), lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), col("n_docs"), col("n_tokens"))
    val before = census(train, "train_before")
    val after = census(train.join(flagged, Seq("doc_id"), "left_anti"),
      "train_after")
    val dropped = before.select(col("n_docs").as("b_docs"),
        col("n_tokens").as("b_toks"))
      .crossJoin(broadcast(after.select(col("n_docs").as("a_docs"),
        col("n_tokens").as("a_toks")))) // 1-row scalar sides
      .select(lit("dropped").as("stage"),
        (col("b_docs") - col("a_docs")).as("n_docs"),
        (col("b_toks") - col("a_toks")).as("n_tokens"))
    before.union(after).union(dropped)
  }

  /** Pipeline health report — the monitor of monitors: one fixed-shape
    * (check, value, threshold, alarm) table summarizing every standing
    * alarm this engine computes — feed anomalies (p84), source drift
    * (p81), embedding-codebook drift (p100), dedup-index recall (p93),
    * corpus↔index integrity (p87) — the single table a pipeline
    * dashboard pages on. Each row is a bounded aggregate OF the
    * corresponding operator's own output (the Scala calls the same Q
    * functions; the oracle embeds the same five sub-oracles verbatim),
    * so the report cannot drift from the checks it summarizes; the
    * expensive substrates (pair graph, kmeans assignment) come from the
    * shared session artifacts, paid once per corpus build. Thresholds
    * are the classic lines (PSI 0.2, recall 0.8, zero tolerance for
    * anomalies/orphans); `alarm` is NULL when a check has no defined
    * value (an empty corpus has no recall). */
  private def p110HealthReport: Q = (s, d) => {
    def row(check: String, v: DataFrame, threshold: Double,
        higherBad: Boolean): DataFrame = {
      val value = col("v").cast(DoubleType)
      v.select(lit(check).as("check"), value.as("value"),
        lit(threshold).as("threshold"),
        (if (higherBad) value > threshold else value < threshold)
          .as("alarm"))
    }
    row("feed_anomaly_cells",
      p84HourlyAnomaly(s, d).agg(count(lit(1)).as("v")), 0.0, true)
      .union(row("source_drift_psi_max",
        p81SourceDriftPsi(s, d).agg(max(col("psi")).as("v")), 0.2, true))
      .union(row("embedding_drift_psi",
        p100EmbeddingDrift(s, d).agg(max(col("psi")).as("v")), 0.2, true))
      .union(row("dedup_index_recall",
        p93DedupRecall(s, d).select(col("recall").as("v")), 0.8, false))
      .union(row("index_orphans",
        p87RefIntegrity(s, d).agg(sum(col("n_orphans")).as("v")), 0.0, true))
      .union(row("cusum_drift_alarms",
        p122CusumDrift(s, d).agg(
          sum(col("alarm").cast(LongType)).as("v")), 0.0, true))
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
  private def p108NoveltyCurve: Q = (s, d) => {
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
  private def p107PaddingAudit: Q = (s, d) => {
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
  private def p105TrainingOrder: Q = (s, d) =>
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

  /** Multi-probe sign-bucket ANN over [[signBucket]]'s Charikar
    * hyperplanes — recall insurance for the single-bucket path (p72
    * measures the lift): each probe searches its own sign bucket PLUS the
    * [[AnnBits]] buckets at Hamming distance 1 (Lv et al. 2007's
    * multi-probe LSH — spend probes instead of building more tables), so
    * a near neighbor that disagrees on one sign bit is no longer
    * invisible. Only the PROBE side fans out (×(bits+1) keys on the small
    * probe set); every corpus vector still carries exactly one bucket and
    * the join stays keyed — per-probe work is (bits+1)·corpus/2^bits
    * candidates, and because
    * buckets partition the corpus the probe keys are distinct and no
    * candidate dedup stage is needed. Recall is monotonically ≥ the
    * single-bucket path by construction (a candidate that displaces a
    * true top-k hit must itself be a true top-k hit under the same
    * global sim order); AnnRecallSpec measures the actual lift and p72
    * now monitors all three index variants. */
  private def p104AnnMultiprobe: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(vdot(col("v"), col("v"))))
      .withColumn("bucket", signBucket(col("v"), AnnBits))
    val probes = e.select(col("vec_id").as("probe_id"), col("v").as("pv"),
      col("nrm").as("pnrm"), col("bucket")).filter(col("probe_id") < 20)
    val probeKeys = probes.select(col("probe_id"), col("pv"), col("pnrm"),
      explode(array(col("bucket") +:
        (1 to AnnBits).map(i => flipBit(col("bucket"), i)): _*)).as("bucket"))
    val sims = e.join(probeKeys, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(vdot(col("pv"), col("v")) / (col("pnrm") * col("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("probe_id", "vec_id", "rnk", "sim")
  }

  /** The [[AnnBits]]-char sign-bucket string with bit `i` (1-based)
    * flipped — shared by p104's probe fan-out and p72's multi-probe
    * monitor. */
  private def flipBit(b: Column, i: Int): Column = concat(
    substring(b, 1, i - 1),
    when(substring(b, i, 1) === "1", lit("0")).otherwise(lit("1")),
    substring(b, i + 1, AnnBits - i))

  /** Source-trust policy table for provenance-aware dedup: tier 1 =
    * curated sources, tier 2 = vetted web, everything else tier 3
    * (raw crawl). In production this is a config input per corpus
    * build; here it is a declared constant that BOTH the Spark
    * expression and the DuckDB oracle CASE are generated from, so the
    * two sides cannot drift (the p89 oracle-generation rule). */
  private[graft] val SourceTiers: Seq[(Int, Seq[String])] = Seq(
    1 -> (0 to 4).map("src" + _),
    2 -> (5 to 12).map("src" + _))
  private[graft] val DefaultTier = 3
  private def tierOf(c: Column): Column =
    SourceTiers.foldRight(lit(DefaultTier): Column) { case ((t, ss), acc) =>
      when(c.isin(ss: _*), lit(t)).otherwise(acc)
    }
  private def sqlTier(c: String): String =
    "CASE " + SourceTiers.map { case (t, ss) =>
      s"WHEN $c IN (${ss.map("'" + _ + "'").mkString(", ")}) THEN $t"
    }.mkString(" ") + s" ELSE $DefaultTier END"

  /** Provenance-priority canonical selection — the keeper policy real
    * curation pipelines apply when near-duplicates span sources of
    * different trust (keep the curated copy of a page over the crawl
    * copy, whatever their lengths — the RefinedWeb/Dolma rule): within
    * each near-dup cluster the representative is chosen by source TIER
    * first ([[SourceTiers]]), then p41's (longest, min doc_id) rule as
    * the tiebreak. The length-only pick is emitted beside it with an
    * `overridden` flag, so the output IS the policy audit: which
    * clusters provenance decided differently. Both picks run through
    * the native bounded-heap top-1 per key over the one staged
    * cluster-member table (≤ tasks×clusters shuffle rows each, no
    * window sort); members are the p32 label artifact joined to the
    * narrow (doc_id, source, n_chars) projection, so the text never
    * moves. */
  private def p99ProvenanceReps: Q = (s, d) => {
    val members = dupClusterLabels(s, d)
      .select(col("doc_id"), col("cluster_id"))
      .join(Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          tierOf(col("source")).as("tier")),
        "doc_id")
      .staged // read 3x: two top-1 passes + the size census
    val prov = graft.plans.TopKPerKey.topK(members, Seq("cluster_id"),
      Seq(("tier", true), ("n_chars", false), ("doc_id", true)), 1)
      .select(col("cluster_id"), col("doc_id").as("rep_prov"),
        col("tier").as("rep_tier"))
    val longest = graft.plans.TopKPerKey.topK(members, Seq("cluster_id"),
      Seq(("n_chars", false), ("doc_id", true)), 1)
      .select(col("cluster_id"), col("doc_id").as("rep_longest"))
    members.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      .join(prov, "cluster_id")
      .join(longest, "cluster_id")
      .select(col("cluster_id"), col("n_members"), col("rep_prov"),
        col("rep_tier"), col("rep_longest"),
        (col("rep_prov") =!= col("rep_longest")).as("overridden"))
  }

  /** Embedding-space snapshot drift — the monitor that explains WHY ANN
    * recall decays (p72/p93 measure THAT it decays): the population
    * share of each k-means codebook cell is compared between two corpus
    * snapshots with the same PSI-in-bits rule as p81 (0.5-per-cell
    * Laplace smoothing makes p and q exact integer ratios, each term a
    * qlog2 delta of integer products, the total a cell-SORTED fold —
    * bit-identical across engines). A codebook trained on snapshot A
    * silently mis-buckets snapshot B's vectors as the distribution
    * moves; this is the standing alarm that triggers recentering.
    * Snapshots are the p63 hash-slice stand-ins (vec_id mod 7 / mod 5);
    * in production they are two corpus versions. Cost: the cell
    * assignment is the shared kmeans artifact — this op adds two
    * filtered per-cell counts and K-row arithmetic, nothing
    * corpus-sized beyond the (already-paid) assignment scan. */
  private def p100EmbeddingDrift: Q = (s, d) => {
    val (_, a2) = kmeansState(s, d)
    val cells = a2.select(col("vec_id"), col("cell"))
    val counts = cells.groupBy("cell").agg(
      count(when(pmod(col("vec_id"), lit(7L)) =!= 0, 1)).as("n_prev"),
      count(when(pmod(col("vec_id"), lit(5L)) =!= 0, 1)).as("n_next"))
    val grid = broadcast(s.range(0, KmeansK).toDF("cell"))
    val f = grid.join(counts, Seq("cell"), "left_outer")
      .select(col("cell"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_next"), lit(0L)).as("n_next"))
      .staged // read twice: per-cell terms + the snapshot totals
    val tot = f.agg(sum("n_prev").as("tp"), sum("n_next").as("tn"))
    val B = KmeansK.toLong
    val pn = lit(2L) * col("n_next") + lit(1L)
    val pd = lit(2L) * col("tn") + lit(B)
    val qn = lit(2L) * col("n_prev") + lit(1L)
    val qd = lit(2L) * col("tp") + lit(B)
    val dq = (qlog2(pn * qd) - qlog2(qn * pd)).cast(DoubleType)
    val term = (pn.cast(DoubleType) / pd.cast(DoubleType)
      - qn.cast(DoubleType) / qd.cast(DoubleType)) * dq / lit(65536.0)
    val terms = f.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_prev"), col("n_next"), term.as("term"))
    val psi = terms.groupBy()
      .agg(aggregate(
        array_sort(collect_list(struct(col("cell"), col("term")))),
        lit(0.0), (acc, x) => acc + x.getField("term")).as("psi"))
    terms.crossJoin(broadcast(psi)) // 1-row scalar side
      .select(col("cell"), col("n_prev"), col("n_next"),
        round(col("term"), 6).as("term"), round(col("psi"), 6).as("psi"))
  }

  /** Cross-source near-dup matrix — which sources MIRROR each other:
    * near-dup pair counts aggregated to unordered (source, source)
    * cells. The off-diagonal is the mirror-site / re-hosting signal the
    * published corpus reports lead their dedup sections with (one crawl
    * re-serving another's pages), and the diagonal is each source's
    * internal duplication; both feed the per-source quota and tier
    * decisions (p79, p99). Cost on top of the pair-graph artifact: two
    * doc-keyed joins of the LSH-bounded pair list against the narrow
    * (doc_id, source) projection — the pair side is the small one and
    * AQE broadcasts it — then a ≤ sources² aggregation. */
  private def p101SourceMirror: Q = (s, d) => {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    nearDupPairs(s, d).select("doc_a", "doc_b")
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        (col("source_a") =!= col("source_b")).as("cross_source"))
  }

  /** One-query dataset card — the corpus datasheet a dataset release
    * leads with ("Datasheets for Datasets", Gebru et al. 2021; every
    * published-corpus paper's table 1), composed from the engine's own
    * building blocks in a single plan: corpus census, language and
    * source composition, quality-gate pass rate (p23's gate), exact-
    * and near-duplication rates (p01's hash rule + the p02/p32 pair
    * and label artifacts), and eval-set contamination (p92's 8-gram
    * overlap). Fixed (section, metric, n, frac) schema so the card is
    * machine-diffable between corpus versions. Scale shape: ONE corpus
    * scan builds the staged per-doc base (tokens/hash/quality gate all
    * map-side); every section is then a bounded aggregation of that
    * base or of an already-LSH-bounded artifact — the near-dup and
    * contamination sections reuse the shared pair-graph/label
    * machinery rather than re-sketching; output is ~(5 + langs +
    * sources + 4) rows at any corpus size. */
  private def p102DatasetCard: Q = (s, d) => {
    val t = tokens(col("text"))
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(t).cast(LongType).as("n_toks"),
        sha2(col("text"), 256).as("h"),
        (size(filter(t, x => x.isin(Stopwords: _*))) / size(t)
          >= QualityMinStopRatio &&
          size(t).cast(LongType) >= QualityMinTokens).as("qpass"))
      .staged // one corpus scan, read by census + both share sections
    val census = base.agg(count(lit(1)).as("n_docs"),
      sum("n_toks").as("n_tokens"), sum("n_chars").as("n_chars"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(when(col("qpass"), 1L).otherwise(0L)).as("n_quality"),
      (count(lit(1)) - countDistinct(col("h"))).as("n_exact_dup"))
      .staged // 1-row scalar side, read by every rate below
    val nDocs = census.select(col("n_docs"))
    // empty-corpus guard: ANSI mode turns /0 into an error, and the
    // card must degrade to NULL rates, not a crash (EmptyInputSpec)
    def rate(n: Column): Column =
      when(col("n_docs") === 0, lit(null).cast(DoubleType))
        .otherwise(round(n.cast(DoubleType) / col("n_docs"), 6))
    val censusRows = census.select(explode(array(
        struct(lit("n_docs").as("metric"), col("n_docs").as("n")),
        struct(lit("n_tokens").as("metric"), col("n_tokens").as("n")),
        struct(lit("n_chars").as("metric"), col("n_chars").as("n")),
        struct(lit("n_sources").as("metric"), col("n_sources").as("n")),
        struct(lit("n_langs").as("metric"), col("n_langs").as("n"))))
        .as("kv"))
      .select(lit("corpus").as("section"), col("kv.metric").as("metric"),
        col("kv.n").as("n"), lit(null).cast(DoubleType).as("frac"))
    def share(key: String, section: String): DataFrame =
      base.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(nDocs))
        .select(lit(section).as("section"), col(key).as("metric"),
          col("n"), rate(col("n")).as("frac"))
    val qualityRow = census.select(lit("quality").as("section"),
      lit("gate_pass").as("metric"), col("n_quality").as("n"),
      rate(col("n_quality")).as("frac"))
    val exactRow = census.select(lit("dedup").as("section"),
      lit("exact_dup_docs").as("metric"), col("n_exact_dup").as("n"),
      rate(col("n_exact_dup")).as("frac"))
    val nearRows = dupClusterLabels(s, d)
      .agg(count(lit(1)).as("n_near"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .crossJoin(broadcast(nDocs))
      .select(explode(array(
        struct(lit("near_dup_docs").as("metric"), col("n_near").as("n"),
          rate(col("n_near")).as("frac")),
        struct(lit("near_dup_clusters").as("metric"),
          col("n_clusters").as("n"),
          lit(null).cast(DoubleType).as("frac")))).as("kv"))
      .select(lit("dedup").as("section"), col("kv.metric").as("metric"),
        col("kv.n").as("n"), col("kv.frac").as("frac"))
    val contamRow = p92Decontaminate(s, d)
      .agg(count(lit(1)).as("n_contam"))
      .crossJoin(broadcast(nDocs))
      .select(lit("contamination").as("section"),
        lit("contaminated_docs").as("metric"), col("n_contam").as("n"),
        rate(col("n_contam")).as("frac"))
    censusRows.union(share("lang", "lang")).union(share("source", "source"))
      .union(qualityRow).union(exactRow).union(nearRows).union(contamRow)
  }

  // ---- dedup tuning triptych (p111–p113) ---------------------------------
  // Three reports that turn the dedup machinery into an instrument: how
  // the near-dup graph responds to the Jaccard THRESHOLD (p111), how
  // duplication varies with gram WIDTH (p112), and how long duplicated
  // spans actually RUN (p113). Together they are the evidence a corpus
  // team reads before fixing τ, w, and the span policy — published
  // pipelines pick these constants (0.8 Jaccard, 50-token substrings,
  // 3-sentence spans) from exactly these curves.

  /** Near-dedup threshold sensitivity — the τ tuning curve: for each
    * candidate Jaccard threshold (0.5–0.9 in tenths), the surviving
    * pair count, the count of docs linked by any pair, and the count of
    * docs the greedy higher-id drop rule (p78's) would remove. Read off
    * the one session-cached pair artifact — the index is BUILT at
    * τ = [[JaccardThreshold]] (banding is tuned for it), so the curve
    * sweeps upward from there; choosing a higher τ is a free re-filter
    * of the artifact, while lowering τ would mean re-banding.
    *
    * Scale shape: the pair graph is LSH-bounded (never corpus-sized),
    * and the 5-row threshold table broadcasts against it; every
    * aggregation is over that bounded frame. Thresholds with zero
    * surviving pairs still emit their row (p100's grid rule). The
    * compare is `jaccard * 10 >= t` — one IEEE multiply against an
    * integer, bit-identical across engines, no float literal to
    * round differently. */
  private def p111DedupThresholdCurve: Q = (s, d) =>
    dedupThresholdCurveOf(s, nearDupPairs(s, d))

  /** The p111 core over any (doc_a, doc_b, jaccard) pair frame —
    * Round10dOpsSpec replays it against per-threshold direct filters. */
  private[queries] def dedupThresholdCurveOf(s: SparkSession,
      pairs: DataFrame): DataFrame = {
    val taus = s.range(5, 10).select(col("id").as("tt"))
    val hit = pairs.crossJoin(broadcast(taus))
      .filter(col("jaccard") * 10.0 >= col("tt"))
      .staged // bounded: |pairs| × 5, read by both aggregates below
    val pairAgg = hit.groupBy("tt")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_b")).as("n_dropped"))
    val docAgg = hit
      .select(col("tt"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy("tt").agg(countDistinct(col("doc")).as("n_docs_linked"))
    taus.join(pairAgg, Seq("tt"), "left_outer")
      .join(docAgg, Seq("tt"), "left_outer")
      .select((col("tt").cast(DoubleType) / 10.0).as("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_linked"), lit(0L)).as("n_docs_linked"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** Gram widths the duplication spectrum samples — short enough to
    * catch phrase reuse, long enough to isolate wholesale copying
    * (Lee et al. 2022 dedup at 50 tokens; C4 at 3 sentences; this
    * corpus's docs run ~10–200 tokens, so the octave ladder 4–32
    * brackets its regimes). Shared verbatim with the oracle builder. */
  private[graft] val SpectrumWidths = Seq(4, 8, 16, 32)

  /** Duplication spectrum — the gram-WIDTH tuning curve: for each width
    * w in [[SpectrumWidths]], the corpus-wide distinct w-gram count, how
    * many of those grams occur in more than one document, and how many
    * documents carry at least one such duplicated gram. Short grams
    * duplicate by chance (common phrases), long grams only by real
    * copying — the width where the doc-level rate knees is the width a
    * span-dedup pass (p37/p75) should run at, measured instead of
    * assumed.
    *
    * Scale shape: ONE corpus scan computes every width's per-doc
    * distinct gram set in a single projection (the native map-only
    * [[graft.functions.ShingleIdSet]], once per width, exploded from
    * one struct array); the only corpus-keyed shuffle is the (w, gram)
    * doc-frequency count (map-side combined). Doc verdicts ride a
    * (w, gram)-keyed join of the gram rows back to the bounded df
    * table, then per-(w, doc) and per-w aggregates. Fractions follow
    * p107's exact-ppm rule; widths with no eligible docs still emit
    * their row with NULL fractions (p100's grid rule). */
  private def p112DupSpectrum: Q = (s, d) =>
    dupSpectrumOf(s, docsBalanced(s, d))

  /** The p112 core over any (doc_id, text) frame — Round10dOpsSpec
    * reconciles one width against a direct distinct-gram computation. */
  private[queries] def dupSpectrumOf(s: SparkSession,
      docsIn: DataFrame): DataFrame = {
    val widths = s.createDataFrame(
      SpectrumWidths.map(Tuple1(_))).toDF("w")
    val grams = docsIn
      .select(col("doc_id"), explode(array(SpectrumWidths.map(w =>
        struct(lit(w).as("w"),
          graft.functions.ShingleIdSet.shingleIdSet(col("text"), w)
            .as("st"))): _*)).as("x"))
      .filter(col("x.st").isNotNull) // docs with < w tokens: no rows at w
      .select(col("doc_id"), col("x.w").as("w"), explode(col("x.st")).as("g"))
      .staged // read by the df count and the doc-verdict join
    val dfreq = grams.groupBy("w", "g").agg(count(lit(1)).as("df")).staged
    val gramAgg = dfreq.groupBy("w")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
    val docAgg = grams.join(dfreq, Seq("w", "g"))
      .groupBy("w", "doc_id").agg(max(col("df")).as("mx"))
      .groupBy("w")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("mx") > 1, 1L).otherwise(0L)).as("n_docs_with_dup"))
    def ppm(num: Column, den: Column): Column =
      when(den.isNull || den === 0L, lit(null).cast(DoubleType))
        .otherwise(ldiv(num * lit(1000000L), den).cast(DoubleType)
          / lit(1000000.0))
    widths.join(docAgg, Seq("w"), "left_outer")
      .join(gramAgg, Seq("w"), "left_outer")
      .select(col("w"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_docs_with_dup"), lit(0L)).as("n_docs_with_dup"),
        ppm(coalesce(col("n_docs_with_dup"), lit(0L)), col("n_docs"))
          .as("doc_dup_frac"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        ppm(coalesce(col("n_dup_grams"), lit(0L)), col("n_grams"))
          .as("gram_dup_frac"))
  }

  /** Duplicated-run length histogram — the exact-substring STRUCTURE
    * report: p37/p75 treat each duplicated [[SpanW]]-token window
    * independently, but real duplication arrives as runs (a copied
    * paragraph is many consecutive duplicated windows). Per document,
    * consecutive duplicated window indices merge into maximal runs
    * (gaps-and-islands), and the output is the run-length histogram:
    * for each run length, how many runs and how many distinct docs
    * carry one, with the token extent alongside. A histogram massed at
    * length 1 says window-level dedup suffices; a long tail is the
    * case for suffix-array exact-substring removal (Lee et al. 2022
    * use 50-token substrings — ~5 consecutive windows here).
    *
    * Scale shape: the window hash/census machinery is p75's (same
    * [[SpanW]], same h60 over the same span text, so the two ops
    * cannot disagree about what a duplicated window is); only the
    * SPARSE duplicated (doc_id, window-index) rows reach the doc-keyed
    * island window — per-doc state is that doc's duplicated-window
    * count, never its text; the histogram is a bounded aggregate of
    * the run rows. */
  private def p113DupRunLengths: Q = (s, d) =>
    dupRunLengthsOf(docsBalanced(s, d))

  /** The p113 core over any (doc_id, text) frame — Round10dOpsSpec
    * plants window-aligned shared blocks and asserts their run rows. */
  private[queries] def dupRunLengthsOf(docsIn: DataFrame): DataFrame = {
    val spans = spanWindowTable(docsIn)._2
      .select("doc_id", "j", "hv")
      .staged // read by the census and the dup-window join
    // a window is duplicated if its span text occurs anywhere else in
    // the corpus — including the keeper copy (structure, not policy)
    val census = spans.groupBy("hv").agg(count(lit(1)).as("cnt"))
    val dupw = spans.join(census.filter(col("cnt") > 1), "hv")
      .select(col("doc_id"), col("j"))
    val runs = dupw
      .withColumn("isl", col("j") - row_number().over(
        Window.partitionBy("doc_id").orderBy("j")))
      .groupBy("doc_id", "isl")
      .agg(count(lit(1)).cast(LongType).as("run_len"))
    runs.groupBy("run_len")
      .agg(count(lit(1)).as("n_runs"),
        countDistinct(col("doc_id")).as("n_docs"))
      .select(col("run_len"), (col("run_len") * SpanW).as("run_tokens"),
        col("n_runs"), col("n_docs"))
  }

  /** Minimum dropped-run length (in [[SpanW]]-token windows) for
    * [[p114RunStrip]] — 3 windows = 30 tokens, the Lee et al. 2022
    * 50-token rule scaled to this corpus's 10–200-token documents
    * (p113's measured histogram knees at 3+: chance phrase collisions
    * never run that long, block copies do). Shared verbatim with the
    * oracle builder. */
  private[graft] val MinRunW = 3

  /** Run-gated duplicate-span removal — the ACT on p113's report:
    * where p75 excises EVERY non-keeper duplicated window independently
    * (C4's rule, which also deletes chance phrase collisions), this op
    * drops a window only when it sits in a maximal run of at least
    * [[MinRunW]] consecutive duplicated non-keeper windows — the
    * exact-substring removal of Lee et al. 2022 expressed over p75's
    * window machinery (same [[SpanW]], same h60 span hash, same
    * min-(doc,position) keeper rule, so the three ops cannot disagree
    * about what a duplicated window is). Short incidental matches
    * survive; copied blocks vanish. Output is p75's audit shape plus
    * the per-doc dropped-run count, so the two policies' token loss is
    * directly comparable row by row.
    *
    * Scale shape: p75's exactly — one span-keyed census shuffle, one
    * span-keyed join back, then only the SPARSE candidate
    * (doc_id, window-index) rows reach the doc-keyed island window
    * (per-doc state = that doc's duplicated-window count, never text);
    * reconstruction re-derives the cleaned text from the doc's own
    * token array. The run gate is a pure filter on the bounded run
    * table — no new shuffle over p75. */
  private def p114RunStrip: Q = (s, d) => runStripOf(docsBalanced(s, d))

  /** The p114 core over any (doc_id, text) frame — Round10dOpsSpec
    * plants a long shared block plus a short shared phrase and asserts
    * only the block is stripped (and only its non-keeper copy). */
  private[queries] def runStripOf(docsIn: DataFrame): DataFrame = {
    val (base, spans) = spanWindowTable(docsIn)
    val census = spans.groupBy("hv")
      .agg(count(lit(1)).as("cnt"), min(col("pos")).as("keeper"))
    val cand = spans.join(census, "hv")
      .filter(col("cnt") > 1 && col("pos") =!= col("keeper"))
      .select(col("doc_id"), col("j"))
    val drops = cand
      .withColumn("isl", col("j") - row_number().over(
        Window.partitionBy("doc_id").orderBy("j")))
      .groupBy("doc_id", "isl")
      .agg(count(lit(1)).as("run_len"), collect_set(col("j")).as("js"))
      .filter(col("run_len") >= MinRunW)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_runs"),
        flatten(collect_list(col("js"))).as("drop_j"))
    spanReassemble(base, drops)
      .select(col("doc_id"),
        col("n_spans").cast(LongType).as("n_spans"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs_dropped"),
        size(col("dj")).cast(LongType).as("n_dropped"),
        size(col("clean")).cast(LongType).as("n_tokens_clean"),
        md5(array_join(col("clean"), " ")).as("clean_md5"))
  }

  /** Share of the corpus token count the [[p120BudgetAllocation]]
    * training budget covers, in percent. Shared with the oracle. */
  private[graft] val TrainBudgetPct = 50L

  /** Quality-greedy budget allocation — the step AFTER p118's
    * scorecard: given a token budget ([[TrainBudgetPct]]% of the
    * corpus), fill it source by source in quality order (Gopher pass
    * rate desc, source asc), taking each source's full token mass
    * until the boundary source gets the remainder and the tail gets
    * zero — the greedy knapsack every "train on the best N tokens"
    * recipe actually runs. Emits the full allocation table: rank,
    * quality, available and allocated tokens per source, so the
    * cut line is visible and auditable.
    *
    * Scale shape: one corpus scan aggregates to |sources| rows;
    * the ordered running sum is a window over THAT bounded table
    * (sources are a catalog-bounded dimension — 20 here, thousands at
    * worst — so the single-partition window holds ~rows = sources,
    * never corpus). Quality ranks by the exact integer ppm (no float
    * compare), budget arithmetic is pure int64. */
  private def p120BudgetAllocation: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val perSource = gopherRules(docs)
      .select(col("doc_id"), col("keep").cast(LongType).as("keep"))
      .join(docs.select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast(LongType).as("n_tok")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_pass"),
        sum(col("n_tok")).as("avail_tokens"))
      .withColumn("pass_ppm", ldiv(col("n_pass") * lit(1000000L),
        col("n_docs")))
    val total = perSource.agg(
      coalesce(sum(col("avail_tokens")), lit(0L)).as("total_tokens"))
    val w = Window.orderBy(col("pass_ppm").desc, col("source"))
    perSource.crossJoin(broadcast(total))
      .withColumn("budget",
        ldiv(col("total_tokens") * lit(TrainBudgetPct), lit(100L)))
      .withColumn("rnk", row_number().over(w))
      .withColumn("cum_before",
        coalesce(sum(col("avail_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("rnk"),
        (col("pass_ppm").cast(DoubleType) / 1000000.0)
          .as("gopher_pass_frac"),
        col("avail_tokens"),
        greatest(lit(0L), least(col("avail_tokens"),
          col("budget") - col("cum_before"))).as("alloc_tokens"))
  }

  /** Token frequency spectrum — the count-of-counts table (Good &
    * Turing 1953; Gale & Sampson 1995's smoothing reads exactly this):
    * per occurrence-count octave (bucket = ⌊log₂ c⌋), how many
    * distinct terms occur that often, their total token mass, and the
    * corpus mass share. The bucket-1 row (hapax legomena) is the
    * Good–Turing unseen-mass estimate N₁/N; a heavy singleton bucket
    * means vocabulary still growing (more data helps), a fat head
    * octave means template repetition. Bucketing is integer-exact:
    * ⌊log₂ c⌋ = len(bin(c)) − 1 in BOTH engines — no float log to
    * diverge.
    *
    * Scale shape: one token-keyed counting shuffle (map-side
    * combined, one row per DISTINCT term), then a ≤64-row octave
    * aggregation; the 1-row total broadcasts for the mass share
    * (p107's exact-ppm rule). Nothing beyond the term table ever
    * shuffles. */
  private def p121FreqSpectrum: Q = (s, d) =>
    freqSpectrumOf(docsBalanced(s, d))

  /** The p121 core over any (doc_id, text) frame — Round10dOpsSpec
    * plants a corpus with a known spectrum (hapax through head terms)
    * and replays every octave; the driver corpus itself is degenerate
    * here (a ~31-term synthetic vocabulary, no singletons), which the
    * gate records honestly. */
  private[queries] def freqSpectrumOf(docsIn: DataFrame): DataFrame = {
    val termCounts = docsIn
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val buckets = termCounts
      .withColumn("bucket", (length(bin(col("c"))) - 1).cast(IntegerType))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("n_occurrences"))
    val total = buckets.agg(
      coalesce(sum(col("n_occurrences")), lit(0L)).as("total"))
    buckets.crossJoin(broadcast(total))
      .select(col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), bucket)").as("c_lo"),
        col("n_terms"), col("n_occurrences"),
        (ldiv(col("n_occurrences") * lit(1000000L), col("total"))
          .cast(DoubleType) / 1000000.0).as("mass_frac"))
  }

  /** Dedup savings report — what deduplication actually buys, by
    * cluster size: for each near-dup cluster size k (from the p32
    * label artifact; k = 1 is the unlinked remainder, so the rows sum
    * to the corpus), the cluster count, member docs, docs the min-id
    * keeper rule drops (k − 1 per cluster), and the TOKENS those
    * dropped docs carry — the "storage/compute reclaimed" number a
    * dedup proposal leads with, broken down by duplication depth
    * (a corpus of pairs dedups very differently from one with
    * thousand-copy template families).
    *
    * Scale shape: rides the cluster-label artifact (built once per
    * session/dataset); one doc-keyed token join, one cluster-keyed
    * agg, one size-keyed histogram agg, one LEFT ANTI for the
    * singleton census — every shuffle keyed and bounded by the
    * cluster structure. The keeper IS the cluster_id (labels converge
    * to the min member id), so the drop rule needs no extra pass. */
  private def p119DedupSavings: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tok"))
    val lbl = dupClusterLabels(s, d).select("doc_id", "cluster_id")
    val perCluster = lbl.join(docs, "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("k"),
        sum(when(col("doc_id") =!= col("cluster_id"), col("n_tok"))
          .otherwise(0L)).as("tok_dropped"))
    val clustered = perCluster.groupBy("k")
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("k")).as("n_docs"),
        sum(col("k") - 1L).as("n_docs_dropped"),
        sum(col("tok_dropped")).as("n_tokens_dropped"))
      .select(col("k").as("cluster_size"), col("n_clusters"),
        col("n_docs"), col("n_docs_dropped"), col("n_tokens_dropped"))
    val singles = docs.join(lbl, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit(1L).as("cluster_size"), col("n").as("n_clusters"),
        col("n").as("n_docs"), lit(0L).as("n_docs_dropped"),
        lit(0L).as("n_tokens_dropped"))
    clustered.union(singles)
  }

  /** Source scorecard — the per-source ranking table a corpus team
    * reads before deciding what to crawl more of and what to drop
    * (RefinedWeb/Dolma-style source tables): per source, document and
    * token counts, the Gopher-rule pass rate (p76's gate), the
    * exact-duplicate rate (p01's sha256 keeper rule: a doc counts as
    * dup when a smaller doc_id carries identical text anywhere in the
    * corpus), and the near-dup involvement rate (fraction of the
    * source's docs linked by any p02 pair). A source with a high dup
    * rate against a curated twin is a mirror (p101 names the pairs);
    * a low pass rate is crawl noise.
    *
    * Scale shape: one corpus scan builds (source, tokens, sha256);
    * the exact-dup verdict is a hash-keyed min + hash-keyed join back
    * (p01's shuffle, carrying digests); the near-dup side is the
    * LSH-bounded pair artifact exploded to a distinct doc list; one
    * final source-keyed aggregation with map-side combine. Fractions
    * follow p107's exact-ppm rule. */
  private def p118SourceScorecard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val base = docs.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast(LongType).as("n_tok"),
      sha2(col("text"), 256).as("h"))
    val keepBits = gopherRules(docs)
      .select(col("doc_id"), col("keep").cast(LongType).as("keep"))
    val keepers = base.groupBy("h").agg(min(col("doc_id")).as("keeper"))
    val flagged = base.join(keepers, "h")
      .select(col("doc_id"), col("source"), col("n_tok"),
        when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L)
          .as("is_exact_dup"))
    val linked = nearDupPairs(s, d)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
      .withColumn("is_linked", lit(1L))
    def ppm(num: Column, den: Column): Column =
      when(den === 0L, lit(null).cast(DoubleType))
        .otherwise(ldiv(num * lit(1000000L), den).cast(DoubleType)
          / lit(1000000.0))
    flagged.join(keepBits, "doc_id")
      .join(linked, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("keep")).as("n_pass"),
        sum(col("is_exact_dup")).as("n_exact"),
        sum(coalesce(col("is_linked"), lit(0L))).as("n_near"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        ppm(col("n_pass"), col("n_docs")).as("gopher_pass_frac"),
        ppm(col("n_exact"), col("n_docs")).as("exact_dup_frac"),
        ppm(col("n_near"), col("n_docs")).as("near_dup_frac"))
  }

  /** The near-dup detectors [[p117DedupAgreement]] cross-tabulates, in
    * emission order. Shared verbatim with the oracle builder. */
  private[graft] val AgreementMethods =
    Seq("minhash", "simhash", "edit", "semantic")

  /** Dedup-method agreement matrix — which detector finds what: the
    * four near-dup pair detectors (p02 MinHash token-Jaccard, p12
    * SimHash Hamming, p29 edit-distance, p49 embedding+text semantic)
    * cross-tabulated as pair sets over the SAME corpus — per method
    * pair, both sets' sizes, the intersection, and each side's
    * exclusive finds. This is the report a corpus team reads before
    * trusting one detector alone (published dedup sections run exactly
    * this comparison: token-level methods miss reworded copies, edit
    * distance misses reorderings, embeddings flag topical
    * near-misses); a detector whose exclusive column dominates is
    * either finding real structure the others miss or
    * false-positiving — p49's text_confirmed gate answers which.
    *
    * Scale shape: every input is an already-LSH/band-bounded pair
    * table (never corpus²); each is staged once and the matrix is
    * pair-keyed joins + 1-row counts over those bounded tables — the
    * matrix costs a small multiple of the detectors it audits, and
    * nothing new scales with the corpus. */
  private def p117DedupAgreement: Q = (s, d) => dedupAgreementOf(Seq(
    "minhash" -> nearDupPairs(s, d),
    "simhash" -> p12SimhashPairs(s, d),
    "edit" -> p29EditNearDup(s, d),
    "semantic" -> p49SemanticNearDup(s, d)
      .filter(col("text_confirmed") === 1)))

  /** The p117 core over any (method, pair-frame) list — every frame
    * needs canonical (doc_a < doc_b) distinct pairs, which all four
    * detectors emit by construction. Round10dOpsSpec replays it on
    * hand-built pair sets with known overlaps. */
  private[queries] def dedupAgreementOf(
      methods: Seq[(String, DataFrame)]): DataFrame = {
    val staged = methods.map { case (n, df) =>
      n -> df.select(col("doc_a"), col("doc_b")).staged }
    staged.combinations(2).map { case Seq((na, a), (nb, b)) =>
      val ca = a.agg(count(lit(1)).as("n_a"))
      val cb = b.agg(count(lit(1)).as("n_b"))
      val both = a.join(b, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_both"))
      ca.crossJoin(cb).crossJoin(both)
        .select(lit(na).as("method_a"), lit(nb).as("method_b"),
          col("n_a"), col("n_b"), col("n_both"),
          (col("n_a") - col("n_both")).as("n_only_a"),
          (col("n_b") - col("n_both")).as("n_only_b"))
    }.reduce(_.union(_))
  }

  /** The (bands × rows) factorizations of the [[NumHashes]]-hash
    * MinHash family [[p116LshPlanner]] sweeps — every way to band 12
    * hashes. Shared verbatim with the oracle builder. */
  private[graft] val PlannerConfigs: Seq[(Int, Int)] =
    Seq((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1))

  /** LSH banding planner — the S-curves behind p02's 6×2 banding
    * choice: for every factorization (b bands × r rows) of the
    * [[NumHashes]]-hash family and every Jaccard j in tenths, the
    * candidate-detection probability P = 1 − (1 − jʳ)ᵇ (Leskovec et
    * al., MMDS ch. 3 — the standard banding analysis). Read next to
    * p111's MEASURED threshold curve, this is how a corpus team picks
    * the banding before building the index: more rows sharpen the
    * knee rightward (fewer false candidates), more bands pull it left
    * (better recall). The engine's live config is flagged in-row.
    *
    * Exactness: with j = jt/10 and b·r = 12 fixed, P is the exact
    * rational (10¹² − (10ʳ − jtʳ)ᵇ) / 10¹², every intermediate an
    * int64 below 2^53 (jtʳ ≤ 9¹² ≈ 2.8e11; (10ʳ−jtʳ)ᵇ < 10¹²), so
    * both engines compute integer products and ONE correctly-rounded
    * IEEE division — no pow(), no float drift (the p97/p107 house
    * rule). Pure 54-row grid, no table read: the planner costs
    * nothing at any corpus size. */
  private def p116LshPlanner: Q = (s, _) => lshPlannerOf(s)

  /** The p116 core — Round10dOpsSpec replays the closed form in
    * driver-side BigDecimal and pins the banding-theory shape. */
  private[queries] def lshPlannerOf(s: SparkSession): DataFrame = {
    val jts = s.range(1, 10).select(col("id").as("jt"))
    PlannerConfigs.map { case (b, r) =>
      val jr = (1 to r).map(_ => col("jt")).reduce(_ * _)
      val withC = jts.select(col("jt"),
        (lit(BigInt(10).pow(r).toLong) - jr).as("c"))
      val cb = (1 to b).map(_ => col("c")).reduce(_ * _)
      withC.select(lit(b).as("n_bands"), lit(r).as("n_rows"),
        (col("jt").cast(DoubleType) / 10.0).as("j"),
        ((lit(1000000000000L) - cb).cast(DoubleType) / 1.0e12)
          .as("p_detect"),
        lit(if (b == NumBands && r == BandRows) 1 else 0)
          .cast(IntegerType).as("is_current"))
    }.reduce(_.union(_))
  }

  /** The shuffle-key domains [[p115SkewAudit]] profiles — (table,
    * column) pairs the engine's own heavy operators shuffle on (p11/
    * p15/p54 key on events.user_id, p84 on event_type, q30/q32 on
    * l_orderkey and o_custkey, p30/p46/p79 on documents.source/lang).
    * Shared verbatim with the oracle builder. */
  private[graft] val SkewDomains: Seq[(String, String)] = Seq(
    "events" -> "user_id",
    "events" -> "event_type",
    "lineitem" -> "l_orderkey",
    "orders" -> "o_custkey",
    "documents" -> "source",
    "documents" -> "lang")

  /** Shuffle-skew audit — the pre-flight instrument for every keyed
    * shuffle the engine runs: per declared key domain
    * ([[SkewDomains]]), total rows, distinct keys, the hottest key and
    * its row count, and the skew factor max/avg — the number that
    * decides whether a 1000-executor job needs salting or AQE
    * skew-splitting BEFORE it runs (a skew factor of k means the
    * hottest reducer does k× the average work; Spark's own
    * skewedPartitionFactor trips at 5). Hot key reported as the
    * minimum key among ties so both engines agree.
    *
    * Scale shape: per domain one keyed counting shuffle (map-side
    * combined, carries one row per DISTINCT key) feeding a 1-row
    * summary; the hot-key pick filters the bounded counts table
    * against the broadcast 1-row max and takes MIN — no sort, no
    * window. The skew factor is exact-ppm integer division (p107's
    * rule) under an in-plan envelope assert (keys × max_rows < 9e9
    * keeps the ppm product inside ldiv's 2^53 exactness bound — at
    * production volumes pre-scale the counts, and the gate fails
    * LOUDLY rather than rounding). Empty domains keep their row with
    * zero counts and NULL skew (p100's grid rule). */
  private def p115SkewAudit: Q = (s, d) => {
    val frames = Map(
      "events" -> Tables.events(s, d),
      "lineitem" -> Tables.lineitem(s, d),
      "orders" -> Tables.orders(s, d),
      "documents" -> Tables.documents(s, d))
    skewAuditOf(SkewDomains.map { case (t, c) =>
      (s"$t.$c", frames(t), c) })
  }

  /** The p115 core over any (domain-name, frame, key-column) list —
    * Round10dOpsSpec replays it against driver-side counting on a
    * hand-skewed fixture. */
  private[queries] def skewAuditOf(
      domains: Seq[(String, DataFrame, String)]): DataFrame =
    domains.map { case (name, df, key) =>
      val counts = df.select(col(key).cast(StringType).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .staged // read by the summary and the hot-key pick
      val tot = counts.agg(
        coalesce(sum(col("c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"),
        coalesce(max(col("c")), lit(0L)).as("max_rows"))
      val hot = counts.join(broadcast(tot),
          col("c") === col("max_rows"))
        .agg(min(col("k")).as("hot_key"))
      tot.crossJoin(hot)
        .filter(assert_true(
          col("n_keys") * col("max_rows") < lit(9000000000L),
          lit(s"$name: skew ppm outside the exact-int64 envelope — " +
            "pre-scale the counts")).isNull)
        .select(lit(name).as("domain"), col("n_rows"), col("n_keys"),
          col("max_rows"), col("hot_key"),
          when(col("n_rows") === 0L, lit(null).cast(DoubleType))
            .otherwise(ldiv(
              col("max_rows") * col("n_keys") * lit(1000000L),
              col("n_rows")).cast(DoubleType) / lit(1000000.0))
            .as("skew"))
    }.reduce(_.union(_))

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

  // DuckDB twins. Shared SQL fragments:
  private val sqlToks = "string_split(text, ' ')"

  // twin of `qlog2`: piecewise-linear log2, 16 fractional bits, pure
  // integer arithmetic (DuckDB's // is BIGINT floor-division; the
  // power(2, …) divisor is a power of two, CAST-exact below 2^52)
  private def sqlQlog2(x: String): String =
    s"((CAST(length(bin($x)) AS BIGINT) - 1) * 65536" +
      s" + (($x) * 65536) // CAST(power(2, length(bin($x)) - 1) AS BIGINT)" +
      s" - 65536)"
  private val sqlSigList = (0 until NumHashes)
    .map(i => s"min(${sqlHashFam(i, "shingle")})").mkString(", ")
  private val sqlStops =
    Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  // The capped candidate-pair CTEs (twin of `candidatePairs`), appended
  // after any `bands(doc_id, band, bkey)` CTE — one copy for both the
  // p02 and p29 oracles so cap/ordering tweaks cannot diverge.
  private val sqlCappedCand: String =
    s"""capped AS (
       |  SELECT doc_id, band, bkey FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bsz
       |    FROM bands) t WHERE bsz <= $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)""".stripMargin

  // p02's full oracle text, shared with p32 (which clusters p02's pairs).
  /** The global-BPE CTE chain (wf, sym0, then p_r/w_r/sym_r per round)
    * shared by p62 (merge table) and p66 (apply + compression summary).
    * LEFT JOIN ON TRUE replays the Scala chain's winner-less-round
    * behavior: NULL a/b never merge, the vocabulary passes through. */
  private def sqlBpeChain(rounds: Int): String = {
    val round = (r: Int) => s"""
       |p$r AS (SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt
       |  FROM sym${r - 1}, UNNEST(generate_series(1, len(l)-1)) AS u(i)
       |  GROUP BY 1, 2),
       |w$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
       |sym$r AS (SELECT w, freq,
       |    list_reduce(list_transform(l, s -> [s]), (acc, x) ->
       |      CASE WHEN acc[len(acc)] = a AND x[1] = b
       |           THEN list_concat(acc[1:len(acc)-1], [a || b])
       |           ELSE list_concat(acc, x) END) AS l
       |  FROM sym${r - 1} LEFT JOIN w$r ON TRUE)"""
    s"""WITH wf AS (
       |  SELECT term AS w, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
       |  WHERE regexp_full_match(term, '[a-z]+') AND length(term) >= 2
       |  GROUP BY 1),
       |sym0 AS (SELECT w, freq, string_split(w, '') AS l FROM wf)""".stripMargin +
      (1 to rounds).map(r => "," + round(r).stripMargin).mkString
  }

  /** The p02 sketch+bands CTE chain (sh, sig, bands) — shared with the
    * incremental form p65. */
  // The sketch/band CTE chain over any (doc_id, text) relation `src` —
  // twin of `minhashSigOf` + `bandRowsOf`, shared by p02/p65 (over
  // `documents`) and p78 (over its exact-dedup survivors).
  private def sqlMinhashBaseFrom(src: String): String =
    s"""sh AS (
       |  SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
       |  FROM (SELECT doc_id, $sqlToks AS t FROM $src)),
       |sig AS (SELECT doc_id, [$sqlSigList] AS sig,
       |    list(DISTINCT ${sqlH60("shingle")}) AS shset,
       |    len(shset) AS n
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b AS band, array_to_string(list_transform(
       |    sig[b*$BandRows+1 : b*$BandRows+$BandRows],
       |    x -> CAST(x AS VARCHAR)), ',') AS bkey
       |  FROM sig, (SELECT unnest(generate_series(0, ${NumBands - 1})) AS b) bs)"""
      .stripMargin

  private val sqlMinhashBase: String = sqlMinhashBaseFrom("documents")

  private val sqlP02: String =
    s"""WITH $sqlMinhashBase,
       |$sqlCappedCand,
       |pairs AS (
       |  SELECT c.doc_a, c.doc_b,
       |    len(list_intersect(da.shset, db.shset)) AS ninter,
       |    da.n AS na, db.n AS nb
       |  FROM cand c
       |  JOIN sig da ON da.doc_id = c.doc_a
       |  JOIN sig db ON db.doc_id = c.doc_b)
       |SELECT doc_a, doc_b,
       |  CAST(ninter AS DOUBLE) / (na + nb - ninter) AS jaccard
       |FROM pairs
       |WHERE CAST(ninter AS DOUBLE) / (na + nb - ninter)
       |  >= $JaccardThreshold""".stripMargin

  // Scalar-quantization CTEs (twin of `quantizedVectors`) shared by the
  // p42 and p47 oracles: per-dim min/max lists + int8 codes per vector.
  // Callers prepend WITH and read `q` (vec_id, label, v, nrm, qv) and
  // `sa` (mns, mxs).
  private val sqlQuantCtes: String =
    """e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |st AS (
      |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
      |  FROM e, (SELECT unnest(generate_series(1,
      |    (SELECT max(len(v)) FROM e))) AS i) dims
      |  WHERE i <= len(v) GROUP BY i),
      |sa AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
      |  FROM st),
      |q AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
      |    list_transform(generate_series(1, len(v)), i ->
      |      CASE WHEN mxs[i] = mns[i] THEN 0
      |        ELSE least(127, CAST(floor((v[i] - mns[i]) * 255.0
      |          / (mxs[i] - mns[i])) AS BIGINT) - 128) END) AS qv
      |  FROM e, sa)""".stripMargin

  // The p53 two-Lloyd-iteration chain (twin of `kmeansState`), shared
  // by the p53 and p94 oracles. Prepend `sqlQuantCtes`; readers get
  // `qq` (vec_id, qv) and `a2` (vec_id, d2, cell).
  // The NB scoring chain shared by the p71 census and p103 calibration
  // oracles. Prepend WITH; readers get `sc` (doc_id, actual, cls, score).
  private val sqlNbScoredCtes: String =
    s"""d AS (SELECT doc_id, lang, text,
       |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_test
       |  FROM documents),
       |tk AS (SELECT doc_id, lang, is_test, unnest($sqlToks) AS token
       |  FROM d),
       |model AS (SELECT lang, token, COUNT(*) AS cnt
       |  FROM tk WHERE NOT is_test GROUP BY 1, 2),
       |vs AS (SELECT COUNT(DISTINCT token) AS v FROM model),
       |cs AS (SELECT m.lang AS cls,
       |    ${sqlQlog2("p.n_docs")} AS q_prior,
       |    ${sqlQlog2("CAST(SUM(m.cnt) + vs.v AS BIGINT)")} AS q_den
       |  FROM model m
       |  JOIN (SELECT lang, COUNT(*) AS n_docs FROM d
       |        WHERE NOT is_test GROUP BY 1) p ON p.lang = m.lang,
       |    vs
       |  GROUP BY m.lang, p.n_docs, vs.v),
       |sc AS (SELECT tk.doc_id, tk.lang AS actual, cs.cls,
       |    cs.q_prior
       |      + SUM(${sqlQlog2("COALESCE(m.cnt, 0) + 1")})
       |      - COUNT(*) * cs.q_den AS score
       |  FROM tk CROSS JOIN cs
       |  LEFT JOIN model m ON m.lang = cs.cls AND m.token = tk.token
       |  WHERE tk.is_test
       |  GROUP BY tk.doc_id, tk.lang, cs.cls, cs.q_prior, cs.q_den)""".stripMargin

  private val sqlKmeansCtes: String =
    s"""qq AS (SELECT vec_id, qv FROM q),
       |dims AS (SELECT unnest(generate_series(1,
       |    (SELECT max(len(qv)) FROM qq))) AS i),
       |c0 AS (SELECT vec_id AS cell, qv AS cv FROM qq
       |  WHERE vec_id < $KmeansK),
       |s1 AS (SELECT v.vec_id, c.cell,
       |    list_sum(list_transform(generate_series(1, len(v.qv)),
       |      i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS d2
       |  FROM qq v, c0 c),
       |b1 AS (SELECT vec_id, MIN(d2) AS d2 FROM s1 GROUP BY 1),
       |a1 AS (SELECT s1.vec_id, s1.d2, MIN(s1.cell) AS cell
       |  FROM s1 JOIN b1 ON s1.vec_id = b1.vec_id AND s1.d2 = b1.d2
       |  GROUP BY 1, 2),
       |u1 AS (SELECT a1.cell, i AS j, SUM(qq.qv[i]) AS sx, COUNT(*) AS n
       |  FROM a1 JOIN qq ON a1.vec_id = qq.vec_id, dims
       |  WHERE i <= len(qq.qv) GROUP BY 1, 2),
       |c1 AS (SELECT cell,
       |    list((sx - ((sx % n) + n) % n) // n ORDER BY j) AS cv
       |  FROM u1 GROUP BY 1),
       |s2 AS (SELECT v.vec_id, c.cell,
       |    list_sum(list_transform(generate_series(1, len(v.qv)),
       |      i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS d2
       |  FROM qq v, c1 c),
       |b2 AS (SELECT vec_id, MIN(d2) AS d2 FROM s2 GROUP BY 1),
       |a2 AS (SELECT s2.vec_id, s2.d2, MIN(s2.cell) AS cell
       |  FROM s2 JOIN b2 ON s2.vec_id = b2.vec_id AND s2.d2 = b2.d2
       |  GROUP BY 1, 2)""".stripMargin

  // The p33 IVF-bucketed kNN-graph chain, shared by the p33 and p96
  // oracles. Prepend WITH; readers get `r` (vec_id, nbr_id, sim, rnk).
  private val sqlP33Chain: String =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
      |  FROM n WHERE vec_id < 16),
      |a0 AS (
      |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
      |    round(list_sum(list_transform(generate_series(1, len(n.v)),
      |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS csim
      |  FROM n, c),
      |a AS (
      |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY csim DESC, cent_id) AS arnk FROM a0) t
      |  WHERE arnk = 1),
      |s AS (
      |  SELECT x.vec_id, y.vec_id AS nbr_id,
      |    round(list_sum(list_transform(generate_series(1, len(x.v)),
      |      i -> x.v[i] * y.v[i])) / (x.nrm * y.nrm), 6) AS sim
      |  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
      |r AS (SELECT vec_id, nbr_id, sim,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY sim DESC, nbr_id) AS INT) AS rnk FROM s)""".stripMargin

  // p13's full oracle text, shared with p49 (which text-verifies p13's
  // embedding-bucketed candidate pairs).
  private val sqlP13: String =
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
      |  ${sqlSignBucket("v", 4)} AS bucket
      |  FROM e)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_sum(list_transform(generate_series(1, len(a.v)),
      |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS sim
      |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE round(list_sum(list_transform(generate_series(1, len(a.v)),
      |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) >= 0.40""".stripMargin

  // Connected-component labels over p02's pair graph (transitive closure
  // + min-label per component) — the cluster CTE shared by the p32 and
  // p41 oracles. Callers prepend WITH RECURSIVE and read `lbl`.
  private val sqlClusterLabels: String =
    s"""p AS ($sqlP02),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lbl AS (
       |  SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src)""".stripMargin

  val oracleSql: Map[String, String] = oracleBase +
    // the health report's oracle IS the five sub-oracles verbatim,
    // each scoped inside its own parenthesized subquery (DuckDB scopes
    // a nested WITH locally, so their CTE names cannot collide) — the
    // composite can never drift from the checks it summarizes
    ("p110_health_report" ->
      s"""WITH
         |v1 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v
         |  FROM (${oracleBase("p84_hourly_anomaly")}) t),
         |v2 AS (SELECT MAX(psi) AS v
         |  FROM (${oracleBase("p81_source_drift_psi")}) t),
         |v3 AS (SELECT MAX(psi) AS v
         |  FROM (${oracleBase("p100_embedding_drift")}) t),
         |v4 AS (SELECT recall AS v
         |  FROM (${oracleBase("p93_dedup_recall")}) t),
         |v5 AS (SELECT CAST(SUM(n_orphans) AS DOUBLE) AS v
         |  FROM (${oracleBase("p87_ref_integrity")}) t)
         |, v6 AS (SELECT CAST(SUM(alarm) AS DOUBLE) AS v
         |  FROM ($sqlP122) t)
         |SELECT 'feed_anomaly_cells' AS "check", v AS value,
         |  0.0 AS threshold, v > 0.0 AS alarm FROM v1
         |UNION ALL SELECT 'source_drift_psi_max', v, 0.2, v > 0.2 FROM v2
         |UNION ALL SELECT 'embedding_drift_psi', v, 0.2, v > 0.2 FROM v3
         |UNION ALL SELECT 'dedup_index_recall', v, 0.8, v < 0.8 FROM v4
         |UNION ALL SELECT 'index_orphans', v, 0.0, v > 0.0 FROM v5
         |UNION ALL SELECT 'cusum_drift_alarms', v, 0.0, v > 0.0 FROM v6"""
        .stripMargin) +
    ("p111_dedup_threshold_curve" ->
      s"""WITH p AS ($sqlP02),
         |taus AS (SELECT unnest(generate_series(5, 9)) AS tt),
         |hit AS (SELECT tt, doc_a, doc_b FROM p, taus
         |  WHERE jaccard * 10.0 >= tt),
         |pa AS (SELECT tt, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_dropped
         |  FROM hit GROUP BY 1),
         |da AS (SELECT tt, CAST(COUNT(DISTINCT doc) AS BIGINT)
         |      AS n_docs_linked
         |  FROM (SELECT tt, unnest([doc_a, doc_b]) AS doc FROM hit)
         |  GROUP BY 1)
         |SELECT CAST(t.tt AS DOUBLE) / 10.0 AS threshold,
         |  COALESCE(pa.n_pairs, 0) AS n_pairs,
         |  COALESCE(da.n_docs_linked, 0) AS n_docs_linked,
         |  COALESCE(pa.n_dropped, 0) AS n_dropped
         |FROM taus t LEFT JOIN pa ON pa.tt = t.tt
         |LEFT JOIN da ON da.tt = t.tt""".stripMargin) +
    ("p112_dup_spectrum" -> {
      // one block per width, generated from the SAME SpectrumWidths list
      // the Spark side explodes — the two sides cannot desynchronize
      val blocks = SpectrumWidths.map { w =>
        s"""(WITH sh AS (SELECT doc_id, unnest(${sqlShingles("t", w)})
           |    AS shingle
           |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
           |gr AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g
           |  FROM sh),
           |dfq AS (SELECT g, COUNT(*) AS df FROM gr GROUP BY 1),
           |ga AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_grams,
           |    CAST(COALESCE(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END), 0)
           |      AS BIGINT) AS n_dup_grams FROM dfq),
           |da AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(COALESCE(SUM(CASE WHEN mx > 1 THEN 1 ELSE 0 END), 0)
           |      AS BIGINT) AS n_docs_with_dup
           |  FROM (SELECT doc_id, MAX(df) AS mx
           |    FROM gr JOIN dfq USING (g) GROUP BY 1))
           |SELECT CAST($w AS INTEGER) AS w, da.n_docs, da.n_docs_with_dup,
           |  CASE WHEN da.n_docs = 0 THEN CAST(NULL AS DOUBLE)
           |    ELSE CAST((da.n_docs_with_dup * 1000000) // da.n_docs
           |      AS DOUBLE) / 1000000.0 END AS doc_dup_frac,
           |  ga.n_grams, ga.n_dup_grams,
           |  CASE WHEN ga.n_grams = 0 THEN CAST(NULL AS DOUBLE)
           |    ELSE CAST((ga.n_dup_grams * 1000000) // ga.n_grams
           |      AS DOUBLE) / 1000000.0 END AS gram_dup_frac
           |FROM ga, da)""".stripMargin
      }
      blocks.mkString("\nUNION ALL\n")
    }) +
    ("p113_dup_run_lengths" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |sp AS (SELECT doc_id, j,
         |    ${sqlH60(s"array_to_string(t[(j-1)*$SpanW+1:j*$SpanW], ' ')")}
         |      AS hv
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, len(t) // $SpanW)) AS j FROM tk)),
         |c AS (SELECT hv, COUNT(*) AS cnt FROM sp GROUP BY 1),
         |dw AS (SELECT doc_id, j FROM sp JOIN c USING (hv) WHERE cnt > 1),
         |runs AS (SELECT doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS run_len
         |  FROM (SELECT doc_id, j,
         |      j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j)
         |        AS isl FROM dw)
         |  GROUP BY doc_id, isl)
         |SELECT run_len, run_len * $SpanW AS run_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_runs,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM runs GROUP BY 1""".stripMargin) +
    ("p114_run_strip" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |base AS (SELECT doc_id, t, len(t) AS n,
         |    len(t) // $SpanW AS n_spans FROM tk),
         |sp AS (SELECT doc_id, j,
         |    ${sqlH60(s"array_to_string(t[(j-1)*$SpanW+1:j*$SpanW], ' ')")}
         |      AS hv,
         |    doc_id * $StripPosPack + j AS pos
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, n_spans)) AS j FROM base)),
         |c AS (SELECT hv, COUNT(*) AS cnt, MIN(pos) AS keeper
         |  FROM sp GROUP BY 1),
         |cand AS (SELECT doc_id, j FROM sp JOIN c USING (hv)
         |  WHERE cnt > 1 AND pos <> keeper),
         |runs AS (SELECT doc_id, COUNT(*) AS run_len, list(j) AS js
         |  FROM (SELECT doc_id, j,
         |      j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j)
         |        AS isl FROM cand)
         |  GROUP BY doc_id, isl),
         |dr AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
         |    flatten(list(js)) AS drop_j
         |  FROM runs WHERE run_len >= $MinRunW GROUP BY doc_id),
         |fin AS (SELECT b.doc_id, b.n_spans, dr.n_runs,
         |    coalesce(dr.drop_j, CAST([] AS BIGINT[])) AS dj,
         |    flatten(list_transform(
         |        list_filter(generate_series(1, b.n_spans),
         |          j -> NOT list_contains(
         |            coalesce(dr.drop_j, CAST([] AS BIGINT[])), j)),
         |        j -> b.t[(j-1)*$SpanW+1:j*$SpanW]))
         |      || b.t[b.n_spans*$SpanW+1:b.n] AS clean
         |  FROM base b LEFT JOIN dr ON b.doc_id = dr.doc_id)
         |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
         |  CAST(coalesce(n_runs, 0) AS BIGINT) AS n_runs_dropped,
         |  CAST(len(dj) AS BIGINT) AS n_dropped,
         |  CAST(len(clean) AS BIGINT) AS n_tokens_clean,
         |  md5(coalesce(array_to_string(clean, ' '), '')) AS clean_md5
         |FROM fin""".stripMargin) +
    ("p115_skew_audit" -> {
      // one block per key domain, generated from the SAME SkewDomains
      // list the Spark side iterates — the two sides cannot desync
      val blocks = SkewDomains.map { case (t, c) =>
        s"""(WITH cc AS (SELECT CAST($c AS VARCHAR) AS k, COUNT(*) AS c
           |    FROM $t GROUP BY 1),
           |tt AS (SELECT COALESCE(SUM(c), 0) AS n_rows,
           |    COUNT(*) AS n_keys, COALESCE(MAX(c), 0) AS mx FROM cc),
           |hh AS (SELECT MIN(k) AS hot_key FROM cc, tt WHERE cc.c = tt.mx)
           |SELECT '$t.$c' AS domain, CAST(tt.n_rows AS BIGINT) AS n_rows,
           |  CAST(tt.n_keys AS BIGINT) AS n_keys,
           |  CAST(tt.mx AS BIGINT) AS max_rows, hh.hot_key,
           |  CASE WHEN tt.n_rows = 0 THEN CAST(NULL AS DOUBLE)
           |    ELSE CAST((tt.mx * tt.n_keys * 1000000) // tt.n_rows
           |      AS DOUBLE) / 1000000.0 END AS skew
           |FROM tt, hh)""".stripMargin
      }
      blocks.mkString("\nUNION ALL\n")
    }) +
    ("p116_lsh_planner" -> {
      // one block per banding config, generated from the SAME
      // PlannerConfigs list; jt^r and c^b expanded as literal integer
      // products so no engine's pow() is in play
      val blocks = PlannerConfigs.map { case (b, r) =>
        val jr = Seq.fill(r)("jt").mkString(" * ")
        val cb = Seq.fill(b)("c").mkString(" * ")
        val cur = if (b == NumBands && r == BandRows) 1 else 0
        s"""(SELECT CAST($b AS INT) AS n_bands, CAST($r AS INT) AS n_rows,
           |  CAST(jt AS DOUBLE) / 10.0 AS j,
           |  CAST(1000000000000 - $cb AS DOUBLE) / 1000000000000.0
           |    AS p_detect,
           |  CAST($cur AS INT) AS is_current
           |FROM (SELECT jt, ${BigInt(10).pow(r)} - $jr AS c
           |  FROM (SELECT unnest(generate_series(1, 9)) AS jt)))"""
          .stripMargin
      }
      blocks.mkString("\nUNION ALL\n")
    }) +
    ("p117_dedup_agreement" -> {
      // each detector's pair set is its own oracle text embedded
      // verbatim as a scoped subquery (the p110 pattern), keyed by the
      // SAME AgreementMethods list the Spark side iterates
      val srcs = Map(
        "minhash" -> s"SELECT doc_a, doc_b FROM ($sqlP02) t",
        "simhash" -> ("SELECT doc_a, doc_b FROM (" +
          oracleBase("p12_simhash_pairs") + ") t"),
        "edit" -> ("SELECT doc_a, doc_b FROM (" +
          oracleBase("p29_edit_neardup") + ") t"),
        "semantic" -> ("SELECT doc_a, doc_b FROM (" +
          oracleBase("p49_semantic_neardup") +
          ") t WHERE text_confirmed = 1"))
      val ctes = AgreementMethods
        .map(m => s"m_$m AS (${srcs(m)})").mkString(",\n")
      val blocks = AgreementMethods.combinations(2).map {
        case Seq(ma, mb) =>
          s"""SELECT '$ma' AS method_a, '$mb' AS method_b,
             |  (SELECT COUNT(*) FROM m_$ma) AS n_a,
             |  (SELECT COUNT(*) FROM m_$mb) AS n_b,
             |  (SELECT COUNT(*) FROM m_$ma JOIN m_$mb
             |    USING (doc_a, doc_b)) AS n_both,
             |  (SELECT COUNT(*) FROM m_$ma)
             |    - (SELECT COUNT(*) FROM m_$ma JOIN m_$mb
             |      USING (doc_a, doc_b)) AS n_only_a,
             |  (SELECT COUNT(*) FROM m_$mb)
             |    - (SELECT COUNT(*) FROM m_$ma JOIN m_$mb
             |      USING (doc_a, doc_b)) AS n_only_b""".stripMargin
      }.toSeq
      s"WITH\n$ctes\n" + blocks.mkString("\nUNION ALL\n")
    }) +
    ("p118_source_scorecard" ->
      s"""WITH g AS (SELECT doc_id, keep
         |  FROM (${oracleBase("p76_gopher_rules")}) t),
         |b AS (SELECT doc_id, source,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tok,
         |    sha256(text) AS h FROM documents),
         |k AS (SELECT h, MIN(doc_id) AS keeper FROM b GROUP BY 1),
         |f AS (SELECT b.doc_id, b.source, b.n_tok,
         |    CASE WHEN b.doc_id <> k.keeper THEN 1 ELSE 0 END
         |      AS is_exact_dup
         |  FROM b JOIN k USING (h)),
         |pr AS (SELECT DISTINCT doc AS doc_id
         |  FROM (SELECT unnest([doc_a, doc_b]) AS doc
         |    FROM ($sqlP02) t)),
         |a AS (SELECT f.source, COUNT(*) AS n_docs,
         |    SUM(f.n_tok) AS n_tokens, SUM(g.keep) AS n_pass,
         |    SUM(f.is_exact_dup) AS n_exact,
         |    COUNT(pr.doc_id) AS n_near
         |  FROM f JOIN g USING (doc_id)
         |  LEFT JOIN pr USING (doc_id)
         |  GROUP BY 1)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST((n_pass * 1000000) // n_docs AS DOUBLE) / 1000000.0
         |    AS gopher_pass_frac,
         |  CAST((n_exact * 1000000) // n_docs AS DOUBLE) / 1000000.0
         |    AS exact_dup_frac,
         |  CAST((n_near * 1000000) // n_docs AS DOUBLE) / 1000000.0
         |    AS near_dup_frac
         |FROM a""".stripMargin) +
    ("p119_dedup_savings" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |tk AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |pc AS (SELECT l.cluster_id, COUNT(*) AS k,
         |    SUM(CASE WHEN l.doc_id <> l.cluster_id THEN t.n_tok
         |      ELSE 0 END) AS tok_dropped
         |  FROM lbl l JOIN tk t ON t.doc_id = l.doc_id GROUP BY 1),
         |cl AS (SELECT CAST(k AS BIGINT) AS cluster_size,
         |    CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |    CAST(SUM(k) AS BIGINT) AS n_docs,
         |    CAST(SUM(k - 1) AS BIGINT) AS n_docs_dropped,
         |    CAST(SUM(tok_dropped) AS BIGINT) AS n_tokens_dropped
         |  FROM pc GROUP BY k),
         |sg AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
         |    CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(0 AS BIGINT) AS n_docs_dropped,
         |    CAST(0 AS BIGINT) AS n_tokens_dropped
         |  FROM documents d
         |  WHERE NOT EXISTS (SELECT 1 FROM lbl WHERE lbl.doc_id = d.doc_id))
         |SELECT * FROM cl UNION ALL SELECT * FROM sg""".stripMargin) +
    ("p120_budget_allocation" ->
      s"""WITH g AS (SELECT doc_id, keep
         |  FROM (${oracleBase("p76_gopher_rules")}) t),
         |b AS (SELECT doc_id, source,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tok FROM documents),
         |ps AS (SELECT b.source, COUNT(*) AS n_docs,
         |    SUM(g.keep) AS n_pass, SUM(b.n_tok) AS avail_tokens
         |  FROM b JOIN g USING (doc_id) GROUP BY 1),
         |pp AS (SELECT source, n_docs, avail_tokens,
         |    (n_pass * 1000000) // n_docs AS pass_ppm FROM ps),
         |tt AS (SELECT COALESCE(SUM(avail_tokens), 0) AS total FROM pp),
         |rk AS (SELECT pp.*, tt.total,
         |    (tt.total * $TrainBudgetPct) // 100 AS budget,
         |    CAST(ROW_NUMBER() OVER
         |      (ORDER BY pass_ppm DESC, source) AS INT) AS rnk,
         |    COALESCE(SUM(avail_tokens) OVER
         |      (ORDER BY pass_ppm DESC, source
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_before
         |  FROM pp, tt)
         |SELECT source, rnk,
         |  CAST(pass_ppm AS DOUBLE) / 1000000.0 AS gopher_pass_frac,
         |  CAST(avail_tokens AS BIGINT) AS avail_tokens,
         |  CAST(greatest(0, least(avail_tokens, budget - cum_before))
         |    AS BIGINT) AS alloc_tokens
         |FROM rk""".stripMargin) +
    ("p121_freq_spectrum" ->
      s"""WITH tc AS (SELECT tok, COUNT(*) AS c FROM (
         |    SELECT unnest($sqlToks) AS tok FROM documents)
         |  GROUP BY 1),
         |bk AS (SELECT CAST(len(bin(c)) - 1 AS INT) AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM(c) AS BIGINT) AS n_occurrences
         |  FROM tc GROUP BY 1),
         |tt AS (SELECT COALESCE(SUM(n_occurrences), 0) AS total FROM bk)
         |SELECT bucket,
         |  CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS c_lo,
         |  n_terms, n_occurrences,
         |  CAST((n_occurrences * 1000000) // tt.total AS DOUBLE)
         |    / 1000000.0 AS mass_frac
         |FROM bk, tt""".stripMargin) +
    ("p122_cusum_drift" -> sqlP122) +
    ("p123_drift_changepoint" ->
      // the p122 oracle rides verbatim as a parenthesized scoped
      // subquery (DuckDB scopes its WITH RECURSIVE locally — the
      // p110/p112 embedding pattern)
      s"""WITH fin AS (SELECT * FROM ($sqlP122) t),
         |rnk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |    ORDER BY hour) AS rn FROM fin),
         |fa AS (SELECT event_type, MIN(rn) AS arn FROM rnk
         |  WHERE alarm = 1 GROUP BY 1),
         |lz AS (SELECT r.event_type, MAX(r.rn) AS zrn
         |  FROM rnk r JOIN fa ON fa.event_type = r.event_type
         |  WHERE r.cusum8nb = 0 AND r.rn < fa.arn GROUP BY 1),
         |cp AS (SELECT fa.event_type, fa.arn,
         |    COALESCE(lz.zrn + 1, 1) AS crn
         |  FROM fa LEFT JOIN lz ON lz.event_type = fa.event_type)
         |SELECT cp.event_type, a.hour AS first_alarm_hour,
         |  c.hour AS changepoint_hour,
         |  CAST(cp.arn - cp.crn + 1 AS BIGINT) AS hours_to_detect
         |FROM cp
         |JOIN rnk a ON a.event_type = cp.event_type AND a.rn = cp.arn
         |JOIN rnk c ON c.event_type = cp.event_type AND c.rn = cp.crn"""
        .stripMargin)

  /** The p122 oracle text, shared verbatim with p123's (which scopes
    * it as the first CTE of its changepoint chain). */
  private lazy val sqlP122: String =
      s"""WITH RECURSIVE h AS (
         |  SELECT event_type, STRFTIME(ts, '%Y-%m-%d %H') AS hour,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |nn AS (SELECT event_type, COUNT(*) AS n FROM h
         |  GROUP BY 1 HAVING COUNT(*) > $CusumBaselineHours),
         |rk AS (SELECT h.event_type, h.hour, h.c, nn.n,
         |    ROW_NUMBER() OVER (PARTITION BY h.event_type
         |      ORDER BY h.hour) AS rn
         |  FROM h JOIN nn ON nn.event_type = h.event_type),
         |bs AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nb,
         |    CAST(SUM(c) AS BIGINT) AS sb,
         |    CAST(SUM(c*c) AS BIGINT) AS ssb
         |  FROM rk WHERE rn <= $CusumBaselineHours GROUP BY 1),
         |cu AS (
         |  SELECT r.event_type, r.rn, r.hour, r.c,
         |    GREATEST(0, 8 * b.nb * r.c - 9 * b.sb) AS cusum
         |  FROM rk r JOIN bs b ON b.event_type = r.event_type
         |  WHERE r.rn = $CusumBaselineHours + 1
         |  UNION ALL
         |  SELECT r.event_type, r.rn, r.hour, r.c,
         |    GREATEST(0, cu.cusum + 8 * b.nb * r.c - 9 * b.sb)
         |  FROM cu
         |  JOIN rk r ON r.event_type = cu.event_type
         |    AND r.rn = cu.rn + 1
         |  JOIN bs b ON b.event_type = r.event_type)
         |SELECT cu.event_type, cu.hour, cu.c,
         |  CAST(cu.cusum AS BIGINT) AS cusum8nb,
         |  CAST(CASE WHEN cu.cusum * cu.cusum >
         |      4096 * (b.nb * b.ssb - b.sb * b.sb)
         |    THEN 1 ELSE 0 END AS INT) AS alarm
         |FROM cu JOIN bs b ON b.event_type = cu.event_type""".stripMargin

  private lazy val oracleBase: Map[String, String] = Map(
    // rebuilds each image row's bytes from the text's hex directly; a
    // byte-order, stride, offset, or row-flip bug on the Spark side
    // (which PARSES them back out of the composed BMP) flips the hash
    "p61_bmp_real_bytes" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(4 + doc_id % 3 AS INT) AS width,
        |    CAST(2 + doc_id % 2 AS INT) AS height,
        |    lower(hex(text)) AS hx FROM documents),
        |px AS (SELECT doc_id, width, height, width*3 AS rowbytes,
        |    substr(hx, 1, height*width*6)
        |      || repeat('0', greatest(0, height*width*6 - len(hx)))
        |      AS pixhex
        |  FROM p),
        |rws AS (SELECT doc_id, width, height, rowbytes,
        |    CAST(i AS INT) AS img_row,
        |    substr(pixhex, i*rowbytes*2 + 1, rowbytes*2) AS rowhex
        |  FROM px, unnest(generate_series(0, height-1)) u(i)),
        |b AS (SELECT doc_id, img_row, width, height, rowbytes,
        |    CAST('0x' || substr(rowhex, j*2+1, 2) AS BIGINT) AS bv
        |  FROM rws, unnest(generate_series(0, rowbytes-1)) v(j))
        |SELECT doc_id, img_row, '424d' AS magic, width, height,
        |  CAST(24 AS INT) AS bpp,
        |  round(CAST(SUM(bv) AS DOUBLE) / rowbytes, 6) AS row_mean
        |FROM b GROUP BY doc_id, img_row, width, height, rowbytes""".stripMargin,
    // the ImageIO decode must agree with the mean computed straight from
    // the text bytes that became the pixels (padding excluded): the real
    // codec's stride/row-flip/channel handling is checked against pure SQL
    "p68_bmp_imageio_decode" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(4 + doc_id % 3 AS INT) AS width,
        |    CAST(2 + doc_id % 2 AS INT) AS height,
        |    lower(hex(text)) AS hx FROM documents),
        |px AS (SELECT doc_id, width, height, width*3*height AS npix,
        |    substr(hx, 1, height*width*6)
        |      || repeat('0', greatest(0, height*width*6 - len(hx)))
        |      AS pixhex
        |  FROM p),
        |b AS (SELECT doc_id, width, height, npix,
        |    CAST('0x' || substr(pixhex, j*2+1, 2) AS BIGINT) AS bv
        |  FROM px, unnest(generate_series(0, npix-1)) v(j))
        |SELECT doc_id, width, height,
        |  round(CAST(SUM(bv) AS DOUBLE) / npix, 6) AS mean_pixel
        |FROM b GROUP BY doc_id, width, height, npix""".stripMargin,
    // AudioSystem's decoded stream must return exactly the text's UTF-8
    // bytes as unsigned 8-bit samples, and its AudioFormat must report
    // the per-doc sample rate the WAV header declared
    "p69_wav_audio_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
        |    lower(hex(text)) AS hx FROM documents),
        |b AS (SELECT doc_id,
        |    CAST('0x' || substr(hx, j*2+1, 2) AS BIGINT) AS bv
        |  FROM d, unnest(generate_series(0, len(hx)//2 - 1)) v(j)),
        |t AS (SELECT doc_id, SUM(bv) AS s, COUNT(*) AS cnt
        |  FROM b GROUP BY doc_id)
        |SELECT d.doc_id, d.sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(8 AS INT) AS bits,
        |  CAST(coalesce(t.cnt, 0) AS BIGINT) AS n_samples,
        |  round(CAST(t.s AS DOUBLE) / t.cnt, 6) AS mean_sample
        |FROM d LEFT JOIN t ON d.doc_id = t.doc_id""".stripMargin,
    // the exact twin of the sketch-powered two-phase query: MG
    // guarantees every >= n/128 token reaches the recount, so plain
    // GROUP BY ... HAVING is the full answer
    "p70_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest($sqlToks) AS token FROM documents),
         |tot AS (SELECT COUNT(*) AS n FROM tk)
         |SELECT token, COUNT(*) AS cnt
         |FROM tk, tot
         |GROUP BY token, tot.n
         |HAVING COUNT(*) * $HhDen >= tot.n""".stripMargin,
    // the naive-Bayes replay: identical 16-fractional-bit quantized-log
    // scoring (sqlQlog2 twin of qlog2), identical smoothing, identical
    // argmax tiebreak — the confusion census must match exactly
    "p71_nb_classifier" ->
      s"""WITH $sqlNbScoredCtes,
         |pred AS (SELECT actual, cls FROM (
         |    SELECT actual, cls, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cls) AS rn
         |    FROM sc) t WHERE rn = 1)
         |SELECT actual, cls AS predicted, COUNT(*) AS n_docs
         |FROM pred GROUP BY 1, 2""".stripMargin,
    "p103_nb_calibration" ->
      s"""WITH $sqlNbScoredCtes,
         |r AS (SELECT doc_id, actual, cls, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cls) AS rn
         |  FROM sc),
         |pd AS (SELECT doc_id,
         |    MIN(CASE WHEN rn = 1 THEN cls END) AS predicted,
         |    MIN(actual) AS actual,
         |    MAX(CASE WHEN rn = 1 THEN score END)
         |      - COALESCE(MAX(CASE WHEN rn = 2 THEN score END),
         |        MAX(CASE WHEN rn = 1 THEN score END)
         |          - ${(CalMaxBin + 1) * 65536L}) AS margin_q
         |  FROM r WHERE rn <= 2 GROUP BY doc_id)
         |SELECT CAST(least($CalMaxBin, margin_q // 65536) AS BIGINT) AS bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  round(CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
         |      AS DOUBLE) / COUNT(*), 6) AS accuracy
         |FROM pd GROUP BY 1""".stripMargin,
    // the recall replay: the p04-shape exact scan vs the p05-shape
    // sign-bucket search AND the p20-shape IVF-cell search — hit counts
    // are integers, so both recalls are exact
    "p72_ann_recall" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |  ${sqlSignBucket("v", AnnBits)} AS bucket
        |  FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, bucket
        |  FROM n WHERE vec_id < 20),
        |es AS (SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n, p WHERE vec_id <> probe_id),
        |ex AS (SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS rnk FROM es) t WHERE rnk <= 3),
        |lss AS (SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n JOIN p USING (bucket) WHERE vec_id <> probe_id),
        |ls AS (SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS rnk FROM lss) t WHERE rnk <= 3),
        |pk AS (SELECT probe_id, pv, pnrm,
        |    unnest(list_prepend(bucket,
        |      list_transform(generate_series(1, $AnnBits), i ->
        |        substr(bucket, 1, CAST(i - 1 AS INT)) ||
        |        (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1'
        |          THEN '0' ELSE '1' END) ||
        |        substr(bucket, CAST(i + 1 AS INT), CAST($AnnBits - i AS INT)))))
        |      AS bucket
        |  FROM p),
        |mss AS (SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n JOIN pk USING (bucket) WHERE vec_id <> probe_id),
        |ms AS (SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS rnk FROM mss) t WHERE rnk <= 3),
        |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id < 16),
        |a0 AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
        |    round(list_sum(list_transform(generate_series(1, len(n.v)),
        |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS csim
        |  FROM n, c),
        |a AS (
        |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY csim DESC, cent_id) AS arnk FROM a0) t
        |  WHERE arnk = 1),
        |ip AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, cell
        |  FROM a WHERE vec_id < 20),
        |ivs AS (SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM a JOIN ip USING (cell) WHERE vec_id <> probe_id),
        |iv AS (SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS rnk FROM ivs) t WHERE rnk <= 3)
        |SELECT ex.probe_id,
        |  CAST(SUM(CASE WHEN ls.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_hits_lsh,
        |  round(SUM(CASE WHEN ls.vec_id IS NULL THEN 0 ELSE 1 END) / 3.0, 6)
        |    AS recall_lsh,
        |  CAST(SUM(CASE WHEN ms.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_hits_mp,
        |  round(SUM(CASE WHEN ms.vec_id IS NULL THEN 0 ELSE 1 END) / 3.0, 6)
        |    AS recall_mp,
        |  CAST(SUM(CASE WHEN iv.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_hits_ivf,
        |  round(SUM(CASE WHEN iv.vec_id IS NULL THEN 0 ELSE 1 END) / 3.0, 6)
        |    AS recall_ivf
        |FROM ex
        |  LEFT JOIN ls
        |    ON ls.probe_id = ex.probe_id AND ls.vec_id = ex.vec_id
        |  LEFT JOIN ms
        |    ON ms.probe_id = ex.probe_id AND ms.vec_id = ex.vec_id
        |  LEFT JOIN iv
        |    ON iv.probe_id = ex.probe_id AND iv.vec_id = ex.vec_id
        |GROUP BY ex.probe_id""".stripMargin,
    // the perplexity replay: identical bigram LM, identical qlog2
    // surprisal, identical value-histogram tercile cutoffs
    "p73_perplexity_buckets" ->
      s"""WITH d AS (SELECT doc_id, text,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_test
         |  FROM documents),
         |tk AS (SELECT doc_id, is_test, $sqlToks AS t FROM d),
         |bg AS (SELECT doc_id, is_test, t[i] AS prev, t[i + 1] AS cur
         |  FROM (SELECT doc_id, is_test, t,
         |    unnest(generate_series(1, len(t) - 1)) AS i
         |    FROM tk WHERE len(t) >= 2)),
         |model AS (SELECT prev, cur, COUNT(*) AS cnt
         |  FROM bg WHERE NOT is_test GROUP BY 1, 2),
         |ctx AS (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS ctx
         |  FROM model GROUP BY 1),
         |vs AS (SELECT COUNT(DISTINCT tok) AS v FROM
         |  (SELECT unnest($sqlToks) AS tok FROM d WHERE NOT is_test)),
         |sc AS (SELECT bg.doc_id,
         |    CAST(SUM(${sqlQlog2("COALESCE(ctx.ctx, 0) + vs.v")}
         |      - ${sqlQlog2("COALESCE(m.cnt, 0) + 1")}) AS BIGINT) AS bits_q,
         |    COUNT(*) AS nb
         |  FROM bg LEFT JOIN model m
         |      ON m.prev = bg.prev AND m.cur = bg.cur
         |    LEFT JOIN ctx ON ctx.prev = bg.prev, vs
         |  WHERE bg.is_test GROUP BY bg.doc_id),
         |sp AS (SELECT doc_id, bits_q // nb AS bpt_q FROM sc),
         |hist AS (SELECT bpt_q, COUNT(*) AS n FROM sp GROUP BY 1),
         |cum AS (SELECT bpt_q,
         |    SUM(n) OVER (ORDER BY bpt_q ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM hist),
         |tot AS (SELECT COUNT(*) AS n_docs FROM sp),
         |cuts AS (SELECT
         |    MIN(CASE WHEN cum * 3 >= n_docs THEN bpt_q END) AS c1,
         |    MIN(CASE WHEN cum * 3 >= 2 * n_docs THEN bpt_q END) AS c2
         |  FROM cum, tot)
         |SELECT CASE WHEN bpt_q <= c1 THEN 'head'
         |    WHEN bpt_q <= c2 THEN 'middle' ELSE 'tail' END AS bucket,
         |  COUNT(*) AS n_docs, MIN(bpt_q) AS min_bpt_q,
         |  MAX(bpt_q) AS max_bpt_q, CAST(SUM(bpt_q) AS BIGINT) AS sum_bpt_q
         |FROM sp, cuts GROUP BY 1""".stripMargin,
    // the BM25 replay: identical scaled-integer Okapi arithmetic
    // (// is DuckDB's BIGINT floor division, the ldiv twin)
    "p74_bm25_retrieval" ->
      s"""WITH tkl AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf
         |  FROM (SELECT doc_id, t[i] || ' ' || t[i + 1] AS token
         |    FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, len(t) - 1)) AS i
         |      FROM tkl WHERE len(t) >= 2))
         |  GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
         |  FROM tf GROUP BY 1),
         |st AS (SELECT COUNT(*) AS d_docs, CAST(SUM(dl) AS BIGINT) AS t_toks
         |  FROM dl),
         |dfx AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         |qt AS (SELECT tf.doc_id AS probe_id, tf.token,
         |    ${sqlQlog2("st.d_docs + 1")} - ${sqlQlog2("dfx.df")} AS idf_q,
         |    st.d_docs, st.t_toks
         |  FROM tf JOIN dfx USING (token), st
         |  WHERE tf.doc_id < 10 AND dfx.df * 20 <= st.d_docs),
         |cd AS (SELECT qt.probe_id, tf.doc_id,
         |    (qt.idf_q * tf.tf * 144179)
         |      // (tf.tf * 65536 + (3 * 65536
         |        + 9 * ((dl.dl * 65536 * qt.d_docs) // qt.t_toks)) // 10)
         |      AS term_q
         |  FROM qt JOIN tf USING (token) JOIN dl ON dl.doc_id = tf.doc_id
         |  WHERE tf.doc_id <> qt.probe_id),
         |sc AS (SELECT probe_id, doc_id, CAST(SUM(term_q) AS BIGINT) AS score_q
         |  FROM cd GROUP BY 1, 2),
         |r AS (SELECT probe_id, doc_id, score_q,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
         |    ORDER BY score_q DESC, doc_id) AS INT) AS rnk FROM sc)
         |SELECT probe_id, doc_id, rnk, score_q FROM r WHERE rnk <= 10""".stripMargin,
    "p75_span_strip" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |base AS (SELECT doc_id, t, len(t) AS n,
         |    len(t) // $SpanW AS n_spans FROM tk),
         |sp AS (SELECT doc_id, j,
         |    ${sqlH60(s"array_to_string(t[(j-1)*$SpanW+1:j*$SpanW], ' ')")}
         |      AS hv,
         |    doc_id * $StripPosPack + j AS pos
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, n_spans)) AS j FROM base)),
         |c AS (SELECT hv, COUNT(*) AS cnt, MIN(pos) AS keeper
         |  FROM sp GROUP BY 1),
         |dr AS (SELECT doc_id, list(j) AS drop_j
         |  FROM sp JOIN c USING (hv)
         |  WHERE cnt > 1 AND pos <> keeper GROUP BY doc_id),
         |fin AS (SELECT b.doc_id, b.n_spans,
         |    coalesce(dr.drop_j, CAST([] AS BIGINT[])) AS dj,
         |    flatten(list_transform(
         |        list_filter(generate_series(1, b.n_spans),
         |          j -> NOT list_contains(
         |            coalesce(dr.drop_j, CAST([] AS BIGINT[])), j)),
         |        j -> b.t[(j-1)*$SpanW+1:j*$SpanW]))
         |      || b.t[b.n_spans*$SpanW+1:b.n] AS clean
         |  FROM base b LEFT JOIN dr ON b.doc_id = dr.doc_id)
         |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
         |  CAST(len(dj) AS BIGINT) AS n_dropped,
         |  CAST(len(clean) AS BIGINT) AS n_tokens_clean,
         |  md5(coalesce(array_to_string(clean, ' '), '')) AS clean_md5
         |FROM fin""".stripMargin,
    "p76_gopher_rules" -> {
      val stopSum = Stopwords
        .map(w => s"CASE WHEN list_contains(t, '$w') THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t,
         |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters
         |  FROM documents),
         |m AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words, n_letters,
         |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |    CAST($stopSum AS BIGINT) AS n_stop
         |  FROM tk),
         |f AS (SELECT doc_id, n_words,
         |    CAST(CASE WHEN n_words BETWEEN 50 AND 100000
         |      THEN 1 ELSE 0 END AS INT) AS r_words,
         |    CAST(CASE WHEN n_letters >= 3 * n_words
         |        AND n_letters <= 10 * n_words
         |      THEN 1 ELSE 0 END AS INT) AS r_mean_len,
         |    CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS r_stop,
         |    CAST(CASE WHEN (n_words - n_distinct) * 100 <= n_words * 55
         |      THEN 1 ELSE 0 END AS INT) AS r_dup
         |  FROM m)
         |SELECT doc_id, n_words, r_words, r_mean_len, r_stop, r_dup,
         |  CAST(r_words * r_mean_len * r_stop * r_dup AS INT) AS keep
         |FROM f""".stripMargin
    },
    "p78_curation_funnel" -> {
      val stopSum = Stopwords
        .map(w => s"CASE WHEN list_contains(t, '$w') THEN 1 ELSE 0 END")
        .mkString(" + ")
      def census(no: Int, name: String, src: String) =
        s"""SELECT CAST($no AS INT) AS stage_no, '$name' AS stage,
           |  COUNT(*) AS n_docs,
           |  CAST(coalesce(SUM(n_words), 0) AS BIGINT) AS n_tokens
           |FROM $src""".stripMargin
      s"""WITH w AS (SELECT doc_id, text,
         |    CAST(len($sqlToks) AS BIGINT) AS n_words FROM documents),
         |gm AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
         |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
         |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |    CAST($stopSum AS BIGINT) AS n_stop
         |  FROM (SELECT doc_id, text, $sqlToks AS t FROM documents)),
         |kept AS (SELECT w.* FROM w JOIN gm USING (doc_id)
         |  WHERE gm.n_words BETWEEN 50 AND 100000
         |    AND gm.n_letters >= 3 * gm.n_words
         |    AND gm.n_letters <= 10 * gm.n_words
         |    AND gm.n_stop >= 2
         |    AND (gm.n_words - gm.n_distinct) * 100 <= gm.n_words * 55),
         |rep0 AS (SELECT sha256(text) AS ch, MIN(doc_id) AS doc_id
         |  FROM kept GROUP BY 1),
         |reps AS (SELECT k.* FROM kept k JOIN rep0 r ON k.doc_id = r.doc_id),
         |${sqlMinhashBaseFrom("reps")},
         |$sqlCappedCand,
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b,
         |    len(list_intersect(da.shset, db.shset)) AS ninter,
         |    da.n AS na, db.n AS nb
         |  FROM cand c
         |  JOIN sig da ON da.doc_id = c.doc_a
         |  JOIN sig db ON db.doc_id = c.doc_b),
         |dropd AS (SELECT DISTINCT doc_b AS doc_id FROM pairs
         |  WHERE CAST(ninter AS DOUBLE) / (na + nb - ninter)
         |    >= $JaccardThreshold),
         |near AS (SELECT r.* FROM reps r
         |  LEFT JOIN dropd d ON r.doc_id = d.doc_id WHERE d.doc_id IS NULL)
         |${census(0, "raw", "w")}
         |UNION ALL ${census(1, "gopher_rules", "kept")}
         |UNION ALL ${census(2, "exact_dedup", "reps")}
         |UNION ALL ${census(3, "near_dedup", "near")}""".stripMargin
    },
    "p77_dsir_weights" ->
      s"""WITH g AS (SELECT doc_id, is_target,
         |    ${sqlH60("t[i] || ' ' || t[i + 1]")} % $DsirBuckets AS f
         |  FROM (SELECT doc_id, lang = 'en' AS is_target, t,
         |      unnest(generate_series(1, len(t) - 1)) AS i
         |    FROM (SELECT doc_id, lang, $sqlToks AS t FROM documents)
         |    WHERE len(t) >= 2)),
         |cr AS (SELECT f, COUNT(*) AS cr FROM g GROUP BY 1),
         |ct AS (SELECT f, COUNT(*) AS ct FROM g WHERE is_target GROUP BY 1),
         |feat AS (SELECT cr.f,
         |    ${sqlQlog2("coalesce(ct.ct, 0) + 1")}
         |      - ${sqlQlog2("cr.cr + 1")} AS delta_q
         |  FROM cr LEFT JOIN ct ON cr.f = ct.f),
         |tot AS (SELECT COUNT(*) AS r_tot,
         |    CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
         |      AS t_tot FROM g),
         |sc AS (SELECT doc_id,
         |    CAST(MAX(CASE WHEN is_target THEN 1 ELSE 0 END) AS INT)
         |      AS is_target,
         |    COUNT(*) AS n_grams, CAST(SUM(delta_q) AS BIGINT) AS sum_delta
         |  FROM g JOIN feat USING (f) GROUP BY doc_id)
         |SELECT doc_id, is_target, CAST(n_grams AS BIGINT) AS n_grams,
         |  sum_delta + n_grams * (${sqlQlog2(s"r_tot + $DsirBuckets")}
         |    - ${sqlQlog2(s"t_tot + $DsirBuckets")}) AS w_q,
         |  CAST(CASE WHEN sum_delta + n_grams
         |      * (${sqlQlog2(s"r_tot + $DsirBuckets")}
         |        - ${sqlQlog2(s"t_tot + $DsirBuckets")}) > 0
         |    THEN 1 ELSE 0 END AS INT) AS keep
         |FROM sc, tot""".stripMargin,
    "p60_pack_whole_docs" ->
      s"""WITH n AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n
         |  FROM documents),
         |c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM n),
         |g AS (SELECT CAST((cum-n)//$ShardTokens AS BIGINT) AS pack,
         |    COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
         |    MAX(cum) AS end_cum
         |  FROM c GROUP BY 1)
         |SELECT pack, n_docs, n_tokens, first_doc, last_doc,
         |  CAST(greatest(0, end_cum - (pack+1)*$ShardTokens) AS BIGINT)
         |    AS overflow_tokens
         |FROM g""".stripMargin,
    "p67_temperature_mix" ->
      s"""WITH dl AS (SELECT doc_id, lang FROM documents),
         |bl AS (SELECT lang, COUNT(*) AS n_in FROM dl GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_tot FROM dl),
         |sc AS (SELECT lang, n_in, n_tot,
         |    sqrt(CAST(n_in AS DOUBLE) / CAST(n_tot AS DOUBLE)) AS s
         |  FROM bl, tot),
         |z AS (SELECT list_reduce(list(s ORDER BY lang), (a, b) -> a + b)
         |    AS z FROM sc),
         |rates AS (SELECT lang, n_in, s / z AS q,
         |    least(1.0, ((s / z) * floor(CAST(n_tot AS DOUBLE) / 2.0))
         |      / CAST(n_in AS DOUBLE)) AS keep_rate
         |  FROM sc, z),
         |kept AS (SELECT d.lang, COUNT(*) AS n_kept
         |  FROM dl d JOIN rates r ON d.lang = r.lang
         |  WHERE ${sqlH60("'tmix:' || CAST(doc_id AS VARCHAR)")} % $MixScale
         |    < CAST(floor(r.keep_rate * $MixScale.0) AS BIGINT)
         |  GROUP BY 1)
         |SELECT r.lang, r.n_in, round(r.q, 6) AS target_share,
         |  round(r.keep_rate, 6) AS keep_rate,
         |  coalesce(k.n_kept, 0) AS n_kept
         |FROM rates r LEFT JOIN kept k ON r.lang = k.lang""".stripMargin,
    "p65_incremental_neardup" ->
      s"""WITH $sqlMinhashBase,
         |capped AS (
         |  SELECT doc_id, band, bkey FROM (
         |    SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bsz
         |    FROM bands) t WHERE bsz <= $MaxBucket),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
         |j AS (
         |  SELECT c.new_id, c.old_id,
         |    CAST(len(list_intersect(da.shset, db.shset)) AS DOUBLE)
         |      / (da.n + db.n - len(list_intersect(da.shset, db.shset)))
         |      AS jaccard
         |  FROM cand c
         |  JOIN sig da ON da.doc_id = c.new_id
         |  JOIN sig db ON db.doc_id = c.old_id)
         |SELECT new_id,
         |  CAST(COUNT(*) OVER (PARTITION BY new_id) AS BIGINT) AS n_dups,
         |  old_id AS best_old, jaccard AS best_jaccard
         |FROM j WHERE jaccard >= $JaccardThreshold
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY new_id
         |  ORDER BY jaccard DESC, old_id) = 1""".stripMargin,
    "p64_bpe_by_lang" -> {
      val round = (r: Int) => s"""
         |p$r AS (SELECT lang, l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt
         |  FROM sym${r - 1}, UNNEST(generate_series(1, len(l)-1)) AS u(i)
         |  GROUP BY 1, 2, 3),
         |w$r AS (SELECT lang, a, b, cnt FROM p$r
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY cnt DESC, a, b) = 1),
         |sym$r AS (SELECT lang, freq,
         |    list_reduce(list_transform(l, s -> [s]), (acc, x) ->
         |      CASE WHEN acc[len(acc)] = a AND x[1] = b
         |           THEN list_concat(acc[1:len(acc)-1], [a || b])
         |           ELSE list_concat(acc, x) END) AS l
         |  FROM sym${r - 1} JOIN w$r USING (lang))"""
      val selects = (1 to BpeRounds).map(r =>
        s"""SELECT lang, $r AS round, a AS left_sym, b AS right_sym,
           |  a || b AS merged, CAST(cnt AS BIGINT) AS cnt FROM w$r"""
          .stripMargin).mkString("\nUNION ALL ")
      s"""WITH wf AS (
         |  SELECT lang, term AS w, COUNT(*) AS freq FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS term
         |    FROM documents)
         |  WHERE regexp_full_match(term, '[a-z]+') AND length(term) >= 2
         |  GROUP BY 1, 2),
         |sym0 AS (SELECT lang, freq, string_split(w, '') AS l FROM wf)"""
        .stripMargin +
        (1 to BpeRounds).map(r => "," + round(r).stripMargin).mkString +
        "\n" + selects
    },
    "p63_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, lang, md5(text) AS h FROM documents
        |  WHERE doc_id % 7 <> 0),
        |b AS (SELECT doc_id, lang,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' updated'
        |             ELSE text END) AS h
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(a.lang, b.lang) AS lang,
        |  CASE WHEN a.h IS NULL THEN 'added'
        |       WHEN b.h IS NULL THEN 'removed'
        |       WHEN a.h <> b.h THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  COUNT(*) AS n_docs
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "p62_bpe_merges" -> {
      val selects = (1 to BpeRounds).map(r =>
        s"""SELECT $r AS round, a AS left_sym, b AS right_sym,
           |  a || b AS merged, CAST(cnt AS BIGINT) AS cnt FROM w$r"""
          .stripMargin).mkString("\nUNION ALL ")
      sqlBpeChain(BpeRounds) + "\n" + selects
    },
    "p66_bpe_apply" ->
      (sqlBpeChain(BpeRounds) + s"""
         |SELECT COUNT(*) AS n_words,
         |  CAST(SUM(freq) AS BIGINT) AS n_occurrences,
         |  CAST(SUM(freq * length(w)) AS BIGINT) AS syms_before,
         |  CAST(SUM(freq * len(l)) AS BIGINT) AS syms_after,
         |  CAST(SUM(freq * length(w)) - SUM(freq * len(l)) AS BIGINT)
         |    AS syms_saved
         |FROM sym$BpeRounds""".stripMargin),
    "p59_shingle_vocab" ->
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS tk FROM documents),
         |sh AS (SELECT lang, array_to_string(tk[i:i+${ShingleW - 1}], ' ') AS shingle
         |       FROM t, unnest(generate_series(1, len(tk)-${ShingleW - 1})) AS u(i)),
         |c AS (SELECT lang, shingle, COUNT(*) AS cnt FROM sh GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_shingles,
         |        COUNT(*) AS n_distinct FROM c GROUP BY 1),
         |top AS (SELECT lang, shingle AS top_shingle, cnt AS top_cnt,
         |        ROW_NUMBER() OVER (PARTITION BY lang
         |          ORDER BY cnt DESC, shingle) AS rn FROM c)
         |SELECT lang, n_shingles, n_distinct, top_shingle, top_cnt
         |FROM tot JOIN top USING (lang) WHERE rn = 1""".stripMargin,
    "p32_dup_clusters" ->
      s"""WITH RECURSIVE $sqlClusterLabels
         |SELECT doc_id, cluster_id,
         |  CAST(CASE WHEN cluster_id = doc_id THEN 1 ELSE 0 END
         |    AS INT) AS keep
         |FROM lbl""".stripMargin,
    "p41_cluster_reps" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |tk AS (SELECT doc_id, len($sqlToks) AS n_tokens FROM documents),
         |r AS (SELECT l.cluster_id, l.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY l.cluster_id
         |      ORDER BY t.n_tokens DESC, l.doc_id ASC) AS rnk
         |  FROM lbl l JOIN tk t ON l.doc_id = t.doc_id)
         |SELECT cluster_id,
         |  MIN(CASE WHEN rnk = 1 THEN doc_id END) AS rep_doc,
         |  COUNT(*) AS n_members
         |FROM r GROUP BY cluster_id""".stripMargin,
    "p42_ann_quantized" ->
      s"""WITH $sqlQuantCtes,
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, qv AS qpv
        |  FROM q WHERE vec_id < 5),
        |c AS (
        |  SELECT probe_id, vec_id, pv, v, pnrm, nrm,
        |    CAST(list_sum(list_transform(generate_series(1, len(qpv)),
        |      i -> qpv[i] * qv[i])) AS BIGINT) AS qsim
        |  FROM q, p WHERE vec_id <> probe_id),
        |t AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY qsim DESC, vec_id ASC) AS qrnk FROM c),
        |r AS (
        |  SELECT probe_id, vec_id, qsim,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM t WHERE qrnk <= 20)
        |SELECT probe_id, vec_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id ASC) AS INT) AS rnk,
        |  sim, qsim
        |FROM r
        |QUALIFY rnk <= 5""".stripMargin,
    "p47_quantized_centroids" ->
      s"""WITH $sqlQuantCtes,
         |x AS (
         |  SELECT label, i, qv[i] AS cq, mns[i] AS mn, mxs[i] AS mx
         |  FROM q, sa, (SELECT unnest(generate_series(1,
         |    (SELECT max(len(qv)) FROM q))) AS i) dims
         |  WHERE i <= len(qv))
         |SELECT label, CAST(i - 1 AS INT) AS dim, COUNT(*) AS n,
         |  round(CAST(SUM(cq) AS DOUBLE) / COUNT(*), 6) AS centroid_q,
         |  round(MIN(mn) + (CAST(SUM(cq) AS DOUBLE) / COUNT(*) + 128.0)
         |    * (MIN(mx) - MIN(mn)) / 255.0, 6) AS centroid
         |FROM x GROUP BY label, i""".stripMargin,
    "p48_hist_quantiles" ->
      s"""WITH mm AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx,
         |    COUNT(*) AS n FROM documents),
         |hist AS (
         |  SELECT least(${HistBins - 1},
         |      (n_chars - mn) * $HistBins // (mx - mn + 1)) AS b,
         |    COUNT(*) AS c
         |  FROM documents, mm GROUP BY 1),
         |cdf AS (SELECT b, SUM(c) OVER (ORDER BY b) AS cum FROM hist),
         |p50 AS (SELECT MIN(b) AS p50_bin FROM cdf, mm WHERE cum * 2 >= n),
         |p90 AS (SELECT MIN(b) AS p90_bin FROM cdf, mm
         |  WHERE cum * 10 >= n * 9),
         |ex AS (SELECT round(quantile_cont(n_chars, 0.5), 4) AS p50_exact,
         |  round(quantile_cont(n_chars, 0.9), 4) AS p90_exact
         |  FROM documents)
         |SELECT n, mn, mx, p50_bin,
         |  round(mn + CAST(p50_bin + 1 AS DOUBLE)
         |    * CAST(mx - mn + 1 AS DOUBLE) / $HistBins.0, 4) AS p50_approx,
         |  p50_exact, p90_bin,
         |  round(mn + CAST(p90_bin + 1 AS DOUBLE)
         |    * CAST(mx - mn + 1 AS DOUBLE) / $HistBins.0, 4) AS p90_approx,
         |  p90_exact
         |FROM mm, p50, p90, ex""".stripMargin,
    "p43_vocab_oov" ->
      s"""WITH occ AS (
         |  SELECT doc_id, lang, source, unnest($sqlToks) AS term
         |  FROM documents),
         |dtf AS (SELECT doc_id, lang, source, term, COUNT(*) AS tf
         |  FROM occ GROUP BY 1, 2, 3, 4),
         |corpus AS (SELECT term, SUM(tf) AS cnt FROM dtf GROUP BY 1),
         |vocab AS (SELECT term FROM corpus
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC)
         |    <= $VocabTopK)
         |SELECT lang, source, COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN v.term IS NULL THEN tf ELSE 0 END)
         |    AS BIGINT) AS n_oov,
         |  round(CAST(SUM(CASE WHEN v.term IS NULL THEN tf ELSE 0 END)
         |      AS DOUBLE)
         |    / CAST(SUM(tf) AS BIGINT), 6) AS oov_rate
         |FROM dtf d LEFT JOIN vocab v ON d.term = v.term
         |GROUP BY 1, 2""".stripMargin,
    "p45_diversity_score" ->
      s"""WITH ch AS (
         |  SELECT doc_id, c FROM (
         |    SELECT doc_id, ch, COUNT(*) AS c FROM (
         |      SELECT doc_id, unnest(string_split(text, '')) AS ch
         |      FROM documents) WHERE ch <> '' GROUP BY 1, 2)),
         |cd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ch,
         |    CAST(SUM(c * c) AS BIGINT) AS s2_ch
         |  FROM ch GROUP BY 1),
         |tk AS (
         |  SELECT doc_id, c FROM (
         |    SELECT doc_id, term, COUNT(*) AS c FROM (
         |      SELECT doc_id, unnest($sqlToks) AS term
         |      FROM documents) GROUP BY 1, 2)),
         |td AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
         |    CAST(SUM(c * c) AS BIGINT) AS s2_tok
         |  FROM tk GROUP BY 1)
         |SELECT cd.doc_id, n_ch,
         |  round(1.0 - CAST(s2_ch AS DOUBLE) / CAST(n_ch * n_ch AS DOUBLE), 6)
         |    AS char_simpson,
         |  n_tok,
         |  round(1.0 - CAST(s2_tok AS DOUBLE) / CAST(n_tok * n_tok AS DOUBLE),
         |    6) AS token_simpson
         |FROM cd JOIN td ON cd.doc_id = td.doc_id""".stripMargin,
    "p46_mixture_sample" ->
      s"""WITH dt AS (
         |  SELECT doc_id, source, CAST(len($sqlToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |bysrc AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok,
         |    COUNT(*) AS n_docs_in
         |  FROM dt GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS tot_tok FROM dt),
         |rates AS (
         |  SELECT source, n_docs_in,
         |    least(1.0, $MixCap /
         |      (CAST(src_tok AS DOUBLE) / CAST(tot_tok AS DOUBLE)))
         |      AS keep_rate
         |  FROM bysrc, tot),
         |kept AS (
         |  SELECT d.source, COUNT(*) AS n_docs_kept,
         |    CAST(SUM(d.n_tok) AS BIGINT) AS n_tok_kept
         |  FROM dt d JOIN rates r ON d.source = r.source
         |  WHERE ${sqlH60("'mix:' || CAST(doc_id AS VARCHAR)")} % $MixScale
         |    < CAST(floor(r.keep_rate * $MixScale.0) AS BIGINT)
         |  GROUP BY 1)
         |SELECT r.source, round(r.keep_rate, 6) AS keep_rate, r.n_docs_in,
         |  coalesce(k.n_docs_kept, 0) AS n_docs_kept,
         |  coalesce(k.n_tok_kept, 0) AS n_tok_kept
         |FROM rates r LEFT JOIN kept k ON r.source = k.source""".stripMargin,
    "p44_bloom_prefilter" ->
      s"""WITH d AS (SELECT doc_id, sha256(text) AS content_hash,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_new
         |  FROM documents),
         |existing AS (SELECT DISTINCT content_hash FROM d WHERE NOT is_new),
         |seeds AS (SELECT unnest(generate_series(0, ${BloomK - 1})) AS k),
         |bits AS (SELECT DISTINCT
         |    ${sqlH60Seeded("k", "content_hash")} % $BloomBits AS pos
         |  FROM existing, seeds),
         |pr AS (SELECT doc_id, content_hash,
         |    ${sqlH60Seeded("k", "content_hash")} % $BloomBits AS pos
         |  FROM d, seeds WHERE is_new),
         |verdicts AS (
         |  SELECT doc_id, content_hash,
         |    CAST(CASE WHEN SUM(CASE WHEN b.pos IS NULL THEN 1 ELSE 0 END)
         |      = 0 THEN 1 ELSE 0 END AS INT) AS bloom_hit
         |  FROM pr LEFT JOIN bits b ON pr.pos = b.pos
         |  GROUP BY 1, 2)
         |SELECT h.doc_id, h.bloom_hit,
         |  CAST(CASE WHEN e.content_hash IS NULL THEN 0 ELSE 1 END
         |    AS INT) AS is_dup
         |FROM verdicts h
         |LEFT JOIN existing e ON h.content_hash = e.content_hash""".stripMargin,
    "p01_exact_dedup" ->
      """SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS dup_cnt
        |FROM documents GROUP BY 1""".stripMargin,
    "p02_minhash_neardup" -> sqlP02,
    "p03_simhash_fingerprint" ->
      s"""WITH tok AS (
         |  SELECT doc_id, ${sqlH60("tok")} AS hv FROM (
         |    SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS tok
         |    FROM (SELECT doc_id, $sqlToks AS t FROM documents))),
         |votes AS (
         |  SELECT doc_id, j, CAST(SUM(2 * ((hv >> j) & 1) - 1) AS BIGINT) AS s
         |  FROM tok, (SELECT unnest(generate_series(0, 31)) AS j) js
         |  GROUP BY doc_id, j)
         |SELECT doc_id, CAST(SUM(CASE WHEN s >= 0
         |  THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
         |FROM votes GROUP BY doc_id""".stripMargin,
    "p04_ann_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
        |  FROM n WHERE vec_id < 5),
        |s AS (
        |  SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n, p WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rnk FROM s)
        |SELECT probe_id, vec_id, rnk, sim FROM r WHERE rnk <= 10""".stripMargin,
    "p05_ann_lsh_bucketed" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |  ${sqlSignBucket("v", AnnBits)} AS bucket
        |  FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, bucket
        |  FROM n WHERE vec_id < 20),
        |s AS (
        |  SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n JOIN p USING (bucket) WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rnk FROM s)
        |SELECT probe_id, vec_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "p106_perplexity_by_lang" ->
      s"""WITH d AS (SELECT doc_id, lang, text,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_test
         |  FROM documents),
         |tk AS (SELECT doc_id, lang, is_test, $sqlToks AS t FROM d),
         |bg AS (SELECT doc_id, lang, is_test, t[i] AS prev, t[i + 1] AS cur
         |  FROM (SELECT doc_id, lang, is_test, t,
         |    unnest(generate_series(1, len(t) - 1)) AS i
         |    FROM tk WHERE len(t) >= 2)),
         |model AS (SELECT lang, prev, cur, COUNT(*) AS cnt
         |  FROM bg WHERE NOT is_test GROUP BY 1, 2, 3),
         |ctx AS (SELECT lang, prev, CAST(SUM(cnt) AS BIGINT) AS ctx
         |  FROM model GROUP BY 1, 2),
         |vs AS (SELECT lang, COUNT(DISTINCT tok) AS v FROM
         |  (SELECT lang, unnest($sqlToks) AS tok FROM d WHERE NOT is_test)
         |  GROUP BY 1),
         |sc AS (SELECT bg.doc_id, bg.lang,
         |    CAST(SUM(${sqlQlog2("COALESCE(ctx.ctx, 0) + vs.v")}
         |      - ${sqlQlog2("COALESCE(m.cnt, 0) + 1")}) AS BIGINT) AS bits_q,
         |    COUNT(*) AS nb
         |  FROM bg LEFT JOIN model m
         |      ON m.lang = bg.lang AND m.prev = bg.prev AND m.cur = bg.cur
         |    LEFT JOIN ctx ON ctx.lang = bg.lang AND ctx.prev = bg.prev
         |    JOIN vs ON vs.lang = bg.lang
         |  WHERE bg.is_test GROUP BY bg.doc_id, bg.lang),
         |sp AS (SELECT doc_id, lang, bits_q // nb AS bpt_q FROM sc),
         |hist AS (SELECT lang, bpt_q, COUNT(*) AS n FROM sp GROUP BY 1, 2),
         |cum AS (SELECT lang, bpt_q,
         |    SUM(n) OVER (PARTITION BY lang ORDER BY bpt_q
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM hist),
         |tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM sp GROUP BY 1),
         |cuts AS (SELECT cum.lang,
         |    MIN(CASE WHEN cum * 3 >= n_docs THEN bpt_q END) AS c1,
         |    MIN(CASE WHEN cum * 3 >= 2 * n_docs THEN bpt_q END) AS c2
         |  FROM cum JOIN tot ON tot.lang = cum.lang GROUP BY 1)
         |SELECT sp.lang,
         |  CASE WHEN bpt_q <= c1 THEN 'head'
         |    WHEN bpt_q <= c2 THEN 'middle' ELSE 'tail' END AS bucket,
         |  COUNT(*) AS n_docs, MIN(bpt_q) AS min_bpt_q,
         |  MAX(bpt_q) AS max_bpt_q
         |FROM sp JOIN cuts ON cuts.lang = sp.lang GROUP BY 1, 2""".stripMargin,
    "p109_decontam_release" ->
      s"""WITH sh AS (SELECT doc_id, unnest(${sqlShingles("t", ContamW)})
         |    AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |g AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g FROM sh),
         |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 29 = 7),
         |hit AS (SELECT DISTINCT doc_id FROM g
         |  WHERE doc_id % 29 <> 7 AND g IN (SELECT g FROM ev)),
         |tr AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_toks
         |  FROM documents WHERE doc_id % 29 <> 7),
         |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens FROM tr),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens
         |  FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM hit))
         |SELECT 'train_before' AS stage, n_docs, n_tokens FROM b
         |UNION ALL SELECT 'train_after', n_docs, n_tokens FROM a
         |UNION ALL SELECT 'dropped', b.n_docs - a.n_docs,
         |  b.n_tokens - a.n_tokens FROM b, a""".stripMargin,
    "p108_novelty_curve" ->
      s"""WITH sh AS (SELECT doc_id, unnest(${sqlShingles("t", ContamW)})
         |    AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |gr AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g FROM sh),
         |f AS (SELECT g, MIN(doc_id) AS first_doc FROM gr GROUP BY 1),
         |m AS (SELECT MAX(doc_id) + 1 AS m FROM gr)
         |SELECT (gr.doc_id * 10) // m AS decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(SUM(CASE WHEN gr.doc_id = f.first_doc THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  CAST((SUM(CASE WHEN gr.doc_id = f.first_doc THEN 1 ELSE 0 END)
         |    * 1000000) // COUNT(*) AS DOUBLE) / 1000000.0 AS novelty_frac
         |FROM gr JOIN f USING (g), m
         |GROUP BY 1""".stripMargin,
    "p107_padding_audit" ->
      s"""WITH l AS (SELECT doc_id,
         |    least(CAST(len($sqlToks) AS BIGINT), $PadCtx) AS len
         |  FROM documents),
         |a AS (SELECT len,
         |    (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // $PadBatch AS batch
         |  FROM l),
         |s AS (SELECT len,
         |    (ROW_NUMBER() OVER (ORDER BY len, doc_id) - 1) // $PadBatch
         |      AS batch
         |  FROM l),
         |ab AS (SELECT batch, COUNT(*) AS bsz, MAX(len) AS mx,
         |    SUM(len) AS tok FROM a GROUP BY 1),
         |sb AS (SELECT batch, COUNT(*) AS bsz, MAX(len) AS mx,
         |    SUM(len) AS tok FROM s GROUP BY 1)
         |SELECT 'arrival' AS strategy,
         |  CAST(COUNT(*) AS BIGINT) AS n_batches,
         |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
         |  CAST(SUM(bsz * mx - tok) AS BIGINT) AS padded_slots,
         |  CAST((SUM(bsz * mx - tok) * 1000000)
         |    // (SUM(bsz * mx - tok) + SUM(tok)) AS DOUBLE) / 1000000.0
         |    AS waste_frac
         |FROM ab
         |UNION ALL
         |SELECT 'length_sorted',
         |  CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(tok) AS BIGINT),
         |  CAST(SUM(bsz * mx - tok) AS BIGINT),
         |  CAST((SUM(bsz * mx - tok) * 1000000)
         |    // (SUM(bsz * mx - tok) + SUM(tok)) AS DOUBLE) / 1000000.0
         |FROM sb""".stripMargin,
    "p105_training_order" ->
      s"""WITH k AS (SELECT doc_id,
         |    ${sqlH60("'order:' || CAST(doc_id AS VARCHAR)")} AS hkey
         |  FROM documents),
         |r AS (SELECT doc_id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY hkey, doc_id) - 1 AS BIGINT)
         |      AS step
         |  FROM k)
         |SELECT doc_id, step, step // $OrderBatch AS batch FROM r""".stripMargin,
    "p104_ann_multiprobe" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |  ${sqlSignBucket("v", AnnBits)} AS bucket
        |  FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, bucket
        |  FROM n WHERE vec_id < 20),
        |pk AS (SELECT probe_id, pv, pnrm,
        |    unnest(list_prepend(bucket,
        |      list_transform(generate_series(1, $AnnBits), i ->
        |        substr(bucket, 1, CAST(i - 1 AS INT)) ||
        |        (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1'
        |          THEN '0' ELSE '1' END) ||
        |        substr(bucket, CAST(i + 1 AS INT), CAST($AnnBits - i AS INT)))))
        |      AS bucket
        |  FROM p),
        |s AS (
        |  SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n JOIN pk USING (bucket) WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rnk FROM s)
        |SELECT probe_id, vec_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "p06_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
         |    AS BIGINT) AS n_regex_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq,
         |  len(list_distinct(t)) / len(t) AS uniq_ratio,
         |  CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) / len(t)
         |    AS avg_tok_len,
         |  len(list_filter(t, x -> list_contains($sqlStops, x))) / len(t)
         |    AS stop_ratio,
         |  round((len(list_filter(t, x -> list_contains($sqlStops, x))) / len(t)
         |    + len(list_distinct(t)) / len(t)) / 2, 6) AS quality,
         |  CASE WHEN len(list_filter(t, x -> list_contains($sqlStops, x)))
         |    / len(t) >= 0.05 THEN 'en' ELSE 'unk' END AS lang_pred,
         |  md5(text) AS fingerprint
         |FROM (SELECT doc_id, text, $sqlToks AS t FROM documents)""".stripMargin,
    "p07_lang_profile" ->
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) / COUNT(*) AS avg_chars,
         |  CAST(SUM(len($sqlToks)) AS BIGINT) AS total_tokens
         |FROM documents GROUP BY lang, source""".stripMargin,
    "p08_multimodal_stub" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  lower(hex(encode(substr(text, 1, 4)))) AS magic,
        |  md5(text) AS digest,
        |  CAST(CEIL(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    // DuckDB 1.0 lacks blob substr; the docs are ASCII so slicing the
    // varchar yields the same bytes (and the same md5) as the binary slice.
    "p58_wav_real_bytes" -> {
      // little-endian n-byte blob of a non-negative integer expression
      def le(v: String, nBytes: Int): String = {
        val h = s"lpad(hex($v), ${nBytes * 2}, '0')"
        "unhex(" + (0 until nBytes)
          .map(i => s"substr($h, ${(nBytes - 1 - i) * 2 + 1}, 2)")
          .mkString(" || ") + ")"
      }
      // byte value at 1-based byte position `pos` of hex string `ph`
      def b(pos: String): String =
        s"((strpos('0123456789ABCDEF', substr(ph, 2*($pos)-1, 1))-1)*16" +
          s" + strpos('0123456789ABCDEF', substr(ph, 2*($pos), 1))-1)"
      def leVal(start: Int): String =
        (0 until 4).map(i => s"${1L << (8 * i)}*${b((start + i).toString)}")
          .mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id, encode(text) AS data,
         |    octet_length(encode(text)) AS len,
         |    CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS rate
         |  FROM documents),
         |p AS (
         |  SELECT doc_id,
         |    encode('RIFF') || ${le("len + 36", 4)} || encode('WAVE')
         |      || encode('fmt ') || ${le("16", 4)} || ${le("1", 2)}
         |      || ${le("1", 2)} || ${le("rate", 4)} || ${le("rate", 4)}
         |      || ${le("1", 2)} || ${le("8", 2)} || encode('data')
         |      || ${le("len", 4)} || data AS payload
         |  FROM d),
         |h AS (SELECT doc_id, hex(payload) AS ph FROM p),
         |hdr AS (SELECT doc_id, ph,
         |    lower(substr(ph, 1, 8)) AS riff_hex,
         |    lower(substr(ph, 17, 8)) AS wave_hex,
         |    CAST(${leVal(25)} AS INTEGER) AS sample_rate,
         |    CAST(${leVal(41)} AS INTEGER) AS data_len
         |  FROM h),
         |fr AS (SELECT doc_id, ph, riff_hex, wave_hex, sample_rate, data_len,
         |    CAST(u.k AS INT) AS frame_idx,
         |    CAST(LEAST(16, data_len - u.k*16) AS INT) AS frame_len
         |  FROM hdr,
         |    UNNEST(generate_series(0,
         |      CAST(CEIL(data_len/16.0) AS BIGINT)-1)) AS u(k))
         |SELECT doc_id, frame_idx, riff_hex, wave_hex, sample_rate,
         |  data_len, frame_len,
         |  round(CAST(list_aggregate(list_transform(
         |      generate_series(1, frame_len),
         |      j -> ${b("44 + frame_idx*16 + j")}), 'sum') AS DOUBLE)
         |    / frame_len, 6) AS mean_sample
         |FROM fr""".stripMargin
    },
    "p14_frame_sample" ->
      """SELECT doc_id, CAST(u.k AS INT) AS frame_idx,
        |  md5(substr(text, u.k*16+1, 16)) AS frame_md5,
        |  CAST(strlen(substr(text, u.k*16+1, 16)) AS INT) AS frame_len
        |FROM documents,
        |  UNNEST(generate_series(0,
        |    CAST(CEIL(strlen(text)/16.0) AS BIGINT)-1)) AS u(k)""".stripMargin,
    "p09_events_props" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
         |  ${sqlDsum("value")} AS sum_value,
         |  MIN(value) AS min_value, MAX(value) AS max_value
         |FROM events GROUP BY event_type""".stripMargin,
    "p10_events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "p12_simhash_pairs" ->
      s"""WITH tok AS (
         |  SELECT doc_id, ${sqlH60("tok")} AS hv FROM (
         |    SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS tok
         |    FROM (SELECT doc_id, $sqlToks AS t FROM documents))),
         |votes AS (
         |  SELECT doc_id, j, CAST(SUM(2 * ((hv >> j) & 1) - 1) AS BIGINT) AS s
         |  FROM tok, (SELECT unnest(generate_series(0, 31)) AS j) js
         |  GROUP BY doc_id, j),
         |fp AS (
         |  SELECT doc_id, CAST(SUM(CASE WHEN s >= 0
         |    THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
         |  FROM votes GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS bkey
         |  FROM fp, (SELECT unnest(generate_series(0, 3)) AS band) bs),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3""".stripMargin,
    "p13_cosine_neardup" -> sqlP13,
    "p49_semantic_neardup" ->
      s"""WITH pairs AS ($sqlP13),
         |sets AS (SELECT doc_id,
         |    list_distinct($sqlToks) AS tset FROM documents),
         |j AS (
         |  SELECT p.vec_a AS doc_a, p.vec_b AS doc_b, p.sim,
         |    len(list_intersect(a.tset, b.tset)) AS ninter,
         |    len(a.tset) AS na, len(b.tset) AS nb
         |  FROM pairs p
         |  JOIN sets a ON p.vec_a = a.doc_id
         |  JOIN sets b ON p.vec_b = b.doc_id)
         |SELECT doc_a, doc_b, sim,
         |  round(CAST(ninter AS DOUBLE) / CAST(na + nb - ninter AS DOUBLE),
         |    6) AS jaccard,
         |  CAST(CASE WHEN CAST(ninter AS DOUBLE)
         |      / CAST(na + nb - ninter AS DOUBLE) >= $JaccardThreshold
         |    THEN 1 ELSE 0 END AS INT) AS text_confirmed
         |FROM j""".stripMargin,
    "p50_interval_join_binned" ->
      s"""WITH ev AS (
         |  SELECT event_id, epoch_us(ts) AS ts_us, event_type FROM events),
         |p AS (SELECT event_id AS p_event_id, ts_us AS lo,
         |    ts_us + $IntervalW AS hi
         |  FROM ev WHERE event_type = 'purchase')
         |SELECT p_event_id, COUNT(*) AS n_overlap
         |FROM p JOIN ev ON ev.ts_us BETWEEN p.lo AND p.hi
         |GROUP BY 1""".stripMargin,
    "p51_lm_fluency" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |pr AS (
         |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         |  FROM t, (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
         |uni AS (SELECT w1, COUNT(*) AS cu FROM pr GROUP BY 1),
         |bi AS (SELECT w1, w2, COUNT(*) AS cb FROM pr GROUP BY 1, 2),
         |per AS (
         |  SELECT pr.doc_id, COUNT(*) AS n_bigrams,
         |    SUM(CAST(length(bin(bi.cb)) - length(bin(uni.cu)) AS BIGINT))
         |      AS qsum
         |  FROM pr
         |  JOIN bi ON pr.w1 = bi.w1 AND pr.w2 = bi.w2
         |  JOIN uni ON pr.w1 = uni.w1
         |  GROUP BY 1)
         |SELECT d.doc_id, COALESCE(per.n_bigrams, 0) AS n_bigrams,
         |  round(CAST(qsum AS DOUBLE) / n_bigrams, 6) AS lm_score
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin,
    "p52_containment_dedup" ->
      s"""WITH shs AS (
         |  SELECT doc_id, ${sqlH60("shingle")} AS hv
         |  FROM (SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
         |        FROM (SELECT doc_id, $sqlToks AS t FROM documents))),
         |sets AS (SELECT doc_id, list(DISTINCT hv) AS st,
         |    CAST(len(st) AS BIGINT) AS n,
         |    list_sort(st)[1:$ContainProbeK] AS probes
         |  FROM shs GROUP BY doc_id),
         |rare AS (SELECT hv FROM shs GROUP BY hv
         |  HAVING COUNT(*) <= $ContainDfCap),
         |idx AS (SELECT s.hv, s.doc_id FROM shs s JOIN rare USING (hv)),
         |cand AS (
         |  SELECT DISTINCT p.doc_id AS doc_a, idx.doc_id AS doc_b
         |  FROM (SELECT doc_id, unnest(probes) AS hv FROM sets) p
         |  JOIN idx USING (hv)
         |  WHERE idx.doc_id != p.doc_id)
         |SELECT c.doc_a, c.doc_b, a.n AS na, b.n AS nb,
         |  round(CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) / a.n, 6)
         |    AS containment
         |FROM cand c
         |JOIN sets a ON a.doc_id = c.doc_a
         |JOIN sets b ON b.doc_id = c.doc_b
         |WHERE round(CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) / a.n, 6)
         |  >= $ContainThreshold""".stripMargin,
    "p53_kmeans_cells" ->
      s"""WITH $sqlQuantCtes,
         |$sqlKmeansCtes
         |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(SUM(d2) AS BIGINT) AS sum_sqdist
         |FROM a2 GROUP BY 1""".stripMargin,
    "p94_semdedup_prune" ->
      s"""WITH $sqlQuantCtes,
         |$sqlKmeansCtes,
         |m AS (SELECT a2.vec_id, a2.cell, a2.d2, qq.qv,
         |    list_sum(list_transform(qq.qv, x -> x * x)) AS aa
         |  FROM a2 JOIN qq USING (vec_id)),
         |pr AS (SELECT a.vec_id, a.d2, a.aa,
         |    b.vec_id AS o_id, b.d2 AS o_d2, b.aa AS o_aa,
         |    list_sum(list_transform(generate_series(1, len(a.qv)),
         |      i -> a.qv[i] * b.qv[i])) AS dot
         |  FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         |dropd AS (SELECT DISTINCT vec_id FROM pr
         |  WHERE dot > 0 AND 10000 * dot * dot >= $SemTau2E4 * aa * o_aa
         |    AND (o_d2 > d2 OR (o_d2 = d2 AND o_id < vec_id))),
         |kept AS (SELECT m.cell, COUNT(*) AS n_kept FROM m
         |  LEFT JOIN dropd ON m.vec_id = dropd.vec_id
         |  WHERE dropd.vec_id IS NULL GROUP BY 1),
         |mem AS (SELECT cell, COUNT(*) AS n_members FROM m GROUP BY 1)
         |SELECT mem.cell, CAST(mem.n_members AS BIGINT) AS n_members,
         |  CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(mem.n_members - COALESCE(kept.n_kept, 0) AS BIGINT)
         |    AS n_dropped
         |FROM mem LEFT JOIN kept USING (cell)""".stripMargin,
    "p95_tokenizer_fertility" -> {
      // global chain = sqlBpeChain (wf, sym0..symN keyed by w); per-lang
      // chain mirrors the p64 oracle with l-prefixed names and the
      // LEFT-join apply (winner-less languages keep their vocabulary)
      val lround = (r: Int) => s"""
         |lp$r AS (SELECT lang, l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt
         |  FROM lsym${r - 1}, UNNEST(generate_series(1, len(l)-1)) AS u(i)
         |  GROUP BY 1, 2, 3),
         |lw$r AS (SELECT lang, a, b FROM lp$r
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY cnt DESC, a, b) = 1),
         |lsym$r AS (SELECT lang, freq,
         |    list_reduce(list_transform(l, s -> [s]), (acc, x) ->
         |      CASE WHEN acc[len(acc)] = a AND x[1] = b
         |           THEN list_concat(acc[1:len(acc)-1], [a || b])
         |           ELSE list_concat(acc, x) END) AS l
         |  FROM lsym${r - 1} LEFT JOIN lw$r USING (lang))"""
      sqlBpeChain(BpeRounds) + s""",
         |lwf AS (
         |  SELECT lang, term AS w, COUNT(*) AS freq FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS term
         |    FROM documents)
         |  WHERE regexp_full_match(term, '[a-z]+') AND length(term) >= 2
         |  GROUP BY 1, 2),
         |lsym0 AS (SELECT lang, freq, string_split(w, '') AS l FROM lwf)"""
        .stripMargin +
        (1 to BpeRounds).map(r => "," + lround(r).stripMargin).mkString +
        s"""
         |,
         |gj AS (SELECT lwf.lang, lwf.freq, length(lwf.w) AS wlen,
         |    len(s.l) AS gs
         |  FROM lwf JOIN sym$BpeRounds s ON lwf.w = s.w),
         |gagg AS (SELECT lang, CAST(SUM(freq) AS BIGINT) AS n_occurrences,
         |    CAST(SUM(freq * wlen) AS BIGINT) AS syms_char,
         |    CAST(SUM(freq * gs) AS BIGINT) AS syms_global
         |  FROM gj GROUP BY 1),
         |own AS (SELECT lang, CAST(SUM(freq * len(l)) AS BIGINT) AS syms_own
         |  FROM lsym$BpeRounds GROUP BY 1)
         |SELECT g.lang, g.n_occurrences, g.syms_char, g.syms_global,
         |  o.syms_own,
         |  ROUND(CAST(g.syms_global AS DOUBLE) / g.n_occurrences, 6)
         |    AS fertility_global,
         |  ROUND(CAST(o.syms_own AS DOUBLE) / g.n_occurrences, 6)
         |    AS fertility_own
         |FROM gagg g JOIN own o ON g.lang = o.lang""".stripMargin
    },
    "p97_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(greatest(1, len(string_split(text, ' '))) AS BIGINT) AS w,
         |    ${sqlH60("'wsample:' || CAST(doc_id AS VARCHAR)")}
         |      % 4294967296 AS h32
         |  FROM documents),
         |sc AS (SELECT doc_id, lang, w,
         |    CAST(2097152 - ${sqlQlog2("h32 + 1")} AS DOUBLE) / w AS priority
         |  FROM t),
         |r AS (SELECT doc_id, lang, w, priority,
         |  CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS INT) AS rnk
         |  FROM sc)
         |SELECT rnk, doc_id, lang, w, ROUND(priority, 6) AS priority
         |FROM r WHERE rnk <= $SampleK""".stripMargin,
    "p98_leakage_free_split" -> {
      def sqlSplit(k: String) =
        s"""CASE WHEN ${sqlH60(s"'split:' || CAST($k AS VARCHAR)")} % 10 < 8
           |    THEN 'train'
           |  WHEN ${sqlH60(s"'split:' || CAST($k AS VARCHAR)")} % 10 = 8
           |    THEN 'val' ELSE 'test' END""".stripMargin
      s"""WITH RECURSIVE $sqlClusterLabels,
         |d AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_toks
         |  FROM documents),
         |a AS (SELECT d.doc_id, d.n_toks,
         |    COALESCE(lbl.cluster_id, d.doc_id) AS cluster_id
         |  FROM d LEFT JOIN lbl ON d.doc_id = lbl.doc_id),
         |s AS (SELECT doc_id, n_toks,
         |    ${sqlSplit("doc_id")} AS split_doc,
         |    ${sqlSplit("cluster_id")} AS split_cluster
         |  FROM a),
         |lkd AS (SELECT CAST(COUNT(*) AS BIGINT) AS leak_pairs FROM p
         |  JOIN s sa ON p.doc_a = sa.doc_id
         |  JOIN s sb ON p.doc_b = sb.doc_id
         |  WHERE sa.split_doc <> sb.split_doc),
         |lkc AS (SELECT CAST(COUNT(*) AS BIGINT) AS leak_pairs FROM p
         |  JOIN s sa ON p.doc_a = sa.doc_id
         |  JOIN s sb ON p.doc_b = sb.doc_id
         |  WHERE sa.split_cluster <> sb.split_cluster)
         |SELECT 'doc_hash' AS method, split_doc AS split,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  lkd.leak_pairs
         |FROM s, lkd GROUP BY 2, 5
         |UNION ALL
         |SELECT 'cluster_hash' AS method, split_cluster AS split,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  lkc.leak_pairs
         |FROM s, lkc GROUP BY 2, 5""".stripMargin
    },
    "p99_provenance_reps" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |m AS (SELECT l.cluster_id, l.doc_id, d.n_chars,
         |    ${sqlTier("d.source")} AS tier
         |  FROM lbl l JOIN documents d ON l.doc_id = d.doc_id),
         |rp AS (SELECT cluster_id, doc_id, tier,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY tier ASC, n_chars DESC, doc_id ASC) AS rnk
         |  FROM m),
         |rl AS (SELECT cluster_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY n_chars DESC, doc_id ASC) AS rnk
         |  FROM m),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
         |  FROM m GROUP BY 1)
         |SELECT sz.cluster_id, sz.n_members,
         |  p.doc_id AS rep_prov, p.tier AS rep_tier,
         |  g.doc_id AS rep_longest,
         |  p.doc_id <> g.doc_id AS overridden
         |FROM sz
         |JOIN (SELECT * FROM rp WHERE rnk = 1) p USING (cluster_id)
         |JOIN (SELECT * FROM rl WHERE rnk = 1) g USING (cluster_id)""".stripMargin,
    "p100_embedding_drift" ->
      s"""WITH $sqlQuantCtes,
         |$sqlKmeansCtes,
         |cc AS (SELECT cell,
         |    CAST(SUM(CASE WHEN vec_id % 7 <> 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_prev,
         |    CAST(SUM(CASE WHEN vec_id % 5 <> 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_next
         |  FROM a2 GROUP BY 1),
         |grid AS (SELECT unnest(generate_series(0, ${KmeansK - 1})) AS cell),
         |f AS (SELECT g.cell,
         |    coalesce(cc.n_prev, 0) AS n_prev,
         |    coalesce(cc.n_next, 0) AS n_next
         |  FROM grid g LEFT JOIN cc USING (cell)),
         |tot AS (SELECT SUM(n_prev) AS tp, SUM(n_next) AS tn FROM f),
         |r AS (SELECT cell, n_prev, n_next,
         |    2 * n_next + 1 AS pn, 2 * tn + $KmeansK AS pd,
         |    2 * n_prev + 1 AS qn, 2 * tp + $KmeansK AS qd
         |  FROM f CROSS JOIN tot),
         |tm AS (SELECT cell, n_prev, n_next,
         |    (CAST(pn AS DOUBLE) / pd - CAST(qn AS DOUBLE) / qd)
         |      * (${sqlQlog2("pn * qd")} - ${sqlQlog2("qn * pd")})
         |      / 65536.0 AS term
         |  FROM r),
         |ps AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(term ORDER BY cell)), (a, x) -> a + x) AS psi FROM tm)
         |SELECT CAST(cell AS BIGINT) AS cell, n_prev, n_next,
         |  round(term, 6) AS term, round(psi, 6) AS psi
         |FROM tm CROSS JOIN ps""".stripMargin,
    "p101_source_mirror" ->
      s"""WITH p AS ($sqlP02),
         |s AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_a,
         |  greatest(a.source, b.source) AS source_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  least(a.source, b.source) <> greatest(a.source, b.source)
         |    AS cross_source
         |FROM p
         |JOIN s a ON p.doc_a = a.doc_id
         |JOIN s b ON p.doc_b = b.doc_id
         |GROUP BY 1, 2, 4""".stripMargin,
    "p102_dataset_card" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |base AS (SELECT doc_id, lang, source, n_chars,
         |    CAST(len(t) AS BIGINT) AS n_toks, sha256(text) AS h,
         |    (len(list_filter(t, x -> list_contains($sqlStops, x))) / len(t)
         |       >= $QualityMinStopRatio
         |      AND len(t) >= $QualityMinTokens) AS qpass
         |  FROM (SELECT doc_id, text, lang, source, n_chars, $sqlToks AS t
         |    FROM documents)),
         |census AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(SUM(CASE WHEN qpass THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_quality,
         |    CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dup
         |  FROM base),
         |sh AS (SELECT doc_id, unnest(${sqlShingles("t", ContamW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |gg AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g FROM sh),
         |ev AS (SELECT DISTINCT g FROM gg WHERE doc_id % 29 = 7),
         |tr AS (SELECT doc_id, g FROM gg WHERE doc_id % 29 <> 7),
         |ct AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_contam
         |  FROM tr WHERE g IN (SELECT g FROM ev)),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_near,
         |    CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
         |  FROM lbl)
         |SELECT 'corpus' AS section, 'n_docs' AS metric, n_docs AS n,
         |  CAST(NULL AS DOUBLE) AS frac FROM census
         |UNION ALL SELECT 'corpus', 'n_tokens', n_tokens, NULL FROM census
         |UNION ALL SELECT 'corpus', 'n_chars', n_chars, NULL FROM census
         |UNION ALL SELECT 'corpus', 'n_sources', n_sources, NULL FROM census
         |UNION ALL SELECT 'corpus', 'n_langs', n_langs, NULL FROM census
         |UNION ALL SELECT 'lang', lang, CAST(COUNT(*) AS BIGINT),
         |  round(CAST(COUNT(*) AS DOUBLE) / (SELECT n_docs FROM census), 6)
         |  FROM base GROUP BY lang
         |UNION ALL SELECT 'source', source, CAST(COUNT(*) AS BIGINT),
         |  round(CAST(COUNT(*) AS DOUBLE) / (SELECT n_docs FROM census), 6)
         |  FROM base GROUP BY source
         |UNION ALL SELECT 'quality', 'gate_pass', n_quality,
         |  round(CAST(n_quality AS DOUBLE) / n_docs, 6) FROM census
         |UNION ALL SELECT 'dedup', 'exact_dup_docs', n_exact_dup,
         |  round(CAST(n_exact_dup AS DOUBLE) / n_docs, 6) FROM census
         |UNION ALL SELECT 'dedup', 'near_dup_docs', n_near,
         |  round(CAST(n_near AS DOUBLE) / n_docs, 6) FROM nd, census
         |UNION ALL SELECT 'dedup', 'near_dup_clusters', n_clusters, NULL
         |  FROM nd
         |UNION ALL SELECT 'contamination', 'contaminated_docs', n_contam,
         |  round(CAST(n_contam AS DOUBLE) / n_docs, 6) FROM ct, census""".stripMargin,
    "p55_dup_graph_hops" ->
      s"""WITH p AS ($sqlP02),
         |e AS (SELECT doc_a, doc_b FROM p
         |  UNION SELECT doc_b, doc_a FROM p),
         |th AS (
         |  SELECT a.doc_a AS src, b.doc_b AS dst
         |  FROM e a JOIN e b ON a.doc_b = b.doc_a
         |  WHERE a.doc_a != b.doc_b
         |  UNION
         |  SELECT doc_a, doc_b FROM e),
         |deg AS (SELECT doc_a AS src, COUNT(*) AS degree FROM e GROUP BY 1)
         |SELECT th.src AS doc_id, deg.degree, COUNT(*) AS n_within2
         |FROM th JOIN deg ON th.src = deg.src
         |GROUP BY 1, 2""".stripMargin,
    "p56_pii_redact" ->
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(text,
         |    '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g')
         |    AS clean_text,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT)
         |    AS n_phones
         |FROM documents""".stripMargin,
    "p54_sliding_window" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  COUNT(*) OVER w AS n_trailing,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
        |    AS sum_trailing
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "p15_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS p_ts_us, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts_us, p.p_ts_us, p.p_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.p_ts_us""".stripMargin,
    "p17_tfidf_topterms" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term,
         |    round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 4) AS score
         |  FROM tf JOIN dfreq USING (term), n),
         |ranked AS (
         |  SELECT doc_id, term, score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, term ASC) AS INT) AS rnk
         |  FROM scored)
         |SELECT doc_id, rnk, term, score FROM ranked WHERE rnk <= 3""".stripMargin,
    "p18_bigram_top" ->
      s"""WITH bi AS (
         |  SELECT unnest(${sqlShingles("t", 2)}) AS bigram
         |  FROM (SELECT $sqlToks AS t FROM documents)),
         |counted AS (SELECT bigram, COUNT(*) AS n FROM bi GROUP BY bigram),
         |ranked AS (SELECT bigram, n,
         |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, bigram ASC) AS INT) AS rnk
         |  FROM counted)
         |SELECT rnk, bigram, n FROM ranked WHERE rnk <= 25""".stripMargin,
    "p19_train_val_split" ->
      s"""SELECT CASE WHEN ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 < 8
         |    THEN 'train'
         |  WHEN ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 8 THEN 'val'
         |  ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1, 2""".stripMargin,
    "p20_ann_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id < 16),
        |a0 AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
        |    round(list_sum(list_transform(generate_series(1, len(n.v)),
        |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS csim
        |  FROM n, c),
        |a AS (
        |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY csim DESC, cent_id) AS arnk FROM a0) t
        |  WHERE arnk = 1),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, cell
        |  FROM a WHERE vec_id < 20),
        |s AS (
        |  SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM a JOIN p USING (cell) WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rnk FROM s)
        |SELECT probe_id, vec_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "p33_knn_graph" ->
      s"""WITH $sqlP33Chain
         |SELECT vec_id, nbr_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "p96_knn_label_eval" ->
      s"""WITH $sqlP33Chain,
         |knn AS (SELECT vec_id, nbr_id FROM r WHERE rnk <= 3),
         |lb AS (SELECT vec_id, label FROM embeddings),
         |v AS (SELECT k.vec_id, l.label AS nbr_label, COUNT(*) AS cnt
         |  FROM knn k JOIN lb l ON k.nbr_id = l.vec_id GROUP BY 1, 2),
         |pred AS (SELECT vec_id, nbr_label AS pred_label FROM v
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cnt DESC, nbr_label) = 1),
         |j AS (SELECT lb.label, pred.pred_label
         |  FROM lb LEFT JOIN pred ON lb.vec_id = pred.vec_id)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(COUNT(pred_label) AS BIGINT) AS n_voted,
         |  CAST(SUM(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  CASE WHEN COUNT(pred_label) > 0 THEN
         |    ROUND(CAST(SUM(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
         |      AS DOUBLE) / COUNT(pred_label), 6) END AS accuracy
         |FROM j GROUP BY 1""".stripMargin,
    "p21_winnow_fingerprint" ->
      s"""WITH wins AS (
         |  SELECT DISTINCT doc_id, ${sqlH60("substr(text, u.i, 8)")} AS whash
         |  FROM documents,
         |    UNNEST(generate_series(1, length(text) - 7)) AS u(i)
         |  WHERE length(text) >= 8),
         |r AS (SELECT doc_id, whash,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY whash)
         |    AS INT) AS rnk
         |  FROM wins)
         |SELECT doc_id, rnk, whash FROM r WHERE rnk <= 4""".stripMargin,
    "p22_langid_ngram" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang, list_distinct(list_transform(
         |    generate_series(1, greatest(length(text) - 1, 1)),
         |    i -> substr(text, i, 2))) AS grams
         |  FROM documents),
         |h AS (SELECT doc_id, lang,
         |  CAST(len(list_intersect(grams,
         |    ${EnBigrams.map(b => s"'$b'").mkString("[", ", ", "]")}))
         |    AS BIGINT) AS en_hits,
         |  CAST(len(list_intersect(grams,
         |    ${FrBigrams.map(b => s"'$b'").mkString("[", ", ", "]")}))
         |    AS BIGINT) AS fr_hits
         |  FROM g)
         |SELECT doc_id, lang, en_hits, fr_hits,
         |  CASE WHEN en_hits >= fr_hits THEN 'en' ELSE 'fr' END AS pred
         |FROM h""".stripMargin,
    "p23_curation" ->
      s"""WITH sc AS (
         |  SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tokens,
         |    len(list_filter(t, x -> list_contains($sqlStops, x))) / len(t)
         |      AS stop_ratio,
         |    len(list_distinct(t)) / len(t) AS uniq_ratio
         |  FROM (SELECT doc_id, text, $sqlToks AS t FROM documents)),
         |q AS (SELECT doc_id, n_tokens, stop_ratio,
         |    round((stop_ratio + uniq_ratio) / 2, 6) AS quality,
         |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
         |  FROM sc)
         |SELECT doc_id, n_tokens, quality FROM q
         |WHERE doc_id = keep_id AND stop_ratio >= 0.05
         |  AND n_tokens >= 5 AND quality >= 0.3""".stripMargin,
    "p26_funnel" ->
      """WITH fc AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS c_ts FROM events
        |  WHERE event_type = 'click' GROUP BY user_id),
        |hits AS (
        |  SELECT fc.user_id, MAX(CASE WHEN p.p_ts >= fc.c_ts
        |      AND p.p_ts <= fc.c_ts + 1800000000 THEN 1 ELSE 0 END)
        |    AS converted
        |  FROM fc LEFT JOIN
        |    (SELECT user_id, epoch_us(ts) AS p_ts FROM events
        |     WHERE event_type = 'purchase') p
        |    ON fc.user_id = p.user_id
        |  GROUP BY fc.user_id)
        |SELECT COUNT(*) AS n_clickers,
        |  CAST(SUM(converted) AS BIGINT) AS n_converted,
        |  round(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 4) AS conv_rate
        |FROM hits""".stripMargin,
    "p25_pmi_collocations" ->
      s"""WITH toks AS (SELECT unnest($sqlToks) AS w FROM documents),
         |uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
         |tt AS (SELECT COUNT(*) AS t_total FROM toks),
         |bi0 AS (
         |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> array_to_string(t[i:i+1], ' '))) AS bigram
         |  FROM (SELECT $sqlToks AS t FROM documents)),
         |bi AS (SELECT bigram, COUNT(*) AS c12,
         |    split_part(bigram, ' ', 1) AS w1,
         |    split_part(bigram, ' ', 2) AS w2
         |  FROM bi0 GROUP BY bigram),
         |bt AS (SELECT CAST(SUM(c12) AS BIGINT) AS b_total FROM bi),
         |sc AS (SELECT bigram, c12,
         |    round(ln((CAST(c12 AS DOUBLE) * t_total * t_total) /
         |      (CAST(b_total AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
         |  FROM bi
         |  JOIN uni u1 ON u1.w = bi.w1
         |  JOIN uni u2 ON u2.w = bi.w2, tt, bt
         |  WHERE c12 >= 5),
         |r AS (SELECT bigram, c12, pmi,
         |  CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) AS INT) AS rnk
         |  FROM sc)
         |SELECT rnk, bigram, c12, pmi FROM r WHERE rnk <= 15""".stripMargin,
    "p24_cms_counts" -> {
      def b(j: String, t: String) = s"${sqlH60Seeded(j, t)} % $CmsWidth"
      val probeList = CmsProbes.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH terms AS (
         |  SELECT unnest($sqlToks) AS term FROM documents),
         |js AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j),
         |cms AS (
         |  SELECT j, ${b("j", "term")} AS bucket, COUNT(*) AS n
         |  FROM terms, js GROUP BY 1, 2),
         |pb AS (
         |  SELECT p.term, js.j, ${b("js.j", "p.term")} AS bucket
         |  FROM (SELECT unnest($probeList) AS term) p, js),
         |est AS (
         |  SELECT term, MIN(coalesce(n, 0)) AS est_count
         |  FROM pb LEFT JOIN cms USING (j, bucket) GROUP BY term),
         |ex AS (
         |  SELECT term, COUNT(*) AS exact_count FROM terms
         |  WHERE list_contains($probeList, term) GROUP BY term)
         |SELECT term, CAST(est_count AS BIGINT) AS est_count,
         |  CAST(coalesce(exact_count, 0) AS BIGINT) AS exact_count
         |FROM est LEFT JOIN ex USING (term)""".stripMargin
    },
    "p16_range_join" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |p AS (SELECT event_id AS p_event_id, user_id, epoch_us(ts) AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.p_event_id, COUNT(*) AS n_follow
        |FROM p JOIN ev ON p.user_id = ev.user_id
        |  AND ev.ts_us >= p.p_ts AND ev.ts_us <= p.p_ts + 600000000
        |GROUP BY 1""".stripMargin,
    "p27_doc_chunking" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |c AS (SELECT doc_id, unnest(generate_series(1, len(t), $ChunkStride)) AS i, t
         |  FROM t)
         |SELECT doc_id, CAST((i-1)//$ChunkStride AS BIGINT) AS chunk_id,
         |  array_to_string(t[i:i+${ChunkTokens - 1}], ' ') AS chunk_text,
         |  CAST(len(t[i:i+${ChunkTokens - 1}]) AS BIGINT) AS n_tok
         |FROM c WHERE i = 1 OR i + ${ChunkTokens - ChunkStride} <= len(t)""".stripMargin,
    "p28_token_shards" ->
      s"""WITH n AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n
         |  FROM documents),
         |c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM n)
         |SELECT CAST((cum-1)//$ShardTokens AS BIGINT) AS shard,
         |  COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1""".stripMargin,
    "p29_edit_neardup" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |sig AS (SELECT doc_id, MIN(${sqlHashFam(0, "shingle")}) AS b0,
         |    MIN(${sqlHashFam(1, "shingle")}) AS b1
         |  FROM sh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band, b0 AS bkey FROM sig
         |  UNION ALL SELECT doc_id, 1, b1 FROM sig),
         |$sqlCappedCand,
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b, ta.text AS xa, tb.text AS xb,
         |    greatest(ta.n_chars, tb.n_chars) AS mx
         |  FROM cand c
         |  JOIN documents ta ON ta.doc_id = c.doc_a
         |  JOIN documents tb ON tb.doc_id = c.doc_b
         |  WHERE abs(ta.n_chars - tb.n_chars)
         |    <= $EditRelThreshold * greatest(ta.n_chars, tb.n_chars))
         |SELECT doc_a, doc_b, CAST(levenshtein(xa, xb) AS BIGINT) AS dist,
         |  round(levenshtein(xa, xb) * 1.0 / mx, 6) AS rel_dist
         |FROM pairs
         |WHERE levenshtein(xa, xb) <= $EditRelThreshold * mx""".stripMargin,
    "p30_stratified_sample" ->
      s"""SELECT doc_id, lang, source, rk FROM (
         |  SELECT doc_id, lang, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
         |      ORDER BY ${sqlH60("text")}, doc_id) AS INT) AS rk
         |  FROM documents) t
         |WHERE rk <= $StratumSampleK""".stripMargin,
    "p31_repetition_score" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
         |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
         |uni AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         |    COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_cnt
         |  FROM tc GROUP BY 1),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
         |    i -> array_to_string(t[i:i+1], ' '))) AS bigram
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |bi AS (SELECT doc_id, COUNT(*) AS n_bi,
         |    COUNT(DISTINCT bigram) AS n_bi_d
         |  FROM bg GROUP BY 1)
         |SELECT uni.doc_id, n AS n_tokens,
         |  round(n_distinct * 1.0 / n, 6) AS distinct_ratio,
         |  round(top_cnt * 1.0 / n, 6) AS top_token_frac,
         |  CASE WHEN coalesce(n_bi, 0) > 0
         |    THEN round(1.0 - n_bi_d * 1.0 / n_bi, 6)
         |    ELSE 0.0 END AS dup_bigram_frac
         |FROM uni LEFT JOIN bi USING (doc_id)""".stripMargin,
    "p36_incremental_dedup" ->
      s"""WITH d AS (SELECT doc_id, sha256(text) AS content_hash,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_new
         |  FROM documents),
         |existing AS (SELECT DISTINCT content_hash FROM d WHERE NOT is_new)
         |SELECT content_hash, MIN(doc_id) AS keep_id,
         |  COUNT(*) AS batch_dups
         |FROM d WHERE is_new
         |  AND content_hash NOT IN (SELECT content_hash FROM existing)
         |GROUP BY 1""".stripMargin,
    "p35_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(len($sqlToks) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    '${BpeTokenRe.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
         |FROM documents""".stripMargin,
    "p34_retention_cohorts" ->
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events GROUP BY 1, 2),
        |c AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY 1)
        |SELECT STRFTIME(c.cohort, '%Y-%m-%d') AS cohort_day,
        |  date_diff('day', c.cohort, d.day) AS offset_days,
        |  COUNT(DISTINCT d.user_id) AS n_users
        |FROM c JOIN d ON c.user_id = d.user_id
        |GROUP BY 1, 2""".stripMargin,
    "p37_span_dedup" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |sp AS (SELECT doc_id, ${sqlH60("span")} AS hv FROM (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(t) // $SpanW),
         |    j -> array_to_string(t[(j-1)*$SpanW+1:j*$SpanW], ' '))) AS span
         |  FROM tk)),
         |c AS (SELECT hv, COUNT(*) AS cnt FROM sp GROUP BY 1),
         |agg AS (SELECT doc_id, COUNT(*) AS n_spans,
         |    CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM sp JOIN c USING (hv) GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
         |  coalesce(n_dup, 0) AS n_dup_spans,
         |  CASE WHEN coalesce(n_spans, 0) > 0
         |    THEN round(n_dup * 1.0 / n_spans, 6)
         |    ELSE 0.0 END AS dup_span_frac
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    "p38_decontamination" ->
      s"""WITH g0 AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", DecontamW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |g AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS hv,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % $EvalSliceMod
         |      = $EvalSliceRem AS is_eval
         |  FROM g0),
         |ev AS (SELECT DISTINCT hv FROM g WHERE is_eval),
         |agg AS (SELECT g.doc_id, COUNT(*) AS n_grams,
         |    CAST(SUM(CASE WHEN ev.hv IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_hits
         |  FROM g LEFT JOIN ev ON g.hv = ev.hv
         |  WHERE NOT g.is_eval GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
         |  coalesce(n_hits, 0) AS n_hits,
         |  CASE WHEN coalesce(n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated,
         |  CASE WHEN coalesce(n_grams, 0) > 0
         |    THEN round(n_hits * 1.0 / n_grams, 6)
         |    ELSE 0.0 END AS contam_frac
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
         |WHERE ${sqlH60("CAST(d.doc_id AS VARCHAR)")} % $EvalSliceMod
         |  <> $EvalSliceRem""".stripMargin,
    "p39_inverted_index" ->
      s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |r AS (SELECT term, doc_id, tf,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY term
         |      ORDER BY tf DESC, doc_id) AS INT) AS rk
         |  FROM tf)
         |SELECT r.term, df.df AS df, r.rk, r.doc_id, r.tf
         |FROM r JOIN df ON r.term = df.term
         |WHERE r.rk <= $PostingsK""".stripMargin,
    "p57_hll_groups" ->
      s"""WITH h AS (
         |  SELECT event_type, ${sqlH60("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events),
         |b AS (SELECT event_type, hv & ${HllM - 1} AS bucket,
         |    hv >> $HllP AS w FROM h),
         |r AS (SELECT event_type, bucket,
         |    MAX(CASE WHEN w = 0 THEN $HllRhoMax
         |      ELSE CAST(bit_count((w & (0 - w)) - 1) AS INT) + 1 END) AS mj
         |  FROM b GROUP BY 1, 2),
         |s AS (SELECT event_type,
         |    CAST(SUM(CAST(1 AS BIGINT) << ($HllRhoMax - mj)) AS BIGINT)
         |      + ($HllM - COUNT(*)) * CAST($HllPow AS BIGINT) AS s_int,
         |    $HllM - COUNT(*) AS v
         |  FROM r GROUP BY 1),
         |e AS (SELECT event_type,
         |    round(CASE WHEN $HllRawNum / s_int <= ${2.5 * HllM} AND v > 0
         |      THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v)
         |      ELSE $HllRawNum / s_int END, 4) AS est FROM s),
         |x AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT x.event_type, n_exact, est AS hll_estimate,
         |  round(abs(est - n_exact) / n_exact, 6) AS rel_err
         |FROM e JOIN x ON e.event_type = x.event_type""".stripMargin,
    "p40_hll_distinct" ->
      s"""WITH h AS (
         |  SELECT ${sqlH60("CAST(user_id AS VARCHAR)")} AS hv FROM events),
         |b AS (SELECT hv & ${HllM - 1} AS bucket, hv >> $HllP AS w FROM h),
         |r AS (SELECT bucket, MAX(CASE WHEN w = 0 THEN $HllRhoMax
         |    ELSE CAST(bit_count((w & (0 - w)) - 1) AS INT) + 1 END) AS mj
         |  FROM b GROUP BY 1),
         |s AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << ($HllRhoMax - mj)) AS BIGINT)
         |    + ($HllM - COUNT(*)) * CAST($HllPow AS BIGINT) AS s_int,
         |    $HllM - COUNT(*) AS v
         |  FROM r),
         |e AS (SELECT round(CASE WHEN $HllRawNum / s_int <= ${2.5 * HllM} AND v > 0
         |    THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v)
         |    ELSE $HllRawNum / s_int END, 4) AS est FROM s),
         |x AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events)
         |SELECT n_exact, est AS hll_estimate,
         |  round(abs(est - n_exact) / n_exact, 6) AS rel_err
         |FROM e, x""".stripMargin,
    "p11_events_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    LAG(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 600000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM g),
        |s AS (
        |  SELECT user_id, ts_us, CAST(SUM(new_sess) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS sess
        |  FROM f)
        |SELECT user_id, sess, COUNT(*) AS n_events,
        |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
        |FROM s GROUP BY user_id, sess""".stripMargin,
    "p79_source_quota_cap" ->
      s"""SELECT doc_id, source, n_chars FROM (
         |  SELECT doc_id, source, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM documents) t
         |WHERE rk <= $QuotaK""".stripMargin,
    "p80_mixture_epochs" ->
      s"""WITH e AS (
         |  SELECT doc_id, source,
         |    1 + ${sqlH60("source")} % $MixEpochMax AS epochs
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |    CAST(unnest(generate_series(1, epochs)) AS BIGINT) AS epoch
         |  FROM e)
         |SELECT doc_id, source, epoch,
         |  ${sqlH60("CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)")}
         |    % $MixShardN AS shard
         |FROM r""".stripMargin,
    "p81_source_drift_psi" ->
      s"""WITH b AS (
         |  SELECT source, least($PsiMaxBin, n_chars // 100) AS bin
         |  FROM documents),
         |c AS (SELECT source, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
         |grid AS (
         |  SELECT source, bin
         |  FROM (SELECT DISTINCT source FROM documents),
         |    (SELECT unnest(generate_series(0, $PsiMaxBin)) AS bin)),
         |f AS (
         |  SELECT g.source, g.bin, coalesce(c.c, 0) AS c
         |  FROM grid g LEFT JOIN c ON g.source = c.source AND g.bin = c.bin),
         |tot AS (SELECT source, SUM(c) AS t FROM f GROUP BY 1),
         |gl AS (SELECT bin, SUM(c) AS gc FROM f GROUP BY 1),
         |n AS (SELECT SUM(c) AS n FROM f),
         |r AS (
         |  SELECT f.source, f.bin,
         |    2 * f.c + 1 AS pn, 2 * t + ${PsiMaxBin + 1} AS pd,
         |    2 * (gc - f.c) + 1 AS qn, 2 * (n - t) + ${PsiMaxBin + 1} AS qd
         |  FROM f JOIN tot USING (source) JOIN gl USING (bin) CROSS JOIN n),
         |tm AS (
         |  SELECT source, bin,
         |    (CAST(pn AS DOUBLE) / pd - CAST(qn AS DOUBLE) / qd)
         |      * (${sqlQlog2("pn * qd")} - ${sqlQlog2("qn * pd")})
         |      / 65536.0 AS term
         |  FROM r)
         |SELECT source,
         |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(term ORDER BY bin)), (a, x) -> a + x), 6) AS psi
         |FROM tm GROUP BY source""".stripMargin,
    "p82_soft_dedup_weights" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |sz AS (SELECT cluster_id, COUNT(*) AS n_members
         |  FROM lbl GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(l.cluster_id, d.doc_id) AS cluster_id,
         |  coalesce(sz.n_members, 1) AS n_members,
         |  round(CAST(1 AS DOUBLE) / coalesce(sz.n_members, 1), 6) AS weight
         |FROM documents d
         |LEFT JOIN lbl l ON d.doc_id = l.doc_id
         |LEFT JOIN sz ON l.cluster_id = sz.cluster_id""".stripMargin,
    "p83_quality_sampling" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |b AS (SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(tk, x -> list_contains($sqlStops, x)))
         |      AS BIGINT) AS n_stop
         |  FROM t),
         |p AS (SELECT doc_id, n_tokens,
         |    greatest(CAST(0.05 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
         |      n_stop / n_tokens)) AS p_acc
         |  FROM b)
         |SELECT doc_id, n_tokens, round(p_acc, 6) AS accept_p,
         |  round(CAST(1 AS DOUBLE) / p_acc, 6) AS weight
         |FROM p
         |WHERE ${sqlH60("CAST(doc_id AS VARCHAR)")} % $SampleLanes
         |  < CAST(floor(p_acc * $SampleLanes.0) AS BIGINT)""".stripMargin,
    "p84_hourly_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, STRFTIME(ts, '%Y-%m-%d %H') AS hour,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n_hours,
        |    CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c*c) AS BIGINT) AS ss
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.hour, h.c, st.n_hours,
        |  (st.n_hours*h.c - st.s) * (st.n_hours*h.c - st.s) AS dev2,
        |  st.n_hours*st.ss - st.s*st.s AS nvar
        |FROM h JOIN st USING (event_type)
        |WHERE st.n_hours >= 2
        |  AND (st.n_hours*h.c - st.s) * (st.n_hours*h.c - st.s)
        |    > 9 * (st.n_hours*st.ss - st.s*st.s)""".stripMargin,
    // recomputes each nearest-neighbor-sampled source pixel straight
    // from the text hex that became the BMP pixels: resample index
    // bugs, stride/row-flip errors, or padding leakage flip the hash
    "p86_image_resize" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(4 + doc_id % 3 AS INT) AS width,
        |    CAST(2 + doc_id % 2 AS INT) AS height,
        |    lower(hex(text)) AS hx FROM documents),
        |px AS (SELECT doc_id, width, height,
        |    substr(hx, 1, height*width*6)
        |      || repeat('0', greatest(0, height*width*6 - len(hx)))
        |      AS pixhex
        |  FROM p),
        |g AS (SELECT doc_id, width, height, pixhex,
        |    CAST(ty AS INT) AS ty, CAST(tx AS INT) AS tx,
        |    (ty * height) // 2 AS sy, (tx * width) // 2 AS sx
        |  FROM px, unnest(generate_series(0, 1)) a(ty),
        |    unnest(generate_series(0, 1)) b(tx)),
        |b AS (SELECT doc_id, ty, tx,
        |    CAST('0x' || substr(pixhex, (sy*width*3 + sx*3 + k)*2 + 1, 2)
        |      AS BIGINT) AS bv
        |  FROM g, unnest(generate_series(0, 2)) c(k))
        |SELECT doc_id, ty, tx,
        |  round(CAST(SUM(bv) AS DOUBLE) / 3, 6) AS px_mean
        |FROM b GROUP BY doc_id, ty, tx""".stripMargin,
    "p90_fk_discovery" -> {
      // GENERATED from the same FkDomain/FkCandidatePairs enumeration the
      // Spark side require-checks against the live schemas, with the same
      // exact gate (parent unique, child NDV <= parent NDV) — the
      // approximate catalog-stats prune on the Spark side only skips
      // pairs this WHERE clause rejects anyway
      def blk(ct: String, cc: String, pt: String, pc: String,
          fam: String): String = {
        def v(x: String) = if (fam == "int") s"CAST($x AS BIGINT)" else x
        s"""SELECT '$ct.$cc' AS child_col, '$pt.$pc' AS parent_col,
           |  (SELECT CAST(COUNT(DISTINCT $cc) AS BIGINT) FROM $ct)
           |    AS n_child_distinct,
           |  (SELECT CAST(COUNT(*) AS BIGINT)
           |   FROM (SELECT DISTINCT ${v(cc)} AS v FROM $ct
           |         WHERE $cc IS NOT NULL) q
           |   WHERE v NOT IN (SELECT ${v(pc)} FROM $pt
           |                   WHERE $pc IS NOT NULL)) AS n_unmatched
           |WHERE (SELECT COUNT(DISTINCT $pc) FROM $pt)
           |    = (SELECT COUNT(*) FROM $pt)
           |  AND (SELECT COUNT(DISTINCT $cc) FROM $ct)
           |   <= (SELECT COUNT(DISTINCT $pc) FROM $pt)
           |  AND (SELECT COUNT(DISTINCT $cc) FROM $ct) >= 1
           |  AND (SELECT COUNT(DISTINCT $pc) FROM $pt) >= 1"""
          .stripMargin
      }
      val blocks = FkCandidatePairs.map { case ((ct, cc, fam), (pt, pc, _)) =>
        blk(ct, cc, pt, pc, fam)
      }.mkString("\nUNION ALL\n")
      s"""SELECT child_col, parent_col, n_child_distinct, n_unmatched,
         |  CAST(CASE WHEN n_unmatched = 0 THEN 1 ELSE 0 END AS INT)
         |    AS is_fk
         |FROM ($blocks)""".stripMargin
    },
    "p89_table_profile" ->
      // the unpivot is GENERATED from DocumentsColumns — the same list the
      // Spark side checks its scan against — so schema drift turns into
      // one loud require, never a silent two-sided desync (round-9 ADVICE)
      s"""WITH st AS (
        |  ${DocumentsColumns.map(c =>
             s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS v" +
               " FROM documents").mkString("\n  UNION ALL ")}),
        |g AS (SELECT column_name, v, COUNT(*) AS cnt FROM st GROUP BY 1, 2),
        |s AS (SELECT column_name, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT)
        |      AS n_nulls,
        |    COUNT(CASE WHEN v IS NOT NULL THEN 1 END) AS n_distinct,
        |    MIN(v) AS min_value, MAX(v) AS max_value
        |  FROM g GROUP BY 1),
        |t AS (SELECT column_name, v AS top_value, cnt AS top_cnt,
        |    ROW_NUMBER() OVER (PARTITION BY column_name
        |      ORDER BY cnt DESC, v ASC) AS rk
        |  FROM g WHERE v IS NOT NULL)
        |SELECT s.column_name, n_rows, n_nulls, n_distinct,
        |  min_value, max_value, t.top_value, t.top_cnt
        |FROM s JOIN t ON s.column_name = t.column_name AND t.rk = 1"""
        .stripMargin,
    "p88_dup_pagerank" ->
      s"""WITH p AS ($sqlP02),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
         |r0 AS (SELECT src AS doc_id, CAST($PrScale AS BIGINT) AS rank
         |  FROM deg),
         |c1 AS (SELECT e.dst AS doc_id,
         |    CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS sc
         |  FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r0 r ON e.src = r.doc_id GROUP BY 1),
         |r1 AS (SELECT doc_id,
         |    CAST($PrBase + (85 * sc) // 100 AS BIGINT) AS rank FROM c1),
         |c2 AS (SELECT e.dst AS doc_id,
         |    CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS sc
         |  FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r1 r ON e.src = r.doc_id GROUP BY 1),
         |r2 AS (SELECT doc_id,
         |    CAST($PrBase + (85 * sc) // 100 AS BIGINT) AS rank FROM c2)
         |SELECT r2.doc_id, d.outdeg AS degree, r2.rank
         |FROM r2 JOIN deg d ON r2.doc_id = d.src""".stripMargin,
    "p87_ref_integrity" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 13 <> 5),
        |v AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 3),
        |a AS (SELECT 'doc_without_vec' AS category,
        |    COUNT(*) AS n_orphans, MIN(doc_id) AS min_id,
        |    MAX(doc_id) AS max_id
        |  FROM d WHERE doc_id NOT IN (SELECT vec_id FROM v)),
        |b AS (SELECT 'vec_without_doc' AS category,
        |    COUNT(*) AS n_orphans, MIN(vec_id) AS min_id,
        |    MAX(vec_id) AS max_id
        |  FROM v WHERE vec_id NOT IN (SELECT doc_id FROM d))
        |SELECT * FROM a UNION ALL SELECT * FROM b""".stripMargin,
    "p93_dedup_recall" ->
      // found = the full p02 oracle restricted to sample-internal pairs;
      // truth = an INDEPENDENT exact all-pairs Jaccard over the sample's
      // distinct shingle-id sets (own CTE names, no reuse of p02's
      // internals beyond the shared tokenizer/shingle fragments)
      s"""WITH p AS ($sqlP02),
         |found AS (SELECT doc_a, doc_b FROM p
         |  WHERE doc_a % 2 = 0 AND doc_b % 2 = 0),
         |tsh AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents
         |        WHERE doc_id % 2 = 0)),
         |tsig AS (SELECT doc_id,
         |    list(DISTINCT ${sqlH60("shingle")}) AS shset,
         |    len(shset) AS n
         |  FROM tsh GROUP BY doc_id),
         |truth AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM tsig a JOIN tsig b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
         |    / (a.n + b.n - len(list_intersect(a.shset, b.shset)))
         |    >= $JaccardThreshold),
         |hit AS (SELECT f.doc_a FROM found f
         |  JOIN truth t ON f.doc_a = t.doc_a AND f.doc_b = t.doc_b),
         |c AS (SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM found) AS n_found,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit)
         |SELECT n_true, n_found, n_hit,
         |  CASE WHEN n_true > 0
         |    THEN ROUND(CAST(n_hit AS DOUBLE) / n_true, 6) END AS recall,
         |  CASE WHEN n_found > 0
         |    THEN ROUND(CAST(n_hit AS DOUBLE) / n_found, 6) END AS precision
         |FROM c""".stripMargin,
    "p92_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", ContamW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |g AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g FROM sh),
         |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 29 = 7),
         |tr AS (SELECT doc_id, g FROM g WHERE doc_id % 29 <> 7),
         |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
         |  FROM tr GROUP BY 1),
         |hit AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
         |  FROM tr WHERE g IN (SELECT g FROM ev) GROUP BY 1)
         |SELECT h.doc_id, t.n_grams, h.n_contaminated,
         |  ROUND(CAST(h.n_contaminated AS DOUBLE) / t.n_grams, 6)
         |    AS contam_frac
         |FROM hit h JOIN tot t ON h.doc_id = t.doc_id""".stripMargin,
    "p91_upsert_tombstones" ->
      """WITH u AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |    value,
        |    CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END AS is_delete
        |  FROM events),
        |r AS (SELECT u.*, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rk FROM u)
        |SELECT user_id, event_type, event_id, ts_us, value
        |FROM r WHERE rk = 1 AND is_delete = 0""".stripMargin,
    "p85_upsert_latest" ->
      """WITH u AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |    value,
        |    CAST(CASE WHEN event_id % 10 = 9 THEN 1 ELSE 0 END AS INT)
        |      AS from_batch
        |  FROM events),
        |r AS (SELECT u.*, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rk FROM u)
        |SELECT user_id, event_type, event_id, ts_us, value, from_batch
        |FROM r WHERE rk = 1""".stripMargin,
  )
}
