package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed minis for the pipeline operators, run against a tiny
  * synthetic scale-factor directory written once per JVM. */
object PipelineMiniSpec {
  lazy val dir: String = {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mini").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
      "omega one two three four five"
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src0", base.length.toLong), // exact dup of 0
      (2L, base.replace(" five", " FIVE"), "en", "src1",
        base.length.toLong), // near-dup of 0: 1 of 28 shingles differs
      (3L, "the quick brown fox jumps over the lazy dog today",
        "en", "src2", 44L),
      (4L, "completely different words entirely unrelated content here now",
        "fr", "src3", 60L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    // zero-padded to the engine's declared AnnDim so the Charikar sign
    // buckets (64-wide hyperplanes) see full-length vectors; padding
    // changes no cosine and no centroid assignment
    def vec(xs: Double*): Seq[Float] =
      (xs ++ Seq.fill(Pipeline.AnnDim - xs.length)(0.0)).map(_.toFloat)
    Seq(
      (0L, vec(1, 0, 0, 0), 0),
      (1L, vec(0.9, 0.1, 0, 0), 0), // nearest to 0
      (2L, vec(0, 1, 0, 0), 1),
      (3L, vec(-1, 0, 0, 0), 2),
      // non-centroid for the IVF path (p20 treats vec_id < 16 as the
      // codebook): nearest centroid is 2, so it lands in cell 2
      (16L, vec(0.1, 0.95, 0, 0), 1),
    ).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val t0 = 1700000000000000000L // nanos
    val min = 60L * 1000000000L
    Seq(
      // user 7: two events 5 min apart, then a 20-min gap → 2 sessions
      (1L, t0, 7L, "click", 1.25, """{"k": 1}"""),
      (2L, t0 + 5 * min, 7L, "view", 2.50, """{"k": 2}"""),
      (3L, t0 + 25 * min, 7L, "click", 0.75, """{"k": 3}"""),
      // user 8: single event → 1 session
      (4L, t0, 8L, "purchase", 9.99, """{"k": 4}"""),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }
}

class PipelineMiniSpec extends SparkSpec {
  private def dir = PipelineMiniSpec.dir

  private def run(name: String) = Pipeline.queries(name)(spark, dir)

  test("p01 exact dedup keeps min doc_id and counts duplicates") {
    val rows = run("p01_exact_dedup")
      .orderBy("keep_id").collect()
    assert(rows.length == 4) // 5 docs, one exact-dup pair
    val dup = rows.find(_.getLong(1) == 0L).get
    assert(dup.getLong(2) == 2L) // docs 0 and 1 share a hash
  }

  test("p02 minhash near-dedup finds the planted pairs and only them") {
    val pairs = run("p02_minhash_neardup")
      .select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      Set((0L, 1L), (0L, 2L), (1L, 2L)))
    val exact = pairs.find(p => (p._1, p._2) == (0L, 1L)).get
    assert(exact._3 == 1.0)
    val near = pairs.find(p => (p._1, p._2) == (0L, 2L)).get
    assert(near._3 > 0.9 && near._3 < 1.0) // 27 of 29 shingles shared
  }

  test("p03 simhash of identical docs is identical, others differ") {
    val fp = run("p03_simhash_fingerprint")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(4L))
  }

  test("p04 brute-force ANN ranks the planted neighbor first") {
    val top = run("p04_ann_cosine_topk")
      .filter(col("probe_id") === 0 && col("rnk") === 1).head
    assert(top.getAs[Long]("vec_id") == 1L)
    val sim = top.getAs[Double]("sim")
    assert(sim > 0.99 && sim <= 1.0) // cos([1,0,0,0],[.9,.1,0,0]) ≈ 0.9939
  }

  test("p05 LSH ANN only pairs vectors within a sign bucket") {
    val rows = run("p05_ann_lsh_bucketed")
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Charikar buckets: bit p = sign(v · r_p). v1 = [.9,.1,0,...] always
    // shares v0 = [1,0,0,...]'s bucket (its dot is 0.9·r0 + 0.1·r1, and
    // |0.9| > |0.1| pins the sign to r0's), while v3 = -v0 flips EVERY
    // bit (dot exactly negated, never zero), so 0/1 pair up and 3 can
    // never match 0 or 1.
    assert(rows.contains((0L, 1L)))
    assert(!rows.exists(p =>
      (p._1 == 3L && p._2 <= 1L) || (p._2 == 3L && p._1 <= 1L)))
  }

  test("p20 IVF ANN searches only the probe's centroid cell") {
    val rows = run("p20_ann_ivf")
      .select("probe_id", "vec_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // v16 assigns to centroid 2 (cos ≈ 0.994 beats every other centroid),
    // so probe 2's cell contains exactly {2, 16} and its only hit is 16.
    assert(rows.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet == Set((16L, 1)))
    // centroids 0,1,3 keep singleton cells aside from 0/1 sharing none —
    // 0 and 1 sit in their own cells (each is its own nearest centroid),
    // so probe 0 finds nothing.
    assert(!rows.exists(_._1 == 0L))
  }

  test("p21 winnow fingerprints of identical docs match, k-min is bounded") {
    val byDoc = run("p21_winnow_fingerprint").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    assert(byDoc(0L).map(t => (t._2, t._3)).toSet ==
      byDoc(1L).map(t => (t._2, t._3)).toSet) // doc 1 is an exact dup of 0
    assert(byDoc.values.forall(_.length <= 4))
    assert(byDoc(3L).length == 4) // 49 chars → 42 windows → full sketch
  }

  test("p22 n-gram language ID flags the English doc") {
    val r = run("p22_langid_ngram").filter(col("doc_id") === 3).head()
    assert(r.getAs[Long]("en_hits") > 0L)
    assert(r.getAs[String]("pred") == "en")
  }

  test("p06 text stats are exact on a known doc") {
    val r = run("p06_text_stats").filter(col("doc_id") === 3).head()
    assert(r.getAs[Long]("n_tokens") == 10L)
    assert(r.getAs[Long]("n_uniq") == 9L) // "the" appears twice
    assert(r.getAs[Double]("stop_ratio") == 0.2) // two "the" in 10 tokens
    assert(r.getAs[String]("lang_pred") == "en")
  }

  test("p09 events props extraction sums the JSON field") {
    val byType = run("p09_events_props").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("sum_k")).toMap
    assert(byType("click") == 4L) // k=1 + k=3
    assert(byType("purchase") == 4L)
  }

  test("p15 as-of join matches the latest prior purchase, null before any") {
    // mini events: user 7 clicks at t0 (no prior purchase), user 8
    // purchases at t0, and user 7 clicks again at t0+25min... use the
    // actual rows: events are click(t0), view(t0+5m), click(t0+25m) for
    // user 7 and purchase(t0) for user 8 — so user 7's clicks have no
    // purchase to match and user 8 has no clicks.
    val rows = run("p15_asof_join").orderBy("event_id").collect()
    assert(rows.length == 2) // user 7's two clicks
    assert(rows.forall(_.isNullAt(3))) // no prior purchases anywhere
    assert(rows.forall(_.getAs[Long]("user_id") == 7L))
  }

  test("p10 hourly windows land all mini events in one hour") {
    val rows = run("p10_events_hourly").collect()
    assert(rows.map(_.getAs[String]("hour")).distinct.length == 1)
    val byType = rows.map(r =>
      r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(byType == Map("click" -> 2L, "view" -> 1L, "purchase" -> 1L))
  }

  test("p13 cosine near-dup pairs only within sign buckets above 0.40") {
    val pairs = run("p13_cosine_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucket "1111" holds v0,v1,v2,v16; only (0,1) and (2,16) have
    // cosine >= 0.40; v3 ("0111") is alone in its bucket.
    assert(pairs == Set((0L, 1L), (2L, 16L)))
  }

  test("p16 range join counts the purchase itself inside its window") {
    val rows = run("p16_range_join").collect()
    assert(rows.length == 1) // one purchase (user 8), no later events
    assert(rows.head.getAs[Long]("n_follow") == 1L)
  }

  test("p50 binned interval join counts cross-user overlap, not just same-user") {
    // purchase (event 4, user 8) at t0 opens [t0, t0+10min]: catches
    // itself plus user 7's events at t0 and t0+5min — p16's user-keyed
    // form would see only the purchase itself
    val rows = run("p50_interval_join_binned").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("p_event_id") == 4L)
    assert(rows.head.getAs[Long]("n_overlap") == 3L)
  }

  test("p51 LM fluency: identical docs tie, ambiguous heads score below unique") {
    val r = run("p51_lm_fluency").collect()
      .map(x => x.getLong(0) -> (x.getLong(1),
        Option(x.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(r(0L) == r(1L)) // exact duplicates score identically
    // doc 3's two "the ..." bigrams split the head count (cu=2, cb=1 →
    // quantized log2 p = -1 each); every doc-4 bigram is unique with a
    // unique head (0 each)
    assert(r(3L)._2.get < 0.0)
    assert(r(4L)._2.get == 0.0)
    assert(r(3L)._1 == 9L) // 10 tokens → 9 bigrams
  }

  test("p52 containment: identical docs score 1.0, near-dup 26/27, others absent") {
    val rows = run("p52_containment_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // docs 0/1/2 are mutual high-containment (27 4-token shingles,
    // >=26 shared); docs 3/4 share no shingles with anything
    assert(rows.keySet == Set((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L),
      (1L, 2L), (2L, 1L)))
    assert(rows((0L, 1L)) == 1.0 && rows((1L, 0L)) == 1.0)
    assert(rows((2L, 0L)) == math.rint(26.0 / 27.0 * 1e6) / 1e6)
  }

  test("p53 k-means: mini vectors keep their own cells, v16 joins cell 2") {
    // init: vec_ids 0-3 seed their own cells; v16's nearest seed is v2,
    // so cell 2 becomes {2, 16} and its updated centroid moves — the
    // other cells are singletons sitting exactly on their centroid
    val rows = run("p53_kmeans_cells").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.view.mapValues(_._1).toMap ==
      Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 1L))
    assert(rows(0L)._2 == 0L && rows(1L)._2 == 0L && rows(3L)._2 == 0L)
    assert(rows(2L)._2 > 0L)
  }

  test("p54 trailing 10-min window counts exactly the in-range events") {
    val r = run("p54_sliding_window").collect()
      .map(x => x.getLong(0) -> (x.getLong(3), x.getDouble(4))).toMap
    assert(r(1L) == ((1L, 1.25)))  // first event: only itself
    assert(r(2L) == ((2L, 3.75)))  // +5min: event 1 still in range
    assert(r(3L) == ((1L, 0.75)))  // +25min: 20-min gap evicts both
    assert(r(4L) == ((1L, 9.99)))  // other user: own window
  }

  test("p55 dup-graph hops: the planted triangle is a clique (2-hop == degree)") {
    val rows = run("p55_dup_graph_hops").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L))
    rows.values.foreach { case (deg, w2) =>
      assert(deg == 2L && w2 == 2L) // clique: nothing new at hop 2
    }
  }

  test("p56 masks planted emails and phones, counts them, leaves clean text") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-pii").toString
    Seq(
      (0L, "contact me at jo.doe+x@corp.example.org or 555-123-4567 ok",
        "en", "s", 1L),
      (1L, "no pii here just words", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val r = Pipeline.queries("p56_pii_redact")(spark, d).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r(0L) == (("contact me at <EMAIL> or <PHONE> ok", 1L, 1L)))
    assert(r(1L) == (("no pii here just words", 0L, 0L)))
  }

  test("p19 split is exhaustive and deterministic") {
    def rows() = run("p19_train_val_split").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    val a = rows()
    assert(a.map(_._3).sum == 5) // every doc lands in exactly one split
    assert(a.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    assert(a == rows())
  }

  test("p23 curation keeps exactly the deduped english quality doc") {
    // docs 0/1/2 have no stopwords (stop_ratio 0 -> language gate drops
    // them); doc 4 likewise; doc 3 has two "the" -> only survivor.
    val rows = run("p23_curation").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L))
    assert(rows.head.getAs[Long]("n_tokens") == 10L)
  }

  test("p17 tf-idf ranks the repeated rare term first") {
    // "the" is doc 3's only tf=2 term and appears in no other doc, so its
    // score 2*ln(6/2) tops the doc's ranking.
    val top = run("p17_tfidf_topterms")
      .filter(col("doc_id") === 3 && col("rnk") === 1).head()
    assert(top.getAs[String]("term") == "the")
  }

  test("p18 top bigram is the alphabetically-first 3-document bigram") {
    // docs 0, 1, 2 share the base text's bigrams (document frequency 3);
    // ties break on the bigram itself, so "alpha beta" ranks first.
    val top = run("p18_bigram_top").filter(col("rnk") === 1).head()
    assert(top.getAs[String]("bigram") == "alpha beta")
    assert(top.getAs[Long]("n") == 3L)
  }

  test("p25 PMI emits nothing below the count threshold") {
    // no mini bigram reaches 5 occurrences, so the threshold filters all
    assert(run("p25_pmi_collocations").isEmpty)
  }

  test("p26 funnel counts clickers; the mini corpus converts nobody") {
    val r = run("p26_funnel").head()
    assert(r.getAs[Long]("n_clickers") == 1L) // only user 7 clicks
    assert(r.getAs[Long]("n_converted") == 0L) // user 8's purchase is unrelated
    assert(r.getAs[Double]("conv_rate") == 0.0)
  }

  test("p24 CMS never undercounts and is exact on the mini corpus") {
    val rows = run("p24_cms_counts").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("the", "a", "of", "and", "to"))
    rows.values.foreach { case (est, exact) => assert(est >= exact) }
    assert(rows("the")._2 == 2L) // doc 3 contains "the" twice
  }

  test("p27 chunking covers every token and respects the stride") {
    val rows = run("p27_doc_chunking")
      .filter(col("doc_id") === 0).orderBy("chunk_id").collect()
    // 29 tokens: chunk 0 already reaches end-of-doc, so the start at 25
    // (whose chunk would add no new tokens) is suppressed
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("chunk_id") == 0L)
    assert(rows(0).getAs[Long]("n_tok") == 29L) // 32-cap truncates at end
    val one = run("p27_doc_chunking").filter(col("doc_id") === 3).collect()
    assert(one.length == 1) // 10 tokens -> single chunk = the whole doc
    assert(one.head.getAs[String]("chunk_text") ==
      "the quick brown fox jumps over the lazy dog today")
  }

  test("p28 token sharding packs the mini corpus into one exact shard") {
    val r = run("p28_token_shards").collect()
    assert(r.length == 1) // 29*3 + 10 + 8 = 105 tokens < 4096
    val row = r.head
    assert(row.getAs[Long]("shard") == 0L)
    assert(row.getAs[Long]("n_docs") == 5L)
    assert(row.getAs[Long]("total_tokens") == 105L)
    assert(row.getAs[Long]("first_doc") == 0L)
    assert(row.getAs[Long]("last_doc") == 4L)
  }

  test("p29 edit-distance near-dup finds the planted pairs with exact distances") {
    val pairs = run("p29_edit_neardup")
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist")))
    // docs 0=1 (identical), 2 differs by the 4-char five->FIVE edit
    assert(pairs.toSet ==
      Set((0L, 1L, 0L), (0L, 2L, 4L), (1L, 2L, 4L)))
    val rel = run("p29_edit_neardup").collect()
      .map(_.getAs[Double]("rel_dist"))
    assert(rel.forall(_ <= 0.2))
  }

  test("p30 stratified sample keeps <=k per stratum, ties broken by doc_id") {
    val rows = run("p30_stratified_sample").collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("rk")).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L)) // every stratum <= k
    // docs 0 and 1 share text (equal hash) -> doc_id tiebreak orders them
    assert(rows(0L) == 1 && rows(1L) == 2)
    assert(rows(2L) == 1 && rows(3L) == 1 && rows(4L) == 1)
  }

  test("p31 repetition scores match hand counts") {
    val r = run("p31_repetition_score")
      .filter(col("doc_id") === 3).head()
    assert(r.getAs[Long]("n_tokens") == 10L)
    assert(r.getAs[Double]("distinct_ratio") == 0.9) // "the" appears twice
    assert(r.getAs[Double]("top_token_frac") == 0.2)
    assert(r.getAs[Double]("dup_bigram_frac") == 0.0) // all 9 bigrams distinct
    val base = run("p31_repetition_score")
      .filter(col("doc_id") === 0).head()
    assert(base.getAs[Double]("distinct_ratio") == 1.0) // 29 distinct tokens
  }

  test("p32 dup clusters collapse the near-dup triangle to one canonical doc") {
    val rows = run("p32_dup_clusters").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // p02 emits pairs (0,1),(0,2),(1,2) -> a single component labeled 0
    assert(rows.keySet == Set(0L, 1L, 2L))
    assert(rows.values.map(_._1).toSet == Set(0L))
    assert(rows(0L)._2 == 1 && rows(1L)._2 == 0 && rows(2L)._2 == 0)
  }

  test("p33 kNN graph pairs only the cell cohabitants, mutually") {
    val rows = run("p33_knn_graph").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("rnk")))
    // only cell 2 holds two vectors (centroid 2 and vec 16); every other
    // vector is alone in its cell and has no neighbors at all
    assert(rows.toSet == Set((2L, 16L, 1), (16L, 2L, 1)))
  }

  test("p34 retention puts both mini users in one day-0 cohort cell") {
    val rows = run("p34_retention_cohorts").collect()
    assert(rows.length == 1) // all mini events land on 2023-11-14 UTC
    assert(rows.head.getAs[String]("cohort_day") == "2023-11-14")
    assert(rows.head.getAs[Long]("offset_days") == 0L)
    assert(rows.head.getAs[Long]("n_users") == 2L)
  }

  test("p35 token counts: regex equals whitespace on plain text, finer on punctuated") {
    val rows = run("p35_token_counts").collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens"))).toMap
    // on pure lowercase+space text the BPE-ish pre-tokenizer coincides
    // with whitespace splitting...
    Seq(0L, 1L, 3L, 4L).foreach(id => assert(rows(id)._1 == rows(id)._2))
    // ...but doc 2's "FIVE" is outside [a-z]+ and splits into 4
    // single-char tokens: +3 over the whitespace count
    assert(rows(2L)._2 == rows(2L)._1 + 3)
    import spark.implicits._
    val bpe = Seq("it's 42 spark-sql!").toDF("text")
      .select(regexp_extract_all(col("text"),
        lit(Pipeline.BpeTokenRe), lit(0)).as("t"))
      .head.getSeq[String](0)
    assert(bpe == Seq("it", "'s", "42", "spark", "-", "sql", "!"))
  }

  test("p36 incremental dedup keeps only unseen new-slice hashes") {
    // independent re-derivation of the hash slice: md5-prefix mod 10 == 9
    def bucket(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString.take(15), 16) % 10
    assert((0L to 4L).filter(id => bucket(id.toString) == 9L) == Seq(4L))
    // doc 4 is the whole "new batch"; its text is unique in the corpus,
    // so it survives the anti-join with batch_dups = 1
    val rows = run("p36_incremental_dedup").collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("batch_dups")))
    assert(rows.toSeq == Seq((4L, 1L)))
  }

  test("p37 span dedup: shared 10-token spans dup, short docs score zero") {
    val rows = run("p37_span_dedup").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_dup_spans"), r.getAs[Double]("dup_span_frac"))).toMap
    // docs 0,1,2 all span tokens 1-20 identically (doc 2's edit is token
    // 29, past the last full span) -> every span occurs 3x corpus-wide
    Seq(0L, 1L, 2L).foreach(id => assert(rows(id) == ((2L, 2L, 1.0))))
    assert(rows(3L) == ((1L, 0L, 0.0))) // 10 tokens, one unique span
    assert(rows(4L) == ((0L, 0L, 0.0))) // 8 tokens: no full span at all
  }

  test("p38 decontamination excludes the eval slice and scores the rest") {
    // independent slice re-derivation: h60 = md5 hex prefix, mod 20 == 3
    def slice(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString.take(15), 16) % 20
    assert((0L to 4L).filter(id => slice(id.toString) == 3L) == Seq(3L))
    val rows = run("p38_decontamination").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_hits"), r.getAs[Int]("contaminated"))).toMap
    // eval doc 3 is absent from the audit; no training doc shares a
    // 5-gram with it, so the corpus is clean but fully scored
    assert(rows.keySet == Set(0L, 1L, 2L, 4L))
    assert(rows(0L) == ((25L, 0L, 0))) // 29 distinct tokens -> 25 grams
    assert(rows(4L) == ((4L, 0L, 0)))  // 8 tokens -> 4 grams
    assert(rows.values.forall(_._3 == 0))
  }

  test("p39 inverted index: exact df, postings ranked tf desc then doc") {
    val rows = run("p39_inverted_index").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
        r.getAs[Int]("rk"), r.getAs[Long]("doc_id"), r.getAs[Long]("tf")))
    // "the" occurs twice inside doc 3 only: df counts docs, tf the hits
    assert(rows.filter(_._1 == "the").toSeq == Seq(("the", 1L, 1, 3L, 2L)))
    // tokens() does not fold case: "five" (docs 0,1) vs "FIVE" (doc 2)
    assert(rows.filter(_._1 == "alpha").sortBy(_._3).toSeq ==
      Seq(("alpha", 3L, 1, 0L, 1L), ("alpha", 3L, 2, 1L, 1L),
        ("alpha", 3L, 3, 2L, 1L)))
    assert(rows.count(_._1 == "five") == 2 && rows.count(_._1 == "FIVE") == 1)
  }

  test("p40 HLL estimate matches the hand-computed linear-count value") {
    val r = run("p40_hll_distinct").head
    assert(r.getAs[Long]("n_exact") == 2L)
    // 2 users -> 2 occupied registers, linear counting: 256*ln(256/254)
    assert(r.getAs[Double]("hll_estimate") == 2.0079)
    assert(r.getAs[Double]("rel_err") == 0.00395)
  }

  test("p41 cluster reps keep the longest doc, min doc_id on ties") {
    val rows = run("p41_cluster_reps").collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("rep_doc"),
        r.getAs[Long]("n_members")))
    // one cluster: the {0,1,2} near-dup triangle; all 29 tokens long,
    // so the tie falls to the smallest doc_id
    assert(rows.toSeq == Seq((0L, 0L, 3L)))
  }

  test("p42 quantized ANN re-ranks to the true nearest neighbor") {
    val rows = run("p42_ann_quantized")
      .filter(col("probe_id") === 0).orderBy("rnk").collect()
    assert(rows.length == 4) // whole mini corpus fits in top-5
    val top = rows.head
    assert(top.getAs[Long]("vec_id") == 1L)
    // hand-quantized (mins/maxes over the 5 mini vectors):
    // qv0 = [127, -128, 0, 0], qv1 = [114, -103, 0, 0]
    // qdot = 127*114 + (-128)*(-103) = 27662
    assert(top.getAs[Long]("qsim") == 27662L)
    assert(top.getAs[Double]("sim") > 0.99)
    // the affine-shifted integer score may re-order mid-ranks (vec 3
    // outscores vec 16 quantized but loses on cosine) — the exact
    // re-rank must win: ranks follow sim, not qsim
    val sims = rows.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("p43 vocab top-16 and per-stratum OOV micro-average") {
    val rows = run("p43_vocab_oov").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate")))).toMap
    // 28 terms tie at count 3; the vocab is the 16 alphabetically
    // first, so each base doc has 13 OOV occurrences of 29
    assert(rows(("en", "src0")) == ((2L, 58L, 26L, 0.448276)))
    assert(rows(("en", "src1")) == ((1L, 29L, 13L, 0.448276)))
    // docs 3 and 4 share no vocab term: fully OOV
    assert(rows(("en", "src2"))._4 == 1.0)
    assert(rows(("fr", "src3"))._4 == 1.0)
  }

  test("p44 bloom prefilter clears the unique new doc") {
    val rows = run("p44_bloom_prefilter").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bloom_hit"),
        r.getAs[Int]("is_dup")))
    // doc 4 is the whole new batch (same slice as p36); its text is
    // unique, and its 3 bit positions miss the 9 occupied bits of the
    // 8192-bit filter, so the bloom screens it out before any join
    assert(rows.toSeq == Seq((4L, 0, 0)))
  }

  test("p45 Simpson diversity matches hand counts, no logs anywhere") {
    val rows = run("p45_diversity_score").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ch"), r.getAs[Double]("char_simpson"),
          r.getAs[Long]("n_tok"), r.getAs[Double]("token_simpson")))).toMap
    // doc 3: 49 chars with sum(cnt^2)=165; 10 tokens, "the" twice
    assert(rows(3L) == ((49L, 0.931279, 10L, 0.88)))
    // docs 0/1: 29 tokens all distinct -> 1 - 29/841
    assert(rows(0L)._4 == 0.965517)
  }

  test("p46 mixture sampling caps every mini source, admits by hash") {
    val rows = run("p46_mixture_sample").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("keep_rate"), r.getAs[Long]("n_docs_in"),
          r.getAs[Long]("n_docs_kept"), r.getAs[Long]("n_tok_kept")))).toMap
    // shares: src0 58/105, src1 29/105, src2 10/105, src3 8/105 — all
    // above the 5% cap, so every keep_rate is cap/share < 1
    assert(rows("src0") == ((0.090517, 2L, 0L, 0L)))
    assert(rows("src1") == ((0.181034, 1L, 0L, 0L)))
    // only doc 3 hashes under its source's threshold (re-derived:
    // h60("mix:3") % 1e6 = 470143 < floor(0.525 * 1e6))
    assert(rows("src2") == ((0.525, 1L, 1L, 10L)))
    assert(rows("src3") == ((0.65625, 1L, 0L, 0L)))
  }

  test("p47 quantized centroids average the int8 codes exactly") {
    val rows = run("p47_quantized_centroids").collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("centroid_q"),
          r.getAs[Double]("centroid")))).toMap
    assert(rows.size == 3 * Pipeline.AnnDim) // 3 labels x 64 dims
    // label 0 = vecs 0,1 with codes 127/114 on dim 0: mean 120.5,
    // dequantized -1 + (120.5+128)*2/255 = 0.949020
    assert(rows((0, 0)) == ((2L, 120.5, 0.94902)))
    assert(rows((0, 1)) == ((2L, -115.5, 0.049020)))
    // constant dims quantize to 0 and dequantize to the constant
    assert(rows((0, 2)) == ((2L, 0.0, 0.0)))
    // label 2 is the single vector 3: codes pass through
    assert(rows((2, 0)) == ((1L, -128.0, -1.0)))
  }

  test("p48 histogram quantiles bracket the exact percentiles") {
    val r = run("p48_hist_quantiles").head
    // n_chars = [147, 147, 147, 44, 60]: mn 44, mx 147, bin width
    // (104/32); 147 lands in bin 31, so both quantiles read bin 31
    // whose upper edge 44 + 32*104/32 = 148 brackets the exact 147
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("mn") == 44L && r.getAs[Long]("mx") == 147L)
    assert(r.getAs[Long]("p50_bin") == 31L)
    assert(r.getAs[Double]("p50_approx") == 148.0)
    assert(r.getAs[Double]("p50_exact") == 147.0)
    assert(r.getAs[Double]("p90_exact") == 147.0)
  }

  test("p49 semantic near-dup text-confirms the identical linked docs") {
    val rows = run("p49_semantic_neardup").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"), r.getAs[Int]("text_confirmed")))
    // p13 pairs (0,1) and (2,16); vec 16 has no linked document, so
    // only the exact-dup text pair survives and confirms at jaccard 1
    assert(rows.toSeq == Seq((0L, 1L, 1.0, 1)))
  }

  test("p11 sessionization splits on the >10-minute gap") {
    val sessions = run("p11_events_sessions")
      .filter(col("user_id") === 7).orderBy("sess").collect()
    assert(sessions.length == 2)
    assert(sessions(0).getAs[Long]("n_events") == 2L)
    assert(sessions(1).getAs[Long]("n_events") == 1L)
    val s8 = run("p11_events_sessions").filter(col("user_id") === 8).collect()
    assert(s8.length == 1 && s8.head.getAs[Long]("n_events") == 1L)
  }
}
