package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-12 operator reconciliations: driver-side replays that rebuild
  * an operator's full result with plain Scala collections and the
  * engine's exact arithmetic, then assert equality — the same
  * independence discipline as Round10OpsSpec's p93/p94 replays. */
class Round12OpsSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.01"

  test("p125: the two-level census reconciles against a full " +
      "driver-side replay of both assignment paths") {
    val out = Pipeline.queries("p125_ann_ivf2")(spark, Sf01).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // structural invariants first: full grid, agreement bounded
    assert(out.keySet == (0L until Pipeline.IvfKFloor).toSet)
    out.values.foreach { case (f, t, a) =>
      assert(a <= math.min(f, t), "agreement cannot exceed either census")
    }
    // independent replay: the engine's exact arithmetic in plain Scala —
    // double left-to-right accumulation of float-widened products
    // (VectorDot's contract) and round-half-up at 6 decimals via
    // BigDecimal.valueOf, which is what Spark's `round` does on doubles
    val em = Tables.embeddings(spark, Sf01)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def rnd(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val k = math.max(Pipeline.IvfKFloor,
      (em.length + Pipeline.IvfCellTarget - 1) / Pipeline.IvfCellTarget)
    assert(k == 16, "the 500-vector fixture floors at 16 cells")
    val cNum = math.ceil(math.sqrt(k.toDouble)).toLong
    val nrm = em.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val vecs = em.toMap
    val cents = em.takeWhile(_._1 < k).map(_._1)
    val coarse = cents.filter(_ < cNum)
    // argmin by (rounded cosine DESC, id ASC) — iterate ids ascending,
    // keep on strictly greater, so ties resolve to the smallest id
    def best(v: Array[Float], vn: Double, cands: Seq[Long]): Long = {
      var bestId = -1L
      var bestSim = Double.NegativeInfinity
      cands.foreach { c =>
        val s = rnd(dot(v, vecs(c)) / (vn * nrm(c)))
        if (s > bestSim) { bestSim = s; bestId = c }
      }
      bestId
    }
    val centCoarse = cents.map(c => c -> best(vecs(c), nrm(c), coarse)).toMap
    val membersOf = cents.groupBy(centCoarse)
    val flat = em.map { case (id, v) => id -> best(v, nrm(id), cents) }
    val two = em.flatMap { case (id, v) =>
      val anchor = best(v, nrm(id), coarse)
      membersOf.get(anchor).map(ms => id -> best(v, nrm(id), ms.toSeq))
    }
    val expect = (0L until k).map { cell =>
      val f = flat.count(_._2 == cell).toLong
      val t = two.count(_._2 == cell).toLong
      val twoMap = two.toMap
      val a = flat.count { case (id, fc) =>
        fc == cell && twoMap.get(id).contains(cell)
      }.toLong
      cell -> (f, t, a)
    }.toMap
    assert(out == expect, "census must equal the driver-side replay")
    assert(flat.length == em.length && two.length == em.length,
      "the fixture never orphans a vector under the hierarchy")
    // the audit must be measuring something real: the fixture corpus is
    // weakly clustered, so flat and two-level genuinely disagree somewhere
    assert(out.values.exists { case (f, _, a) => a < f },
      "fixture produced perfect agreement — the audit would be vacuous")
  }

  test("p13: multi-probe emits each unordered pair exactly once, " +
      "ordered, and strictly extends the single-bucket pair set") {
    // the hash gate CANNOT see double-surfacing here: the DuckDB twin
    // fans out identically, so a pair emitted from two probe
    // orientations would duplicate on BOTH engine sides and still
    // hash-match — the exactly-once claim needs its own assertion
    val rows = Pipeline.queries("p13_cosine_neardup")(spark, Sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty, "fixture corpus must produce near-dup pairs")
    assert(rows.distinct.length == rows.length,
      "a pair surfaced from more than one probe orientation")
    rows.foreach { case (a, b) =>
      assert(a < b, s"pair ($a, $b) broke the vec_a < vec_b contract")
    }
    // multi-probe must be a strict superset of the same-bucket pairs:
    // rebuild the single-bucket candidate set from the engine's own
    // bucket column and check containment both ways
    val bits = Pipeline.annPairBits(Pipeline.embCount(spark, Sf01))
    val e = Tables.embeddings(spark, Sf01)
      .select(col("vec_id"),
        Pipeline.signBucket(col("embedding"), bits).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val bucketOf = e.toMap
    def hamming(x: String, y: String): Int = x.zip(y).count(t => t._1 != t._2)
    rows.foreach { case (a, b) =>
      assert(hamming(bucketOf(a), bucketOf(b)) <= 1,
        s"pair ($a, $b) matched outside the Hamming<=1 probe set")
    }
    val sameBucket = rows.filter { case (a, b) => bucketOf(a) == bucketOf(b) }
    assert(sameBucket.length < rows.length,
      "fixture never exercised the Hamming-1 recovery path")
  }

  test("p126: semantic decontamination reconciles against a driver-side " +
      "replay and finds leaks the lexical p92 cannot") {
    val out = Pipeline.queries("p126_semantic_decontam")(spark, Sf01)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // independent replay: engine-exact arithmetic in plain Scala —
    // VectorDot's ordered double accumulation of float-widened products
    // and Spark round's BigDecimal HALF_UP at 6 decimals
    val em = Tables.embeddings(spark, Sf01)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def rnd(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val nrm = em.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val (ev, tr) = em.partition(_._1 % 29 == 7)
    assert(ev.nonEmpty && tr.nonEmpty, "fixture must populate both sides")
    val expect = tr.flatMap { case (t, tv) =>
      val hits = ev.map { case (e2, evv) =>
        e2 -> rnd(dot(tv, evv) / (nrm(t) * nrm(e2)))
      }.filter(_._2 >= 0.40)
      if (hits.isEmpty) None
      else {
        // best = (sim DESC, eval_id ASC)
        val best = hits.minBy { case (id, s2) => (-s2, id) }
        Some(t -> ((hits.length, best._1, best._2)))
      }
    }.toMap
    assert(out == expect, "flagged set must equal the driver-side replay")
    assert(out.nonEmpty, "fixture corpus must produce semantic flags")
    // the reason the op exists: at least one semantic flag is invisible
    // to the lexical 8-gram screen (a paraphrase-class leak) — checked
    // against p92's own flagged-doc output, not a re-derivation
    val lexical = Pipeline.queries("p92_decontaminate")(spark, Sf01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((out.keySet -- lexical).nonEmpty,
      "every semantic flag was already lexically visible — vacuous op")
  }

  test("p127: the RRF fusion reconciles against a driver-side fold of " +
      "its two input rankings") {
    val out = Pipeline.queries("p127_rrf_fusion")(spark, Sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))
      .toMap
    // input 1: the engine's own BM25 ranking (itself hash-gated)
    val bm25 = Pipeline.queries("p74_bm25_retrieval")(spark, Sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // input 2: the ANN ranking replayed in plain Scala with the
    // engine's exact arithmetic
    val em = Tables.embeddings(spark, Sf01)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def rnd(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val nrm = em.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val probes = em.filter(_._1 < 10)
    val ann = probes.flatMap { case (p, pv) =>
      em.filter(_._1 != p)
        .map { case (id, v) => id -> rnd(dot(pv, v) / (nrm(p) * nrm(id))) }
        .sortBy { case (id, s2) => (-s2, id) }
        .take(Pipeline.Bm25TopK)
        .zipWithIndex
        .map { case ((id, _), i) => (p, id) -> (i + 1) }
    }.toMap
    // the RRF fold: exact integer terms, fused rank by (score DESC, id ASC)
    val keys = bm25.keySet ++ ann.keySet
    val expect = keys.groupBy(_._1).flatMap { case (p, ks) =>
      ks.toSeq.map { k =>
        val (b, a) = (bm25.getOrElse(k, 0), ann.getOrElse(k, 0))
        def term(r2: Int) =
          if (r2 > 0) Pipeline.RrfScale / (Pipeline.RrfK + r2) else 0L
        (k._2, term(b) + term(a), b, a)
      }.sortBy { case (id, q, _, _) => (-q, id) }
        .take(Pipeline.Bm25TopK)
        .zipWithIndex
        .map { case ((id, q, b, a), i) => (p, id) -> (i + 1, q, b, a) }
    }
    assert(out == expect, "fusion must equal the driver-side RRF fold")
    // fusion is doing real work on this corpus: some fused top-10 row
    // exists that only ONE system retrieved (the hybrid's whole point)
    assert(out.values.exists { case (_, _, b, a) => b == 0 || a == 0 },
      "every fused row was retrieved by both systems — vacuous fusion")
    assert(out.values.exists { case (_, _, b, a) => b > 0 && a > 0 },
      "no fused row was retrieved by both systems — fusion never fused")
  }

  test("p128: the staleness census reconciles against a driver-side " +
      "diff of the engine's own posting builds") {
    val out = Pipeline.queries("p128_index_staleness")(spark, Sf01)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(out.keySet == Set("retired", "new", "changed", "unchanged"))
    def postings(filterBatch: Boolean): Map[(String, Long), Long] = {
      val docs = Tables.documents(spark, Sf01)
        .repartition(spark.sparkContext.defaultParallelism)
      val in2 = if (filterBatch) docs.filter(col("doc_id") % 10 =!= 0)
        else docs
      Pipeline.bm25Postings(in2).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val (po, pn) = (postings(true), postings(false))
    val keys = po.keySet ++ pn.keySet
    def census(p: ((String, Long)) => Boolean) = keys.count(p).toLong
    assert(out("retired")._1 == census(k => !pn.contains(k)))
    assert(out("new")._1 == census(k => !po.contains(k)))
    assert(out("changed")._1 ==
      census(k => po.contains(k) && pn.contains(k) && po(k) != pn(k)))
    assert(out("unchanged")._1 ==
      census(k => po.contains(k) && pn.contains(k) && po(k) == pn(k)))
    val maxDq = keys.collect {
      case k if po.contains(k) && pn.contains(k) && po(k) != pn(k) =>
        math.abs(pn(k) - po(k))
    }.maxOption.map(_.toDouble)
    assert(out("changed")._2 == maxDq)
    // the audit's reason to exist: global-stat drift must actually
    // bite — the batch's arrival changes or retires standing postings
    assert(out("changed")._1 > 0 || out("retired")._1 > 0,
      "the batch arrival left the standing index untouched — vacuous")
  }

  test("p130: the per-source breakdown reconciles with the two screens' " +
      "own outputs and keeps clean sources in the grid") {
    val out = Pipeline.queries("p130_contam_by_source")(spark, Sf01)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val docs = Tables.documents(spark, Sf01)
      .filter(col("doc_id") % 29 =!= 7)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.values.toSet,
      "every train source keeps its row, clean or not")
    val lex = Pipeline.queries("p92_decontaminate")(spark, Sf01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sem = Pipeline.queries("p126_semantic_decontam")(spark, Sf01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    out.foreach { case (src, (nt, nl, ns, nb)) =>
      val members = docs.collect { case (id, s2) if s2 == src => id }.toSet
      assert(nt == members.size.toLong, s"$src train census")
      assert(nl == (members & lex).size.toLong, s"$src lexical count")
      assert(ns == (members & sem).size.toLong, s"$src semantic count")
      assert(nb == (members & lex & sem).size.toLong, s"$src both count")
    }
    assert(out.values.exists(_._1 > 0) &&
      out.values.exists(v => v._2 > 0 || v._3 > 0),
      "fixture must flag something somewhere")
    assert(out.values.exists(v => v._2 == 0 && v._3 == 0),
      "fixture must also keep a clean source's zero row")
  }

  test("p129: the approximation audit reconciles with p127 and shows " +
      "the IVF branch costing something real") {
    val out = Pipeline.queries("p129_rrf_ivf_audit")(spark, Sf01)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    assert(out.keySet == (0L until 10L).toSet, "one row per probe")
    // n_exact must equal the p127 output's own per-probe row counts —
    // the audit's exact side IS p127
    val p127Counts = Pipeline.queries("p127_rrf_fusion")(spark, Sf01)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    out.foreach { case (p, (ne, ni, nb)) =>
      assert(ne == p127Counts(p), s"probe $p exact side != p127")
      assert(nb <= math.min(ne, ni), s"probe $p overlap exceeds a side")
    }
    // non-vacuity: the cheap index must visibly cost SOMETHING on this
    // corpus (otherwise the audit proves nothing here)
    assert(out.values.map(_._3).sum < out.values.map(_._1).sum,
      "IVF-fused lists identical to exact everywhere — vacuous audit")
  }

  test("p127 semantics: a lexical twin and an embedding twin each " +
      "surface through their own system into the fused top-k") {
    import spark.implicits._
    // probe 0; doc 100 = lexical twin (shares the probe's bigrams,
    // embedding pointing AWAY so the ANN top-10 excludes it); doc 200 =
    // embedding twin (same direction, disjoint vocabulary); 64 fillers
    // with unique vocabularies and orthogonal embeddings make D large
    // enough that the probe's df=2 bigrams survive impact pruning
    // (df*20 <= D needs D >= 40) and fill the ANN list at sim 0
    val probeText = "alpha beta gamma delta epsilon"
    val docs = (Seq(
      0L -> probeText,
      100L -> (probeText + " extra"),
      200L -> "omega psi chi phi upsilon") ++
      (0 until 64).map(i =>
        (300L + i) -> s"f${i}a f${i}b f${i}c")).toDF("doc_id", "text")
    val vecs = (Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      100L -> Seq(-0.5f, 0.86f, 0f, 0f),
      200L -> Seq(0.9f, 0f, 0f, 0f)) ++
      (0 until 64).map(i =>
        (300L + i) -> Seq(0f, 0.2f + i * 0.01f, 1f, 0f)))
      .toDF("vec_id", "v")
    val rows = Pipeline.rrfFusedTopDocs(docs, vecs, probeMax = 1L)
      .collect()
      .map(r => r.getLong(1) -> (r.getInt(2), r.getInt(4), r.getInt(5)))
      .toMap
    val (lexRnk, lexB, lexA) = rows(100L)
    assert(lexB == 1 && lexA == 0,
      s"lexical twin must top BM25 and miss the ANN list: $rows")
    val (embRnk, embB, embA) = rows(200L)
    assert(embA == 1 && embB == 0,
      s"embedding twin must top ANN and miss the BM25 list: $rows")
    // both carry the same single term RrfScale/61 — the tie resolves
    // by doc_id, so the two twins are fused ranks 1 and 2
    assert(lexRnk == 1 && embRnk == 2,
      s"fused order must be the two twins first: $rows")
  }

  test("hybridRetrieve streams the batch probes to rows identical to " +
      "batch p127") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val batch = Pipeline.queries("p127_rrf_fusion")(spark, Sf01).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getLong(3),
        r.getInt(4), r.getInt(5)))
      .toSet
    // offline artifacts: the term-at-a-time BM25 index over the SAME
    // docs frame the batch op reads, and the raw embedding table
    val postings = Pipeline.bm25Postings(
      Tables.documents(spark, Sf01)
        .repartition(spark.sparkContext.defaultParallelism))
    val vecs = Tables.embeddings(spark, Sf01)
      .select(col("vec_id"), col("embedding").as("v"))
    // the query stream: the batch op's own ten probes, text + embedding
    val texts = Tables.documents(spark, Sf01).filter(col("doc_id") < 10)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val embs = Tables.embeddings(spark, Sf01).filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val probes = texts.keys.toSeq.sorted
      .map(id => (id, texts(id), embs(id)))
    val in = MemoryStream[(Long, String, Seq[Float])]
    val q = graft.streaming.Streams.hybridRetrieve(
        in.toDF().toDF("probe_id", "text", "v"), postings, vecs)
      .writeStream.format("memory").queryName("hybrid")
      .outputMode(OutputMode.Update).start()
    try {
      // two deliveries: fusion must not depend on batch boundaries
      val (first, rest) = probes.splitAt(probes.length / 2)
      in.addData(first: _*)
      q.processAllAvailable()
      in.addData(rest: _*)
      q.processAllAvailable()
      // at-least-once: redeliver the first batch (plus one same-batch
      // duplicate) — the recompute is identical, so NOTHING new emits
      in.addData(first ++ first.take(1): _*)
      q.processAllAvailable()
      val rows = spark.table("hybrid").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getInt(5)))
      assert(rows.length == rows.distinct.length,
        "redelivery re-emitted a probe's fused list")
      assert(rows.toSet == batch,
        "streamed fusion must equal batch p127's rows exactly")
    } finally q.stop()
  }

  test("hybridRetrieve and batch p127 agree on a NaN-poisoned vector: " +
      "the degenerate cosine is NULL and ranks LAST on both paths") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    // before cos6 mapped NaN INPUTS to NULL, the two paths forked on a
    // poisoned embedding: batch windows rank NaN FIRST (Spark's
    // NaN-greatest double ordering) while the streaming fold's NULL
    // sentinel ranks LAST — this corpus plants exactly that vector
    val docs = Seq(
      0L -> "alpha beta gamma",
      1L -> "alpha beta one", 2L -> "alpha beta two",
      3L -> "alpha beta three", 4L -> "alpha beta four",
      5L -> "alpha beta five", 6L -> "alpha beta poison")
      .toDF("doc_id", "text")
    val vecs = Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0.8f, 0.2f),
      3L -> Seq(0f, 1f), 4L -> Seq(-1f, 0f), 5L -> Seq(0.5f, 0.5f),
      6L -> Seq(Float.NaN, 1f)).toDF("vec_id", "v")
    val batch = Pipeline.rrfFusedTopDocs(docs, vecs, probeMax = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getLong(3),
        r.getInt(4), r.getInt(5)))
      .toSet
    // the poisoned doc is still RETRIEVED (it fills the ANN list) but
    // its NULL cosine ranks below every real one — even the −1 antipode
    val annRnks = batch.map(t => t._3 -> t._6).toMap
    assert(annRnks(6L) == (1L to 6L).map(annRnks(_)).max,
      s"NaN-poisoned doc must hold the WORST ann rank: $batch")
    assert(annRnks(6L) > annRnks(4L),
      s"NaN-poisoned doc must rank below the sim=-1 doc: $batch")
    val in = MemoryStream[(Long, String, Seq[Float])]
    val q = graft.streaming.Streams.hybridRetrieve(
        in.toDF().toDF("probe_id", "text", "v"),
        Pipeline.bm25Postings(docs), vecs)
      .writeStream.format("memory").queryName("hybrid_nan")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((0L, "alpha beta gamma", Seq(1f, 0f)))
      q.processAllAvailable()
      val rows = spark.table("hybrid_nan").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getInt(5))).toSet
      assert(rows == batch,
        "streamed fusion must equal batch p127 on a NaN-poisoned corpus")
    } finally q.stop()
  }

  test("hybridRetrieve in IVF mode serves rows identical to batch " +
      "p135 (which is p129's IVF-fused side, one builder)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    // expected: the IVF-SERVED fused list as the batch op computes it —
    // p135 and p129's approximate side share ivfFusedTopDocs, so this
    // one comparison ties stream, serving op and audit together
    val expected = Pipeline.queries("p135_rrf_ivf_serving")(spark, Sf01)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getLong(3),
        r.getInt(4), r.getInt(5)))
      .toSet
    // offline artifacts: postings, the cell-assigned corpus index, and
    // the (cent_id, cv) codebook — exactly what a serving deploy ships
    val assigned = Pipeline.ivfAssigned(spark, Sf01)
    val postings = Pipeline.bm25Postings(
      Tables.documents(spark, Sf01)
        .repartition(spark.sparkContext.defaultParallelism))
    val corpus = assigned.select("vec_id", "v", "cell")
    val cents = Tables.embeddings(spark, Sf01)
      .filter(col("vec_id") < Pipeline.ivfK(spark, Sf01))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val texts = Tables.documents(spark, Sf01).filter(col("doc_id") < 10)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val embs = Tables.embeddings(spark, Sf01).filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val probes = texts.keys.toSeq.sorted
      .map(id => (id, texts(id), embs(id)))
    val in = MemoryStream[(Long, String, Seq[Float])]
    val q = graft.streaming.Streams.hybridRetrieve(
        in.toDF().toDF("probe_id", "text", "v"), postings, corpus,
        ivfCentroids = Some(cents))
      .writeStream.format("memory").queryName("hybrid_ivf")
      .outputMode(OutputMode.Update).start()
    try {
      val (first, rest) = probes.splitAt(probes.length / 2)
      in.addData(first: _*)
      q.processAllAvailable()
      in.addData(rest: _*)
      q.processAllAvailable()
      // redelivery across batches: identical recompute → no emission
      in.addData(first: _*)
      q.processAllAvailable()
      val rows = spark.table("hybrid_ivf").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getInt(5)))
      assert(rows.length == rows.distinct.length,
        "redelivery re-emitted a probe's IVF-fused list")
      assert(rows.toSet == expected,
        "IVF-served stream must equal p129's IVF-fused list exactly")
    } finally q.stop()
  }
}
