package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-14 native scan expressions against independent
  * driver-side references on seeded randomized corpora — the
  * SortedContainsSpec discipline. The planted shapes are exactly the
  * degenerate edges the expressions hand-replicate from the folds
  * they replaced: zero-norm vectors (NULL cosine), NaN poison,
  * dimension mismatches, null elements, exact similarity ties, and
  * the empty index. */
class NativeScanSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def nrmOf(v: Seq[Float]): Double =
    math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)

  private def dot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + x.toDouble * y.toDouble }

  /** cos6's exact convention: None for zero/NaN denominator or NaN
    * dot (and the caller handles dimension mismatch) — plus the native
    * scans' non-finite-quotient skip: an Inf operand (Inf-poisoned
    * embedding) or overflow makes q non-finite, which the scans treat
    * as the NULL degenerate instead of crashing BigDecimal.valueOf. */
  private def cos6Ref(num: Double, den: Double): Option[Double] =
    if (den == 0.0 || num.isNaN || den.isNaN ||
        !java.lang.Double.isFinite(num / den)) None
    else Some(round6(num / den))

  // ---- SemanticScan via semanticContamMatches ----

  test("semanticContamMatches matches a driver reference on a " +
      "randomized corpus with planted degenerate vectors") {
    val rnd = new scala.util.Random(42)
    val dim = 4
    def vec(): Seq[Float] =
      Seq.fill(dim)((rnd.nextInt(5) - 2).toFloat)
    val evals: Seq[(Long, Seq[Float])] =
      (0L until 40L).map(i => i -> vec()) ++ Seq(
        40L -> Seq.fill(dim)(0f), // zero-norm eval vector
        // Inf-poisoned eval vector: q is non-finite against every
        // probe — must be SKIPPED, not crash the scan (ADVICE r15)
        41L -> Seq(Float.PositiveInfinity, 1f, 1f, 1f))
    val probes: Seq[(Long, Seq[Float])] =
      (100L until 160L).map(i => i -> vec()) ++ Seq(
        200L -> Seq.fill(dim)(0f), // zero-norm probe
        201L -> Seq(Float.NaN, 1f, 1f, 1f), // NaN-poisoned probe
        202L -> Seq(1f, 1f), // dimension-mismatched probe
        203L -> Seq(Float.NegativeInfinity, 1f, 1f, 1f)) // Inf probe
    val expected = probes.flatMap { case (id, v) =>
      val nrm = nrmOf(v)
      val hits = evals.flatMap { case (eid, e) =>
        if (e.length != v.length) None
        else cos6Ref(dot(v, e), nrm * nrmOf(e))
          .filter(_ >= 0.40).map(s => (eid, s))
      }
      if (hits.isEmpty) None
      else {
        val best = hits.minBy { case (eid, s) => (-s, eid) }
        Some((id, hits.size, best._1, best._2))
      }
    }.toSet
    assert(expected.nonEmpty, "vacuous corpus — regenerate")
    // degenerate probes must hit nothing on both sides
    assert(!expected.exists(r => r._1 >= 200L))
    val out = graft.streaming.Streams.semanticContamMatches(
        probes.toDF("vec_id", "v"),
        evals.toDF("eval_id", "evv"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == expected,
      s"only-spark=${(out -- expected).take(3)} " +
        s"only-ref=${(expected -- out).take(3)}")
  }

  test("semanticContamMatches keeps every dim group of a mixed-dim " +
      "eval set — the replaced fold's per-row dim rule") {
    // a dim-3 eval row first by id must NOT anchor the index and
    // blind the screen to the dim-2 rows the probes actually match
    val evals = Seq(
      (0L, Seq(1f, 1f, 1f)), // odd-dim row, smallest id
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    val probes = Seq(
      (100L, Seq(1f, 0f)), // matches eval 1 at sim 1.0
      (101L, Seq(1f, 1f, 1f))) // matches eval 0 at sim 1.0
    val out = graft.streaming.Streams.semanticContamMatches(
        probes.toDF("vec_id", "v"), evals.toDF("eval_id", "evv"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out(100L) == ((1, 1L)),
      s"dim-2 probe must still hit the dim-2 eval rows: $out")
    assert(out(101L) == ((1, 0L)),
      s"dim-3 probe must hit the dim-3 eval row: $out")
  }

  test("CentroidArgmax survives a degraded codebook: a NULL or " +
      "wrong-dim centroid loses to any real cosine instead of " +
      "failing the query at build") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val docs = Seq((0L, "alpha beta gamma"), (1L, "alpha beta one"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (0L, Seq(1f, 0f), 10L), (1L, Seq(0.9f, 0.1f), 10L))
      .toDF("vec_id", "v", "cell")
    val cents = Seq(
      (5L, Option.empty[Seq[Float]]), // NULL centroid
      (7L, Some(Seq(1f, 1f, 1f))), // wrong-dim centroid
      (10L, Some(Seq(1f, 0f)))) // the real cell
      .toDF("cent_id", "cv")
    val in = MemoryStream[(Long, String, Seq[Float])]
    val q = graft.streaming.Streams.hybridRetrieve(
        in.toDF().toDF("probe_id", "text", "v"),
        graft.queries.Pipeline.bm25Postings(docs), corpus,
        ivfCentroids = Some(cents))
      .writeStream.format("memory").queryName("hybrid_degraded")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((0L, "alpha beta gamma", Seq(1f, 0f)))
      q.processAllAvailable()
      val rows = spark.table("hybrid_degraded").collect()
      // the probe must land in cell 10 (the only real cosine) and
      // retrieve doc 1 through the ANN branch
      assert(rows.exists(r => r.getLong(2) == 1L && r.getInt(5) > 0),
        s"degraded codebook broke the serving path: ${rows.toSeq}")
    } finally q.stop()
  }

  test("semanticContamMatches against an empty eval set flags nothing") {
    val out = graft.streaming.Streams.semanticContamMatches(
      Seq((1L, Seq(1f, 2f))).toDF("vec_id", "v"),
      Seq.empty[(Long, Seq[Float])].toDF("eval_id", "evv"))
    assert(out.count() == 0L)
  }

  // ---- CentroidArgmax ----

  private def argmaxRef(v: Seq[Float], cents: Seq[(Long, Seq[Float])])
      : Option[Long] = {
    if (cents.isEmpty) return None
    val nrm = nrmOf(v)
    // (simOption, id) under csim DESC NULLS LAST, id ASC
    val scored = cents.map { case (id, c) =>
      val sim =
        if (c.length != v.length) None
        else cos6Ref(dot(v, c), nrm * nrmOf(c))
      (sim, id)
    }
    Some(scored.minBy { case (s, id) =>
      (s.isEmpty, s.map(-_).getOrElse(0.0), id) }._2)
  }

  private def runArgmax(probes: Seq[(Long, Seq[Float])],
      cents: Seq[(Long, Seq[Float])]): Map[Long, Option[Long]] = {
    import graft.functions.VectorDot.vdot
    val idx = CentroidArgmax.codebook(cents.map { case (id, c) =>
      (id, Some(c.map(java.lang.Float.valueOf): Seq[java.lang.Float]),
        nrmOf(c))
    })
    probes.toDF("probe_id", "v")
      .withColumn("nrm", sqrt(vdot(col("v"), col("v"))))
      .withColumn("cell", CentroidArgmax.centroidArgmax(
        spark, col("v"), col("nrm"), idx))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("cell"))) None
         else Some(r.getLong(r.fieldIndex("cell"))))).toMap
  }

  test("CentroidArgmax matches the batch window order on a randomized " +
      "codebook, ties and degenerate probes included") {
    val rnd = new scala.util.Random(7)
    val dim = 4
    def vec(): Seq[Float] =
      Seq.fill(dim)((rnd.nextInt(5) - 2).toFloat)
    val base = (0L until 12L).map(i => i -> vec())
    // plant an exact-tie pair (same vector, two ids), a zero-norm
    // centroid (NULL csim against every probe), and a wrong-dim
    // centroid (per-row vdot NULL — the ragged-codebook rule)
    val cents = base ++ Seq(20L -> base.head._2,
      21L -> Seq.fill(dim)(0f), 22L -> Seq(1f, 1f),
      // Inf-poisoned centroid: csim NULL vs every probe (non-finite
      // quotient) — must never win AND never crash round6 (ADVICE r15)
      23L -> Seq(Float.PositiveInfinity, 0f, 0f, 0f))
    val probes = (100L until 140L).map(i => i -> vec()) ++ Seq(
      200L -> Seq.fill(dim)(0f), // zero-norm probe: all csim NULL
      201L -> Seq(Float.NaN, 1f, 1f, 1f), // NaN probe: all csim NULL
      202L -> Seq(1f, 1f), // dim mismatch: all csim NULL
      203L -> Seq(Float.PositiveInfinity, 1f, 1f, 1f)) // Inf probe
    val got = runArgmax(probes, cents)
    probes.foreach { case (id, v) =>
      assert(got(id) == argmaxRef(v, cents), s"probe $id")
    }
    // the all-NULL degenerates land in the SMALLEST cell — the batch
    // window's NULLS-LAST + id-ASC edge, not a dropped row
    Seq(200L, 201L, 203L).foreach(id => assert(got(id).contains(0L)))
    // and the Inf-poisoned CENTROID never wins any probe
    assert(!got.values.exists(_.contains(23L)))
    // while the dim-2 probe finds the dim-2 codebook row (real cosine
    // 1.0) — the ragged per-row dim rule, not a global anchor
    assert(got(202L).contains(22L))
  }

  test("CentroidArgmax on an empty codebook yields NULL (probe drops " +
      "out of the cell join)") {
    val got = runArgmax(Seq(1L -> Seq(1f, 0f)), Nil)
    assert(got(1L).isEmpty)
  }

  // ---- BroadcastLongArray ----

  test("BroadcastLongArray + SortedContains equals array_contains on " +
      "a literal copy, across a multi-partition frame") {
    val rnd = new scala.util.Random(11)
    val set = (0 until 5000).map(_ => rnd.nextLong() % 100000L)
      .distinct.sorted.toArray
    val bcArr = BroadcastLongArray.broadcastLongArray(spark, set)
    val keys = ((0 until 2000).map(_ => rnd.nextLong() % 100000L) ++
      set.take(500)).toDF("key").repartition(13)
    val out = keys
      .select(col("key"),
        SortedContains.sortedContains(bcArr, col("key")).as("native"),
        array_contains(lit(set), col("key")).as("literal"))
      .collect()
    assert(out.nonEmpty && out.exists(_.getBoolean(1)))
    out.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2),
      s"diverged at key ${r.getLong(0)}"))
  }

  test("BroadcastLongArray wrap cache: one wrap per broadcast, and " +
      "entries die with their broadcasts (no unbounded growth when " +
      "scanners are rebuilt)") {
    import org.apache.spark.broadcast.Broadcast
    // wrap-once: the same broadcast yields the SAME cached instance
    val bc0 = spark.sparkContext.broadcast(Array(1L, 2L, 3L))
    assert(BroadcastLongArray.wrapped(bc0) eq BroadcastLongArray.wrapped(bc0))
    // and distinct broadcasts cannot collide (value-keyed, not id-keyed)
    val bc1 = spark.sparkContext.broadcast(Array(9L, 9L, 9L))
    assert(BroadcastLongArray.wrapped(bc1).getLong(0) == 9L)
    assert(BroadcastLongArray.wrapped(bc0).getLong(0) == 1L)
    bc0.destroy(); bc1.destroy()
    // lifecycle: N scanner-rebuild-style broadcasts, then destroy +
    // drop the handles — once the value arrays are only weakly
    // reachable (block removed by destroy, handle gone), ordinary GC
    // must expunge the entries
    val baseline = BroadcastLongArray.cacheSize
    var handles: Seq[Broadcast[Array[Long]]] =
      (0 until 16).map { i =>
        val bc = spark.sparkContext.broadcast(Array.fill(4096)(i.toLong))
        BroadcastLongArray.wrapped(bc)
        bc
      }
    assert(BroadcastLongArray.cacheSize >= baseline + 16)
    handles.foreach(_.destroy())
    handles = Nil
    var tries = 0
    while (BroadcastLongArray.cacheSize > baseline && tries < 50) {
      System.gc(); Thread.sleep(50); tries += 1
    }
    assert(BroadcastLongArray.cacheSize <= baseline,
      s"cache retained ${BroadcastLongArray.cacheSize - baseline} " +
        "entries after their broadcasts were destroyed and dropped")
  }
}
