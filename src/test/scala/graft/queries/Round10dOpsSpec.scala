package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-10 (cont.) dedup-tuning triptych semantics: p111 threshold
  * curve, p112 width spectrum, p113 run-length histogram. Each test
  * reconciles the operator against an independent driver-side replay
  * or a planted fixture whose answer is known by construction. */
class Round10dOpsSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.01"

  private def run(name: String, d: String = Sf01): DataFrame =
    Pipeline.queries(name)(spark, d)

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("p111: every threshold row replays a direct pair-artifact filter") {
    val pairs = Pipeline.nearDupPairs(spark, Sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val out = run("p111_dedup_threshold_curve").collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(0.5, 0.6, 0.7, 0.8, 0.9))
    out.foreach { case (tau, (nPairs, nLinked, nDropped)) =>
      // replay against the integer tenth, not tau * 10.0 — the rounded
      // double 0.7 times 10 need not hit 7.0 exactly
      val tt = math.round(tau * 10).toDouble
      val hit = pairs.filter(_._3 * 10.0 >= tt)
      assert(nPairs == hit.length.toLong, s"tau=$tau pairs")
      assert(nLinked ==
        hit.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong,
        s"tau=$tau linked docs")
      assert(nDropped == hit.map(_._2).distinct.length.toLong,
        s"tau=$tau dropped docs")
    }
    // the curve must be monotone: raising tau can only shrink the graph
    val byTau = out.toSeq.sortBy(_._1).map(_._2)
    byTau.sliding(2).foreach { case Seq(a, b) =>
      assert(a._1 >= b._1 && a._2 >= b._2 && a._3 >= b._3,
        s"curve not monotone: $a then $b")
    }
    // and the corpus must exercise it: the 0.5 row IS the artifact
    assert(out(0.5)._1 == pairs.length.toLong)
    assert(pairs.nonEmpty)
  }

  test("p111 core: boundary and overlap semantics on a synthetic graph") {
    import spark.implicits._
    // doc 1 pairs with 2 (strong) and with 3 (weak): the linked/dropped
    // sets must deduplicate doc 1 across pairs, and 0.74 must clear
    // tau=0.7 but not 0.8
    val pairs = Seq((1L, 2L, 0.95), (1L, 3L, 0.55), (4L, 5L, 0.74))
      .toDF("doc_a", "doc_b", "jaccard")
    val out = Pipeline.dedupThresholdCurveOf(spark, pairs).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0.5) == (3L, 5L, 3L))
    assert(out(0.6) == (2L, 4L, 2L))
    assert(out(0.7) == (2L, 4L, 2L))
    assert(out(0.8) == (1L, 2L, 1L))
    assert(out(0.9) == (1L, 2L, 1L))
  }

  test("p112: width 8 reconciles against a direct distinct-gram replay") {
    val out = run("p112_dup_spectrum").collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet == Pipeline.SpectrumWidths.toSet)
    // independent replay at w=8: per-doc distinct gram sets via the
    // same native expression, aggregated driver-side
    val rows = graft.Tables.documents(spark, Sf01)
      .select(col("doc_id"),
        graft.functions.ShingleIdSet.shingleIdSet(col("text"), 8).as("st"))
      .filter(col("st").isNotNull)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val df8 = rows.flatMap { case (id, st) => st.map(g => (g, id)) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    val (nDocs, nDocsDup, nGrams, nDupGrams) = out(8)
    assert(nDocs == rows.length.toLong)
    assert(nGrams == df8.size.toLong)
    assert(nDupGrams == df8.count(_._2 > 1).toLong)
    assert(nDocsDup ==
      rows.count { case (_, st) => st.exists(g => df8(g) > 1) }.toLong)
  }

  test("p112: doc-level duplication is monotone non-increasing in width") {
    // a duplicated w-gram contains duplicated sub-grams at every
    // smaller width, so the doc count can only fall as w grows
    val out = run("p112_dup_spectrum").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    Pipeline.SpectrumWidths.sliding(2).foreach { case Seq(a, b) =>
      assert(out(a) >= out(b), s"w=$a=${out(a)} < w=$b=${out(b)}")
    }
    // the corpus must exercise the spectrum: real duplication at the
    // widest window (planted near-dup docs share >32-token spans)
    assert(out(Pipeline.SpectrumWidths.max) > 0L)
  }

  test("p113: planted aligned blocks produce exactly the expected runs") {
    def toks(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val X = toks("x", 30)   // 3-window block shared by A and B
    val Y = toks("y", 10)   // 1-window block repeated inside C
    val X2 = toks("p", 10)  // two 1-window blocks shared by D and E,
    val X3 = toks("q", 10)  // separated by per-doc filler: a gap
    val docs = docsDf(Seq(
      1L -> X.mkString(" "),
      2L -> (X ++ toks("b", 10)).mkString(" "),
      3L -> (Y ++ toks("c", 10) ++ Y).mkString(" "),
      4L -> (X2 ++ toks("d", 10) ++ X3).mkString(" "),
      5L -> (X2 ++ toks("e", 10) ++ X3).mkString(" ")))
    val out = Pipeline.dupRunLengthsOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // A and B: one maximal run of 3 consecutive duplicated windows each;
    // C carries Y twice (two length-1 runs); D and E each split across
    // the filler gap into two length-1 runs — never merged
    assert(out.keySet == Set(1L, 3L))
    assert(out(3L) == (30L, 2L, 2L))
    assert(out(1L) == (10L, 6L, 3L))
  }

  test("p114: only runs of MinRunW+ non-keeper windows are stripped") {
    def toks(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val X = toks("x", 30) // 3-window block: meets the run gate
    val Y = toks("y", 10) // 1-window phrase: chance-collision stand-in
    val Z = toks("z", 20) // 2-window block: one under the gate
    val docs = docsDf(Seq(
      1L -> X.mkString(" "),
      2L -> (X ++ toks("b", 10)).mkString(" "),
      3L -> (Y ++ toks("c", 10)).mkString(" "),
      4L -> (Y ++ toks("d", 10)).mkString(" "),
      5L -> Z.mkString(" "),
      6L -> (Z ++ toks("e", 10)).mkString(" ")))
    val out = Pipeline.runStripOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    // doc 1 is X's keeper: untouched. Doc 2's 3-window copy is one
    // maximal run >= MinRunW: stripped, filler survives.
    assert(out(1L) == (3L, 0L, 0L, 30L,
      java.security.MessageDigest.getInstance("MD5")
        .digest(X.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
    assert(out(2L)._2 == 1L && out(2L)._3 == 3L && out(2L)._4 == 10L)
    // the 1-window phrase and the 2-window block sit UNDER the gate:
    // kept on both sides (p75 would have stripped docs 4 and 6)
    Seq(3L, 4L, 5L, 6L).foreach { id =>
      assert(out(id)._2 == 0L && out(id)._3 == 0L, s"doc $id stripped")
    }
    // contrast with p75 on the same fixture: every p114 drop is a p75
    // drop, and p75 additionally strips the under-gate copies
    val p75 = Pipeline.spanStrip(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(p75(4L) == 1L && p75(6L) == 2L && p75(2L) == 3L)
    out.foreach { case (id, (_, _, dropped, _, _)) =>
      assert(dropped <= p75(id), s"doc $id p114 dropped more than p75")
    }
  }

  test("p114 on the corpus: drops are a strict subset of p75's") {
    val p114 = run("p114_run_strip").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val p75 = Pipeline.spanStrip(
      graft.Tables.documents(spark, Sf01).select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(p114.keySet == p75.keySet)
    p114.foreach { case (id, d) =>
      assert(d <= p75(id), s"doc $id p114=$d > p75=${p75(id)}")
    }
    val (s114, s75) = (p114.values.sum, p75.values.sum)
    assert(s114 > 0L, "corpus must exercise the run gate")
    assert(s114 < s75,
      "corpus must carry under-gate duplication p114 preserves")
  }

  test("p115: skew factor, hot-key ties, and the envelope assert") {
    import spark.implicits._
    // 3+1 rows over 2 keys: skew = max/avg = 3*2/4 = 1.5 exactly
    val skewed = Seq("a", "a", "a", "b").toDF("k1")
    // tie at 2: hot key must be the MINIMUM among tied keys
    val tied = Seq("b", "b", "a", "a", "c").toDF("k2")
    val out = Pipeline.skewAuditOf(Seq(
      ("d1", skewed, "k1"), ("d2", tied, "k2"))).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getDouble(5))).toMap
    assert(out("d1") == (4L, 2L, 3L, "a", 1.5))
    assert(out("d2") == (5L, 3L, 2L, "a", 1.2))
    // the envelope assert must fail LOUDLY, not round — a real frame
    // whose counts product exceeds 9e9 can't be materialized in a
    // test, so prove the assert wiring on a synthetic 1-row breach
    // with the operator's own expression
    val breach = Seq((10000000000L, 1L)).toDF("n_keys", "max_rows")
      .filter(assert_true(col("n_keys") * col("max_rows") < 9000000000L,
        lit("boom")).isNull)
    val e = intercept[Exception] { breach.collect() }
    assert(e.getMessage != null)
  }

  test("p115 gate row: events.user_id reconciles a driver-side count") {
    val out = run("p115_skew_audit").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet ==
      Pipeline.SkewDomains.map { case (t, c) => s"$t.$c" }.toSet)
    val ev = graft.Tables.events(spark, Sf01)
      .groupBy("user_id").count().collect()
      .map(r => r.get(0) -> r.getLong(1))
    assert(out("events.user_id") ==
      (ev.map(_._2).sum, ev.length.toLong, ev.map(_._2).max))
  }

  test("p116: the S-curve grid replays the closed form exactly") {
    val out = run("p116_lsh_planner").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)) ->
        (r.getDouble(3), r.getInt(4))).toMap
    assert(out.size == Pipeline.PlannerConfigs.size * 9)
    // driver-side replay with BigInt products and the same single
    // IEEE division — every cell must be bit-identical
    Pipeline.PlannerConfigs.foreach { case (b, r) =>
      (1 to 9).foreach { jt =>
        val c = BigInt(10).pow(r) - BigInt(jt).pow(r)
        val p = (BigInt(10).pow(12) - c.pow(b)).toDouble / 1.0e12
        val (got, cur) = out((b, r, jt / 10.0))
        assert(got == p, s"b=$b r=$r jt=$jt")
        assert(cur == (if (b == 6 && r == 2) 1 else 0))
      }
    }
    // banding theory shape: P rises with j within every config, and
    // at fixed j more bands (fewer rows) can only raise P
    Pipeline.PlannerConfigs.foreach { case (b, r) =>
      (1 to 8).foreach { jt =>
        assert(out((b, r, jt / 10.0))._1 <= out((b, r, (jt + 1) / 10.0))._1)
      }
    }
    (1 to 9).foreach { jt =>
      val byBands = Pipeline.PlannerConfigs.sortBy(_._1)
        .map { case (b, r) => out((b, r, jt / 10.0))._1 }
      byBands.sliding(2).foreach { case Seq(lo, hi) =>
        assert(lo <= hi, s"jt=$jt: more bands lowered P")
      }
    }
  }

  test("the 6x2 banding adjudication, pinned on p116's own grid: " +
      "(b,r) is a function of the operating threshold, not corpus size") {
    // Round-14 adjudication of "should the live banding scale with the
    // corpus like corpusCells?" — NO, kept fixed: banding theory puts
    // the S-curve knee at ~(1/b)^(1/r), a function of the operating
    // tau only; corpus growth moves the false-candidate VOLUME, and
    // that lever already scales via capBuckets/MaxBucket (bounded pair
    // fan-out per bucket at ANY corpus size) + the exact-Jaccard
    // verify + p93's live recall monitor. Re-banding by N would also
    // invalidate the persisted signature/band artifacts the
    // incremental ops (p36/p65) join against — a full re-index at
    // every size boundary for zero recall benefit at fixed tau.
    val out = run("p116_lsh_planner").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)) ->
        r.getDouble(3)).toMap
    def p(b: Int, r: Int, j: Double) = out((b, r, j))
    val tau = Pipeline.JaccardThreshold
    // the live 6x2 is the recall-leaning knee nearest tau from below —
    // the correct factorization AT THE THRESHOLD, corpus size absent
    val knees = Pipeline.PlannerConfigs.map { case (b, r) =>
      (b, r) -> math.pow(1.0 / b, 1.0 / r) }.toMap
    assert(knees((6, 2)) < tau &&
      knees.filter(_._2 <= tau).maxBy(_._2)._1 == ((6, 2)),
      s"6x2's knee must be the nearest below tau=$tau: $knees")
    // at tau it catches >= 80% of exactly-threshold pairs; every
    // sharper banding (r >= 3) loses more than half of them
    assert(p(6, 2, tau) >= 0.8, s"live banding recall at tau: $out")
    Pipeline.PlannerConfigs.filter(_._2 >= 3).foreach { case (b, r) =>
      assert(p(b, r, tau) < 0.5, s"${b}x$r would be viable at tau — " +
        "the adjudication's premise changed, revisit it") }
    // at background j=0.1 it passes <= 6% of noise to the verify;
    // the softer 12x1 would flood it with > 70%
    assert(p(6, 2, 0.1) <= 0.06)
    assert(p(12, 1, 0.1) > 0.7)
  }

  test("p117 core: the matrix counts hand-built overlaps exactly") {
    import spark.implicits._
    val a = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val b = Seq((1L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
    val c = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Pipeline.dedupAgreementOf(Seq(
      "x" -> a, "y" -> b, "z" -> c)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(out(("x", "y")) == (3L, 2L, 1L, 2L, 1L))
    assert(out(("x", "z")) == (3L, 0L, 0L, 3L, 0L))
    assert(out(("y", "z")) == (2L, 0L, 0L, 2L, 0L))
  }

  test("p117 gate: internally consistent, minhash row ties to the artifact") {
    val rows = run("p117_dedup_agreement").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(rows.size ==
      Pipeline.AgreementMethods.combinations(2).size)
    // every row: intersection bounded, exclusives are exact complements
    rows.values.foreach { case (na, nb, both, oa, ob) =>
      assert(both <= math.min(na, nb) && oa == na - both && ob == nb - both)
    }
    // a method's total must be identical in every row that mentions it
    Pipeline.AgreementMethods.foreach { m =>
      val totals = rows.collect {
        case ((a, _), (na, _, _, _, _)) if a == m => na
      } ++ rows.collect {
        case ((_, b), (_, nb, _, _, _)) if b == m => nb
      }
      assert(totals.toSet.size == 1, s"$m totals: $totals")
    }
    // and the minhash column IS the p02 pair artifact
    val nPairs = Pipeline.nearDupPairs(spark, Sf01).count()
    assert(rows(("minhash", "simhash"))._1 == nPairs && nPairs > 0L)
  }

  test("p118: every source row reconciles a driver-side replay") {
    val docs = graft.Tables.documents(spark, Sf01)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def hash(t: String): String =
      sha.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keeper = docs.groupBy(d => hash(d._3)).view
      .mapValues(_.map(_._1).min).toMap
    val linked = Pipeline.nearDupPairs(spark, Sf01).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val out = run("p118_source_scorecard").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == docs.map(_._2).toSet)
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val (nDocs, nTok, exFrac, nearFrac) = out(src)
      assert(nDocs == ds.length.toLong, s"$src docs")
      assert(nTok == ds.map(_._3.split(" ").length.toLong).sum, s"$src tokens")
      val nEx = ds.count(d => keeper(hash(d._3)) != d._1)
      val nNear = ds.count(d => linked(d._1))
      assert(exFrac == (nEx.toLong * 1000000L / nDocs).toDouble / 1e6,
        s"$src exact")
      assert(nearFrac == (nNear.toLong * 1000000L / nDocs).toDouble / 1e6,
        s"$src near")
    }
    // the corpus must exercise the scorecard's near-dup column (the
    // planted dups are near-identical, not byte-identical, so the
    // exact column correctly reads zero here — the replay above pins
    // both columns either way)
    assert(out.values.exists(_._4 > 0.0))
  }

  test("p119: the histogram replays a driver-side union-find") {
    val pairs = Pipeline.nearDupPairs(spark, Sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val toks = graft.Tables.documents(spark, Sf01)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong)
      .toMap
    // union-find with min-id roots = the label-propagation fixpoint
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val linked = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val clusters = linked.groupBy(find)
    val want = clusters.groupBy(_._2.length).map { case (k, cs) =>
      k.toLong -> (cs.size.toLong, (k * cs.size).toLong,
        ((k - 1) * cs.size).toLong,
        cs.map { case (root, ms) =>
          ms.filter(_ != root).map(toks).sum }.sum)
    }
    val out = run("p119_dedup_savings").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    want.foreach { case (k, v) => assert(out(k) == v, s"size $k") }
    assert(out(1L) ==
      ((toks.size - linked.length).toLong,
        (toks.size - linked.length).toLong, 0L, 0L))
    // the rows must account for the whole corpus
    assert(out.values.map(_._2).sum == toks.size.toLong)
    assert(want.nonEmpty, "corpus must exercise the cluster rows")
  }

  test("p120: the greedy fill replays driver-side; budget conserved") {
    val docs = graft.Tables.documents(spark, Sf01)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keep = Pipeline.queries("p76_gopher_rules")(spark, Sf01)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val bySource = docs.groupBy(_._2).map { case (src, ds) =>
      val avail = ds.map(_._3.split(" ").length.toLong).sum
      val passPpm = ds.map(d => keep(d._1)).sum * 1000000L / ds.length
      (src, avail, passPpm)
    }.toSeq
    val total = bySource.map(_._2).sum
    val budget = total * Pipeline.TrainBudgetPct / 100L
    val ordered = bySource.sortBy { case (src, _, ppm) => (-ppm, src) }
    var cum = 0L
    val want = ordered.zipWithIndex.map { case ((src, avail, _), i) =>
      val alloc = math.max(0L, math.min(avail, budget - cum))
      cum += avail
      src -> (i + 1, avail, alloc)
    }.toMap
    val out = run("p120_budget_allocation").collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(3), r.getLong(4))).toMap
    assert(out == want)
    assert(out.values.map(_._3).sum == math.min(budget, total))
    // the cut must be visible: someone allocated fully, someone zero
    assert(out.values.exists(v => v._3 == v._2 && v._3 > 0L))
    assert(out.values.exists(_._3 == 0L))
  }

  test("p121: a planted corpus produces its exact octave spectrum") {
    // term frequencies: a×1 (hapax), b×2, c×3, d×8, e×100
    val text = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c")
      ++ Seq.fill(8)("d") ++ Seq.fill(100)("e")).mkString(" ")
    val out = Pipeline.freqSpectrumOf(docsDf(Seq(1L -> text))).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // buckets: 0 (c=1: a), 1 (c=2,3: b,c), 3 (c=8: d), 6 (c=100: e)
    assert(out.keySet == Set(0, 1, 3, 6))
    assert(out(0) == (1L, 1L, 1L, (1000000L / 114L).toDouble / 1e6))
    assert(out(1) == (2L, 2L, 5L, (5L * 1000000L / 114L).toDouble / 1e6))
    assert(out(3) == (8L, 1L, 8L, (8L * 1000000L / 114L).toDouble / 1e6))
    assert(out(6) == (64L, 1L, 100L,
      (100L * 1000000L / 114L).toDouble / 1e6))
  }

  test("p122: a sustained drift is 3-sigma-quiet but CUSUM-loud") {
    import spark.implicits._
    // baseline: 12 hours alternating 9/11 (mu0 = 10, sigma0 = 1);
    // drift: 12 hours at 13 — under the FULL-series moments p84 uses,
    // no hour's z clears 3 (the drifted mass inflates the variance),
    // so the spike gate stays silent, while the sustained deviation
    // drives the CUSUM over its 8-sigma handle after a few hours
    val counts = (0 until 12).map(i => if (i % 2 == 0) 9L else 11L) ++
      Seq.fill(12)(13L)
    val hourly = counts.zipWithIndex
      .map { case (c, i) => ("d", f"h$i%02d", c) }
      .toDF("event_type", "hour", "c")
    assert(Pipeline.p84Gate(hourly).collect().isEmpty,
      "the drift must not trip the spike gate")
    val out = Pipeline.cusumDriftOf(hourly).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    // driver replay: nb=11? no — nb = 22/2 = 11 baseline hours
    // (ten 9/11 + the first drift hour), sb/ssb from those
    val nb = counts.length / 2
    val base = counts.take(nb)
    val (sb, ssb) = (base.sum, base.map(c => c * c).sum)
    var run = 0L
    val want = counts.zipWithIndex.drop(nb).map { case (c, i) =>
      run = math.max(0L, run + 8L * nb * c - 9L * sb)
      val alarm = if (run * run > 4096L * (nb * ssb - sb * sb)) 1 else 0
      f"h$i%02d" -> (c, run, alarm)
    }.toMap
    assert(out == want)
    assert(out.values.exists(_._3 == 1), "the drift must alarm")
    assert(out.values.exists(_._3 == 0),
      "the CUSUM must take hours to accumulate, not fire instantly")
  }

  test("p123: changepoints land where the drifts were planted") {
    import spark.implicits._
    def series(name: String, counts: Seq[Long]): Seq[(String, String, Long)] =
      counts.zipWithIndex.map { case (c, i) => (name, f"h$i%02d", c) }
    // "a": drift starts immediately in phase II (no CUSUM reset ever:
    // changepoint = the first phase-II hour). "b": six quiet hours
    // hold the CUSUM at zero, THEN the drift — changepoint must land
    // on the first drifted hour, after the last reset.
    val a = (0 until 12).map(i => if (i % 2 == 0) 9L else 11L) ++
      Seq.fill(12)(13L)
    val b = (0 until 12).map(i => if (i % 2 == 0) 9L else 11L) ++
      Seq.fill(6)(10L) ++ Seq.fill(8)(13L)
    val hourly = (series("a", a) ++ series("b", b))
      .toDF("event_type", "hour", "c")
    val out = Pipeline.driftChangepointOf(Pipeline.cusumDriftOf(hourly))
      .collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    // "a": nb=12, phase II = h12.., steps +168, handle ~768 → first
    // alarm at the 5th phase-II hour; no zero before it → crn = 1
    assert(out("a") == (("h16", "h12", 5L)))
    // "b": nb=13 (baseline absorbs one quiet hour), five phase-II
    // zeros h13–h17, drift from h18, alarm on its 5th hour
    assert(out("b") == (("h22", "h18", 5L)))
  }

  test("p113: the gate path equals an unbalanced-input replay") {
    // docsBalanced must be semantics-neutral: the histogram totals
    // cannot depend on input partitioning or row order
    val p113Docs = run("p113_dup_run_lengths")
      .agg(sum(col("n_runs")).as("nr")).collect()(0).getLong(0)
    val direct = Pipeline.dupRunLengthsOf(
      graft.Tables.documents(spark, Sf01).select("doc_id", "text"))
      .agg(sum(col("n_runs"))).collect()(0).getLong(0)
    assert(p113Docs == direct)
    assert(p113Docs > 0L, "corpus must exercise the histogram")
  }
}
