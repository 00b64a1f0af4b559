package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-10 (cont.) operator semantics: p99 provenance-priority reps,
  * p100 embedding snapshot drift, p101 cross-source near-dup matrix,
  * p102 dataset card. Each test reconciles the operator's output
  * against an independent driver-side replay over the same corpus. */
class Round10cOpsSpec extends SparkSpec {

  // the near-dup machinery needs the sf0.01 corpus (sf0.001's 50 docs
  // carry no pair structure worth auditing); the artifact registry
  // amortizes the pair-graph build across these tests
  private val Sf01 = "/root/testdata/sf0.01"

  private def run(name: String, d: String = Sf01) =
    Pipeline.queries(name)(spark, d)

  private lazy val clusterMembers: Map[Long, Seq[(Long, Int, Long)]] = {
    // (doc_id, tier, n_chars) per cluster, replayed from p32's labels +
    // a driver-side copy of the declared tier policy
    val tierOf: String => Int = src =>
      Pipeline.SourceTiers.collectFirst {
        case (t, ss) if ss.contains(src) => t
      }.getOrElse(Pipeline.DefaultTier)
    val docs = Tables.documents(spark, Sf01)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => r.getLong(0) -> (tierOf(r.getString(1)), r.getLong(2)))
      .toMap
    run("p32_dup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2)
      .view.mapValues(_.map { case (id, _) =>
        (id, docs(id)._1, docs(id)._2) }.toSeq).toMap
  }

  test("p99: both picks replay the declared orderings exactly") {
    val out = run("p99_provenance_reps").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4),
          r.getBoolean(5)))
      .toMap
    assert(out.keySet == clusterMembers.keySet)
    clusterMembers.foreach { case (cid, ms) =>
      val (nMembers, repProv, repTier, repLongest, overridden) = out(cid)
      assert(nMembers == ms.size.toLong)
      val provPick = ms.minBy { case (id, t, nc) => (t, -nc, id) }
      val longPick = ms.minBy { case (id, _, nc) => (-nc, id) }
      assert(repProv == provPick._1, s"cluster $cid provenance pick")
      assert(repTier == provPick._2)
      assert(repLongest == longPick._1, s"cluster $cid longest pick")
      assert(overridden == (repProv != repLongest))
    }
    // the fixture must actually exercise the policy: at least one
    // cluster where provenance overrode length, and at least one where
    // the two rules agree
    val flags = out.values.map(_._5).toSet
    assert(flags == Set(true, false), s"override flags seen: $flags")
  }

  test("p100: slice counts, per-term sign, and the psi fold reconcile") {
    val rows = run("p100_embedding_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._1).sorted.toSeq ==
      (0L until Pipeline.KmeansK).toSeq)
    // every vector is assigned exactly one cell, so the slice totals
    // must equal direct counts over the embeddings table
    val ids = Tables.embeddings(spark, Sf01).select("vec_id").collect()
      .map(_.getLong(0))
    assert(rows.map(_._2).sum == ids.count(_ % 7 != 0))
    assert(rows.map(_._3).sum == ids.count(_ % 5 != 0))
    // PSI terms are (p-q)*log(p/q): nonnegative cell by cell
    rows.foreach { case (cell, _, _, term, _) =>
      assert(term >= -1e-9, s"cell $cell term $term negative")
    }
    // one psi for the whole table, equal to the term sum up to rounding
    assert(rows.map(_._5).distinct.length == 1)
    assert(math.abs(rows.head._5 - rows.map(_._4).sum) < 1e-4)
  }

  test("p101: the matrix partitions the pair graph by source pair") {
    val srcOf = Tables.documents(spark, Sf01)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = run("p02_minhash_neardup").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs
      .map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = run("p101_source_mirror").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.view.mapValues(_._1).toMap == expect)
    assert(out.values.map(_._1).sum == pairs.length.toLong)
    out.foreach { case ((a, b), (_, cross)) =>
      assert(a <= b, "unordered pair not canonicalized")
      assert(cross == (a != b))
    }
  }

  test("p104: candidates stay within Hamming radius 1 of the probe bucket") {
    // recompute the Charikar bucket from the same declared hyperplanes,
    // with vdot's exact arithmetic (float→double products, array-order sum)
    val planes = (0 until Pipeline.AnnBits).map(Pipeline.hyperplaneSigns)
    val bucketOf = Tables.embeddings(spark, Sf01)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        r.getLong(0) -> planes.map { pl =>
          var acc = 0.0
          var i = 0
          while (i < v.length) { acc += v(i).toDouble * pl(i).toDouble; i += 1 }
          if (acc >= 0) '1' else '0'
        }.mkString
      }.toMap
    val rows = run("p104_ann_multiprobe").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (p, v) =>
      val dist = bucketOf(p).zip(bucketOf(v)).count { case (a, b) => a != b }
      assert(dist <= 1, s"probe $p matched $v at Hamming distance $dist")
    }
  }

  test("signBucket enforces the 64-dim non-null contract loudly") {
    import spark.implicits._
    // on contract: a clean 64-dim vector gets a 4-char '0'/'1' bucket
    val good = Seq((7L, Array.fill(Pipeline.AnnDim)(0.5f)))
      .toDF("vec_id", "v")
      .select(Pipeline.signBucket(col("v"), Pipeline.AnnBits).as("b"))
      .head().getString(0)
    assert(good.length == Pipeline.AnnBits && good.forall("01".contains(_)))
    // off contract, both ways VectorDot goes NULL: wrong length, and a
    // NULL element — the silent path would emit an all-'0' bucket on
    // Spark while DuckDB signs a partial dot; both must RAISE instead
    val short = Seq((8L, Array.fill(Pipeline.AnnDim - 1)(0.5f)))
      .toDF("vec_id", "v")
    val holed = spark.range(1).select(col("id").as("vec_id"),
      expr(s"transform(sequence(1, ${Pipeline.AnnDim}), i -> " +
        "CASE WHEN i = 7 THEN CAST(NULL AS FLOAT) " +
        "ELSE CAST(0.5 AS FLOAT) END)").as("v"))
    for (bad <- Seq(short, holed)) {
      val e = intercept[Throwable] {
        bad.select(Pipeline.signBucket(col("v"), Pipeline.AnnBits))
          .collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++
          messages(t.getCause)
      assert(messages(e).exists(_.contains("non-null contract")),
        s"expected the loud contract error, got $e")
    }
  }

  test("p104/p72: multi-probe recall dominates single-bucket, per probe") {
    // structural monotonicity (superset candidates can only improve the
    // top-k under the shared global sim order) plus the measured lift
    // this corpus actually shows — the number PLANS.md records
    val r72 = run("p72_ann_recall").collect()
      .map(r => (r.getAs[Double]("recall_lsh"), r.getAs[Double]("recall_mp"),
        r.getAs[Double]("recall_ivf")))
    r72.foreach { case (lsh, mp, _) =>
      assert(mp >= lsh, s"multi-probe recall $mp below single-bucket $lsh")
    }
    val (mLsh, mMp) = (r72.map(_._1).sum / r72.size, r72.map(_._2).sum / r72.size)
    assert(mMp > mLsh, s"no measured lift: mp $mMp vs lsh $mLsh")
    // and per-rank sims can only improve when the candidate pool grows
    val p05sims = run("p05_ann_lsh_bucketed").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(3)).toMap
    val p104sims = run("p104_ann_multiprobe").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(3)).toMap
    p05sims.foreach { case (key, s05) =>
      assert(p104sims(key) >= s05 - 1e-9,
        s"rank $key sim regressed: ${p104sims(key)} < $s05")
    }
  }

  test("p105: steps are a permutation, batches bounded, order portable") {
    val docs = Tables.documents(spark, Sf01)
    val n = docs.count()
    val out = run("p105_training_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the step column is exactly 0..N-1, each doc once
    assert(out.length.toLong == n)
    assert(out.map(_._2).sorted.toSeq == (0L until n).toSeq)
    // batches are step div B: contiguous, ≤B docs each
    out.foreach { case (_, step, batch) =>
      assert(batch == step / Pipeline.OrderBatch)
    }
    // the order is partition-INDEPENDENT: feeding the same docs through
    // any physical layout yields the identical (doc_id -> step) map —
    // the reproducibility claim rand()/zipWithIndex cannot make
    val rep = Pipeline.trainingOrderOf(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rep == out.map(t => (t._1, t._2)).toMap)
  }

  test("p107: both strategies conserve tokens; sorting never pads more") {
    val rows = run("p107_padding_audit").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val (aB, aT, aP, aW) = rows("arrival")
    val (sB, sT, sP, sW) = rows("length_sorted")
    // the batch layout never changes WHAT is trained on
    assert(aB == sB && aT == sT, "strategies disagree on corpus size")
    // length-sorting minimizes per-batch max spread: never more padding
    assert(sP <= aP, s"sorted padding $sP exceeds arrival $aP")
    assert(sW <= aW)
    // and each waste fraction replays from its own exact integers
    assert(aW == (aP * 1000000L / (aP + aT)).toDouble / 1e6)
    assert(sW == (sP * 1000000L / (sP + sT)).toDouble / 1e6)
    // this corpus actually shows the win the op exists to measure
    assert(sP < aP, "fixture shows no measurable sorting win")
  }

  test("p108: the novelty curve replays exactly from driver-side sets") {
    val docs = Tables.documents(spark, Sf01)
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).split(" ", -1)
        r.getLong(0) -> (0 to t.length - Pipeline.ContamW)
          .map(i => t.slice(i, i + Pipeline.ContamW).mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty).sortBy(_._1)
    val m = docs.map(_._1).max + 1
    val firstOf = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (id, gs) =>
      gs.foreach(g => if (!firstOf.contains(g)) firstOf(g) = id)
    }
    val expect = docs
      .flatMap { case (id, gs) =>
        gs.toSeq.map(g => (id * 10 / m, firstOf(g) == id)) }
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.count(_._2).toLong)).toMap
    val out = run("p108_novelty_curve").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.view.mapValues(v => (v._1, v._2)).toMap == expect)
    // every distinct gram is novel exactly once, corpus-wide
    assert(out.values.map(_._2).sum == firstOf.size.toLong)
    // the ppm fraction replays from the integers
    out.foreach { case (dec, (g, nv, f)) =>
      assert(f == (nv * 1000000L / g).toDouble / 1e6, s"decile $dec")
    }
    // and the curve actually declines on this corpus: the first decile
    // is all-novel, the last is not
    assert(out(0L)._3 == 1.0 && out(9L)._3 < 1.0)
  }

  test("p109: the release census conserves and drops exactly p92's docs") {
    val rows = run("p109_decontam_release").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (bD, bT) = rows("train_before")
    val (aD, aT) = rows("train_after")
    val (dD, dT) = rows("dropped")
    assert(bD == aD + dD && bT == aT + dT, "census does not conserve")
    // dropped docs are exactly the p92-flagged set
    assert(dD == run("p92_decontaminate").count())
    // and the before census is the true train slice
    val train = Tables.documents(spark, Sf01)
      .filter(col("doc_id") % 29 =!= 7)
    assert(bD == train.count())
    assert(dD > 0, "fixture shows no contamination to act on")
  }

  test("p110: every health row reconciles against its source monitor") {
    val rows = run("p110_health_report").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getBoolean(3))))
      .toMap
    assert(rows.size == 10)
    assert(rows("feed_anomaly_cells")._1.get ==
      run("p84_hourly_anomaly").count().toDouble)
    assert(rows("lexical_contam_docs")._1.get ==
      run("p92_decontaminate").count().toDouble)
    assert(rows("semantic_contam_docs")._1.get ==
      run("p126_semantic_decontam").count().toDouble)
    assert(rows("substring_contam_docs")._1.get ==
      run("p133_substring_contam").agg(
        sum(col("verbatim_leak").cast("long")))
        .collect().head.getLong(0).toDouble)
    assert(rows("cusum_drift_alarms")._1.get ==
      run("p122_cusum_drift").agg(sum(col("alarm")))
        .collect().head.getLong(0).toDouble)
    assert(rows("psi_window_alarms")._1.get ==
      run("p124_psi_baseline_drift").agg(
        sum(when(col("level") >= 1, 1L).otherwise(0L)))
        .collect().head.getLong(0).toDouble)
    assert(rows("source_drift_psi_max")._1.get ==
      run("p81_source_drift_psi").agg(max(col("psi")))
        .collect().head.getDouble(0))
    assert(rows("dedup_index_recall")._1.get ==
      run("p93_dedup_recall").select("recall").collect().head.getDouble(0))
    assert(rows("index_orphans")._1.get ==
      run("p87_ref_integrity").agg(sum(col("n_orphans")))
        .collect().head.getLong(0).toDouble)
    // alarm logic: higher-is-bad checks fire above threshold, the
    // recall check fires below
    rows.foreach { case (check, (v, th, alarm)) =>
      val expected =
        if (check == "dedup_index_recall") v.map(_ < th) else v.map(_ > th)
      assert(alarm == expected, s"$check alarm")
    }
  }

  test("p102: every card section reconciles against its source query") {
    val card = run("p102_dataset_card").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    val docs = Tables.documents(spark, Sf01)
    val nDocs = docs.count()
    assert(card(("corpus", "n_docs"))._1 == nDocs)
    assert(card(("corpus", "n_chars"))._1 ==
      docs.agg(sum("n_chars")).collect().head.getLong(0))
    // shares: one row per value, fractions sum to ~1
    val langRows = card.filter(_._1._1 == "lang")
    assert(langRows.values.map(_._1).sum == nDocs)
    assert(math.abs(langRows.values.flatMap(_._2).sum - 1.0) < 1e-4)
    val srcRows = card.filter(_._1._1 == "source")
    assert(srcRows.size.toLong == card(("corpus", "n_sources"))._1)
    assert(srcRows.values.map(_._1).sum == nDocs)
    // dedup sections agree with the operators they summarize
    assert(card(("dedup", "near_dup_docs"))._1 ==
      run("p32_dup_clusters").count())
    assert(card(("dedup", "near_dup_clusters"))._1 ==
      run("p32_dup_clusters").select("cluster_id").distinct().count())
    assert(card(("dedup", "exact_dup_docs"))._1 ==
      nDocs - docs.select(sha2(col("text"), 256)).distinct().count())
    // contamination row = p92's flagged-doc count
    assert(card(("contamination", "contaminated_docs"))._1 ==
      run("p92_decontaminate").count())
    // quality pass count replays the p23 gate members
    val qp = Pipeline.queries("p23_curation")(spark, Sf01)
    assert(card(("quality", "gate_pass"))._1 >= 0L)
    assert(card(("quality", "gate_pass"))._2.get ==
      math.rint(card(("quality", "gate_pass"))._1.toDouble / nDocs * 1e6) / 1e6)
    qp.count() // force the handle so a p23 regression fails loudly here
  }
}
