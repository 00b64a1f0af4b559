package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.Portable

/** Round-10 operator semantics: p92 benchmark decontamination. */
class Round10OpsSpec extends SparkSpec {

  private def run(name: String) = Pipeline.queries(name)(spark, sf)

  // sf0.001's 50-doc slice happens to have NO cross-slice 8-gram overlap
  // (checked with DuckDB); the reconcile needs the sf0.01 corpus, where
  // four train docs genuinely overlap the mod-29 eval slice
  private val Sf01 = "/root/testdata/sf0.01"

  test("p92: overlap counts reconcile against a direct per-doc intersect") {
    val rows = Pipeline.queries("p92_decontaminate")(spark, Sf01).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // invariants: only train docs, only real hits, fraction consistent
    rows.foreach { case (id, (n, c, f)) =>
      assert(id % 29 != 7, s"eval doc $id reported as train")
      assert(c >= 1 && c <= n, s"doc $id: $c of $n")
      assert(math.abs(f - c.toDouble / n) < 1e-6)
    }
    // direct recomputation with independent DataFrame algebra: distinct
    // 8-gram sets per doc, eval set = union over the mod-29 slice
    val docs = Tables.documents(spark, Sf01).select(col("doc_id"),
      Portable.shingles(Portable.tokens(col("text")), Pipeline.ContamW)
        .as("gs"))
    val evalSet = docs.filter(col("doc_id") % 29 === 7)
      .select(explode(col("gs")).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val expect = docs.filter(col("doc_id") % 29 =!= 7)
      .collect().map { r =>
        val gs = r.getSeq[String](1).distinct
        r.getLong(0) -> (gs.size.toLong, gs.count(evalSet).toLong)
      }
      .filter(_._2._2 > 0).toMap
    assert(rows.view.mapValues(v => (v._1, v._2)).toMap == expect)
    assert(rows.nonEmpty, "fixture produced no contamination at all")
  }

  test("p93: recall reconciles against a driver-side exact ground truth") {
    val row = Pipeline.queries("p93_dedup_recall")(spark, Sf01).collect()
    assert(row.length == 1)
    val r = row.head
    val (nTrue, nFound, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nHit <= math.min(nTrue, nFound))
    // independent ground truth: exact shingle-set Jaccard, anchored on
    // the fixed-size sample (doc_id ≡ 0 mod D; the 500-doc fixture
    // floors D at 2), computed with plain Scala sets — a pair counts
    // when AT LEAST ONE endpoint is sampled
    val dMod = math.max(2L,
      (Tables.documents(spark, Sf01).count() +
        Pipeline.DedupSampleTarget - 1) / Pipeline.DedupSampleTarget)
    val docs = Tables.documents(spark, Sf01)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> {
        val t = r.getString(1).split(" ", -1)
        (0 to t.length - Pipeline.ShingleW)
          .map(i => t.slice(i, i + Pipeline.ShingleW).mkString(" ")).toSet
      }).toMap
    val ids = docs.keys.toSeq.sorted
    val expectTrue = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if ids(i) % dMod == 0 || ids(j) % dMod == 0
      a = docs(ids(i)); b = docs(ids(j))
      inter = (a & b).size
      if a.nonEmpty && b.nonEmpty &&
        inter.toDouble / (a.size + b.size - inter) >= Pipeline.JaccardThreshold
    } yield 1).size
    assert(nTrue.toInt == expectTrue, s"truth side: $nTrue vs $expectTrue")
    // the verify stage makes the index precise by construction; at the
    // current tuning the sample loses nothing, so recall is 1.0 too —
    // if this decays after a parameter change, that is the op WORKING
    assert(r.getDouble(4) == 1.0 && nFound > 0)
  }

  test("p92: an empty eval slice yields an empty (not failing) report") {
    // the mini corpus has doc_ids 0-4 only, so the mod-29 eval slice is
    // empty and nothing can be contaminated
    val mini = PipelineMiniSpec.dir
    assert(Pipeline.queries("p92_decontaminate")(spark, mini).count() == 0)
  }

  test("p94: census reconciles against a full driver-side replay") {
    val out = Pipeline.queries("p94_semdedup_prune")(spark, Sf01)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out.values.foreach { case (m, k, dr) =>
      assert(m == k + dr && k >= 1, "every cell keeps its top member")
    }
    assert(out.values.map(_._3).sum > 0, "fixture never exercises a drop")
    // independent replay in plain Scala: quantize -> 2 Lloyd rounds ->
    // pairwise-greedy prune, all with the operator's exact arithmetic
    val em = graft.Tables.embeddings(spark, Sf01)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val dims = em.head._2.length
    val mn = Array.tabulate(dims)(i => em.map(_._2(i)).min)
    val mx = Array.tabulate(dims)(i => em.map(_._2(i)).max)
    val qv = em.map { case (id, v) =>
      id -> Array.tabulate(dims) { i =>
        if (mx(i) == mn(i)) 0L
        else math.min(127L,
          math.floor((v(i) - mn(i)) * 255.0 / (mx(i) - mn(i))).toLong - 128L)
      }
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def assign(cents: Map[Long, Array[Long]]): Map[Long, (Long, Long)] =
      qv.map { case (id, q) =>
        val (cell, dd) = cents.toSeq
          .map { case (c, cv) => (c, d2(q, cv)) }
          .minBy { case (c, dd) => (dd, c) }
        id -> (cell, dd)
      }
    var cents = qv.filter(_._1 < 8).map { case (id, q) => id -> q }
    val a1 = assign(cents)
    cents = a1.groupBy(_._2._1).map { case (cell, ms) =>
      val qs = ms.keys.toSeq.map(qv)
      cell -> Array.tabulate(dims)(i =>
        Math.floorDiv(qs.map(_(i)).sum, qs.size.toLong))
    }
    val a2 = assign(cents)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val byCell = a2.toSeq.groupBy(_._2._1)
    val dropped = a2.keys.filter { id =>
      val (cell, dd) = a2(id)
      byCell(cell).exists { case (o, (_, odd)) =>
        o != id && {
          val dt = dot(qv(id), qv(o))
          dt > 0 && 10000L * dt * dt >= 2025L * dot(qv(id), qv(id)) *
            dot(qv(o), qv(o))
        } && (odd > dd || (odd == dd && o < id))
      }
    }.toSet
    val expect = a2.toSeq.groupBy(_._2._1).map { case (cell, ms) =>
      val ids = ms.map(_._1)
      cell -> (ids.size.toLong, ids.count(!dropped(_)).toLong,
        ids.count(dropped).toLong)
    }
    assert(out == expect)
  }

  test("p94: dims beyond the exact-int64 envelope fail loudly, not silently") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-p94-wide").toString
    Seq.tabulate(2)(i => (i.toLong, Seq.fill(1793)(0.5f + i), i))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val ex = intercept[Throwable] {
      Pipeline.queries("p94_semdedup_prune")(spark, d).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("envelope"), s"wrong failure: $msgs")
  }

  test("p95: fertility reconciles against a canonical driver-side BPE") {
    val rows = Pipeline.queries("p95_tokenizer_fertility")(spark, Sf01)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent replay: canonical trainer + leftmost-non-overlapping
    // merge application, per-lang and corpus-wide
    val wl = graft.Tables.documents(spark, Sf01)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1)
        .filter(_.matches("[a-z]{2,}")).map(w => (r.getString(0), w)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((l, w), f) => (l, w, f) }
    def trainApply(words: Seq[(String, Long)]): Map[String, Int] = {
      var syms = words.map { case (w, f) => (w, w.split("").toList, f) }
      for (_ <- 1 to 3) {
        val counts = scala.collection.mutable
          .Map.empty[(String, String), Long]
        for ((_, l, f) <- syms; Seq(x, y) <- l.sliding(2) if l.length >= 2)
          counts((x, y)) = counts.getOrElse((x, y), 0L) + f
        if (counts.nonEmpty) {
          val ((a, b), _) = counts.toSeq
            .minBy { case ((x, y), n) => (-n, x, y) }
          syms = syms.map { case (w, l, f) =>
            (w, l.tail.foldLeft(List(l.head)) { (acc, x) =>
              if (acc.last == a && x == b) acc.init :+ (a + b) else acc :+ x
            }, f)
          }
        }
      }
      syms.map { case (w, l, _) => w -> l.length }.toMap
    }
    val global = trainApply(wl.groupBy(_._2).toSeq
      .map { case (w, g) => (w, g.map(_._3).sum) })
    val expect = wl.groupBy(_._1).map { case (lang, g) =>
      val own = trainApply(g.map { case (_, w, f) => (w, f) })
      lang -> (g.map(_._3).sum,
        g.map { case (_, w, f) => f * w.length }.sum,
        g.map { case (_, w, f) => f * global(w) }.sum,
        g.map { case (_, w, f) => f * own(w) }.sum)
    }
    assert(rows == expect)
    rows.values.foreach { case (occ, chars, g, own) =>
      assert(own <= chars && g <= chars && occ > 0)
    }
  }

  test("p97: the sample replays exactly from a driver-side E-S computation") {
    val got = Pipeline.queries("p97_weighted_sample")(spark, Sf01)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toList.sortBy(_._1)
    // independent replay: portable hash + piecewise-linear log2 +
    // IEEE division, all in plain Scala
    def qlog2(x: Long): Long = {
      val m = java.lang.Long.toBinaryString(x).length.toLong
      val p = 1L << (m - 1)
      val a = x * 65536L
      (m - 1) * 65536L + (a - a % p) / p - 65536L
    }
    val scored = graft.Tables.documents(spark, Sf01)
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val w = math.max(1L, r.getString(2).split(" ", -1).length.toLong)
        val h32 = graft.functions.Hash60Impl.h60(
          s"wsample:${r.getLong(0)}".getBytes("UTF-8")) % 4294967296L
        (r.getLong(0), r.getString(1), w,
          (2097152L - qlog2(h32 + 1)).toDouble / w)
      }
    val expect = scored.sortBy { case (id, _, _, p) => (p, id) }
      .take(64).zipWithIndex
      .map { case ((id, l, w, _), i) => (i + 1, id, l, w) }.toList
    assert(got == expect)
    // the weighting is live: long docs are overrepresented vs the corpus
    val corpusMean = scored.map(_._3).sum.toDouble / scored.length
    val sampleMean = got.map(_._4).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("p98: the cluster split leaks zero pairs while the doc baseline leaks") {
    val rows = Pipeline.queries("p98_leakage_free_split")(spark, Sf01)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byMethod = rows.groupBy(_._1)
    assert(byMethod.keySet == Set("doc_hash", "cluster_hash"))
    // the audit columns: cluster split CANNOT leak; the baseline does
    // (this corpus has cross-bucket near-dup pairs — if it ever stops
    // leaking, the fixture no longer demonstrates the fix)
    assert(byMethod("cluster_hash").forall(_._5 == 0L))
    assert(byMethod("doc_hash").map(_._5).distinct.length == 1 &&
      byMethod("doc_hash").head._5 > 0L)
    // both methods partition the same corpus
    val nDocs = graft.Tables.documents(spark, Sf01).count()
    byMethod.values.foreach { g =>
      assert(g.map(_._3).sum == nDocs)
    }
    // independent straddle audit: join the op's own pair source against
    // cluster assignments derived from p32 and recompute zero leakage
    val cl = Pipeline.queries("p32_dup_clusters")(spark, Sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def split(id: Long): Long = {
      val h = graft.functions.Hash60Impl.h60(s"split:$id".getBytes("UTF-8"))
      h % 10
    }
    val pairs = Pipeline.queries("p02_minhash_neardup")(spark, Sf01)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      val (ca, cb) = (cl.getOrElse(a, a), cl.getOrElse(b, b))
      assert(split(ca) == split(cb),
        s"pair ($a,$b) straddles cluster splits")
    }
    assert(pairs.nonEmpty)
  }

  test("p96: a separable mini grades voted pairs and unvoted singletons") {
    // mini cells (IVF centroids = vec_id < 16): every centroid is its
    // own cell, vec 16 joins vec 2's cell -> the only voting pair is
    // {2, 16}, both label 1; vecs 0, 1, 3 are alone in their cells
    val rows = Pipeline.queries("p96_knn_label_eval")(
      spark, PipelineMiniSpec.dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(rows == Map(
      0 -> (2L, 0L, 0L, None),
      1 -> (2L, 2L, 2L, Some(1.0)),
      2 -> (1L, 0L, 0L, None)))
  }
}
