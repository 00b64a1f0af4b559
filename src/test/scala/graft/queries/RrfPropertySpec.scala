package graft.queries

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** The whole hybrid-retrieval pipeline (p127's rrfFusedTopDocs: bigram
  * BM25 + exact cosine ANN + exact-int64 RRF fusion) against an
  * INDEPENDENT driver-side reference on generated corpora — the
  * MiniSqlSemanticsPropertySpec discipline applied to retrieval. The
  * generator plants the corner shapes the gate corpus never carries:
  * duplicated probe texts, empty texts, all-equal embeddings, and
  * ZERO-NORM vectors. Writing this spec flushed out a real crash: the
  * raw `round(dot/den, 6)` cosine hit Spark 4's ANSI DIVIDE_BY_ZERO on
  * any zero-norm vector. The pinned convention is now [[graft
  * .functions.VectorDot.cos6]]: zero denominator → NULL sim → ranks
  * LAST under (sim DESC NULLS LAST, doc ASC) — which is EXACTLY what
  * DuckDB computes natively (x/0.0 IS NULL, DESC collates NULLs last),
  * so the engines agree even on zero-norm corpora. */
object RrfPropertySpec extends Properties("RrfFusion") {

  // each case runs the full multi-stage retrieval query; keep it lean
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val S = 65536L
  private val TermNum = 22L * S / 10L // the query path's ⌊2.2·2^16⌋

  private def qlog2(x: Long): Long = {
    val m = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (m - 1) * S + (x * S) / (1L << (m - 1)) - S
  }

  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Rank key for (sim DESC NULLS LAST, doc ASC): −0.0 ≡ 0.0 (Spark's
    * double comparison), NULL (zero-norm cosine) below every real
    * cosine. */
  private def sortKey(s: Option[Double]): Double = s match {
    case None => -2.0 // cosines are ≥ −1: NULL ranks last
    case Some(v) => if (v == 0.0) 0.0 else v
  }

  /** Independent reference of the full pipeline. Returns the exact
    * row set rrfFusedTopDocs must produce. */
  private def reference(docs: Seq[(Long, String)],
      vecs: Seq[(Long, Seq[Float])], probeMax: Long, k: Int)
      : Set[(Long, Long, Int, Long, Int, Int)] = {
    // ---- BM25 branch (scaled-integer Okapi over word bigrams) ----
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val tf: Map[(Long, String), Long] = toks.flatMap { case (id, ts) =>
      if (ts.length < 2) Nil
      else (0 until ts.length - 1).map(i => (id, s"${ts(i)} ${ts(i + 1)}"))
    }.groupBy(identity).map { case (key, v) => key -> v.size.toLong }
    val dl: Map[Long, Long] =
      tf.toSeq.groupBy(_._1._1).map { case (d, v) => d -> v.map(_._2).sum }
    val dDocs = dl.size.toLong
    val tToks = dl.valuesIterator.sum
    val df: Map[String, Long] =
      tf.keys.toSeq.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val bmScores: Map[(Long, Long), Long] = (for {
      ((probe, token), _) <- tf.iterator if probe < probeMax
      if df(token) * 20 <= dDocs
      idfQ = qlog2(dDocs + 1) - qlog2(df(token))
      ((doc, tok2), tfv) <- tf.iterator
      if tok2 == token && doc != probe
    } yield {
      val r = dl(doc) * S * dDocs / tToks
      val den = tfv * S + (3L * S + 9L * r) / 10L
      ((probe, doc), idfQ * tfv * TermNum / den)
    }).toSeq.groupBy(_._1).map { case (key, v) => key -> v.map(_._2).sum }
    val bmRank: Map[(Long, Long), Int] = bmScores.toSeq
      .groupBy(_._1._1).flatMap { case (_, rows) =>
        rows.sortBy { case ((_, doc), s) => (-s, doc) }.take(k)
          .zipWithIndex.map { case ((key, _), i) => key -> (i + 1) }
      }
    // ---- ANN branch (cosine + round 6, NaN-first desc rank) ----
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val annRank: Map[(Long, Long), Int] = vecs
      .collect { case (p, pv) if p < probeMax =>
        val pn = math.sqrt(dot(pv, pv))
        val sims = vecs.collect { case (d, v) if d != p =>
          val den = pn * math.sqrt(dot(v, v))
          d -> (if (den == 0.0) None else Some(round6(dot(pv, v) / den)))
        }
        p -> sims.sortBy { case (d, s) => (-sortKey(s), d) }
          .take(k).map(_._1)
      }
      .flatMap { case (p, ds) =>
        ds.zipWithIndex.map { case (d, i) => (p, d) -> (i + 1) } }
      .toMap
    // ---- exact-int64 RRF fusion ----
    val rrfK = 60L
    val scale = Pipeline.RrfScale
    def term(r: Int): Long = if (r > 0) scale / (rrfK + r) else 0L
    (bmRank.keySet ++ annRank.keySet).groupBy(_._1).flatMap {
      case (p, keys) =>
        keys.toSeq
          .map { key =>
            val (b, a) = (bmRank.getOrElse(key, 0), annRank.getOrElse(key, 0))
            (key._2, term(b) + term(a), b, a)
          }
          .sortBy { case (doc, q, _, _) => (-q, doc) }
          .take(k).zipWithIndex
          .map { case ((doc, q, b, a), i) => (p, doc, i + 1, q, b, a) }
    }.toSet
  }

  // ---- corpus generator: the corner shapes the gate corpus lacks ----
  // 40-48 docs so the df·20 ≤ D impact filter sits right AT its
  // boundary for df = 2 phrases (admitted iff the corpus is big
  // enough) — both filter branches exercise.
  private val corpusGen: Gen[(List[(Long, String)],
      List[(Long, Seq[Float])], Long)] = for {
    n <- Gen.chooseNum(40, 48)
    probeMax <- Gen.chooseNum(1L, 3L)
    empt <- Gen.listOfN(n, Gen.frequency(9 -> false, 1 -> true))
    fill <- Gen.listOfN(n, Gen.chooseNum(1, 6))
    nP <- Gen.chooseNum(1, 4)
    plants <- Gen.listOfN(nP, Gen.listOfN(3, Gen.chooseNum(0, n - 1)))
    dupOn <- Gen.oneOf(true, false)
    dupTarget <- Gen.chooseNum(1, n - 1)
    vs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.listOfN(4, Gen.oneOf(-1f, -0.5f, 0f, 0.5f, 1f, 2f)),
      1 -> Gen.const(List(0f, 0f, 0f, 0f)), // zero-norm: NaN cosine
      1 -> Gen.const(List(1f, 1f, 1f, 1f)))) // shared: tie ranks
  } yield {
    val texts = Array.tabulate(n) { i =>
      if (empt(i)) ""
      else (0 until fill(i)).map(j => s"u${i}x$j").mkString(" ")
    }
    plants.zipWithIndex.foreach { case (targets, kk) =>
      val phrase = s"p${kk}a p${kk}b p${kk}c p${kk}d"
      targets.distinct.foreach { t =>
        texts(t) = if (texts(t).isEmpty) phrase else s"${texts(t)} $phrase"
      }
    }
    if (dupOn) texts(dupTarget) = texts(0) // duplicated probe text
    ((0 until n).map(i => (i.toLong, texts(i))).toList,
      (0 until n).map(i => (i.toLong, vs(i).toSeq)).toList,
      probeMax)
  }

  property("fused top-k equals the independent reference on corpora " +
      "with dup probes, empty texts, tied and zero-norm vectors") =
    forAll(corpusGen) { case (docs, vecs, probeMax) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val got = Pipeline.rrfFusedTopDocs(
          docs.toDF("doc_id", "text"),
          vecs.toDF("vec_id", "v"),
          probeMax)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
          r.getInt(4), r.getInt(5)))
        .toSet
      val want = reference(docs, vecs, probeMax, Pipeline.Bm25TopK)
      if (got != want) println(
        s"MISMATCH\n got-want: ${(got -- want).toSeq.sorted}\n " +
          s"want-got: ${(want -- got).toSeq.sorted}")
      got == want
    }

  property("zero-norm probe: every cosine is NULL, ties break to doc " +
      "ids ascending (the pinned NULLS-LAST convention, crash-free)") = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, s"a$i b$i")).toList
    val vecs = (0L until 20L).map(i =>
      (i, if (i == 0L) Seq(0f, 0f, 0f, 0f) else Seq(1f, 0f, i.toFloat, 1f)))
      .toList
    val got = Pipeline.rrfFusedTopDocs(
        docs.toDF("doc_id", "text"),
        vecs.toDF("vec_id", "v"), probeMax = 1L)
      .collect()
      .map(r => (r.getLong(1), r.getInt(5))).toMap
    // no bigram survives df·20 ≤ D here (every bigram df=1), so the
    // fused list IS the ANN list: all sims NULL → docs 1..10 at ranks
    // 1..10 by the doc-asc tiebreak
    (1L to 10L).forall(d => got.get(d).contains(d.toInt)) &&
      got.size == 10
  }

  property("zero-norm DOC ranks behind every real similarity — " +
      "excluded from a full top-k (NULLS LAST, not NaN-first)") = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, s"a$i b$i")).toList
    // doc 5 is zero-norm; every other candidate has a real cosine
    val vecs = (0L until 20L).map(i =>
      (i, if (i == 5L) Seq(0f, 0f, 0f, 0f) else Seq(1f, 0f, i.toFloat, 1f)))
      .toList
    val got = Pipeline.rrfFusedTopDocs(
        docs.toDF("doc_id", "text"),
        vecs.toDF("vec_id", "v"), probeMax = 1L)
      .collect()
      .map(r => r.getLong(1)).toSet
    // 18 real candidates fill the top-10; the NULL-sim doc must not
    // appear (pre-fix it either crashed ANSI or topped the list NaN-first)
    got.size == 10 && !got.contains(5L)
  }
}
