package graft.queries

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Properties of the training-set assembly operators on arbitrary
  * corpora: chunking must reconstruct every document exactly, and
  * sharding must conserve tokens while respecting its packing bounds. */
object PipelinePropertySpec extends Properties("Pipeline") {

  // each case runs 1-2 distributed queries; keep the suite fast
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private val word: Gen[String] =
    Gen.chooseNum(0, 99).map(i => s"w$i")

  /** Docs with contiguous ids and 1..80 single-space-joined tokens —
    * the documents-table text contract. */
  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 12)
    texts <- Gen.listOfN(n,
      Gen.chooseNum(1, 80).flatMap(Gen.listOfN(_, word).map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("chunks reconstruct each document: strided concat = original") =
    forAll(docsGen) { docs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val chunks = Pipeline.chunkRows(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1)
      docs.forall { case (id, text) =>
        val cs = chunks(id).sortBy(_._2).map(_._3)
        // chunk c starts at token c*stride: the first 24 tokens of each
        // chunk plus the full final chunk rebuild the doc exactly
        val toks = cs.init.flatMap(_.split(" ").take(24)) ++
          cs.last.split(" ")
        toks.mkString(" ") == text &&
          // the final chunk is capped at 32 tokens; with no-new-token
          // starts suppressed, every non-final chunk is exactly full
          cs.last.split(" ").length <= 32 &&
          cs.init.forall(_.split(" ").length == 32)
      }
    }

  property("whole-doc packs conserve docs+tokens, never split, bound overflow") =
    forAll(docsGen, Gen.chooseNum(10L, 200L)) { (docs, budget) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val packs = Pipeline.packWholeDocs(docs.toDF("doc_id", "text"), budget)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(_._1)
      val tokLen = docs.map { case (_, t) => t.split(" ").length.toLong }
      val totalTokens = tokLen.sum
      val maxDoc = tokLen.max
      packs.map(_._3).sum == totalTokens &&
        packs.map(_._2).sum == docs.length.toLong &&
        // no-split bound: a pack holds docs STARTING inside its budget
        // span, so it exceeds the budget only by its last doc's tail
        packs.forall(_._3 < budget + maxDoc) &&
        packs.forall { case (pack, _, nTok, _, _, overflow) =>
          overflow >= 0 && overflow < maxDoc &&
            // overflow is exactly the tokens past the span end
            (overflow == 0 || nTok > 0) &&
            pack >= 0
        } &&
        // doc ranges of consecutive packs are contiguous: whole-doc
        // packing never reorders, drops, or duplicates a document
        packs.sliding(2).forall {
          case Array((_, _, _, _, lastA, _), (_, _, _, firstB, _, _)) =>
            firstB == lastA + 1
          case _ => true
        }
    }

  property("shards conserve tokens, stay in order, and respect bounds") =
    forAll(docsGen, Gen.chooseNum(10L, 200L)) { (docs, budget) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val shards = Pipeline.tokenShards(docs.toDF("doc_id", "text"), budget)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      val totalTokens = docs.map(_._2.split(" ").length.toLong).sum
      val maxDoc = docs.map(_._2.split(" ").length.toLong).max
      shards.map(_._3).sum == totalTokens &&
        shards.map(_._2).sum == docs.length.toLong &&
        // boundary-splitting bound: a shard exceeds the budget by less
        // than its boundary-crossing document
        shards.forall(_._3 < budget + maxDoc) &&
        // doc ranges of consecutive (non-empty) shards are contiguous:
        // packing never reorders or drops a doc
        shards.sliding(2).forall {
          case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
            firstB == lastA + 1
          case _ => true
        }
    }

  /** Word tables over a 3-letter alphabet: short words force heavy
    * pair collisions, equal-symbol runs, and count ties — the cases
    * where a non-canonical merge application would diverge. */
  private val wordTableGen: Gen[List[(String, Long)]] = for {
    n <- Gen.chooseNum(1, 25)
    ws <- Gen.listOfN(n, Gen.chooseNum(1, 8)
      .flatMap(Gen.listOfN(_, Gen.oneOf("a", "b", "c")).map(_.mkString)))
    fs <- Gen.listOfN(n, Gen.chooseNum(1L, 30L))
  } yield ws.distinct.zip(fs)

  /** Canonical single-threaded BPE trainer: overlapping adjacent-pair
    * counts, argmax by (count DESC, pair ASC), leftmost non-overlapping
    * merge application (scan-with-skip, equivalent to the seeded fold). */
  private def refBpe(words: List[(String, Long)], rounds: Int)
      : List[(Int, String, String, String, Long)] = {
    var syms = words.map { case (w, f) => (w.split("").toList, f) }
    val out = List.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((l, f) <- syms; Seq(x, y) <- l.sliding(2) if l.length >= 2)
        counts((x, y)) = counts.getOrElse((x, y), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toList
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((r, a, b, a + b, c))
        syms = syms.map { case (l, f) =>
          (l.tail.foldLeft(List(l.head)) { (acc, x) =>
            if (acc.last == a && x == b) acc.init :+ (a + b) else acc :+ x
          }, f)
        }
        r += 1
      }
    }
    out.result()
  }

  property("learned BPE merges = canonical trainer on arbitrary word tables") =
    forAll(wordTableGen) { words =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val got = Pipeline.bpeLearnMerges(words.toDF("w", "freq"), 3)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
        .sortBy(_._1).toList
      got == refBpe(words, 3)
    }

  property("per-key BPE merges = independent canonical trainers per key") =
    forAll(wordTableGen, wordTableGen) { (wsX, wsY) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val tagged = wsX.map { case (w, f) => ("x", w, f) } ++
        wsY.map { case (w, f) => ("y", w, f) }
      val got = Pipeline.bpeLearnMergesBy(tagged.toDF("g", "w", "freq"), 3)
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getString(3), r.getString(4), r.getLong(5)))
        .sortBy(t => (t._1, t._2)).toList
      val want = List("x" -> wsX, "y" -> wsY).flatMap { case (g, ws) =>
        refBpe(ws, 3).map { case (r, a, b, m, c) => (g, r, a, b, m, c) }
      }
      got == want
    }

  /** Per-probe proper rank lists for two retrieval systems: distinct
    * docs, contiguous ranks 1..n, n ≤ Bm25TopK — the contract both
    * rrfFuse inputs satisfy by construction. */
  private val rankListsGen
      : Gen[(List[(Long, Long, Int)], List[(Long, Long, Int)])] = for {
    nProbes <- Gen.chooseNum(1, 3)
    perProbe <- Gen.listOfN(nProbes, for {
      pool <- Gen.listOfN(30, Gen.chooseNum(10L, 45L)).map(_.distinct)
      nb <- Gen.chooseNum(0, math.min(Pipeline.Bm25TopK, pool.length))
      na <- Gen.chooseNum(0, math.min(Pipeline.Bm25TopK, pool.length))
    } yield (pool.take(nb), pool.reverse.take(na)))
  } yield {
    def rows(side: List[(Long, List[Long])]): List[(Long, Long, Int)] =
      side.flatMap { case (p, ds) =>
        ds.zipWithIndex.map { case (d, i) => (p, d, i + 1) }
      }
    val indexed = perProbe.zipWithIndex.map { case ((b, a), p) =>
      (p.toLong, b, a)
    }
    (rows(indexed.map { case (p, b, _) => p -> b }),
      rows(indexed.map { case (p, _, a) => p -> a }))
  }

  property("rrfFuse = the model RRF fold on arbitrary proper rank lists") =
    forAll(rankListsGen) { case (bmRows, annRows) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val got = Pipeline.rrfFuse(
          bmRows.toDF("probe_id", "doc_id", "bm25_rnk"),
          annRows.toDF("probe_id", "doc_id", "ann_rnk"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
          r.getInt(4), r.getInt(5)))
        .toSet
      val bm = bmRows.map(t => (t._1, t._2) -> t._3).toMap
      val ann = annRows.map(t => (t._1, t._2) -> t._3).toMap
      def term(r: Int): Long =
        if (r > 0) Pipeline.RrfScale / (Pipeline.RrfK + r) else 0L
      val want = (bm.keySet ++ ann.keySet).groupBy(_._1)
        .flatMap { case (p, ks) =>
          ks.toSeq.map { k =>
            val (b, a) = (bm.getOrElse(k, 0), ann.getOrElse(k, 0))
            (k._2, term(b) + term(a), b, a)
          }.sortBy { case (d, q, _, _) => (-q, d) }
            .take(Pipeline.Bm25TopK).zipWithIndex
            .map { case ((d, q, b, a), i) => (p, d, i + 1, q, b, a) }
        }.toSet
      got == want
    }
}
