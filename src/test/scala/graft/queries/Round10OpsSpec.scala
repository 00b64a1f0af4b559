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
    // independent ground truth: exact shingle-set Jaccard over the
    // even-id sample, computed with plain Scala sets
    val docs = Tables.documents(spark, Sf01)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> {
        val t = r.getString(1).split(" ", -1)
        (0 to t.length - Pipeline.ShingleW)
          .map(i => t.slice(i, i + Pipeline.ShingleW).mkString(" ")).toSet
      }).toMap
    val ids = docs.keys.toSeq.sorted
    val expectTrue = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
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
}
