package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pathological-corpus contract of the LSH bucket cap: a spam
  * cluster far larger than MaxBucket (1000 docs of one template) must
  * neither blow up pair generation (cap² fan-out) nor poison the rest
  * of the corpus — the hot bucket is dropped, the honest near-dups
  * elsewhere still surface. */
object HotClusterSpec {
  val HotCopies = 2500

  lazy val dir: String = {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val d = Files.createTempDirectory("graft-hot").toString
    val spam = "congratulations winner click this link now to claim " +
      "your free prize today limited offer expires soon act fast"
    val honestA = "the library opens at nine and closes at five on " +
      "weekdays with extended hours during examination periods only"
    // one near-dup pair + a giant exact-template cluster
    val rows =
      Seq((0L, honestA, "en", "src0", honestA.length.toLong),
        (1L, honestA.replace(" only", " strictly"), "en", "src0",
          honestA.length.toLong)) ++
      (0 until HotCopies).map(k =>
        (100L + k, spam, "en", "spam", spam.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }
}

class HotClusterSpec extends SparkSpec {

  test("p02: the over-cap spam cluster is dropped, honest pairs survive") {
    val t0 = System.nanoTime()
    val pairs = Pipeline.queries("p02_minhash_neardup")(
      spark, HotClusterSpec.dir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    // the 2500-doc template cluster would emit ~3.1M pairs un-capped;
    // with the cap its buckets are dropped wholesale
    assert(!ids.exists(_ >= 100L), s"spam cluster leaked: $ids")
    assert(ids == Set(0L, 1L), s"honest near-dup pair lost: $ids")
    // and the run stays in the seconds range, not a pair explosion
    assert(secs < 60.0, f"p02 took $secs%.1f s on the hot corpus")
  }

  test("p55: graph analysis inherits the cap (no quadratic edge list)") {
    val rows = Pipeline.queries("p55_dup_graph_hops")(
      spark, HotClusterSpec.dir).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L))
    rows.foreach(r => assert(r.getLong(1) == 1L && r.getLong(2) == 1L))
  }
}
