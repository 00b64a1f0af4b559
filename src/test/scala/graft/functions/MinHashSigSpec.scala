package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[MinHashSig]] must be value-identical to the declarative sketch it
  * replaced (`Pipeline.minhashSigOfDeclarative` — the literal shape of
  * the DuckDB oracle SQL): same surviving docs, same 12-min signature,
  * same distinct-shingle-id SET (orders differ by design: collect_set's
  * is engine-internal, the native form's is sorted), same n.
  */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("sig"),
      array_sort(col("shset")).as("shset"), col("n"))

  private def assertEqualSketch(docs: DataFrame): Unit = {
    val native = normalize(graft.queries.Pipeline.minhashSigOf(docs))
    val decl = normalize(graft.queries.Pipeline.minhashSigOfDeclarative(docs))
    assert(native.count() == decl.count())
    assert(native.exceptAll(decl).count() == 0L)
    assert(decl.exceptAll(native).count() == 0L)
  }

  test("native sketch equals the declarative explode+groupBy on real corpus") {
    assertEqualSketch(
      graft.Tables.documents(spark, sf).select("doc_id", "text"))
  }

  test("native sketch equals the declarative form on edge-case texts") {
    // < w tokens (dropped by both), exactly w, consecutive/leading/
    // trailing spaces (empty tokens kept by split-limit−1 semantics),
    // duplicate shingles, unicode
    val docs = Seq(
      1L -> "",
      2L -> "one two",
      3L -> "one two three",
      4L -> "a  b  c  d",
      5L -> " leading and trailing ",
      6L -> "x y x y x y x y",
      7L -> "é 世界 ü ö é 世界 ü",
      8L -> ("w " * 400).trim
    ).toDF("doc_id", "text")
    assertEqualSketch(docs)
    // docs 1 and 2 have < 3 tokens and must be absent
    val kept = graft.queries.Pipeline.minhashSigOf(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(2L) && kept.contains(3L))
  }

  test("null text yields no sketch row") {
    val docs = Seq((1L, Option("alpha beta gamma delta")), (2L, None))
      .toDF("doc_id", "text")
    val kept = graft.queries.Pipeline.minhashSigOf(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("shset is sorted-distinct and n matches; sig has NumHashes entries") {
    val rows = graft.queries.Pipeline.minhashSigOf(
      graft.Tables.documents(spark, sf).select("doc_id", "text"))
      .select(col("sig"), col("shset"), col("n")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sig = r.getSeq[Long](0)
      val shset = r.getSeq[Long](1)
      assert(sig.length == graft.queries.Pipeline.NumHashes)
      assert(shset == shset.sorted && shset.distinct == shset)
      assert(r.getInt(2) == shset.length)
    }
  }

  test("the sketch stage plans with no exchange and no aggregate") {
    // the point of the native form: map-only — scan → project → filter
    // (staging off so the checkpoint cut can't hide the plan under test)
    spark.conf.set("graft.stage.materialize", "none")
    try {
      val plan = graft.queries.Pipeline.minhashSigOf(
          graft.Tables.documents(spark, sf).select("doc_id", "text"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Aggregate"), plan)
    } finally spark.conf.unset("graft.stage.materialize")
  }
}
