package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SimHashFp]] and [[ShingleIdSet]] must be value-identical to the
  * explode/distinct/aggregate pipelines they replaced. */
class SimHashFpSpec extends SparkSpec {
  import spark.implicits._

  test("native simhash fingerprint equals the distinct+SimHashAgg form") {
    val native = graft.queries.Pipeline.queries("p03_simhash_fingerprint")(
      spark, sf)
    val agg = graft.queries.Pipeline.simhashFpAgg(spark, sf)
    assert(native.count() == agg.count())
    assert(native.exceptAll(agg).count() == 0L)
    assert(agg.exceptAll(native).count() == 0L)
  }

  test("native fingerprint handles edge-case texts like the agg form") {
    val docs = Seq(
      1L -> "one two",              // < w tokens: absent from both
      2L -> "a b c",
      3L -> "x  y  z",              // empty tokens between double spaces
      4L -> "dup dup dup dup dup",  // one distinct shingle
      5L -> "é 世界 ü ö é 世界 ü"
    ).toDF("doc_id", "text")
    val native = docs
      .select(col("doc_id"),
        SimHashFp.simhashFp(col("text"), 3).as("simhash"))
      .filter(col("simhash").isNotNull)
    val agg = docs
      .select(col("doc_id"), ShingleRows.shingleRows(col("text"), 3))
      .select(col("doc_id"), Portable.h60(col("shingle")).as("hv"))
      .dropDuplicates("doc_id", "hv")
      .groupBy("doc_id")
      .agg(SimHashAgg.simhashAgg(col("hv")).as("simhash"))
    assert(native.exceptAll(agg).count() == 0L)
    assert(agg.exceptAll(native).count() == 0L)
    assert(!native.select("doc_id").as[Long].collect().contains(1L))
  }

  test("shingle id set equals distinct h60 of shingle rows, sorted") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val native = docs
      .select(col("doc_id"),
        ShingleIdSet.shingleIdSet(col("text"), 3).as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), explode(col("st")).as("hv"))
    val decl = graft.queries.Pipeline.simhashFeatures(spark, sf)
    assert(native.count() == decl.count())
    assert(native.exceptAll(decl).count() == 0L)
    // and sortedness: the first slice element is the min id
    val rows = docs
      .select(ShingleIdSet.shingleIdSet(col("text"), 3).as("st"))
      .filter(col("st").isNotNull)
      .select(col("st"), array_min(col("st")).as("mn")).limit(50).collect()
    rows.foreach(r => assert(r.getSeq[Long](0).head == r.getLong(1)))
  }

  test("p03 plans with no exchange and no aggregate") {
    val plan = graft.queries.Pipeline.queries("p03_simhash_fingerprint")(
      spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Aggregate"), plan)
    // docsBalanced's deliberate rebalance repartition is the only
    // exchange allowed; no aggregation-driven exchange exists
    assert(plan.split("Exchange").length - 1 <= 1, plan)
  }
}
