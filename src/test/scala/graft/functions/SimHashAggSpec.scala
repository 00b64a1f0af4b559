package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SimHashAgg.simhashAgg

class SimHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("single feature: fingerprint is the feature's low 32 bits") {
    val hv = 0xDEADBEEFL & 0x7FFFFFFFFFFFFFFFL
    val fp = Seq((1L, hv)).toDF("doc_id", "hv")
      .groupBy("doc_id").agg(simhashAgg($"hv").as("fp"))
      .head.getLong(1)
    assert(fp == (hv & 0xFFFFFFFFL))
  }

  test("tied bits resolve to 1 (the >= 0 contract)") {
    // two features with complementary low bits: every counter is 0
    val fp = Seq((1L, 0x0F0F0F0FL), (1L, 0xF0F0F0F0L))
      .toDF("doc_id", "hv")
      .groupBy("doc_id").agg(simhashAgg($"hv").as("fp"))
      .head.getLong(1)
    assert(fp == 0xFFFFFFFFL)
  }

  test("matches the declarative explode form on the real mini corpus") {
    val native = graft.queries.Pipeline.queries("p03_simhash_fingerprint")(
      spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val explode = graft.queries.Pipeline.simhashFpExplode(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native.nonEmpty && native == explode)
  }

  test("partials merge correctly across many partitions") {
    val features = graft.queries.Pipeline.simhashFeatures(spark, sf)
    val onePart = features.coalesce(1)
      .groupBy("doc_id").agg(simhashAgg($"hv").as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val manyPart = features.repartition(29)
      .groupBy("doc_id").agg(simhashAgg($"hv").as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(onePart == manyPart)
  }

  test("null inputs are skipped; an all-null group packs to 0 like the explode form") {
    val fp = Seq((1L, Some(7L)), (1L, None), (2L, None))
      .toDF("doc_id", "hv")
      .groupBy("doc_id").agg(simhashAgg($"hv").as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp(1L) == 7L) // the one real feature wins every voted bit
    // the explode form's NULL votes fall through CASE to 0 — the input
    // counter distinguishes this from a genuine all-ties group
    assert(fp(2L) == 0L)
  }

  test("simhash_agg is callable from SQL via the session extension") {
    Seq((1L, 5L), (1L, 5L)).toDF("doc_id", "hv")
      .createOrReplaceTempView("shs_in")
    val fp = spark.sql(
      "SELECT doc_id, simhash_agg(hv) AS fp FROM shs_in GROUP BY doc_id")
      .head.getLong(1)
    assert(fp == 5L)
  }
}
