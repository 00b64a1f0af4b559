package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable.{h60, h60String}

class Hash60Spec extends SparkSpec {
  import spark.implicits._

  test("native hash60 equals the conv/substring form on real corpus text") {
    // every shingle of every sf0.001 document — thousands of distinct
    // strings, including unicode-free and punctuation-heavy ones
    val words = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("s"))
      .union(graft.Tables.documents(spark, sf).select(col("text").as("s")))
    val mismatches = words
      .select(col("s"), h60(col("s")).as("a"), h60String(col("s")).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(mismatches == 0L)
  }

  test("native hash60 equals the string form on edge-case literals") {
    val edge = Seq("", " ", "a", "éü世界", "0", ":",
      "a" * 1000).toDF("s")
    val rows = edge
      .select(h60(col("s")).as("a"), h60String(col("s")).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null input yields null") {
    val r = Seq(Some("x"), None).toDF("s")
      .select(h60(col("s")).as("a")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }

  test("hash60 is callable from SQL and matches the Column API") {
    Seq("alpha beta").toDF("s").createOrReplaceTempView("h60_in")
    val viaSql = spark.sql("SELECT hash60(s) FROM h60_in").head.getLong(0)
    val viaCol = Seq("alpha beta").toDF("s").select(h60(col("s")))
      .head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("both codegen paths agree (wholestage on and off)") {
    val df = Seq("alpha", "beta gamma", "x").toDF("s")
    def vals(codegen: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(h60(col("s"))).collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(vals("false") == vals("true"))
  }
}
