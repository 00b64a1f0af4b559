package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra–Gries sketch aggregate: bounded state, mergeable partials, and
  * the structural guarantee that makes the two-phase heavy-hitter gate
  * (p70) exactly right — every item with frequency > n/(k+1) is in the
  * candidate set, on ANY partitioning of the input. */
class MgAggSpec extends SparkSpec {

  import spark.implicits._

  // skewed stream: token t_i appears i*i times, i = 1..40 (n = 22140)
  private def skewed = (1 to 40).flatMap(i => Seq.fill(i * i)(s"t$i"))

  test("guarantee: every item above n/(k+1) survives, any partitioning") {
    val n = skewed.size
    val k = 16
    val mustKeep = (1 to 40).filter(i => i * i > n / (k + 1)).map(i => s"t$i")
    assert(mustKeep.nonEmpty) // the test has teeth
    Seq(1, 7, 32).foreach { parts =>
      val cands = skewed.toDF("token").repartition(parts)
        .agg(MgAgg.mgAgg(col("token"), k))
        .head().getSeq[String](0).toSet
      assert(cands.size <= k, s"parts=$parts: ${cands.size} > k")
      mustKeep.foreach(t =>
        assert(cands.contains(t), s"parts=$parts lost guaranteed item $t"))
    }
  }

  test("all-distinct input yields at most k candidates and no false must") {
    val cands = (1 to 5000).map(i => s"u$i").toDF("token")
      .repartition(11)
      .agg(MgAgg.mgAgg(col("token"), 8))
      .head().getSeq[String](0)
    assert(cands.size <= 8)
  }

  test("nulls are ignored, empty input evaluates to an empty array") {
    val withNulls = Seq(Some("a"), None, Some("a"), None)
      .toDF("token")
      .agg(MgAgg.mgAgg(col("token"), 4)).head().getSeq[String](0)
    assert(withNulls == Seq("a"))
    val empty = Seq.empty[String].toDF("token")
      .agg(MgAgg.mgAgg(col("token"), 4)).head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("mg_sketch is SQL-registered with a literal-k contract") {
    skewed.toDF("token").createOrReplaceTempView("mg_in")
    val viaSql = spark.sql(s"SELECT mg_sketch(token, 16) FROM mg_in")
      .head().getSeq[String](0).toSet
    assert(viaSql.contains("t40"))
    val e = intercept[Exception] {
      spark.sql("SELECT mg_sketch(token, token) FROM mg_in").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("p70 equals the exact heavy-hitter set") {
    val out = graft.queries.Pipeline.queries("p70_heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toMap
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val exact = toks.groupBy("token").count()
      .filter(col("count") * 128 >= n)
      .as[(String, Long)].collect().toMap
    assert(exact.nonEmpty, "threshold too high to exercise the gate")
    assert(out == exact)
  }
}
