package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorDotLong.vdotl

class VectorDotLongSpec extends SparkSpec {
  import spark.implicits._

  private def ldot = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, p) => acc + p)

  private def vecs = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    (Seq(127L, -128L, 0L), Seq(114L, -103L, 99L)),
    (Seq.fill(64)(-128L), Seq.fill(64)(127L)),
  ).toDF("a", "b")

  test("vdotl equals the hand computation") {
    val got = vecs.select(vdotl(col("a"), col("b"))).collect().map(_.getLong(0))
    assert(got(0) == 32L) // 4 + 10 + 18
    assert(got(1) == 127L * 114 + 128 * 103) // the p42 mini pair
    assert(got(2) == -128L * 127 * 64)
  }

  test("vdotl matches the interpreted HOF form on both codegen paths") {
    def check(): Unit = vecs.select(
      vdotl(col("a"), col("b")).as("fast"),
      ldot(col("a"), col("b")).as("slow")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
    check()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check()
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null array, mismatched length, and null element all yield null") {
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L)))),
      (None: Option[Seq[Option[Long]]], Some(Seq(Some(1L)))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(1L)))),
    ).toDF("a", "b")
    val rows = df.select(
      vdotl(col("a"), col("b")).as("fast"),
      ldot(col("a"), col("b")).as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1))
    }
  }

  test("tinyint and mixed-type arrays dot exactly like bigint arrays") {
    // the persisted quantized index carries array<tinyint>; the k-means
    // path dots tinyint codes against bigint centroid means
    val df = Seq((Seq(127L, -128L, 3L), Seq(114L, -103L, 99L)))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        col("a").cast("array<tinyint>").as("a8"),
        col("b").cast("array<smallint>").as("b16"),
        col("b").cast("array<int>").as("b32"))
    val r = df.select(
      vdotl(col("a"), col("b")).as("ll"),
      vdotl(col("a8"), col("b16")).as("b8x16"),
      vdotl(col("a8"), col("b")).as("b8xl"),
      vdotl(col("b32"), col("a8")).as("b32x8")).collect().head
    val expect = 127L * 114 + 128 * 103 + 3 * 99
    Seq("ll", "b8x16", "b8xl", "b32x8").foreach { c =>
      assert(r.getAs[Long](c) == expect, s"$c mismatched")
    }
    // negative products must widen before multiplying, not after
    val neg = Seq((Seq(-128L, -128L), Seq(127L, 127L))).toDF("a", "b")
      .select(vdotl(col("a").cast("array<tinyint>"),
        col("b").cast("array<tinyint>"))).collect().head.getLong(0)
    assert(neg == -128L * 127 * 2)
  }

  test("a float-element array is rejected at analysis, not at runtime") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(vdotl(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("vector_dot_long is callable from SQL via the session extension") {
    vecs.createOrReplaceTempView("vdl_vecs")
    val got = spark.sql(
      "SELECT vector_dot_long(a, b) AS d FROM vdl_vecs ORDER BY d")
      .collect().map(_.getLong(0))
    assert(got.contains(32L))
  }
}
