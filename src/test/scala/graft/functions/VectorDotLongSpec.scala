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

  test("vector_dot_long is callable from SQL via the session extension") {
    vecs.createOrReplaceTempView("vdl_vecs")
    val got = spark.sql(
      "SELECT vector_dot_long(a, b) AS d FROM vdl_vecs ORDER BY d")
      .collect().map(_.getLong(0))
    assert(got.contains(32L))
  }
}
