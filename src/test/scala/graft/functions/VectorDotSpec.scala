package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable.{asDouble, dot}
import graft.functions.VectorDot.vdot

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, 0.6f)),
    (Seq.fill(64)(0.123f), Seq.fill(64)(-0.456f)),
  ).toDF("a", "b")

  test("vdot equals the hand computation") {
    val got = vecs.select(vdot(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got(0) == 32.0) // 4 + 10 + 18
  }

  test("vdot is bit-identical to the interpreted HOF form (codegen path)") {
    val rows = vecs.select(
      vdot(col("a"), col("b")).as("fast"),
      dot(asDouble(col("a")), asDouble(col("b"))).as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vdot matches with whole-stage codegen disabled (interpreted path)") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val rows = vecs.select(
        vdot(col("a"), col("b")).as("fast"),
        dot(asDouble(col("a")), asDouble(col("b"))).as("slow")).collect()
      rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null input yields null, mismatched lengths yield null like zip_with") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f))),
    ).toDF("a", "b")
    val rows = df.select(
      vdot(col("a"), col("b")).as("fast"),
      dot(asDouble(col("a")), asDouble(col("b"))).as("slow")).collect()
    // zip_with null-pads the shorter array, so the interpreted form is
    // null on a length mismatch — and so is vdot.
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("a null element nulls the result, matching the interpreted form") {
    val df = Seq((Seq(Some(1.0f), None, Some(2.0f)), Seq(Some(1.0f), Some(1.0f), Some(1.0f))))
      .toDF("a", "b")
    val rows = df.select(
      vdot(col("a"), col("b")).as("fast"),
      dot(asDouble(col("a")), asDouble(col("b"))).as("slow")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
  }

  test("vector_dot is a registered SQL function via session extensions") {
    val got = spark.sql(
      """SELECT vector_dot(
        |  array(cast(1.0 AS float), cast(2.0 AS float)),
        |  array(cast(3.0 AS float), cast(4.0 AS float))) AS d""".stripMargin)
      .head.getDouble(0)
    assert(got == 11.0)
    assertThrows[Exception](
      spark.sql("SELECT vector_dot(array(cast(1.0 AS float)))").collect())
  }

  test("rejects non-float-array inputs at analysis") {
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0f))).toDF("a", "b")
    assertThrows[Exception](bad.select(vdot(col("a"), col("b"))).collect())
  }
}
