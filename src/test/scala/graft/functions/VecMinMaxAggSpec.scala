package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSpec
import graft.functions.VecMinMaxAgg.vecMinMax

/** The native elementwise min/max vector aggregate must be
  * value-identical to the declarative posexplode → groupBy(i) form it
  * replaced in the quantization stats build — including on ragged
  * vectors, null elements, null arrays, and empty input — and
  * independent of partitioning (mergeable partials). */
class VecMinMaxAggSpec extends SparkSpec {

  import spark.implicits._

  private def explodeForm(df: DataFrame): (Seq[Any], Seq[Any]) = {
    val r = df.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(min(col("x").cast(DoubleType)).as("mn"),
        max(col("x").cast(DoubleType)).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("i"), col("mn")))),
          p => p.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("i"), col("mx")))),
          p => p.getField("mx")).as("mxs"))
      .collect().head
    (r.getSeq[Any](0), r.getSeq[Any](1))
  }

  private def nativeForm(df: DataFrame): (Seq[Any], Seq[Any]) = {
    val r = df.agg(vecMinMax(col("v")).as("s"))
      .select(col("s").getField("mns"), col("s").getField("mxs"))
      .collect().head
    (r.getSeq[Any](0), r.getSeq[Any](1))
  }

  test("equal to the explode form on the embeddings corpus") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("embedding").as("v"))
    assert(nativeForm(e) == explodeForm(e))
  }

  test("equal on ragged vectors with null elements and null rows") {
    val df = Seq(
      Some(Seq[java.lang.Float](1.5f, -2.0f, 3.0f)),
      Some(Seq[java.lang.Float](0.5f, null, 9.0f, -7.0f)), // ragged + null
      None, // null array row
      Some(Seq[java.lang.Float](2.5f, -8.0f))
    ).toDF("v")
    assert(nativeForm(df) == explodeForm(df))
  }

  test("partition-independent: partials merge to the same answer") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("embedding").as("v"))
    assert(nativeForm(e.repartition(13)) == nativeForm(e.coalesce(1)))
  }

  test("empty input yields two empty arrays, like the explode form") {
    val df = Seq.empty[Seq[Float]].toDF("v")
    assert(nativeForm(df) == ((Seq(), Seq())))
    assert(nativeForm(df) == explodeForm(df))
  }
}
