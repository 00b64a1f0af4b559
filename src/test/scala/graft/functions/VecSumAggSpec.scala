package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VecSumAgg.vecSum

/** The native elementwise sum/count vector aggregate must be
  * value-identical to the declarative posexplode → groupBy(dim) form
  * it replaced in the centroid builds — including ragged vectors, null
  * elements/arrays, negative codes, empty input — and independent of
  * partitioning. */
class VecSumAggSpec extends SparkSpec {

  import spark.implicits._

  private def explodeForm(df: DataFrame): (Seq[Any], Seq[Any]) = {
    val r = df.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i")
      // count(x), not count(*): the aggregate's count is per-dimension
      // VALUES — the mean denominator — so a null element contributes
      // to neither sum nor count (the code arrays the centroid builds
      // feed it are null-free, so the two conventions never diverge
      // in production)
      .agg(sum(col("x").cast("long")).as("s"), count(col("x")).as("n"))
      .agg(
        transform(array_sort(collect_list(struct(col("i"), col("s")))),
          p => p.getField("s")).as("sums"),
        transform(array_sort(collect_list(struct(col("i"), col("n")))),
          p => p.getField("n")).as("counts"))
      .collect().head
    (r.getSeq[Any](0), r.getSeq[Any](1))
  }

  private def nativeForm(df: DataFrame): (Seq[Any], Seq[Any]) = {
    val r = df.agg(vecSum(col("v")).as("s"))
      .select(col("s").getField("sums"), col("s").getField("counts"))
      .collect().head
    (r.getSeq[Any](0), r.getSeq[Any](1))
  }

  test("equal to the explode form on int8 codes with negatives") {
    val df = Seq(
      Seq[Byte](-128, 5, 127),
      Seq[Byte](100, -5, -127),
      Seq[Byte](1, 2, 3)
    ).toDF("v")
    assert(nativeForm(df) == explodeForm(df))
  }

  test("equal on ragged vectors with null elements and null rows") {
    val df = Seq(
      Some(Seq[java.lang.Long](10L, -20L, 30L)),
      Some(Seq[java.lang.Long](5L, null, 9L, -7L)),
      None,
      Some(Seq[java.lang.Long](25L, -8L))
    ).toDF("v")
    assert(nativeForm(df) == explodeForm(df))
  }

  test("partition-independent: partials merge to the same answer") {
    val df = (0 until 500)
      .map(i => Seq((i % 7).toByte, (-i % 11).toByte)).toDF("v")
    assert(nativeForm(df.repartition(13)) == nativeForm(df.coalesce(1)))
  }

  test("empty input yields two empty arrays, like the explode form") {
    val df = Seq.empty[Seq[Byte]].toDF("v")
    assert(nativeForm(df) == ((Seq(), Seq())))
    assert(nativeForm(df) == explodeForm(df))
  }
}
