package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.functions.SimHashAgg.simhashAgg

/** SimHashAgg checked against an INDEPENDENT in-memory reference
  * implementation (not the DataFrame explode form, which shares no code
  * with either) on arbitrary feature sets — including negative hashes,
  * all-ties groups, and single-feature groups — under forced
  * multi-partition partial merges. */
object SimHashAggPropertySpec extends Properties("SimHashAgg") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private def reference(hvs: Seq[Long]): Long = {
    if (hvs.isEmpty) return 0L
    (0 until 32).foldLeft(0L) { (fp, j) =>
      val votes = hvs.map(h => 2L * ((h >>> j) & 1L) - 1L).sum
      if (votes >= 0) fp | (1L << j) else fp
    }
  }

  private val rows: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 150)
    r <- Gen.listOfN(n, for {
      doc <- Gen.chooseNum(0L, 5L)
      hv <- Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue),
        Gen.chooseNum(0L, 3L)) // force frequent tie patterns too
    } yield (doc, hv))
  } yield r

  property("distributed aggregate == in-memory reference") =
    forAll(rows) { data =>
      val spark = SparkSpec.spark
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val got = data.toDF("doc", "hv").repartition(7)
        .groupBy("doc").agg(simhashAgg(col("hv")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = data.groupBy(_._1)
        .map { case (doc, rs) => doc -> reference(rs.map(_._2)) }
      got == expect
    }
}
