package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.VecMinMaxAgg.vecMinMax
import graft.functions.VecSumAgg.vecSum

/** The two native vector-state aggregates against in-memory reference
  * folds on GENERATED ragged inputs — the merge contracts (elementwise
  * min/max and sum) that make them safe as map-side-combined
  * aggregates at any partitioning. */
object VecAggPropertySpec extends Properties("VecAgg") {

  private lazy val spark = graft.SparkSpec.spark
  import spark.implicits._

  // each case runs a distributed aggregation; keep the suite fast
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(20)

  private val floatCorpus: Gen[List[List[Float]]] =
    Gen.choose(0, 12).flatMap { n =>
      Gen.listOfN(n,
        Gen.choose(0, 9).flatMap(len =>
          Gen.listOfN(len, Gen.choose(-1000, 1000).map(_ / 16.0f))))
    }

  private val byteCorpus: Gen[List[List[Byte]]] =
    Gen.choose(0, 12).flatMap { n =>
      Gen.listOfN(n,
        Gen.choose(0, 9).flatMap(len =>
          Gen.listOfN(len, Gen.choose(-128, 127).map(_.toByte))))
    }

  property("vec_minmax = elementwise fold on ragged input") =
    forAll(floatCorpus) { vecs =>
      val dims = if (vecs.isEmpty) 0 else vecs.map(_.length).max
      val expMn = (0 until dims)
        .map(i => vecs.filter(_.length > i).map(_(i).toDouble).min)
      val expMx = (0 until dims)
        .map(i => vecs.filter(_.length > i).map(_(i).toDouble).max)
      val r = vecs.toDF("v").repartition(3)
        .agg(vecMinMax(col("v")).as("s"))
        .select(col("s").getField("mns"), col("s").getField("mxs"))
        .collect().head
      r.getSeq[Any](0) == expMn && r.getSeq[Any](1) == expMx
    }

  property("vec_sum = elementwise fold on ragged input") =
    forAll(byteCorpus) { vecs =>
      val dims = if (vecs.isEmpty) 0 else vecs.map(_.length).max
      val expS = (0 until dims)
        .map(i => vecs.filter(_.length > i).map(_(i).toLong).sum)
      val expN = (0 until dims)
        .map(i => vecs.count(_.length > i).toLong)
      val r = vecs.toDF("v").repartition(3)
        .agg(vecSum(col("v")).as("s"))
        .select(col("s").getField("sums"), col("s").getField("counts"))
        .collect().head
      r.getSeq[Any](0) == expS && r.getSeq[Any](1) == expN
    }

  property("grouped: each key gets its own buffer, never a neighbor's") =
    forAll(Gen.const(())) { _ =>
      val df = Seq(
        ("a", Seq[Byte](1, 2)), ("a", Seq[Byte](3, 4, 5)),
        ("b", Seq[Byte](-7))
      ).toDF("k", "v")
      val got = df.groupBy("k").agg(vecSum(col("v")).as("s"))
        .select(col("k"), col("s").getField("sums"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      got == Map("a" -> Seq(4L, 6L, 5L), "b" -> Seq(-7L))
    }
}
