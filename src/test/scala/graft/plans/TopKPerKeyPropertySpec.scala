package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.plans.TopKPerKey.topK

/** The native heap operator's agreement with the window form as a LAW
  * over arbitrary data: random key skew (including one giant key and
  * empty-ish keys), duplicate order values forcing the tiebreak, and
  * random k — the property that justifies TopKRewriteRule silently
  * re-planning every row_number<=k pattern in the repo. */
object TopKPerKeyPropertySpec extends Properties("TopKPerKey") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private val rows: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(0, 120)
    r <- Gen.listOfN(n, for {
      key <- Gen.oneOf(Gen.chooseNum(0L, 2L), Gen.const(7L)) // skewed
      v <- Gen.chooseNum(0L, 9L) // few distinct values -> many ties
      tb <- Gen.chooseNum(0L, 1000000L)
    } yield (key, v, tb))
  } yield r

  property("native == window form for arbitrary skewed data and k") =
    forAll(rows, Gen.chooseNum(1, 6)) { (data, k) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = data.toDF("key", "v", "tb")
        .repartition(7) // force multi-partition partial heaps
      val w = Window.partitionBy(col("key"))
        .orderBy(col("v").desc, col("tb").asc)
      val expect = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).toSet
      val got = topK(df, Seq("key"), Seq("v" -> false, "tb" -> true), k)
        .collect().map(_.toSeq).toSet
      got == expect
    }
}
