package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.functions.Portable.{asDouble, dot}
import graft.functions.VectorDot.vdot

/** Property: the native codegen'd VectorDot is bit-identical to the
  * interpreted aggregate(zip_with(...)) fold on arbitrary float vectors —
  * including negatives, zeros, tiny magnitudes, and mismatched lengths
  * (both null). This is the equivalence the ANN oracles rest on. */
object VectorDotPropertySpec extends Properties("VectorDot") {

  private val floatGen: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-1e6f, 1e6f),
    Gen.chooseNum(-1f, 1f),
    Gen.oneOf(0f, -0f, 1e-30f, -1e-30f))

  private val vecPairGen: Gen[(Seq[Float], Seq[Float])] = for {
    n <- Gen.chooseNum(0, 48)
    m <- Gen.oneOf(Gen.const(n), Gen.chooseNum(0, 48)) // often equal lengths
    a <- Gen.listOfN(n, floatGen)
    b <- Gen.listOfN(m, floatGen)
  } yield (a, b)

  property("equals the interpreted fold, bit for bit") =
    forAll(Gen.listOfN(16, vecPairGen)) { pairs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      pairs.isEmpty || {
        val rows = pairs.toDF("a", "b").select(
          vdot(col("a"), col("b")).as("fast"),
          dot(asDouble(col("a")), asDouble(col("b"))).as("slow")).collect()
        rows.forall { r =>
          r.isNullAt(0) == r.isNullAt(1) &&
            (r.isNullAt(0) ||
              java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
                java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
        }
      }
    }
}
