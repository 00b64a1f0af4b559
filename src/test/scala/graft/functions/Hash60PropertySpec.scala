package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.functions.Portable.{h60, h60String}

/** The Hash60 equivalence as a law over arbitrary strings — including
  * codepoints outside ASCII and the empty string — not just corpus
  * text: the native digest→bits expression and the conv/substring
  * oracle shape must agree on EVERY input, or some future corpus would
  * silently split the gate. */
object Hash60PropertySpec extends Properties("Hash60") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  // mixed ASCII / unicode / whitespace-heavy strings, in small batches
  private val str: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(" ", "\t", "a", "é", "世", "𐍈", "ß", "ع"))
      .map(_.mkString))

  private val batch: Gen[List[String]] = Gen.listOfN(24, str)

  property("native == conv/substring form on arbitrary strings") =
    forAll(batch) { ss =>
      val spark = SparkSpec.spark
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val rows = ss.toDF("s")
        .select(h60(col("s")).as("a"), h60String(col("s")).as("b"))
        .collect()
      rows.forall(r => r.getLong(0) == r.getLong(1))
    }
}
