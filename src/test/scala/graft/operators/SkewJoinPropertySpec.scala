package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Property: the salted join equals the plain inner join — same row
  * multiset — on arbitrary data with arbitrary skew and salt counts.
  * Salting must never change results, only placement. */
object SkewJoinPropertySpec extends Properties("SkewJoin") {

  // each case runs four distributed joins — 15 cases is plenty and keeps
  // the suite fast
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private val rowsGen: Gen[List[(Long, Int)]] = for {
    nKeys <- Gen.chooseNum(1, 6)
    n <- Gen.chooseNum(0, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, nKeys.toLong)
      v <- Gen.chooseNum(0, 9)
    } yield (k, v))
  } yield rows

  property("salted inner join equals the plain join") =
    forAll(rowsGen, rowsGen, Gen.chooseNum(1, 9)) { (probe, build, salts) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val p = probe.toDF("k", "pv")
      val b = build.toDF("bk", "bv")
      val plain = p.join(b, p("k") === b("bk"))
      val salted = SkewJoin.saltedInner(p, b, "k", "bk", salts)
      salted.count() == plain.count() &&
        salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty
    }
}
