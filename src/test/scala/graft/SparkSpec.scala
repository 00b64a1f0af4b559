package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, one SparkSession). */
object SparkSpec {
  lazy val spark: SparkSession = Session.local()
  val Sf = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  val spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.Sf
}
