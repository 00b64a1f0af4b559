package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}

/** Exact-aggregation helpers: order-insensitive decimal partials. */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  test("dsum is exact and partition-order-insensitive") {
    val vals = Seq.fill(1000)(0.1) ++ Seq.fill(1000)(0.2)
    val df = vals.toDF("v").repartition(16)
    val got = df.agg(Exact.dsum(col("v")).as("s")).head.getDouble(0)
    assert(got == 300.0) // double sum of 0.1s would drift; decimal must not
  }

  test("davg and ravg divide the exact sum") {
    val df = Seq(1.5, 2.5, 3.5).toDF("v")
    val row = df.agg(Exact.davg(col("v")).as("a"), Exact.ravg(col("v")).as("r"))
      .head
    assert(row.getDouble(0) == 2.5)
    assert(row.getFloat(1) == 2.5f)
  }

  test("icount and ravg honor the reference output-type contract") {
    val df = Seq(1.0, 2.0).toDF("v")
    val schema = df.agg(Exact.icount(col("v")).as("c"), Exact.ravg(col("v")).as("a"))
      .schema
    assert(schema("c").dataType == IntegerType) // COUNT → INT
    assert(schema("a").dataType == FloatType)   // AVG → REAL
  }

  test("revenue term is exact decimal arithmetic") {
    val df = Seq((100.0, 0.05)).toDF("p", "d")
    val got = df.select(Exact.revenue(col("p"), col("d")).cast(DoubleType))
      .head.getDouble(0)
    assert(got == 95.0)
  }
}
