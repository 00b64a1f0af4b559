package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HllAgg.hllAgg
import graft.functions.Portable.h60

/** The native HLL aggregate against an independent in-memory reference
  * implementation of the identical formulation (p40's register/harmonic
  * arithmetic), on generated data — plus the merge contracts that make
  * it safe as a grouped, map-side-combined aggregate. */
class HllAggPropertySpec extends SparkSpec {
  import spark.implicits._

  /** In-memory twin of the aggregate's math, from raw 60-bit hashes. */
  private def refEstimate(hashes: Seq[Long]): Double = {
    val regs = new Array[Int](HllAgg.M)
    hashes.foreach { hv =>
      val bucket = (hv & (HllAgg.M - 1)).toInt
      val w = hv >>> HllAgg.P
      val rho = if (w == 0L) HllAgg.RhoMax
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val sInt = regs.map(mj => 1L << (HllAgg.RhoMax - mj)).sum
    val empty = regs.count(_ == 0)
    val raw = HllAgg.RawNum / sInt.toDouble
    val est = if (raw <= 2.5 * HllAgg.M && empty > 0)
      HllAgg.M.toDouble * math.log(HllAgg.M.toDouble / empty)
    else raw
    new java.math.BigDecimal(java.lang.Double.toString(est))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Portable 60-bit hash of a string, computed through the engine so
    * the reference estimate sees exactly the aggregate's input. */
  private def h60Of(values: Seq[String]): Seq[Long] =
    values.toDF("s").select(h60(col("s"))).collect().map(_.getLong(0)).toSeq

  test("matches the in-memory reference on skewed generated groups") {
    // cardinalities straddling the linear-counting/raw-estimate switch,
    // each with skewed multiplicities (value i appears (i % 7) + 1 times)
    for ((nDistinct, salt) <- Seq((1, 11L), (7, 23L), (40, 5L), (200, 99L),
        (400, 1L), (900, 42L))) {
      val values = (0 until nDistinct).flatMap(i =>
        Seq.fill(i % 7 + 1)(s"u${salt}_$i"))
      val got = values.toDF("s")
        .select(h60(col("s")).as("hv"))
        .repartition(5)
        .agg(hllAgg(col("hv")))
        .head().getDouble(0)
      assert(got == refEstimate(h60Of(values.distinct)),
        s"nDistinct=$nDistinct salt=$salt")
    }
  }

  test("partitioning does not change the estimate (merge is exact)") {
    val values = (0 until 5000).map(i => s"user_$i")
    val df = values.toDF("s").select(h60(col("s")).as("hv"))
    val one = df.coalesce(1).agg(hllAgg(col("hv"))).head().getDouble(0)
    val many = df.repartition(32).agg(hllAgg(col("hv"))).head().getDouble(0)
    assert(one == many)
    assert(one == refEstimate(h60Of(values)))
  }

  test("duplicates never move the estimate (register max is idempotent)") {
    val base = (0 until 300).map(i => s"dup_$i")
    val dup = base ++ base ++ base
    val e1 = base.toDF("s").select(h60(col("s")).as("hv"))
      .agg(hllAgg(col("hv"))).head().getDouble(0)
    val e3 = dup.toDF("s").select(h60(col("s")).as("hv"))
      .repartition(8).agg(hllAgg(col("hv"))).head().getDouble(0)
    assert(e1 == e3)
  }

  test("grouped form matches per-group p40-style declarative registers") {
    val rows = (0 until 2000).map(i => (s"g${i % 3}", s"user_${i % (100 * (i % 3 + 1))}"))
    val df = rows.toDF("g", "s").select(col("g"), h60(col("s")).as("hv"))
    val native = df.groupBy("g").agg(hllAgg(col("hv")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      g -> refEstimate(h60Of(vs.map(_._2).distinct))
    }
    assert(native == expect)
  }

  test("empty input evaluates to 0.0 and nulls are skipped") {
    val empty = Seq.empty[String].toDF("s")
      .select(h60(col("s")).as("hv"))
      .agg(hllAgg(col("hv"))).head().getDouble(0)
    assert(empty == 0.0)
    val withNulls = Seq(Some("a"), None, Some("b"), None).toDF("s")
      .select(when(col("s").isNotNull, h60(col("s"))).as("hv"))
      .agg(hllAgg(col("hv"))).head().getDouble(0)
    assert(withNulls == refEstimate(h60Of(Seq("a", "b"))))
  }

  test("hll_agg is callable from SQL via the session extension") {
    Seq("x", "y", "z").toDF("s").createOrReplaceTempView("hll_sql_in")
    val est = spark.sql(
      "SELECT hll_agg(hash60(s)) FROM hll_sql_in").head().getDouble(0)
    assert(est == refEstimate(h60Of(Seq("x", "y", "z"))))
  }
}
