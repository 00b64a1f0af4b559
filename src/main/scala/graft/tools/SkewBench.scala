package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Skew-playbook A/B: the measured record connecting p115's skew
  * monitor to the [[graft.operators.SkewJoin]] remedy. Builds a
  * deliberately skewed fact-dim shuffle join — one hot key owning half
  * the probe rows, exactly the shape p115 flags — and times three
  * strategies end to end (noop sink, min of 3 after warmup):
  *
  *  1. `naive`  — plain shuffle join, AQE off: the hot key's entire
  *     mass lands on ONE reducer (the straggler baseline);
  *  2. `aqe`    — AQE skew-join splitting on (threshold lowered to
  *     fire at this data size, as a real cluster tune would);
  *  3. `salted` — [[SkewJoin.saltedInner]], AQE off: the manual
  *     remedy for shapes AQE cannot reach.
  *
  * All three disable broadcast (a broadcastable dim is the FIRST
  * remedy; this bench is about the cases where it isn't). Row counts
  * are asserted identical across strategies.
  *
  * Usage: runMain graft.tools.SkewBench [probeRows] [hotShare] [salts]
  */
object SkewBench {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val probeRows = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val hotShare = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val salts = args.lift(2).map(_.toInt).getOrElse(32)
    val buildRows = 100000L

    val spark = graft.Session.local()
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // probe: hotShare of rows on key 0, the rest uniform over the dim's
    // key space; a payload column so the join moves real bytes
    def probe: DataFrame = spark.range(probeRows).select(
      when(pmod(col("id"), lit(1000)) < lit((hotShare * 1000).toLong), 0L)
        .otherwise(pmod(hash(col("id")), lit(buildRows)).cast("long"))
        .as("k"),
      col("id").as("payload"))
    def build: DataFrame = spark.range(buildRows).select(
      col("id").as("bk"), (col("id") * 7).as("battr"))

    def sink(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def withConf[A](kvs: (String, String)*)(body: => A): A = {
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    def naive(): Unit = withConf(
      "spark.sql.adaptive.enabled" -> "false") {
      sink(probe.join(build, col("k") === col("bk")))
    }
    def aqe(): Unit = withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // defaults (256 MB / 5x) are cluster-sized; fire at this scale
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
      sink(probe.join(build, col("k") === col("bk")))
    }
    def salted(): Unit = withConf(
      "spark.sql.adaptive.enabled" -> "false") {
      sink(SkewJoin.saltedInner(probe, build, "k", "bk", salts))
    }

    // correctness pin: identical cardinality across all three
    val nNaive = probe.join(build, col("k") === col("bk")).count()
    val nSalted = SkewJoin.saltedInner(probe, build, "k", "bk", salts)
      .count()
    require(nNaive == nSalted,
      s"salted join changed cardinality: $nNaive vs $nSalted")

    val variants = Seq("naive" -> naive _, "aqe" -> aqe _,
      "salted" -> salted _)
    variants.foreach { case (_, f) => f() } // warmup: JIT + codegen
    val results = variants.map { case (name, f) =>
      name -> (1 to 3).map(_ => timed(f())).min
    }
    val js = results.map { case (n, t) =>
      "\"" + n + "\":" + math.rint(t * 1000) / 1000
    }.mkString(",")
    println(s"""{"bench":"skew_join_ab","probe_rows":$probeRows,""" +
      s""""hot_share":$hotShare,"salts":$salts,"rows_out":$nNaive,$js}""")
    spark.stop()
  }
}
