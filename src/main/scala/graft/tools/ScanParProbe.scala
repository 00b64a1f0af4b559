// A/B: single-task scan feeding heavy map work vs an explicit
// repartition that spreads the work across cores. Hand-built variants
// of the bench shapes, min of N reps each, noop sink.
//   tools/run_graft.sh graft.tools.ScanParProbe <sfDir> <reps>
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Session, Tables}
import graft.Exact._

object ScanParProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = args(1).toInt
    val spark = Session.local()
    val n = spark.sparkContext.defaultParallelism

    def time(label: String)(f: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCANPAR $label min=${ts.min}%.3f times=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def li = Tables.lineitem(spark, sfDir)

    // pure scan cost (all 16 cols vs the 6 q19 needs)
    time("scan_q19cols") {
      li.select("l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus", "l_shipdate")
    }
    // q19 as declared (single-task partial agg)
    def q19Of(src: DataFrame) = src
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
    time("q19_asis")(q19Of(li))
    time("q19_repart_key")(q19Of(li.repartition(n, col("l_orderkey"))))
    time("q19_repart_rr")(q19Of(li.repartition(n)))

    // q09 window over composite key: exchange exists anyway; repartition
    // by the SAME keys should merge with the window's requirement
    def q09Of(src: DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"), col("l_partkey"))
      src.withColumn("qty_sum",
          sum(dec(col("l_quantity"))).over(w).cast(DoubleType))
        .select("l_orderkey", "l_partkey", "l_linenumber", "qty_sum")
    }
    time("q09_asis")(q09Of(li))

    // q14 global sort
    time("q14_asis") {
      li.orderBy(col("l_returnflag").asc, col("l_linestatus").asc,
        col("l_orderkey").asc, col("l_linenumber").asc)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
    }
    // narrow projection BEFORE the sort exchange (sort only needs 4 cols
    // - already pruned?) vs sorting on a pre-shuffled frame
    time("q14_repart_first") {
      li.select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .repartition(n, col("l_orderkey"))
        .orderBy(col("l_returnflag").asc, col("l_linestatus").asc,
          col("l_orderkey").asc, col("l_linenumber").asc)
    }

    // q31/q32/q30 star shapes: plain vs balanced stream side
    def q31Of(lside: DataFrame) =
      broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"))
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(spark, sfDir),
          col("n_nationkey") === col("c_nationkey"))
        .join(Tables.orders(spark, sfDir),
          col("c_custkey") === col("o_custkey"))
        .join(lside, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(spark, sfDir),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("rev"))
    time("q31_plain")(q31Of(Tables.lineitem(spark, sfDir)))
    time("q31_balanced")(q31Of(
      Tables.lineitem(spark, sfDir).repartition(n, col("l_orderkey"))))

    def q32Of(lside: DataFrame) =
      lside.filter(col("l_returnflag") === "R")
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("rev"))
        .orderBy(col("rev").desc, col("c_custkey").asc)
        .limit(20)
    time("q32_plain")(q32Of(Tables.lineitem(spark, sfDir)))
    time("q32_balanced")(q32Of(
      Tables.lineitem(spark, sfDir).repartition(n, col("l_orderkey"))))

    def q30Of(oside: DataFrame) =
      Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
        .join(oside, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("rev"))
    time("q30_plain")(q30Of(Tables.orders(spark, sfDir)))
    time("q30_balanced")(q30Of(
      Tables.orders(spark, sfDir).repartition(n, col("o_orderkey"))))
    spark.stop()
  }
}
