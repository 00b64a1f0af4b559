package graft.tools

import org.apache.spark.sql.functions._
import graft.Session
import graft.functions.Portable.{h60, h60String}

object H60Micro {
  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    val df = spark.range(0, 20000000)
      .select(concat(lit("shingle alpha beta "), col("id")).as("s"))
    def run(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      df.select(xxhash64(c).as("h")).agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    run(h60(col("s"))); run(h60String(col("s"))) // warmup
    val tn = (1 to 3).map(_ => run(h60(col("s")))).min
    val ts = (1 to 3).map(_ => run(h60String(col("s")))).min
    println(f"H60 native=$tn%.3f string=$ts%.3f speedup=${ts / tn}%.2fx")
    spark.stop()
  }
}
