package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.functions.SortedContains.sortedContains

/** A/B micro-benchmark: the native binary-search membership probe vs
  * `array_contains` at deployment-shaped sizes — every probe row
  * tests one key against a broadcast sorted set of `setSize` longs,
  * the per-position work of the streaming verbatim-leak scanner
  * against a real eval suite.
  *
  *   sbt "runMain graft.tools.SortedContainsBench [probeRows] [setSize]"
  */
object SortedContainsBench {
  def main(args: Array[String]): Unit = {
    val probeRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val setSize = args.lift(1).map(_.toInt).getOrElse(200000)
    val spark = Session.local()
    import spark.implicits._
    val set = spark.range(setSize.toLong)
      .select((col("id") * 2654435761L % 1000000007L).as("hv"))
      .agg(array_sort(collect_list(col("hv"))).as("es"))
      .cache()
    set.count()
    val probes = spark.range(probeRows)
      .select((col("id") * 40503L % 1000000007L).as("key"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(native: Boolean): Double = {
      val joined = probes.crossJoin(broadcast(set))
      val scored =
        if (native) joined.select(sortedContains(col("es"), col("key")))
        else joined.select(array_contains(col("es"), col("key")))
      time(scored.write.mode("overwrite").format("noop").save())
    }
    run(native = true); run(native = false) // warmup both
    val tn = (1 to 3).map(_ => run(native = true)).min
    val tl = (1 to 3).map(_ => run(native = false)).min
    println(f"SORTEDCONTAINS probes=$probeRows set=$setSize " +
      f"linear=$tl%.3f bsearch=$tn%.3f speedup=${tl / tn}%.2fx")
    spark.stop()
  }
}
