package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Session
import graft.functions.Portable.h60
import graft.functions.ShingleRows.shingleRows

/** A/B micro-benchmark: the native ShingleRows generator vs the
  * codegen'd explode(sequence)+element_at shingle build (the current
  * p02/p38 hot path). Consumer is the p02 sketch stage's shape — one
  * digest per shingle row, then a keyed count — so the comparison
  * includes the downstream the rows feed, not just row production. Run:
  *   sbt "runMain graft.tools.ShingleGenBench <sfDir> [reps] [w]"
  */
object ShingleGenBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val w = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Session.local()
    val docs = graft.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select("doc_id", "text")

    def consume(sh: DataFrame): DataFrame =
      sh.select(col("doc_id"), h60(col("shingle")).as("h"))
        .groupBy("doc_id").agg(min("h").as("mn"), count(lit(1)).as("c"))

    def generatorForm = consume(
      docs.select(col("doc_id"), shingleRows(col("text"), w)))
    def explodeForm = consume(docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        explode(when(size(col("t")) >= w,
          sequence(lit(1), size(col("t")) - (w - 1)))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until w).map(k => element_at(col("t"), col("i") + k)): _*)
        .as("shingle")))

    def run(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    require(generatorForm.count() == explodeForm.count(), "row count mismatch")
    run(explodeForm); run(generatorForm) // warmup
    val te = (1 to reps).map(_ => time(run(explodeForm))).min
    val tg = (1 to reps).map(_ => time(run(generatorForm))).min
    println(f"SHINGLE w=$w explode=$te%.3f generator=$tg%.3f speedup=${te / tg}%.2fx")
    spark.stop()
  }
}
