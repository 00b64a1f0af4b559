package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Session

/** A/B micro-benchmark: the native one-pass MinHashSig sketch vs the
  * declarative explode+groupBy form it replaces (one md5-hex + two
  * conv() per shingle row, 12-min/collect_set ObjectHashAggregate, one
  * keyed shuffle). Both sides end in the same consumer (noop write of
  * the full sketch table), staging off so the producer is what's
  * measured. Run:
  *   sbt "runMain graft.tools.MinHashSigBench <sfDir> [reps]"
  */
object MinHashSigBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Session.local()
    spark.conf.set("graft.stage.materialize", "none")
    def docs = graft.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select("doc_id", "text")
    def nativeForm = graft.queries.Pipeline.minhashSigOf(docs)
    def declForm = graft.queries.Pipeline.minhashSigOfDeclarative(docs)
    def run(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    require(nativeForm.count() == declForm.count(), "row count mismatch")
    run(declForm); run(nativeForm) // warmup
    val td = (1 to reps).map(_ => time(run(declForm))).min
    val tn = (1 to reps).map(_ => time(run(nativeForm))).min
    println(f"MINHASHSIG declarative=$td%.3f native=$tn%.3f " +
      f"speedup=${td / tn}%.2fx")
    spark.stop()
  }
}
