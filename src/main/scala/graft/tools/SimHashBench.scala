package graft.tools

import org.apache.spark.sql.DataFrame

import graft.Session

/** A/B micro-benchmark: the native SimHashAgg fingerprint build vs the
  * declarative explode form it replaces (features×32 rows, two keyed
  * shuffles). Run:
  *   sbt "runMain graft.tools.SimHashBench <sfDir> [reps]"
  */
object SimHashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Session.local()
    def nativeForm =
      graft.queries.Pipeline.queries("p03_simhash_fingerprint")(spark, sfDir)
    def explodeForm = graft.queries.Pipeline.simhashFpExplode(spark, sfDir)
    def run(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    require(nativeForm.count() == explodeForm.count(), "row count mismatch")
    run(explodeForm); run(nativeForm) // warmup
    val te = (1 to reps).map(_ => time(run(explodeForm))).min
    val tn = (1 to reps).map(_ => time(run(nativeForm))).min
    println(f"SIMHASH explode=$te%.3f native=$tn%.3f speedup=${te / tn}%.2fx")
    spark.stop()
  }
}
