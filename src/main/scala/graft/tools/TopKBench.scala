package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Session, Tables}
import graft.plans.TopKPerKey

/** A/B micro-benchmark: native bounded-heap top-k vs the window form it
  * replaces, on lineitem top-3 per partkey. Run:
  *   sbt "runMain graft.tools.TopKBench <sfDir> [reps]"
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Session.local()
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_orderkey", "l_extendedprice", "l_linenumber")
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    def windowForm = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    def nativeForm = TopKPerKey.topK(li, Seq("l_partkey"),
      Seq("l_extendedprice" -> false, "l_orderkey" -> true,
        "l_linenumber" -> true), 3)
    // Session.local() registers GraftExtensions, so with the rewrite
    // rule live the "window" arm would silently re-plan into the native
    // operator and the A/B would compare native vs native. Disable the
    // rewrite around every window-arm plan/run and ASSERT the executed
    // plan really contains WindowExec.
    def withRewriteOff[A](f: => A): A = {
      spark.conf.set("graft.topk.rewrite.enabled", "false")
      try f finally spark.conf.set("graft.topk.rewrite.enabled", "true")
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def runWindow(): Unit = withRewriteOff(run(windowForm))
    // plan-validity assert runs ONCE, on the warmup, outside the timed
    // region — re-planning + plan stringification per rep would bias the
    // window arm. String check: AQE wraps the plan in
    // AdaptiveSparkPlanExec (a leaf node), so tree traversal cannot see
    // the inner operators.
    def assertWindowArm(): Unit = withRewriteOff {
      val df = windowForm
      run(df)
      val executed = df.queryExecution.executedPlan.toString
      require(executed.contains("Window") && !executed.contains("TopKPerKey"),
        s"window arm was rewritten away — A/B invalid:\n$executed")
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    require(nativeForm.count() == withRewriteOff(windowForm.count()),
      "row count mismatch")
    assertWindowArm(); run(nativeForm) // warmup + one-time plan check
    val tw = (1 to reps).map(_ => time(runWindow())).min
    val tn = (1 to reps).map(_ => time(run(nativeForm))).min
    println(f"TOPK window=$tw%.3f native=$tn%.3f speedup=${tw / tn}%.2fx")
    spark.stop()
  }
}
