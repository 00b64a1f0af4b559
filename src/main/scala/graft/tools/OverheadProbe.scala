// Where does a sub-second query's wall time go? Splits one invocation
// into DataFrame construction (plan building), analysis+optimization
// (executedPlan force), and execution (noop write), min of N reps.
//   sbt -batch "runMain graft.tools.OverheadProbe <sfDir> <reps> <name>..."
package graft.tools

import graft.{Session, SparkEntry}

object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = args(1).toInt
    val spark = Session.local()
    spark.conf.set("graft.artifacts.reuse", "false")
    args.drop(2).foreach { name =>
      val rows = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def mn(f: ((Double, Double, Double)) => Double) = rows.map(f).min
      println(f"OVERHEAD $name construct=${mn(_._1)}%.3f " +
        f"plan=${mn(_._2)}%.3f exec=${mn(_._3)}%.3f " +
        f"(mins over $reps reps)")
    }
    spark.stop()
  }
}
