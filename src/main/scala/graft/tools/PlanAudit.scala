// Ad-hoc plan audit: prints the formatted physical plan of selected
// queries at a given sf dir. Run via:
//   sbt -batch "runMain graft.tools.PlanAudit <sfDir> <name> [name...]"
package graft.tools

import graft.{Session, SparkEntry}
import graft.plans.Explain

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Session.local()
    // k=v args are session confs (TimeQuery's convention) — e.g.
    // graft.stage.materialize=none to see through checkpoint cuts
    val (confs, names) = args.tail.partition(_.contains('='))
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    names.foreach { name =>
      println(s"===== $name =====")
      println(Explain.physical(SparkEntry.queries(name)(spark, sfDir)))
    }
    spark.stop()
  }
}
