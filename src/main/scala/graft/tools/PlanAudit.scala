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
    args.tail.foreach { name =>
      println(s"===== $name =====")
      println(Explain.physical(SparkEntry.queries(name)(spark, sfDir)))
    }
    spark.stop()
  }
}
