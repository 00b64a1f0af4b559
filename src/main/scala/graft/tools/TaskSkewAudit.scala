package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}

import graft.{Session, SparkEntry}

/** Per-stage task-time skew profiler — the DERIVED-pair-frame version
  * of p115's declared-key-domain audit (VERDICT r15 item 5). p29's sf10
  * straggler taught the class: a pair frame built by joins INHERITS the
  * upstream partitioning, and when the expensive verify runs per pair
  * (Levenshtein DP, exact Jaccard, containment, cell self-join), an
  * id-local pair distribution piles the whole tail onto a few tasks —
  * aggregate-side skew AQE's skew-join splitting never sees. This tool
  * makes the straggler measurable instead of anecdotal: it runs each
  * named query with a listener recording every task's duration per
  * stage and prints, for stages above a floor, task count / median /
  * max / max-over-median — the number the p29 fix moved from ~30 to ~1.
  *
  *   sbt "runMain graft.tools.TaskSkewAudit <sfDir> <name> [name ...]"
  */
object TaskSkewAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TaskSkewAudit <sfDir> <name>...")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = Session.local()
    spark.conf.set("graft.artifacts.reuse", "false")

    val stageNames = mutable.Map[Int, String]()
    val stageTasks = mutable.Map[Int, mutable.ArrayBuffer[Double]]()
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        synchronized {
          stageNames(e.stageInfo.stageId) =
            e.stageInfo.name.takeWhile(_ != '\n').take(60)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        synchronized {
          stageTasks.getOrElseUpdate(e.stageId, mutable.ArrayBuffer())
            .+=(e.taskInfo.duration / 1000.0)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      stageNames.clear(); stageTasks.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // give straggling listener events a moment to drain (the bus is
      // async and private[spark]; a beat after the action suffices here)
      Thread.sleep(1000)
      println(f"== $name: wall $wall%.1fs ==")
      println(f"${"stage"}%6s ${"tasks"}%6s ${"median_s"}%9s " +
        f"${"max_s"}%9s ${"max/med"}%8s  name")
      stageTasks.toSeq.sortBy(_._1).foreach { case (sid, ts) =>
        val sorted = ts.sorted
        val med = sorted(sorted.size / 2)
        val mx = sorted.last
        // stages whose max is trivial can't be the critical path
        if (mx >= 1.0) {
          val ratio = if (med > 0.001) mx / med else Double.PositiveInfinity
          println(f"$sid%6d ${ts.size}%6d $med%9.2f $mx%9.2f $ratio%8.1f" +
            f"  ${stageNames.getOrElse(sid, "?")}")
        }
      }
    }
    spark.stop()
  }
}
