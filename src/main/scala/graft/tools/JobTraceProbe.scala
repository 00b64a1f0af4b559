// Per-JOB trace of one query invocation: job wall time, stage count,
// task count, summed task time — shows whether a sub-second query is
// bound by data work or by the number of sequential jobs/stages
// (planning cuts, AQE stage materializations, checkpoint builds).
//   tools/run_graft.sh graft.tools.JobTraceProbe <sfDir> <reps> <name>...
package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._

import graft.{Session, SparkEntry}

object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    // args of the form k=v are session confs (TimeQuery's convention);
    // the rest are query names. Default: standalone cost (reuse off).
    val (confs, names) = args.drop(2).toSeq.partition(_.contains('='))
    val spark = Session.local()
    spark.conf.set("graft.artifacts.reuse", "false")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }

    case class Job(start: Long, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageJob = mutable.Map[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        synchronized {
          jobs(e.jobId) = Job(e.time)
          e.stageIds.foreach(sid => stageJob(sid) = e.jobId)
          jobs(e.jobId).stages = e.stageIds.size
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        synchronized {
          stageJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1; j.taskMs += e.taskInfo.duration
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      // warmup (codegen, JIT)
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      var best = Double.MaxValue
      var bestTrace: Seq[String] = Nil
      (1 to reps).foreach { _ =>
        synchronized { jobs.clear(); stageJob.clear() }
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        Thread.sleep(300) // drain listener bus
        val wall = (t2 - t0) / 1e9
        if (wall < best) {
          best = wall
          val rows = synchronized { jobs.toSeq }
          val jobWall = rows.map { case (_, j) =>
            (j.end - j.start) / 1000.0 }.sum
          val head =
            f"  construct=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f" +
              f" jobs=${rows.size} jobWallSum=$jobWall%.3f"
          bestTrace = head +:
            rows.map { case (id, j) =>
              f"  job $id%3d wall=${(j.end - j.start) / 1000.0}%7.3f" +
                f" stages=${j.stages}%2d tasks=${j.tasks}%4d" +
                f" taskSum=${j.taskMs / 1000.0}%7.3f"
            }
        }
      }
      println(f"== $name best=$best%.3f over $reps reps ==")
      bestTrace.foreach(println)
    }
    spark.stop()
  }
}
