package graft.tools

import graft.{Session, SparkEntry}

object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = args(1).toInt
    val spark = Session.local()
    // args of the form k=v are session confs (e.g. graft.artifacts.reuse=false
    // to A/B the artifact registry); the rest are query names
    val (confs, names) = args.drop(2).partition(_.contains('='))
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name min=${times.min}%.2f times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
