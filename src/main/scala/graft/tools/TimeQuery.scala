package graft.tools

import graft.{Session, SparkEntry}

object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = args(1).toInt
    val spark = Session.local()
    args.drop(2).foreach { name =>
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
