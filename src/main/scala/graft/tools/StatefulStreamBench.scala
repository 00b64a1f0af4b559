package graft.tools


import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.Session
import graft.streaming.Streams

/** State-volume bench for the STATEFUL streaming twins (VERDICT r15
  * item 7): the door scanners were scale-out-measured at 96k docs, but
  * psiDrift / cusumDrift / latestPerKey / weightedReservoir had never
  * seen sf10-grade state (500k docs, 10M events). This drives each twin
  * through a real checkpointed FILE-source run — the deploy shape, not
  * MemoryStream — chunked into micro-batches, and prints per twin the
  * numbers a state blow-up shows up in first: batch durations, state
  * rows, and state memory from the progress telemetry.
  *
  *   sbt "runMain graft.tools.StatefulStreamBench <sfDir> [chunks] [store]"
  *
  * `store` = heap (default) | rocksdb — rocksdb switches the state
  * store to RocksDBStateStoreProvider, the posture a 100 TB deploy
  * runs the LINEAR-state twins under (latestPerKey's state is O(keys);
  * on the default heap-backed HDFSBackedStateStoreProvider that rides
  * the executor heap, while RocksDB keeps it off-heap + on-disk with
  * bounded block-cache memory). Run both and diff the state-mem lines.
  *
  * Staging: events/documents are rewritten once into <chunks> files so
  * maxFilesPerTrigger=1 yields <chunks> micro-batches; state then builds
  * ACROSS batches, which is what a blow-up needs to manifest. */
object StatefulStreamBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StatefulStreamBench <sfDir> [chunks] [store]")
    val sfDir = args(0)
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val store = args.lift(2).getOrElse("heap")
    val spark = Session.local()
    import spark.implicits._
    // recentProgress is capped at numRecentProgressUpdates (default
    // 100): with chunks above that, the reported input-row totals,
    // batch durations, and peak state stats would silently cover only
    // the LAST 100 micro-batches. Size the window to the run.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (chunks + 16).toString)
    store match {
      case "rocksdb" => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      case "heap" => () // Spark's default HDFSBackedStateStoreProvider
      case other => throw new IllegalArgumentException(
        s"store must be heap|rocksdb, got '$other'")
    }

    val work = "/tmp/graft-streambench"
    def stage(table: String): String = {
      val dst = s"$work/$table"
      spark.read.parquet(s"$sfDir/$table.parquet")
        .repartition(chunks)
        .write.mode(SaveMode.Overwrite).parquet(dst)
      dst
    }
    val eventsDir = stage("events")
    val docsDir = stage("documents")

    def run(name: String, mode: String,
        build: SparkSession => DataFrame): Unit = {
      val ckpt = s"$work/ckpt-$name"
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(ckpt))
      val q = build(spark).writeStream
        .format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(mode) // must match each twin's declared OutputMode
        .trigger(Trigger.AvailableNow())
        .start()
      val t0 = System.nanoTime()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress
      val batchMs = prog.map(_.batchDuration).filter(_ > 0)
      val stateRows = prog.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateMem = prog.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      val inRows = prog.map(_.numInputRows).sum
      println(f"== $name [$store]: wall $wall%.1fs, " +
        f"batches ${batchMs.length}, input $inRows rows ==")
      if (batchMs.nonEmpty)
        println(f"   batch ms: max ${batchMs.max}, " +
          f"mean ${batchMs.sum / batchMs.length}, last ${batchMs.last}")
      if (stateRows.nonEmpty)
        println(f"   state rows: final ${stateRows.last}, " +
          f"peak ${stateRows.max}; state mem: " +
          f"peak ${stateMem.max / 1048576.0}%.1f MiB, " +
          f"final ${stateMem.last / 1048576.0}%.1f MiB")
      // RocksDB reports where the bytes actually LIVE (off-heap block
      // cache / memtable vs on-disk SST) through custom metrics —
      // that split is the whole point of the posture, so surface it.
      val custom = prog.flatMap(_.stateOperators).flatMap(
        _.customMetrics.asScala).groupMapReduce(_._1)(_._2.longValue)(
        math.max)
      val interesting = Seq("rocksdbTotalMemoryUsage",
        "rocksdbTotalSstFilesSize", "rocksdbPinnedBlocksMemoryUsage",
        "loadedMapCacheHitCount")
      val shown = interesting.flatMap(k => custom.get(k).map(v =>
        f"$k ${v / 1048576.0}%.1f MiB"))
      if (shown.nonEmpty) println("   " + shown.mkString(", "))
    }

    def events(s: SparkSession) = {
      import s.implicits._
      s.readStream
        .schema(s.read.parquet(eventsDir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(eventsDir)
        .transform(graft.Tables.normalizeTs)
        .as[Streams.Event]
    }
    def docs(s: SparkSession) =
      s.readStream
        .schema(s.read.parquet(docsDir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docsDir)

    run("cusumDrift", "append", s => Streams.cusumDrift(events(s)).toDF)
    run("latestPerKey", "update",
      s => Streams.latestPerKey(events(s)).toDF)
    run("psiDrift", "append", s => Streams.psiDrift(docs(s)).toDF)
    run("weightedReservoir", "update",
      s => Streams.weightedReservoir(docs(s)).toDF)
    spark.stop()
  }
}
