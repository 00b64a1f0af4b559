package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Session
import graft.functions.Portable.{h60, tokens}
import graft.queries.Pipeline
import graft.streaming.Streams

/** Deployment-scale probe of the streaming verbatim-leak scanner
  * ([[Streams.substringContamMatches]]): the scaladoc claims the
  * SortedContains binary-search probe lets the door scanner face a
  * REAL eval suite (10⁵–10⁶ grams) instead of benchmark-sized sets —
  * this measures it. The train stream is the sf corpus's train split
  * replicated `mult`× (shifted ids, the ScaleProbe convention); the
  * eval set is the corpus's own eval-slice shingles padded with
  * deterministic synthetic grams to the target size. Three timings
  * per eval size, min-of-3 each:
  *   - stream: one MemoryStream micro-batch through the scanner
  *     (end-to-end, includes micro-batch overhead)
  *   - apply:  the same transform applied batch-side (the scanner is
  *     stateless, so this is its pure per-row work)
  *   - batch:  the p133 SHAPE at the same eval size — stride-1
  *     explode + hash semi-join + island window (the machinery batch
  *     p133 uses, replicated here only to take an explicit gram set)
  *
  *   sbt "runMain graft.tools.DoorScanBench [sfDir] [mult]"
  */
object DoorScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = Session.local()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val W = Pipeline.SpanW
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val train = (0 until mult).map(i =>
        docs.filter(pmod(col("doc_id"), lit(29L)) =!= 7)
          .select((col("doc_id") + lit(i * maxId)).as("doc_id"),
            col("text")))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .cache()
    val nTrain = train.count()
    val realEval = docs.filter(pmod(col("doc_id"), lit(29L)) === 7)
      .select(tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .select(explode(when(col("n") >= W,
        sequence(lit(1), col("n") - (W - 1)))
        .otherwise(array().cast("array<int>"))).as("j"), col("t"))
      .select(h60(concat_ws(" ",
        slice(col("t"), col("j"), lit(W)))).as("hv"))
      .distinct().cache()
    val nReal = realEval.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // the p133 shape with an explicit gram set (mirrors
    // graft.queries.PipelineDedup.substringContamOf's train side)
    def batchShape(evalHv: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{IntegerType, LongType}
      val base = train
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .withColumn("n", size(col("t")))
      val starts = base
        .select(col("doc_id"), col("t"), col("n"),
          explode(when(col("n") >= W,
            sequence(lit(1), col("n") - (W - 1)))
            .otherwise(array().cast("array<int>"))).as("j"))
        .select(col("doc_id"), col("j"),
          h60(concat_ws(" ", slice(col("t"), col("j"), lit(W))))
            .as("hv"))
      val matched = starts.join(evalHv, Seq("hv"), "left_semi")
        .select("doc_id", "j")
      val runs = matched
        .withColumn("isl", col("j") - row_number().over(
          Window.partitionBy("doc_id").orderBy("j")))
        .groupBy("doc_id", "isl")
        .agg(count(lit(1)).cast(IntegerType).as("m"))
      val mx = runs.groupBy("doc_id")
        .agg((max(col("m")) + (W - 1)).as("max_overlap_tokens"))
      base.select(col("doc_id"), col("n"))
        .join(mx, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("max_overlap_tokens"), lit(0)).cast(LongType)
            .as("max_overlap_tokens"))
    }
    for (e <- Seq(100000L, 1000000L)) {
      val pad = spark.range(math.max(e - nReal, 0L))
        .select(h60(concat(lit("pad"), col("id"))).as("hv"))
      val evalHv = realEval.unionByName(pad).cache()
      evalHv.count(): Unit
      def applyOnce(): Double = time(
        Streams.substringContamMatches(train.toDF(), evalHv)
          .write.mode("overwrite").format("noop").save())
      def streamOnce(): Double = {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import org.apache.spark.sql.streaming.OutputMode
        val rows = train.collect().map(r => (r.getLong(0), r.getString(1)))
        val in = MemoryStream[(Long, String)]
        in.addData(rows.toSeq: _*)
        val q = Streams.substringContamMatches(
            in.toDF().toDF("doc_id", "text"), evalHv)
          .writeStream.format("noop")
          .outputMode(OutputMode.Append).start()
        try time(q.processAllAvailable()) finally q.stop()
      }
      def batchOnce(): Double = time(
        batchShape(evalHv).write.mode("overwrite").format("noop").save())
      applyOnce(); batchOnce(): Unit // warmup
      val ta = (1 to 3).map(_ => applyOnce()).min
      val ts = (1 to 3).map(_ => streamOnce()).min
      val tb = (1 to 3).map(_ => batchOnce()).min
      println(f"DOORSCAN eval=$e train_docs=$nTrain " +
        f"stream=$ts%.3f (${nTrain / ts}%.0f rows/s) " +
        f"apply=$ta%.3f (${nTrain / ta}%.0f rows/s) " +
        f"batch_semijoin=$tb%.3f (${nTrain / tb}%.0f rows/s)")
      // PARTITIONED file source (VERDICT r14 item 3): the MemoryStream
      // number above is a single-partition per-core floor; the scanner
      // is a stateless map, so throughput should scale ~linearly with
      // source partitions. Measure it instead of asserting it: the
      // train split written as an 8-file and a 32-file parquet dir,
      // streamed through the SAME scanner via the file source (first
      // micro-batch carries all files → task parallelism = files).
      locally {
        import org.apache.spark.sql.streaming.OutputMode
        for (parts <- Seq(8, 32)) {
          val dir = s"/tmp/graft-doorscan/src-$parts"
          train.repartition(parts).write.mode("overwrite").parquet(dir)
          def fsOnce(): Double = {
            val src = spark.readStream.schema(train.schema).parquet(dir)
            val q = Streams.substringContamMatches(src, evalHv)
              .writeStream.format("noop")
              .outputMode(OutputMode.Append).start()
            try time(q.processAllAvailable()) finally q.stop()
          }
          fsOnce(): Unit // warmup
          val tf = (1 to 3).map(_ => fsOnce()).min
          println(f"DOORSCAN eval=$e file_source parts=$parts " +
            f"t=$tf%.3f (${nTrain / tf}%.0f rows/s, " +
            f"${nTrain / tf / parts}%.0f rows/s/partition)")
        }
        // stream/batch identity at a partitioned configuration: the
        // 8-file source's emitted rows must equal the batch transform's
        if (e == 100000L) {
          val src = spark.readStream.schema(train.schema)
            .parquet("/tmp/graft-doorscan/src-8")
          val q = Streams.substringContamMatches(src, evalHv)
            .writeStream.format("memory").queryName("doorscan_identity")
            .outputMode(OutputMode.Append).start()
          try q.processAllAvailable() finally q.stop()
          val sRows = spark.table("doorscan_identity")
            .collect().map(_.toString).sorted
          val bRows = Streams.substringContamMatches(train.toDF(), evalHv)
            .collect().map(_.toString).sorted
          val ok = sRows.sameElements(bRows)
          println(s"DOORSCAN identity parts=8 rows=${sRows.length} " +
            s"identical=$ok")
          require(ok, "partitioned stream diverged from batch transform")
        }
      }
      evalHv.unpersist(): Unit
    }
    spark.stop()
  }
}
