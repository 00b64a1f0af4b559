package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.streaming.Streams

/** Deployment-scale probe for the OTHER two door scanners (the
  * DoorScanBench discipline applied to the remaining trio members):
  *
  *  - [[Streams.contaminationMatches]] (lexical n-gram screen)
  *    against gram sets of 1e5 and 1e6 hashes
  *  - [[Streams.semanticContamMatches]] (paraphrase screen) against
  *    eval embedding matrices of 1e3 / 1e4 / 1e5 64-dim vectors
  *
  * The scanners are stateless row transforms, so the batch apply IS
  * the stream's per-row work (DoorScanBench showed stream overhead is
  * one MemoryStream partition + micro-batch setup). Min-of-3, noop
  * sink.
  *
  *   sbt "runMain graft.tools.SemScanBench [sfDir] [mult] [lexSizes] [semSizes]"
  * (size lists comma-separated; "-" skips that scanner)
  */
object SemScanBench {
  private def sizes(arg: Option[String], dflt: Seq[Long]): Seq[Long] =
    arg match {
      case None => dflt
      case Some("-") => Nil
      case Some(s) => s.split(",").toSeq.map(_.trim.toLong)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(20)
    val lexSizes = sizes(args.lift(2), Seq(100000L, 1000000L))
    val semSizes = sizes(args.lift(3), Seq(1000L, 10000L, 100000L))
    val spark = Session.local()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // ---- lexical gram screen ----
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val maxId = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1
    val docs = (0 until mult).map(i => docs0.select(
        (col("doc_id") + lit(i * maxId)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism).cache()
    val nDocs = docs.count()
    for (e <- lexSizes) {
      // deterministic synthetic gram hashes in h60 range
      val grams = spark.range(e)
        .select((col("id") * 2654435761L % (1L << 60)).as("g")).cache()
      grams.count(): Unit
      def once(): Double = time(
        Streams.contaminationMatches(docs.toDF(), grams)
          .write.mode("overwrite").format("noop").save())
      once(): Unit
      val t = (1 to 3).map(_ => once()).min
      println(f"LEXSCAN grams=$e docs=$nDocs t=$t%.3f (${nDocs / t}%.0f rows/s)")
      grams.unpersist(): Unit
    }
    // ---- semantic screen ----
    val vecs0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val maxV = vecs0.agg(max(col("vec_id"))).head().getLong(0) + 1
    val vecs = (0 until mult).map(i => vecs0.select(
        (col("vec_id") + lit(i * maxV)).as("vec_id"), col("v")))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism).cache()
    val nVecs = vecs.count()
    for (e <- semSizes) {
      // deterministic synthetic unit-ish 64-dim eval vectors
      val evalVecs = spark.range(e)
        .select(col("id").as("eval_id"),
          transform(sequence(lit(1), lit(64)), i =>
            (sin(col("id") * i.cast("double") * 0.7 + i.cast("double"))
              ).cast("float")).as("evv")).cache()
      evalVecs.count(): Unit
      def once(): Double = time(
        Streams.semanticContamMatches(vecs.toDF(), evalVecs)
          .write.mode("overwrite").format("noop").save())
      once(): Unit
      val t = (1 to 3).map(_ => once()).min
      println(f"SEMSCAN eval=$e vecs=$nVecs t=$t%.3f (${nVecs / t}%.0f rows/s)")
      evalVecs.unpersist(): Unit
    }
    spark.stop()
  }
}
