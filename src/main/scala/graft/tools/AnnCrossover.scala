package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Session, SparkEntry, Tables}
import graft.functions.VectorDot.{cos6, vdot}
import graft.functions.VectorDotLong.vdotl

/** Crossover probe for the quantized-ANN claim: p42's int8 scan pays a
  * fixed overhead (quantization pass + re-rank joins) to make the wide
  * per-candidate work an integer dot over 1-byte codes. At small corpus
  * the overhead dominates; the claim is that the cheaper wide phase wins
  * once the corpus is large enough. This measures both shapes over
  * blown-up embeddings corpora (shifted ids, same dim) at several
  * multipliers and prints the measured ratio at each, so the crossover
  * is a recorded number instead of an asymptotic argument.
  *
  *   sbt "runMain graft.tools.AnnCrossover <sfDir> [mults] [reps] [work]"
  *   (defaults: /root/testdata/sf0.1  5,25,50  3  /tmp/graft-annx)
  */
object AnnCrossover {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("bandwidth")) { bandwidth(args.drop(1)); return }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).getOrElse("5,25,50").split(",").map(_.trim.toInt)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val work = args.lift(3).getOrElse("/tmp/graft-annx")
    val spark = Session.local()

    def time(name: String, dir: String): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    val emb = Tables.embeddings(spark, sfDir)
    val maxVec = emb.agg(max("vec_id")).head.getLong(0) + 1

    // warm the session (first run pays codegen + IO warmup)
    time("p04_ann_cosine_topk", sfDir)
    val base04 = time("p04_ann_cosine_topk", sfDir)
    val base42 = time("p42_ann_quantized", sfDir)
    println(f"ANNX mult=1 n=$maxVec p04=$base04%6.2f p42=$base42%6.2f " +
      f"ratio=${base42 / base04}%5.2f")

    mults.foreach { m =>
      val dir = s"$work/m$m"
      // probe ids (vec_id < 5) exist once; every copy shifts ids up
      (0 until m).map(k => emb.withColumn("vec_id",
          col("vec_id") + lit(k * maxVec)))
        .reduce(_ unionAll _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
      val t04 = time("p04_ann_cosine_topk", dir)
      val t42 = time("p42_ann_quantized", dir)
      // amortized variant: the quantized index persisted once (the
      // production deployment of p42 — built at ingest, reused by every
      // probe batch), so a query pays ONLY the int8 scan + re-rank
      graft.queries.Pipeline.quantizedVectors(spark, dir)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/qindex.parquet")
      val tAmort = {
        val runs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          searchOnly(spark, s"$dir/qindex.parquet")
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        runs.min
      }
      println(f"ANNX mult=$m n=${m * maxVec} p04=$t04%6.2f p42=$t42%6.2f " +
        f"ratio=${t42 / t04}%5.2f p42amort=$tAmort%6.2f " +
        f"amortRatio=${tAmort / t04}%5.2f")
    }
    spark.stop()
  }

  /** The bandwidth-bound regime probe (round-9 VERDICT item 6): the
    * local-scale table above is CPU-bound — at 64 dims a 100k corpus
    * fits in cache, so the int8 scan buys nothing. This mode generates
    * a deterministic synthetic corpus large enough that the float
    * vectors no longer fit in any cache (2M × 256-d float32 = 2.0 GB vs
    * 0.5 GB of int8 codes) and measures the same three shapes, so the
    * "wins once the scan is memory-bound" half of the claim gets a
    * recorded number too.
    *
    *   sbt "runMain graft.tools.AnnCrossover bandwidth [n] [dim] [reps] [work]"
    *   (defaults: 2000000  256  3  /tmp/graft-annx-bw)
    */
  private def bandwidth(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(256)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val work = args.lift(3).getOrElse("/tmp/graft-annx-bw")
    val spark = Session.local()
    // hash-derived floats in [-1, 1): deterministic, incompressible —
    // the parquet bytes on disk track the in-memory footprint
    spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          ((pmod(hash(col("id"), i), lit(20001)) - lit(10000)) /
            lit(10000.0)).cast("float")).as("embedding"),
        lit(0).as("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$work/embeddings.parquet")
    def time(thunk: => DataFrame): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        thunk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    // ONE untimed warmup pass (codegen + parquet footers; a multi-GB
    // scan per pass, so not time()'s full rep count), then the shapes —
    // min-of-reps absorbs each shape's own first-rep codegen
    SparkEntry.queries("p04_ann_cosine_topk")(spark, work)
      .write.mode("overwrite").format("noop").save()
    val t04 = time(SparkEntry.queries("p04_ann_cosine_topk")(spark, work))
    val t42 = time(SparkEntry.queries("p42_ann_quantized")(spark, work))
    graft.queries.Pipeline.quantizedVectors(spark, work)
      .write.mode(SaveMode.Overwrite).parquet(s"$work/qindex.parquet")
    val tAmort = time(searchOnly(spark, s"$work/qindex.parquet"))
    // the int8 SCAN phase alone (candidate top-20 over the codes, no
    // re-rank): the byte-for-byte twin of p04's float scan, isolating
    // the bandwidth claim from the re-rank's implementation
    val tScan = time(scanPhase(spark, s"$work/qindex.parquet"))
    println(f"ANNX-BW n=$n dim=$dim p04=$t04%6.2f p42=$t42%6.2f " +
      f"ratio=${t42 / t04}%5.2f p42amort=$tAmort%6.2f " +
      f"amortRatio=${tAmort / t04}%5.2f qscan=$tScan%6.2f " +
      f"qscanRatio=${tScan / t04}%5.2f")
    spark.stop()
  }

  /** The integer-dot candidate phase over the persisted codes: wide scan
    * of (vec_id, qv) ONLY — 1 byte per dimension off disk — into the
    * two-phase top-20. This is the half of p42 the bandwidth claim is
    * about; [[searchOnly]] adds the float re-rank on top. */
  private def scanPhase(s: SparkSession, qindexPath: String): DataFrame = {
    val q = s.read.parquet(qindexPath)
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("qv").as("qpv"))
    val cands = q.select(col("vec_id"), col("qv"))
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        vdotl(col("qpv"), col("qv")).as("qsim"))
    val local = Window
      .partitionBy(col("probe_id"), pmod(hash(col("vec_id")), lit(64)))
      .orderBy(col("qsim").desc, col("vec_id").asc)
    val global = Window.partitionBy("probe_id")
      .orderBy(col("qsim").desc, col("vec_id").asc)
    cands
      .withColumn("lrnk", row_number().over(local)).filter(col("lrnk") <= 20)
      .withColumn("qrnk", row_number().over(global)).filter(col("qrnk") <= 20)
      .select("probe_id", "vec_id", "qsim")
  }

  /** p42's search phase alone, reading the persisted quantized index:
    * integer-dot wide scan over the int8 codes, two-phase top-20, float
    * re-rank of the survivors — identical shapes to p42, minus the
    * index build. */
  private def searchOnly(s: SparkSession, qindexPath: String): DataFrame = {
    val q = s.read.parquet(qindexPath)
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pnrm"), col("qv").as("qpv"))
    val rerank = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val survivors = scanPhase(s, qindexPath)
    q.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(survivors), "vec_id")
      .join(broadcast(probes.select(col("probe_id"), col("pv"),
        col("pnrm"))), "probe_id")
      .withColumn("sim",
        cos6(vdot(col("pv"), col("v")), col("pnrm") * col("nrm")))
      .withColumn("rnk", row_number().over(rerank))
      .filter(col("rnk") <= 5)
      .select("probe_id", "vec_id", "rnk", "sim", "qsim")
  }
}
