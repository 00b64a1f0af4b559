package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Session, SparkEntry, Tables}
import graft.functions.VectorDot.vdot
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

  /** p42's search phase alone, reading the persisted quantized index:
    * integer-dot wide scan over the int8 codes, two-phase top-20, float
    * re-rank of the survivors — identical shapes to p42, minus the
    * index build. */
  private def searchOnly(s: SparkSession, qindexPath: String): DataFrame = {
    val q = s.read.parquet(qindexPath)
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pnrm"), col("qv").as("qpv"))
    val cands = q.select(col("vec_id"), col("qv"))
      .crossJoin(broadcast(probes.select(col("probe_id"), col("qpv"))))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        vdotl(col("qpv"), col("qv")).as("qsim"))
    val local = Window
      .partitionBy(col("probe_id"), pmod(hash(col("vec_id")), lit(64)))
      .orderBy(col("qsim").desc, col("vec_id").asc)
    val global = Window.partitionBy("probe_id")
      .orderBy(col("qsim").desc, col("vec_id").asc)
    val rerank = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val survivors = cands
      .withColumn("lrnk", row_number().over(local)).filter(col("lrnk") <= 20)
      .withColumn("qrnk", row_number().over(global)).filter(col("qrnk") <= 20)
      .select("probe_id", "vec_id", "qsim")
    q.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(survivors), "vec_id")
      .join(broadcast(probes.select(col("probe_id"), col("pv"),
        col("pnrm"))), "probe_id")
      .withColumn("sim",
        round(vdot(col("pv"), col("v")) / (col("pnrm") * col("nrm")), 6))
      .withColumn("rnk", row_number().over(rerank))
      .filter(col("rnk") <= 5)
      .select("probe_id", "vec_id", "rnk", "sim", "qsim")
  }
}
