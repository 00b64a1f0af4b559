package graft.queries

// A/B the stage-cut structure of p02's pair build at a given sfDir:
//   1. asis      — capped bands staged (materialize=true) + final
//                  Artifacts.stage cut (the shipping shape)
//   2. nomat     — materialize=false: the self-join's two sides share
//                  the capBuckets subtree via AQE exchange reuse
//   3. nofinal   — materialize=true, but no final checkpoint cut
//   4. neither   — no capped-bands cut, no final cut
// Each variant is a full fresh build (artifact reuse off), min of N.
//   tools/run_graft.sh graft.queries.P02CutProbe <sfDir> <reps>
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

object P02CutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val spark = graft.Session.local()
    spark.conf.set("graft.artifacts.reuse", "false")

    object P extends PipelineDedup { // access the package-private builders
      def pairs(s: SparkSession, d: String, mat: Boolean): DataFrame = {
        val docs = minhashSig(s, d)
        val bands = bandRowsOf(docs)
        val cand = candidatePairs(bands, materialize = mat)
        cand
          .join(docs.select(col("doc_id").as("doc_a"), col("shset").as("sa"),
            col("n").as("na")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"), col("shset").as("sb"),
            col("n").as("nb")), "doc_b")
          .withColumn("ninter", size(array_intersect(col("sa"), col("sb"))))
          .select(col("doc_a"), col("doc_b"),
            (col("ninter").cast(DoubleType) /
              (col("na") + col("nb") - col("ninter"))).as("jaccard"))
          .filter(col("jaccard") >= JaccardThreshold)
      }
      val queries = Map.empty[String, Q]
      val oracleSql = Map.empty[String, String]
    }

    def time(label: String)(f: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"P02CUT $label min=${ts.min}%.3f " +
        f"times=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // warmup
    P.pairs(spark, sfDir, mat = true)
      .write.mode("overwrite").format("noop").save()

    time("asis")(graft.Artifacts.stage(spark, P.pairs(spark, sfDir, mat = true)))
    time("nomat")(graft.Artifacts.stage(spark, P.pairs(spark, sfDir, mat = false)))
    time("nofinal")(P.pairs(spark, sfDir, mat = true))
    time("neither")(P.pairs(spark, sfDir, mat = false))
    spark.stop()
  }
}
