package graft.queries

// A/B the connected-components round shape (p32 family / the
// dup_cluster_labels artifact build):
//   join  — per-round convergence via next ⋈ labels (the pre-r17 shape)
//   carry — old label carried through the round's one keyed aggregation;
//           convergence is a map-side filter over the staged next
// Both run the FULL build from the raw corpus (reuse off), min of N.
//   tools/run_graft.sh graft.queries.P32CcProbe <sfDir> <reps>
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Stage.StageOps

object P32CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val spark = graft.Session.local()
    spark.conf.set("graft.artifacts.reuse", "false")

    object P extends PipelineDedup {
      def cc(s: SparkSession, d: String, carry: Boolean): DataFrame = {
        val pairs = nearDupPairs(s, d).select(col("doc_a"), col("doc_b"))
        val edges = pairs
          .union(pairs.select(col("doc_b"), col("doc_a")))
          .toDF("src", "dst").staged
        var labels = edges.select(col("src").as("doc_id")).distinct()
          .withColumn("lbl", col("doc_id")).staged
        var converged = false
        var rounds = 0
        while (!converged) {
          rounds += 1
          require(rounds <= 64, "no convergence")
          if (carry) {
            val viaNeighbor = edges
              .join(labels.select(col("doc_id").as("dst"), col("lbl")), "dst")
              .select(col("src").as("doc_id"), col("lbl"),
                lit(null).cast(LongType).as("old"))
            val viaParent = labels
              .join(labels.select(col("doc_id").as("lbl"),
                col("lbl").as("plbl")), "lbl")
              .select(col("doc_id"), col("plbl").as("lbl"),
                lit(null).cast(LongType).as("old"))
            val next = labels
              .select(col("doc_id"), col("lbl"), col("lbl").as("old"))
              .union(viaNeighbor).union(viaParent)
              .groupBy("doc_id").agg(min(col("lbl")).as("lbl"),
                max(col("old")).as("old"))
              .staged
            converged = next.filter(col("lbl") < col("old")).isEmpty
            labels = next.select(col("doc_id"), col("lbl"))
          } else {
            val viaNeighbor = edges
              .join(labels.select(col("doc_id").as("dst"), col("lbl")), "dst")
              .select(col("src").as("doc_id"), col("lbl"))
            val viaParent = labels
              .join(labels.select(col("doc_id").as("lbl"),
                col("lbl").as("plbl")), "lbl")
              .select(col("doc_id"), col("plbl").as("lbl"))
            val next = labels.union(viaNeighbor).union(viaParent)
              .groupBy("doc_id").agg(min(col("lbl")).as("lbl"))
              .staged
            converged = next
              .join(labels.withColumnRenamed("lbl", "old"), "doc_id")
              .filter(col("lbl") < col("old"))
              .isEmpty
            labels = next
          }
        }
        labels.select(col("doc_id"), col("lbl").as("cluster_id"),
          when(col("lbl") === col("doc_id"), 1).otherwise(0).as("keep"))
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
      println(f"P32CC $label min=${ts.min}%.3f " +
        f"times=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // result-identity spot check before timing: both variants, same rows
    val a = P.cc(spark, sfDir, carry = false)
    val b = P.cc(spark, sfDir, carry = true)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"P32CC rows_diff=$diff (must be 0)")

    time("join")(P.cc(spark, sfDir, carry = false))
    time("carry")(P.cc(spark, sfDir, carry = true))
    spark.stop()
  }
}
