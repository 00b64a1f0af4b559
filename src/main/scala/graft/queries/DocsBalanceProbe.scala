package graft.queries

// A/B docsBalanced's spread: keyless round-robin repartition(n) (pays
// sortBeforeRepartition, retry-safe only via that sort) vs hash on the
// unique doc_id (deterministic, no local sort). Timed through two real
// consumers: the minhash sketch (p02's map phase) and the shingle
// explode + h60 digest (the text-family map phase).
//   tools/run_graft.sh graft.queries.DocsBalanceProbe <sfDir> <reps>
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

object DocsBalanceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val spark = graft.Session.local()
    spark.conf.set("graft.artifacts.reuse", "false")
    val n = spark.sparkContext.defaultParallelism

    object P extends PipelineDedup {
      def sketch(docs: DataFrame): DataFrame =
        docs.select(col("doc_id"),
          graft.functions.MinHashSig.minhashSig(
            col("text"), ShingleW, NumHashes).as("ms"))
          .filter(col("ms").isNotNull)
      def grams(docs: DataFrame): DataFrame =
        shingleRowsOf(docs, ShingleW)
          .select(col("doc_id"),
            graft.functions.Portable.h60(col("shingle")).as("hv"))
      val queries = Map.empty[String, Q]
      val oracleSql = Map.empty[String, String]
    }

    def rr = Tables.documents(spark, sfDir).repartition(n)
    def keyed = Tables.documents(spark, sfDir).repartition(n, col("doc_id"))

    def time(label: String)(f: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DOCSBAL $label min=${ts.min}%.3f " +
        f"times=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    P.sketch(rr).write.mode("overwrite").format("noop").save() // warmup
    time("sketch_rr")(P.sketch(rr))
    time("sketch_keyed")(P.sketch(keyed))
    time("grams_rr")(P.grams(rr))
    time("grams_keyed")(P.grams(keyed))
    spark.stop()
  }
}
