package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Integration contract of the corpus-scaled sizing: every codebook
  * consumer must actually WIRE the sizing functions, not a cached
  * constant — proven by running them on corpora built just past a
  * sizing boundary, where a fixed-K implementation and a scaled one
  * produce different row counts. CorpusSizingSpec pins the pure
  * thresholds; this spec pins that the operators obey them. */
object SizingIntegrationSpec {
  /** A minimal dataset dir with `n` embeddings (dense vec_ids,
    * deterministic 64-dim float vectors, labels) and every other
    * production table empty — the codebook consumers read only the
    * embeddings table. */
  def dir(n: Int): String = {
    val spark = graft.SparkSpec.spark
    val d = Files.createTempDirectory(s"graft-sizing-$n").toString
    Tables.names.foreach { t =>
      val src = spark.read.parquet(s"${graft.SparkSpec.Sf}/$t.parquet")
      if (t == "embeddings") {
        // deterministic hash-spread vectors (a short modular pattern
        // would collapse the corpus to a handful of distinct values
        // and every argmin to a handful of cells)
        import spark.implicits._
        def elem(i: Int, j: Int): Float = {
          val h = (i.toLong * 1103515245L + j.toLong * 2654435761L) >>> 16
          ((h % 101L) - 50L).toFloat
        }
        (0 until n).map { i =>
          (i.toLong, (0 until 64).map(j => elem(i, j)), i % 3)
        }.toDF("vec_id", "embedding", "label")
          .write.parquet(s"$d/$t.parquet")
      } else src.limit(0).write.parquet(s"$d/$t.parquet")
    }
    d
  }
}

class SizingIntegrationSpec extends SparkSpec {

  // one corpus past the k-means boundary (513 -> K=9, IVF 17) and one
  // well into the scaled regime (1100 -> K=18, IVF 35)
  private lazy val d513 = SizingIntegrationSpec.dir(513)
  private lazy val d1100 = SizingIntegrationSpec.dir(1100)

  test("p53 emits exactly the corpus-scaled k-means cell count") {
    assert(Pipeline.queries("p53_kmeans_cells")(spark, d513)
      .select("cell").distinct().count() <= 9)
    // every cell id must come from the scaled codebook range
    val cells = Pipeline.queries("p53_kmeans_cells")(spark, d1100)
      .select("cell").collect().map(_.getLong(0))
    assert(cells.forall(_ < 18L), s"cell ids must sit under K=18")
    assert(cells.exists(_ >= 8L),
      "a fixed K=8 implementation could never produce cell ids >= 8")
  }

  test("p100 emits one row per corpus-scaled cell, grid-complete") {
    assert(Pipeline.queries("p100_embedding_drift")(spark, d513)
      .count() == 9L)
    assert(Pipeline.queries("p100_embedding_drift")(spark, d1100)
      .count() == 18L)
  }

  test("p125 emits one row per corpus-scaled IVF cell") {
    assert(Pipeline.queries("p125_ann_ivf2")(spark, d513).count() == 17L)
    assert(Pipeline.queries("p125_ann_ivf2")(spark, d1100).count() == 35L)
  }

  test("p20/p33 assign against the corpus-scaled IVF codebook") {
    val cells33 = Pipeline.queries("p33_knn_graph")(spark, d1100)
      .select("vec_id").distinct().count()
    assert(cells33 > 0L)
    val assignedCells = Pipeline.queries("p125_ann_ivf2")(spark, d1100)
      .filter(col("n_flat") > 0).count()
    assert(assignedCells > 16L,
      "a fixed 16-centroid codebook could never populate a 17th cell")
  }

  test("p93 keeps its sample fixed-size across corpus growth") {
    // divisor: 513 docs would give D=3... but these dirs have EMPTY
    // documents tables, so p93 sees no docs and reports the empty
    // summary row rather than crashing — the sizing path must still
    // floor cleanly at D=2 with Ndocs=0
    val row = Pipeline.queries("p93_dedup_recall")(spark, d513).collect()
    assert(row.length == 1 && row.head.getLong(0) == 0L)
  }
}
