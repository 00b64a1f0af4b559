package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.queries.Pipeline
import graft.streaming.Streams._

/** The batch/streaming PSI twin contract, proven row for row — the
  * CUSUM twin's pattern applied to the PSI family: ONE synthetic
  * corpus is driven through batch [[Pipeline.psiBaselineDriftOf]]
  * (doc_id order standing in for arrival order) AND through streaming
  * [[Streams.psiDrift]] via MemoryStream in doc_id order, and every
  * (source, window_idx, psi, level) row must be identical — same
  * sizing passed to both paths, same add-½
  * smoothing, same qlog2 fixed-point log2, same bin-ordered fold.
  * Two sources (one drifting, one stable) also prove per-key
  * baseline independence. */
class PsiTwinSpec extends SparkSpec {
  import spark.implicits._

  // per source: 32 baseline docs + 3 full windows of 16 + a partial
  // tail of 5 (must be silent on both paths). Source "a" drifts in
  // window 2 (lengths jump into bin 5); "b" stays in-distribution.
  private def lengths(src: String): Seq[Long] = {
    val base = (0 until 32).map(i => if (i % 2 == 0) 50L else 150L)
    val w0 = (0 until 16).map(i => if (i % 2 == 0) 50L else 150L)
    val w1 = (0 until 16).map(i => if (i % 4 == 0) 250L else 50L)
    val w2 =
      if (src == "a") Seq.fill(16)(550L)
      else (0 until 16).map(i => if (i % 2 == 0) 150L else 50L)
    val tail = Seq.fill(5)(50L)
    base ++ w0 ++ w1 ++ w2 ++ tail
  }

  private def docs: Seq[(Long, String, Long)] =
    for {
      (src, off) <- Seq("a" -> 0L, "b" -> 1000L)
      (len, i) <- lengths(src).zipWithIndex
    } yield (off + i, src, len)

  test("batch p124 and streaming psiDrift emit identical rows for " +
      "one corpus") {
    val df = docs.toDF("doc_id", "source", "n_chars")
    val batchRows = Pipeline.psiBaselineDriftOf(df, baselineDocs = 32, windowDocs = 16).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getInt(3)))).toMap

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = psiDrift(in.toDF().toDF("doc_id", "source", "n_chars"),
        baselineDocs = 32, windowDocs = 16)
      .writeStream.format("memory").queryName("psi_twin")
      .outputMode(OutputMode.Append).start()
    val streamRows =
      try {
        // arrival order = doc_id order, split across two microbatches
        // at an arbitrary boundary (the fold is batch-boundary
        // invariant; each batch folds in doc_id order)
        val (first, rest) = docs.sortBy(_._1).splitAt(40)
        in.addData(first: _*)
        in.addData(rest: _*)
        q.processAllAvailable()
        spark.table("psi_twin").collect()
          .map(r => ((r.getString(0), r.getLong(1)),
            (r.getDouble(2), r.getInt(3)))).toMap
      } finally q.stop()

    assert(batchRows.size == 6, s"3 full windows x 2 sources, got " +
      s"${batchRows.keys.toSeq.sorted}")
    assert(streamRows == batchRows,
      s"twin divergence:\n batch=$batchRows\n stream=$streamRows")
    // the planted drift alarms only on the drifting source
    assert(batchRows(("a", 2L))._2 == 2)
    assert(batchRows(("b", 2L))._2 == 0)
    assert(Seq(("a", 0L), ("b", 0L)).forall(k => batchRows(k)._2 == 0))
  }
}
