package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** hybridRetrieve's opt-in probe TTL: an idle probe's memo expires
  * after `probeTtlMs`, so a post-TTL redelivery RECOMPUTES and
  * RE-EMITS its (identical) fused list instead of being absorbed —
  * the at-least-once trade the scaladoc documents, and the state
  * bound an unbounded-probe deployment needs.
  *
  * Harness note (the reason the TTL is opt-in): with a
  * processing-time timeout configured, every micro-batch "requires
  * another batch" (timeouts only fire inside batches), so the engine
  * never reaches the no-new-data quiesce point and
  * `processAllAvailable()` BLOCKS FOREVER — the round-13 suite hang
  * that motivated the opt-in default. This spec therefore POLLS the
  * memory sink instead. */
class HybridTtlSpec extends SparkSpec {
  import spark.implicits._

  test("a probe redelivered after the TTL re-emits its fused list, " +
      "row-identical") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"), // near-copy: shares every bigram
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0.1f)),
      (2L, Seq(0f, 1f)), (3L, Seq(0.5f, 0.5f))).toDF("vec_id", "v")
    val postings = graft.queries.Pipeline.bm25Postings(docs)
    val probe = (0L, "alpha beta gamma delta", Seq(1f, 0f))
    val in = MemoryStream[(Long, String, Seq[Float])]
    val q = Streams.hybridRetrieve(
        in.toDF().toDF("probe_id", "text", "v"), postings,
        vecs, probeTtlMs = 500L)
      .writeStream.format("memory").queryName("hybrid_ttl")
      .outputMode(OutputMode.Update).start()
    def pollUntil(target: Long => Boolean, what: String): Long = {
      val deadline = System.currentTimeMillis() + 120000
      var n = spark.table("hybrid_ttl").count()
      while (!target(n) && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        n = spark.table("hybrid_ttl").count()
      }
      assert(target(n), s"$what (rows=$n)")
      n
    }
    try {
      in.addData(probe)
      val n1 = pollUntil(_ > 0, "the probe must retrieve something")
      // POLL for state expiry instead of one fixed sleep + one
      // redelivery: on a loaded host the engine's empty-batch loop can
      // stall past any fixed window, and a redelivery landing BEFORE
      // the 500ms timeout fires is absorbed AND refreshes the TTL —
      // the old single-shot shape could then never reach its target
      // and only died at the 120s deadline. Redeliver repeatedly with
      // a super-TTL pause between sends: eventually one send finds the
      // memo expired and re-emits. Extra absorbed sends are no-ops;
      // extra POST-TTL sends just re-emit the identical list again, so
      // the final identity check accepts any emission count ≥ 2 as
      // long as every row carries the SAME count.
      val deadline = System.currentTimeMillis() + 120000
      var n = spark.table("hybrid_ttl").count()
      while (n < 2 * n1 && System.currentTimeMillis() < deadline) {
        Thread.sleep(700) // > probeTtlMs: the memo can expire between sends
        in.addData(probe)
        Thread.sleep(300)
        n = spark.table("hybrid_ttl").count()
      }
      assert(n >= 2 * n1,
        s"a post-TTL redelivery must re-emit the fused list (rows=$n)")
      val rows = spark.table("hybrid_ttl")
        .groupBy("rnk", "doc_id", "rrf_q", "bm25_rnk", "ann_rnk")
        .agg(count(lit(1)).as("n")).collect()
      val counts = rows.map(_.getAs[Long]("n")).toSet
      assert(counts.size == 1 && counts.head >= 2L,
        s"every emission must be IDENTICAL row for row: " +
          rows.mkString(", "))
    } finally q.stop()
  }
}
