package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Streams._

/** Streaming PSI drift monitor: phase-I baseline freeze, count-based
  * windows, add-½ smoothing, standard 0.1/0.25 bands — replayed
  * driver-side row for row with the shared [[Streams.psiOf]] fold. */
class PsiDriftSpec extends SparkSpec {
  import spark.implicits._

  // bins are n_chars div 100 capped at 5: 50→0, 150→1, 550→5
  private val baseA = Seq.fill(4)(Seq(50L, 150L)).flatten // [4,4,0,0,0,0]
  private val win1A = Seq.fill(4)(Seq(50L, 150L)).flatten // in-distribution
  private val win2A = Seq.fill(8)(550L)                   // shape shift
  private val allB = Seq.fill(16)(250L)                   // stable source

  test("psiDrift freezes the baseline, scores windows, bands levels") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = psiDrift(in.toDF().toDF("doc_id", "source", "n_chars"),
        baselineDocs = 8, windowDocs = 8)
      .writeStream.format("memory").queryName("psi")
      .outputMode(OutputMode.Append).start()
    val rows =
      try {
        in.addData((baseA ++ win1A ++ win2A).zipWithIndex
          .map { case (c, i) => (i.toLong, "a", c) }: _*)
        in.addData(allB.zipWithIndex
          .map { case (c, i) => (i.toLong, "b", c) }: _*)
        q.processAllAvailable()
        spark.table("psi").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
            r.getInt(3))).sortBy(t => (t._1, t._2))
      } finally q.stop()

    // driver replay with the SAME shared fold
    def hist(cs: Seq[Long]): Seq[Long] = {
      val h = Array.fill(6)(0L)
      cs.foreach(c => h(math.min(5L, c / 100).toInt) += 1)
      h.toSeq
    }
    val want = Seq(
      ("a", 0L, psiOf(hist(baseA), 8, hist(win1A), 8)),
      ("a", 1L, psiOf(hist(baseA), 8, hist(win2A), 8)),
      ("b", 0L, psiOf(hist(allB.take(8)), 8, hist(allB.drop(8)), 8)))
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq == want)
    // bands: the in-distribution windows are stable, the shift is major
    val levels = rows.map(r => ((r._1, r._2), r._4)).toMap
    assert(levels(("a", 0L)) == 0 && levels(("b", 0L)) == 0)
    assert(levels(("a", 1L)) == 2)
    assert(rows.forall(_._3 >= 0.0), "every PSI term is nonnegative")
  }

  test("a partial window emits nothing until it closes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = psiDrift(in.toDF().toDF("doc_id", "source", "n_chars"),
        baselineDocs = 4, windowDocs = 4)
      .writeStream.format("memory").queryName("psi_partial")
      .outputMode(OutputMode.Append).start()
    try {
      var id = 0L
      def rows(cs: Seq[Long]) = cs.map { c => id += 1; (id, "c", c) }
      in.addData(rows(Seq.fill(4)(50L)): _*) // baseline only
      in.addData(rows(Seq(150L, 150L)): _*)  // half a window
      q.processAllAvailable()
      assert(spark.table("psi_partial").isEmpty,
        "phase I and open windows are silent")
      in.addData(rows(Seq(150L, 150L)): _*)  // closes the window
      q.processAllAvailable()
      val got = spark.table("psi_partial").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq ==
        Seq(("c", 0L, psiOf(Seq(4L, 0, 0, 0, 0, 0), 4,
          Seq(0L, 4, 0, 0, 0, 0), 4))))
    } finally q.stop()
  }
}
