package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Session
import graft.functions.SortedContains.sortedContains
import graft.queries.Pipeline

/** Timing probe for the excision reassembly on PATHOLOGICALLY
  * self-repetitive long docs — the worst case the round-13 verdict
  * flagged: with `array_contains` the per-token membership test is
  * O(|dp|), and a doc that is one motif repeated makes |dp| ≈ n, so
  * reassembly went quadratic per doc. exciseRuns now probes a sorted
  * long array with the native binary search; this tool measures
  * (a) the isolated reassembly kernel A/B (linear vs bsearch) on the
  * exact (t, dp) shape exciseRuns builds, and (b) the full
  * substringStripOf end-to-end on the same corpus.
  *
  *   sbt "runMain graft.tools.ExciseBench [docs] [motifReps]"
  */
object ExciseBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(64)
    val reps = args.lift(1).map(_.toInt).getOrElse(600)
    val spark = Session.local()
    // each doc: a 10-token motif repeated `reps` times (n = 10·reps
    // tokens); the substring pass keeps the first motif copy and
    // drops every later position, so |dp| = n − 10 ≈ n
    val motif = (0 until 10).map(i => s"m$i").mkString(" ")
    val doc = Seq.fill(reps)(motif).mkString(" ")
    val n = 10 * reps
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"), lit(doc).as("text"))
      .cache()
    docs.count()
    // the reassembly kernel input exciseRuns builds on this corpus:
    // the doc's token array + the dropped-position set [11, n]
    val kern = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"),
        sequence(lit(11L), lit(n.toLong)).as("dp"))
      .cache()
    kern.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def kernel(native: Boolean): Double = {
      val clean = transform(filter(sequence(lit(1), lit(n)),
        p => if (native) !sortedContains(col("dp"), p.cast(LongType))
          else !array_contains(col("dp"), p.cast(LongType))),
        p => element_at(col("t"), p))
      time(kern.select(md5(array_join(clean, " ")))
        .write.mode("overwrite").format("noop").save())
    }
    kernel(native = true): Unit // warmup
    val tb = (1 to 3).map(_ => kernel(native = true)).min
    val tl = (1 to 3).map(_ => kernel(native = false)).min
    val te = (1 to 3).map(_ => time(
      Pipeline.substringStripOf(docs.toDF())
        .write.mode("overwrite").format("noop").save())).min
    println(f"EXCISE docs=$nDocs tokens/doc=$n |dp|/doc=${n - 10} " +
      f"kernel_linear=$tl%.3f kernel_bsearch=$tb%.3f " +
      f"speedup=${tl / tb}%.2fx full_substring_strip=$te%.3f")
    spark.stop()
  }
}
