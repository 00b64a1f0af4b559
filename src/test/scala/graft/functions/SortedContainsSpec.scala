package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SortedContains.sortedContains

/** The binary-search membership expression: exact equivalence with
  * `array_contains` on sorted input, across both evaluation paths
  * (whole-stage codegen in a plain projection; interpreted eval inside
  * a higher-order lambda — HOFs are CodegenFallback, which is exactly
  * where the scanner uses it). */
class SortedContainsSpec extends SparkSpec {
  import spark.implicits._

  test("equivalent to array_contains on sorted arrays — randomized " +
      "plus edges, codegen path") {
    val rnd = new scala.util.Random(7)
    val cases = (0 until 200).map { i =>
      val n = rnd.nextInt(40)
      val arr = Seq.fill(n)(rnd.nextLong() % 1000).sorted
      val key =
        if (arr.nonEmpty && i % 3 == 0) arr(rnd.nextInt(arr.length))
        else rnd.nextLong() % 1000
      (arr, key)
    } ++ Seq(
      (Seq.empty[Long], 5L),
      (Seq(1L), 1L), (Seq(1L), 0L), (Seq(1L), 2L),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Long.MinValue),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Long.MaxValue),
      (Seq(-3L, -3L, 7L, 7L), -3L), // duplicates
      (Seq(-3L, -3L, 7L, 7L), 0L))
    val rows = cases.toDF("arr", "key")
      .select(sortedContains(col("arr"), col("key")).as("got"),
        array_contains(col("arr"), col("key")).as("want"))
      .collect()
    rows.zip(cases).foreach { case (r, (arr, key)) =>
      assert(r.getBoolean(0) == r.getBoolean(1),
        s"mismatch for arr=$arr key=$key")
    }
  }

  test("null array or null key yields null, like any binary expression") {
    val out = Seq((Some(Seq(1L, 2L)), None: Option[Long]),
        (None: Option[Seq[Long]], Some(1L)))
      .toDF("arr", "key")
      .select(sortedContains(col("arr"), col("key"))).collect()
    assert(out.forall(_.isNullAt(0)), s"nulls must propagate: ${out.toSeq}")
  }

  test("works inside a higher-order lambda (the scanner's shape, " +
      "interpreted path)") {
    val out = Seq((Seq(2L, 4L, 6L, 8L), Seq(1L, 2L, 3L, 4L)))
      .toDF("es", "keys")
      .select(filter(col("keys"),
        k => sortedContains(col("es"), k)).as("hits"))
      .as[Seq[Long]].head()
    assert(out == Seq(2L, 4L), s"HOF filter must keep members: $out")
  }
}
