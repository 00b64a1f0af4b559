package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ShingleRows.shingleRows

/** The native generator's contract: bit-identical rows to the
  * declarative explode form on corpus text AND on adversarial strings
  * (consecutive/leading/trailing spaces, unicode, short docs), plus SQL
  * callability through LATERAL VIEW. */
class ShingleRowsSpec extends SparkSpec {

  private def declarative(df: org.apache.spark.sql.DataFrame, w: Int) =
    df.select(col("doc_id"),
      explode(when(size(split(col("text"), " ")) >= w,
        transform(
          sequence(lit(1), size(split(col("text"), " ")) - (w - 1)),
          i => concat_ws(" ", slice(split(col("text"), " "), i, lit(w)))))
        .otherwise(array().cast("array<string>"))).as("shingle"))

  private def multiset(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getString(1))).groupBy(identity)
      .view.mapValues(_.length).toMap

  test("generator matches the explode form on the documents table") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val a = docs.select(col("doc_id"), shingleRows(col("text"), 3)).collect()
    val b = declarative(docs, 3).collect()
    assert(a.nonEmpty)
    assert(multiset(a) == multiset(b))
  }

  test("generator matches the explode form on adversarial strings") {
    import spark.implicits._
    val rows = Seq(
      1L -> "a b c d",
      2L -> "a  b", // empty token between consecutive spaces
      3L -> " a b", // leading space -> leading empty token
      4L -> "a b ", // trailing space -> trailing empty token
      5L -> "", // single empty token
      6L -> "   ", // only empty tokens
      7L -> "one", // shorter than w
      8L -> "héllo wörld 世界 𐍈ok end", // multi-byte codepoints
      9L -> "x y").toDF("doc_id", "text")
    for (w <- Seq(1, 2, 3, 5)) {
      val a = rows.select(col("doc_id"), shingleRows(col("text"), w)).collect()
      val b = declarative(rows, w).collect()
      assert(multiset(a) == multiset(b), s"w=$w")
    }
  }

  test("null text yields no rows; width is validated") {
    import spark.implicits._
    val rows = Seq((1L, null: String), (2L, "a b")).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"), shingleRows(col("text"), 2)).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((2L, "a b")))
    val err = intercept[Exception] {
      rows.select(shingleRows(col("text"), 0)).collect()
    }
    assert(err.getMessage.contains("width"))
  }

  test("shingle_rows is callable from SQL via LATERAL VIEW") {
    import spark.implicits._
    Seq((1L, "a b c")).toDF("doc_id", "text")
      .createOrReplaceTempView("sr_docs")
    val out = spark.sql(
      """SELECT doc_id, s.shingle
        |FROM sr_docs LATERAL VIEW shingle_rows(text, 2) s AS shingle
        |ORDER BY shingle""".stripMargin).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a b"), (1L, "b c")))
  }
}
