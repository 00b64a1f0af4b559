package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-13 operator reconciliations — the Round12OpsSpec discipline
  * for the substring family: the streaming verbatim-leak scanner must
  * be row-identical to batch p133, and p134's surgery must repair
  * exactly the docs p133 flags while leaving every clean doc
  * byte-identical. */
class Round13OpsSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.01"

  test("substringContamMatches streams the train docs to rows " +
      "identical to batch p133") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val batch = Pipeline.queries("p133_substring_contam")(spark, Sf01)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .toSet
    // the static eval shingle index an offline job ships: built with
    // the op's own machinery over the same corpus
    val docs = Tables.documents(spark, Sf01).select("doc_id", "text")
    val toks = split(col("text"), " ")
    val evalHv = docs.filter(pmod(col("doc_id"), lit(29L)) === 7)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n", size(col("t")))
      .select(explode(when(col("n") >= Pipeline.SpanW,
        sequence(lit(1), col("n") - (Pipeline.SpanW - 1)))
        .otherwise(array().cast("array<int>"))).as("j"), col("t"))
      .select(graft.functions.Portable.h60(concat_ws(" ",
        slice(col("t"), col("j"), lit(Pipeline.SpanW)))).as("hv"))
      .distinct()
    val train = docs.filter(pmod(col("doc_id"), lit(29L)) =!= 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.substringContamMatches(
        in.toDF().toDF("doc_id", "text"), evalHv)
      .writeStream.format("memory").queryName("contam_scan")
      .outputMode(OutputMode.Append).start()
    try {
      val (a, b) = train.splitAt(train.length / 2)
      in.addData(a.toSeq: _*)
      q.processAllAvailable()
      in.addData(b.toSeq: _*)
      q.processAllAvailable()
      val rows = spark.table("contam_scan").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4)))
        .toSet
      assert(rows == batch,
        s"stream/batch drift: only-stream=${(rows -- batch).take(3)} " +
          s"only-batch=${(batch -- rows).take(3)}")
    } finally q.stop()
  }

  test("the scanner at a deployment-scale eval set: padding the real " +
      "eval slice to 1e5 grams leaves the stream rows identical to " +
      "batch p133") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val batch = Pipeline.queries("p133_substring_contam")(spark, Sf01)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .toSet
    val docs = Tables.documents(spark, Sf01).select("doc_id", "text")
    val toks = split(col("text"), " ")
    val realEval = docs.filter(pmod(col("doc_id"), lit(29L)) === 7)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n", size(col("t")))
      .select(explode(when(col("n") >= Pipeline.SpanW,
        sequence(lit(1), col("n") - (Pipeline.SpanW - 1)))
        .otherwise(array().cast("array<int>"))).as("j"), col("t"))
      .select(graft.functions.Portable.h60(concat_ws(" ",
        slice(col("t"), col("j"), lit(Pipeline.SpanW)))).as("hv"))
      .distinct()
    // deterministic padding grams that no train shingle can hash to
    // (h60 of "pad<i>" strings — single-token, below the SpanW window)
    val evalHv = realEval.unionByName(spark.range(100000L)
      .select(graft.functions.Portable.h60(
        concat(lit("pad"), col("id"))).as("hv")))
    val train = docs.filter(pmod(col("doc_id"), lit(29L)) =!= 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.substringContamMatches(
        in.toDF().toDF("doc_id", "text"), evalHv)
      .writeStream.format("memory").queryName("contam_scan_1e5")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(train.toSeq: _*)
      q.processAllAvailable()
      val rows = spark.table("contam_scan_1e5").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4)))
        .toSet
      assert(rows == batch,
        s"a padded eval set must not change the scan: " +
          s"only-stream=${(rows -- batch).take(3)} " +
          s"only-batch=${(batch -- rows).take(3)}")
    } finally q.stop()
  }

  test("p134 repairs exactly p133's flagged docs and leaves clean " +
      "docs byte-identical") {
    val leaks = Pipeline.queries("p133_substring_contam")(spark, Sf01)
      .filter("verbatim_leak = 1").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val surgery = Pipeline.queries("p134_contam_surgery")(spark, Sf01)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(5))))
      .toMap
    val repaired = surgery.collect {
      case (id, (dropped, _)) if dropped > 0 => id
    }.toSet
    assert(repaired == leaks,
      s"surgery must touch exactly the flagged docs: " +
        s"extra=${repaired -- leaks} missed=${leaks -- repaired}")
    // every untouched doc reconstructs to its own text digest
    val originals = Tables.documents(spark, Sf01)
      .select(col("doc_id"), md5(concat_ws(" ",
        split(col("text"), " "))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    surgery.foreach { case (id, (dropped, cleanMd5)) =>
      if (dropped == 0L)
        assert(cleanMd5 == originals(id),
          s"clean doc $id must be byte-identical after surgery")
      else
        assert(cleanMd5 != originals(id),
          s"repaired doc $id must actually change")
    }
  }
}
