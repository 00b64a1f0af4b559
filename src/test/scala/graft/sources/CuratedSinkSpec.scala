package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CuratedSinkSpec extends SparkSpec {

  test("curated write partitions by (lang, source), bounds files, round-trips") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val docs = Tables.documents(spark, sf)
    CuratedSink.write(docs, s"$dir/out", maxRecordsPerFile = 10L)

    // directory layout: lang=*/source=* partitions on disk
    val langDirs = Paths.get(s"$dir/out").toFile.listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")))

    // every data file respects the record bound AND its rows arrive in
    // doc_id order (the sortWithinPartitions contract, per file)
    val files = Files.walk(Paths.get(s"$dir/out")).iterator()
    var checked = 0
    files.forEachRemaining { p =>
      if (p.toString.endsWith(".parquet")) {
        val ids = spark.read.parquet(p.toString)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids.length <= 10, s"$p has ${ids.length} records")
        assert(ids == ids.sorted, s"$p is not doc_id-ordered")
        checked += 1
      }
    }
    assert(checked > 0)

    // read back equals input (partition columns come back as strings —
    // compare on the stable key + content hash)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == docs.count())
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), md5(col("text")).as("h"),
        col("lang").cast("string"), col("source").cast("string"))
        .collect().map(_.toSeq).toSet
    assert(key(back) == key(docs))

    // a lang filter on the read side prunes directories
    val q = back.filter(col("lang") === "en").select("doc_id")
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
      s"no partition pruning in:\n$plan")
  }
}
