package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("csvToParquet round-trips typed rows") {
    val dir = Files.createTempDirectory("graft-ingest")
    val txt = dir.resolve("in.txt")
    Files.writeString(txt, "1\talice\t10.5\n2\tbob\t20.25\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("bal", FloatType)))
    val out = dir.resolve("out.parquet").toString
    Ingest.csvToParquet(spark, txt.toString, schema, out)
    val back = spark.read.parquet(out).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getInt(0) == 1 && back(0).getString(1) == "alice"
      && back(0).getFloat(2) == 10.5f)
    assert(back(1).getInt(0) == 2 && back(1).getString(1) == "bob"
      && back(1).getFloat(2) == 20.25f)
  }
}
