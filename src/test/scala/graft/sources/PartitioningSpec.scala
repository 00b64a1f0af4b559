package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Partition pruning: a filter on the partition column must reach the
  * scan as a PartitionFilter so non-matching directories are never read. */
class PartitioningSpec extends SparkSpec {

  test("filter on the partition column prunes directories at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf)
      .write.partitionBy("event_type").parquet(s"$dir/events")
    val q = spark.read.parquet(s"$dir/events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "value")
    val plan = q.queryExecution.executedPlan.toString
    // the filter must be INSIDE the PartitionFilters bracket — a residual
    // post-scan Filter node mentioning event_type must not satisfy this
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"no partition filter in:\n$plan")
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(q.count() == expected)
  }
}
