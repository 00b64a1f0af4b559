package graft.sources

import java.nio.file.Files

import graft.{SparkSpec, Tables}

/** The point of bucketing is the ABSENCE of shuffles: co-bucketed tables
  * must sort-merge-join with no Exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans without any Exchange") {
    val dir = Files.createTempDirectory("graft-buckets")
    Bucketing.writeBucketed(Tables.customer(spark, sf),
      "b_customer", s"$dir/c", "c_custkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark, sf),
      "b_orders", s"$dir/o", "o_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark,
        "b_customer", "b_orders", "c_custkey", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      val c = Tables.customer(spark, sf)
      val o = Tables.orders(spark, sf)
      assert(joined.count() == c.join(o, c("c_custkey") === o("o_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
