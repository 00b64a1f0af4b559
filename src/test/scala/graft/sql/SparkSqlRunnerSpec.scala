package graft.sql

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SparkSqlRunnerSpec extends SparkSpec {

  test("registered views answer full ANSI SQL with correct values") {
    val got = SparkSqlRunner.run(spark, sf,
      """SELECT n_name, count(*) AS n_cust
        |FROM nation JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name HAVING count(*) > 0""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = Tables.nation(spark, sf)
      .join(Tables.customer(spark, sf), col("n_nationkey") === col("c_nationkey"))
      .groupBy("n_name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("every catalog table is queryable by name") {
    SparkSqlRunner.run(spark, sf, "SELECT 1")
    Tables.names.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").columns.nonEmpty, t)
    }
  }

  test("the registered events view carries a usable timestamp, not raw nanos") {
    val hours = SparkSqlRunner.run(spark, sf,
      "SELECT date_trunc('hour', ts) AS h FROM events LIMIT 5")
    assert(hours.schema("h").dataType.typeName == "timestamp")
  }
}
