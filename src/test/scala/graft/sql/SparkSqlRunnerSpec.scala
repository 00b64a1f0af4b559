package graft.sql

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SparkSqlRunnerSpec extends SparkSpec {

  test("registered views answer full ANSI SQL") {
    val got = SparkSqlRunner.run(spark, sf,
      """SELECT n_name, count(*) AS n_cust
        |FROM nation JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name HAVING count(*) > 0""".stripMargin)
    val want = Tables.nation(spark, sf)
      .join(Tables.customer(spark, sf), col("n_nationkey") === col("c_nationkey"))
      .groupBy("n_name").count()
    assert(got.count() == want.count())
  }

  test("every catalog table is queryable by name") {
    SparkSqlRunner.run(spark, sf, "SELECT 1")
    Tables.names.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").columns.nonEmpty, t)
    }
  }
}
