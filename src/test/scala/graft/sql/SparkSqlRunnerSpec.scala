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

  test("one broken table does not take down queries that never touch it") {
    // round 8 regression: a single events-view failure inside registerAll
    // darked all 38 SQL-front-end queries. Registration must be isolated
    // per table (the reference opens each table lazily at scan creation,
    // RandomInitialPlan.java:76-89, and has exactly this property).
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft-broken-sfdir")
    Tables.names.filterNot(_ == "events").foreach { t =>
      Files.createSymbolicLink(
        tmp.resolve(s"$t.parquet"), Paths.get(s"$sf/$t.parquet")): Unit
    }
    Files.writeString(tmp.resolve("events.parquet"), "this is not parquet"): Unit
    try {
      Tables.registerAll(spark, tmp.toString)
      // untouched tables still answer (this is s04_sql_join2's shape)
      val n = spark.sql(
        """SELECT count(*) AS n FROM nation
          |JOIN customer ON n_nationkey = c_nationkey""".stripMargin)
        .collect()(0).getLong(0)
      assert(n > 0)
      // the broken table fails loudly at analysis, not silently-stale
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM events LIMIT 1").collect()
      }
    } finally {
      // restore the suite's canonical catalog for later tests
      Tables.registerAll(spark, sf)
    }
  }
}
