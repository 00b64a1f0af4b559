package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Full ANSI Spark SQL over the catalog — the second query front end next
  * to the reference-dialect parser (MiniSql). `Tables.registerAll` exposes
  * every table of a scale-factor directory as a temp view, after which any
  * Spark SQL statement runs against them; a reference user gets their
  * mini-SQL dialect via MiniSqlPlanner and the full modern surface here.
  */
object SparkSqlRunner {
  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(sql)
  }
}
