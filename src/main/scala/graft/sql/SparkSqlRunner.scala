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
  // last directory registered per session — re-registering 10 views (10
  // parquet footer reads) on every statement would be pure overhead
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Idempotent per-(session, directory) registration — the ANALYZE pass
    * in registerAll scans each table once, so callers (the ANSI runner and
    * the mini-SQL planner) share this cache instead of re-collecting. */
  def ensureRegistered(spark: SparkSession, sfDir: String): Unit =
    registered.synchronized {
      if (registered.get(spark) != sfDir) {
        Tables.registerAll(spark, sfDir)
        registered.put(spark, sfDir): Unit
      }
    }

  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    ensureRegistered(spark, sfDir)
    spark.sql(sql)
  }
}
