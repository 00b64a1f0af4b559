package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module; each module carries its own DuckDB
  * oracle twins (same keys, same output column names).
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    Relational,
    Pipeline,
    Dialect,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join + aggregation: region ⋈ nation ⋈ customer ⋈ orders ⋈
    * lineitem, revenue per nation (broadcast dims, single fact shuffle). */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q31_local_volume")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
