package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One group of named queries plus their DuckDB oracle twins.
  *
  * Contract (driver-enforced, see /root/repo/SURVEY.md §5): each key in
  * `queries` that is SQL-expressible has the same key in `oracleSql`, with
  * IDENTICAL output column names — the correctness gate sorts columns by
  * name and hash-compares values.  Queries without an oracle get a weaker
  * rows-only check.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
}
