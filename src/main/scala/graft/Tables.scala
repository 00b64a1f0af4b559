package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table catalog over a scale-factor directory.
  *
  * Spark-native replacement for the reference's serialized-tuple scan
  * (`/root/reference/src/qp/operators/Scan.java:19-109`): `spark.read.parquet`
  * gives us schema, column stats, predicate pushdown and column pruning for
  * free, and parallel split reads at cluster scale.
  */
object Tables {
  /** All driver-provided tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * with `spark.sql.legacy.parquet.nanosAsLong` (set in graft.Session) it
    * arrives as a nanos-since-epoch long, converted here to a microsecond
    * TimestampType by floor division — the same ns→µs truncation DuckDB
    * applies natively, so both engines see identical instants. */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` / the mini-SQL
    * front end can resolve bare table names. Uses the canonical per-table
    * readers, so `events.ts` is the converted microsecond timestamp every
    * other consumer sees — not the raw nanos long of the physical file. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else apply(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
