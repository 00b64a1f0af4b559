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

  /** Register every table so `spark.sql` / the mini-SQL front end can
    * resolve bare table names — and so the cost-based optimizer has
    * statistics to reorder joins with (the Catalyst counterpart of the
    * reference's `.stat` files, `RandomOptimizer.java:126-216`).
    *
    * Nine tables become EXTERNAL catalog tables over the parquet location,
    * followed by `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS`:
    * row counts + per-column NDV/min/max live in the session catalog, which
    * is what `CostBasedJoinReorder` needs on every join input (a temp view
    * over a bare parquet read exposes only sizeInBytes, and CBO stays
    * inert). The ANALYZE scan is a one-time cost per (session, directory) —
    * [[graft.sql.SparkSqlRunner]] caches registration.
    *
    * `events` stays a temp view: its physical column is TIMESTAMP(NANOS)
    * read as a raw long, and the ns→µs conversion is an expression a
    * catalog table cannot carry. Temp views shadow catalog tables, so the
    * converted view is what name resolution finds. */
  /** Column types ANALYZE … FOR COLUMNS accepts (AnalyzeColumnCommand's
    * own support set); everything else only contributes to the row count.
    * TimestampNTZ is deliberately EXCLUDED even though ANALYZE accepts it:
    * Spark 4.1's stats estimation then dies with
    * `MatchError: TimestampNTZType` inside JoinSelectionHelper
    * .canBroadcastBySize (joins.scala:368) the first time a plan over the
    * table computes CBO stats — parquet `timestamp[ms]` columns (orders.
    * o_orderdate) arrive as NTZ, so collecting their min/max would break
    * every query that touches the table. Row count + the other columns'
    * NDVs are what join reorder needs anyway. */
  private def analyzable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType | StringType | BinaryType | BooleanType |
           DateType | TimestampType => true
      case _ => false
    }
  }

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      if (n == "events") events(spark, sfDir).createOrReplaceTempView(n)
      else {
        // a leftover temp view of the same name would shadow the catalog
        // table (and its statistics) — make the catalog entry canonical
        spark.catalog.dropTempView(n): Unit
        spark.sql(s"DROP TABLE IF EXISTS $n")
        spark.sql(
          s"CREATE TABLE $n USING parquet LOCATION '$sfDir/$n.parquet'")
        // FOR ALL COLUMNS refuses tables with any non-analyzable column
        // (embeddings carries ARRAY<FLOAT>), so enumerate the supported
        // ones; the bare form still records the row count either way
        val cols = spark.table(n).schema.fields.collect {
          case f if analyzable(f.dataType) => s"`${f.name}`"
        }
        if (cols.isEmpty) spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS")
        else spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS " +
          s"FOR COLUMNS ${cols.mkString(", ")}")
      }
    }
}
