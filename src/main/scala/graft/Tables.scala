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

  /** Parquet schema per (path, mtime): `spark.read.parquet` with no
    * schema runs a footer-reading Spark JOB per call (~100 ms on this
    * host), and every query invocation re-reads every table it touches —
    * ~35% of the sf0.1 bench was this planning tax (OPTIMIZATION_r17.md
    * §measure). A real deployment resolves schemas from a catalog once;
    * this cache is that catalog for the DataFrame path. Keyed on the
    * file's mtime so a rewritten fixture (tests, ScaleUp rungs) can
    * never serve a stale schema; only metadata is cached — every query
    * still scans the parquet data itself. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Long), org.apache.spark.sql.types.StructType]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val f = new java.io.File(path)
    val key = (f.getAbsolutePath, f.lastModified)
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Scale-adaptive scan balancing: `df` repartitioned to the session
    * default parallelism when the table's scan would otherwise run on
    * (much) fewer tasks than cores — the byte-sized-parallelism class
    * from the round-16 sf10 audit, which also governs the driver's
    * single-row-group bench files: every map-side stage (filters, join
    * probes, partial aggregation, per-row digests) inherits a ONE-task
    * scan no matter how heavy its per-row work is, and AQE cannot see it
    * (it sizes by bytes, not FLOPs).
    *
    * The split estimate is the same arithmetic Spark's own
    * FilePartition packing uses (bytes / maxPartitionBytes, one split
    * floor per file), so the guard self-disables exactly where the scan
    * is already wide: at 100 TB the condition is false and the plan is
    * untouched — no repartition shuffle is ever added where the input
    * is properly split. Keys make the exchange deterministic (guide
    * §2.5: hash on a real high-cardinality column, never rand()). */
  private[graft] def balanced(s: SparkSession, d: String, name: String,
      keys: Seq[String]): DataFrame = {
    val df = apply(s, d, name)
    val cores = s.sparkContext.defaultParallelism
    if (scanSplits(s, s"$d/$name.parquet") * 2 >= cores) df
    else df.repartition(cores, keys.map(col): _*)
  }

  /** Spark's split count for a parquet path: ceil(bytes/maxSplit) summed
    * per file. Over-estimates when row groups clump (a single-row-group
    * file larger than maxSplit still scans as one task), which errs
    * toward NOT repartitioning at big rungs — the safe side. */
  private def scanSplits(s: SparkSession, path: String): Long = {
    val maxSplit = s.sessionState.conf.filesMaxPartitionBytes
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else if (f.getName.endsWith(".parquet") || f.getName.startsWith("part-"))
        math.max(1L, (f.length() + maxSplit - 1) / maxSplit)
      else 0L
    math.max(1L, walk(new java.io.File(path)))
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** The driver has shipped `events.ts` under two physical parquet
    * encodings across rounds — TIMESTAMP(NANOS) (rounds ≤7; Spark's reader
    * rejects it, so `spark.sql.legacy.parquet.nanosAsLong` in graft.Session
    * surfaces it as a nanos-since-epoch long) and `timestamp[us]` with
    * isAdjustedToUTC=false (round 8+; Spark reads TimestampNTZType). The
    * data contract here is *instants*, not encodings: inspect the scanned
    * dtype and normalize every variant to the same microsecond, session-UTC
    * TimestampType, so downstream queries and the DuckDB oracle agree
    * regardless of which encoding a regeneration produced.
    *
    * - long → `timestamp_micros(ts div 1000)`: the same ns→µs truncation
    *   DuckDB applies natively;
    * - TimestampNTZ → cast to TimestampType: the session zone is pinned to
    *   UTC, so the naive wall-clock becomes the identical UTC instant;
    * - TimestampType → already the target type.
    *
    * EventsContractSpec pins all three paths against fixture files so the
    * next silent regeneration turns a test red instead of darking the gate. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType          =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType  =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType     => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported physical type $other — " +
        "extend Tables.normalizeTs for the new testdata encoding")
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(apply(s, d, "events"))
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
    * `events` needs a normalization expression a catalog table cannot
    * carry (normalizeTs), so it is registered as catalog table `events_raw`
    * (ANALYZE'd like the rest) plus temp view `events` projecting the
    * normalized `ts` over it — Catalyst's ProjectEstimation propagates the
    * raw table's row count and per-column stats through the aliasing
    * projection, so CBO sees events joins like any other table's. */
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

  /** Register one table: external catalog entry + column statistics.
    * `events` additionally gets a normalized-ts temp view (see above). */
  private def registerOne(spark: SparkSession, sfDir: String, n: String): Unit = {
    val table = if (n == "events") "events_raw" else n
    // a leftover temp view of the same name would shadow the catalog
    // table (and its statistics) — make the catalog entry canonical; for
    // events, drop the derived view FIRST so a failure below leaves no
    // stale view silently answering with a previous directory's data
    if (n == "events") spark.catalog.dropTempView(n): Unit
    spark.catalog.dropTempView(table): Unit
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // LOCATION resolves RELATIVE paths against the warehouse dir, not
    // the process CWD — a relative sfDir (e.g. the scale rungs under
    // tools/) would register ten empty tables and fail every SQL query
    // with UNABLE_TO_INFER_SCHEMA while the DataFrame path reads the
    // same directory fine. Qualify it once here.
    val loc = new java.io.File(s"$sfDir/$n.parquet")
      .getAbsoluteFile.toURI.toString
    spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$loc'")
    // FOR ALL COLUMNS refuses tables with any non-analyzable column
    // (embeddings carries ARRAY<FLOAT>), so enumerate the supported
    // ones; the bare form still records the row count either way
    val cols = spark.table(table).schema.fields.collect {
      case f if analyzable(f.dataType) => s"`${f.name}`"
    }
    if (cols.isEmpty) spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    else spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS " +
      s"FOR COLUMNS ${cols.mkString(", ")}")
    if (n == "events")
      normalizeTs(spark.table(table)).createOrReplaceTempView(n)
  }

  /** Per-table registration is failure-isolated: one table with a broken
    * path or an unreadable encoding must not take down queries that never
    * reference it (the reference has the same property — each table is
    * opened lazily at scan creation, `RandomInitialPlan.java:76-89`). A
    * failed table is left unregistered, so a query that *does* reference it
    * fails loudly at analysis with TABLE_OR_VIEW_NOT_FOUND; the collected
    * causes are rethrown only if *every* table failed (a wrong sfDir). */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val failures = names.flatMap { n =>
      try { registerOne(spark, sfDir, n); None }
      catch { case e: Exception =>
        System.err.println(
          s"[graft] registration of table '$n' failed (queries over it " +
          s"will not resolve): ${e.getMessage}")
        // drop any half-registered state so resolution fails cleanly
        try {
          spark.catalog.dropTempView(n): Unit
          spark.sql(s"DROP TABLE IF EXISTS ${if (n == "events") "events_raw" else n}"): Unit
        } catch { case _: Exception => () }
        Some(n -> e)
      }
    }
    if (failures.size == names.size)
      throw new IllegalStateException(
        s"every table failed to register from $sfDir — first cause: " +
        failures.head._2.getMessage, failures.head._2)
  }
}
