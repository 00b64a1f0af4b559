package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, FloatType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 read path for the reference's text table format: a
  * directory (or single file) of tab-delimited data rows plus a `.det`
  * schema sidecar — the layout `RandomDB` emits and `ConvertTxtToTbl`
  * serializes (/root/reference/src/RandomDB.java:32-111,
  * /root/reference/src/ConvertTxtToTbl.java:16-75). Where the
  * reference's `Scan` re-reads one Java-serialized `.tbl` file
  * sequentially on a single thread
  * (/root/reference/src/qp/operators/Scan.java:19-109), this source
  * plans ONE INPUT PARTITION PER DATA FILE — a sharded table written by
  * [[TextTables.write]] scans in parallel across executors — and
  * participates in Catalyst's V2 pushdown negotiation:
  *
  *  - column pruning ([[SupportsPushDownRequiredColumns]]): only the
  *    columns a query touches are converted; a 2-column projection over
  *    a 40-column table parses positions, not values (the reference has
  *    no pruning at all — intermediate tuples carry every column,
  *    SURVEY §4.1);
  *  - filter pushdown ([[SupportsPushDownFilters]]): the six reference
  *    comparison ops (`Select.java:130-220`) on INT/STRING/REAL columns
  *    are evaluated during the scan, before row materialization, and
  *    reported in the plan (`PushedFilters: [...]`).
  *
  * The `.det` sidecar grammar (RandomDB.java:54-111): two header lines
  * (column count, tuple byte size), then one line per column —
  * `<colname> <INTEGER|STRING|REAL> <range> <PK|FK|NK> <bytes>`; only
  * name and type matter for reading, the rest is generator/statistics
  * input and is ignored here. Types map INT→IntegerType, STRING→
  * StringType, REAL→FloatType exactly as the reference's three-type
  * system (Attribute.java:11-13).
  *
  * Splitting granularity is the FILE, not a byte range: text rows have
  * no block structure to align ranges to without a first scan, and the
  * write path already shards into as many part files as there were
  * tasks, which is the parallelism that matters. (A 100 TB deployment
  * would ingest to parquet once via [[Ingest.csvToParquet]] and scan
  * that; this source exists so the reference's own on-disk layout is a
  * first-class, pruning-aware table.)
  */
class TextTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-txt"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TextTables.schemaAt(TextTables.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TextTable(schema,
      TextTables.pathOf(new CaseInsensitiveStringMap(properties)))
}

private[sources] class TextTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_txt(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TextScanBuilder(tableSchema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TextWriteBuilder(info.schema(), path)
}

/** DSv2 write builder: append by default; `mode("overwrite")` arrives
  * as [[SupportsTruncate.truncate]] (Spark plans it as
  * OverwriteByExpression(true), legal because the table declares the
  * TRUNCATE capability). */
private[sources] class TextWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  // fail before any task launches, not inside an executor
  schema.fields.foreach { f =>
    require(Seq(IntegerType, StringType, FloatType).contains(f.dataType),
      s"graft-txt supports INTEGER/STRING/REAL only; ${f.name} is ${f.dataType}")
  }
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    // append must match the existing table's sidecar schema, or the new
    // shards would be unreadable under the (rewritten) sidecar — checked
    // here, before any task launches; overwrite replaces the schema.
    if (!doTruncate) {
      // Only the two "table does not exist yet" shapes mean first-write:
      // the path itself is absent, or the directory exists with no .det
      // sidecar. Any OTHER failure (transient fs error, corrupt or
      // unparseable sidecar) must fail the append — silently skipping
      // the check would let job commit REPLACE schema.det and strand the
      // pre-existing shards under a mismatched schema.
      val existing = try Some(TextTables.schemaAt(path)) catch {
        case _: java.io.FileNotFoundException => None // no table yet
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.contains("no .det schema sidecar") =>
          None // directory exists but was never sidecar-committed
      }
      existing.foreach { ex =>
        require(ex.fields.map(f => (f.name, f.dataType)).toSeq ==
          schema.fields.map(f => (f.name, f.dataType)).toSeq,
          s"append schema ${schema.catalogString} does not match " +
            s"existing graft-txt table schema ${ex.catalogString} at $path")
      }
    }
    new TextWrite(schema, path, doTruncate)
  }
}

/** Two-phase-commit batch write in the reference's text layout. Each
  * task streams its rows to a DOT-PREFIXED temp file — invisible to
  * concurrent readers because [[TextTables.dataFiles]] skips dot files —
  * and its commit message carries (temp, final) names; task attempts are
  * isolated by the (partitionId, taskId) pair in the temp name and the
  * default commit coordinator admits one commit per partition. Job
  * commit deletes the previous generation's data files when truncating,
  * renames every temp into place, and writes the `.det` sidecar last;
  * job abort deletes the temps and leaves the previous generation
  * untouched. (Per-file rename commit, the FileOutputCommitter-v2
  * trade-off: a driver death mid-commit can leave a mixed generation —
  * the documented non-atomicity of path-based tables.) */
private[sources] class TextWrite(schema: StructType, path: String,
    truncate: Boolean) extends Write with BatchWrite {

  private val writeId = java.util.UUID.randomUUID().toString

  override def toBatch: BatchWrite = this

  /** Micro-batch streaming sink over the same two-phase commit. Shard
    * names carry the EPOCH instead of a random write id, so a replayed
    * epoch (restart after a crash between sink commit and checkpoint
    * advance) rewrites the very same final names instead of duplicating
    * rows — per-epoch idempotence, which with deterministic batches is
    * the file-sink exactly-once story. Append only: Complete-mode
    * truncation per epoch would discard prior epochs' data. */
  override def toStreaming: StreamingWrite = {
    require(!truncate,
      "graft-txt streaming write supports Append output mode only")
    new TextStreamingWrite(schema, path)
  }

  override def description(): String =
    s"GraftTextWrite path: $path, truncate: $truncate"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    // executor-side fs access must see the user's session fs settings
    // (s3a credentials, HA nameservices, …): ship the session Hadoop
    // conf once per executor as a broadcast, not per-task in the closure
    TextWriterFactory(path, writeId, schema.fields.map(_.dataType),
      TextTables.broadcastHadoopConf())

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    TextWrite.commitShards(schema, path, truncate, messages)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    TextWrite.abortShards(path, messages)
}

private[sources] object TextWrite {
  /** Job/epoch commit shared by the batch and streaming paths: optionally
    * clear the previous generation, rename every temp shard into place
    * (idempotently — a shard already renamed by an earlier commit attempt
    * is left as-is), then write the `.det` sidecar last. */
  def commitShards(schema: StructType, path: String, truncate: Boolean,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val f = dir.getFileSystem(TextTables.hadoopConf())
    if (!f.exists(dir)) f.mkdirs(dir)
    val committed = messages.collect { case m: TextFileCommitted => m }
    if (truncate)
      TextTables.dataFiles(path).foreach(q => f.delete(new Path(q), false))
    committed.foreach { m =>
      val dst = new Path(m.finalPath)
      val tmp = new Path(m.tempPath)
      if (f.exists(tmp)) {
        f.delete(dst, false)
        require(f.rename(tmp, dst),
          s"rename ${m.tempPath} -> ${m.finalPath} failed")
      } else require(f.exists(dst),
        s"shard ${m.finalPath} missing and temp ${m.tempPath} gone")
    }
    TextTables.writeSidecar(schema, path)
  }

  def abortShards(path: String, messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(path).getFileSystem(TextTables.hadoopConf())
    messages.collect { case m: TextFileCommitted => m }
      .foreach(m => f.delete(new Path(m.tempPath), false))
  }
}

/** Epoch-addressed streaming flavor of [[TextWrite]]: one commit per
  * micro-batch, shards named `part-<partition>-epoch-<epoch>.txt`. */
private[sources] class TextStreamingWrite(schema: StructType, path: String)
    extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    TextStreamingWriterFactory(path, schema.fields.map(_.dataType),
      TextTables.broadcastHadoopConf())

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    TextWrite.commitShards(schema, path, truncate = false, messages)

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    TextWrite.abortShards(path, messages)
}

private[sources] case class TextStreamingWriterFactory(path: String,
    types: Array[DataType],
    conf: Broadcast[SerializableConfiguration])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new TextDataWriter(path, f"part-$partitionId%05d-epoch-$epochId.txt",
      taskId, types, conf.value.value)
}

private[sources] case class TextFileCommitted(tempPath: String,
    finalPath: String) extends WriterCommitMessage

private[sources] case class TextWriterFactory(path: String, writeId: String,
    types: Array[DataType],
    conf: Broadcast[SerializableConfiguration]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TextDataWriter(path, f"part-$partitionId%05d-$writeId.txt",
      taskId, types, conf.value.value)
}

/** Streams one task's rows to the temp shard, tab-delimited in schema
  * order (Int/Float via toString — the exact strings the reader's
  * toInt/toFloat round-trip; the format has no escaping, like the
  * reference's, so strings must not contain tabs or newlines). */
private[sources] class TextDataWriter(path: String, finalName: String,
    taskId: Long,
    types: Array[DataType], hadoopConf: Configuration) extends DataWriter[InternalRow] {

  private val tempPath = new Path(path, s".$finalName.t$taskId.tmp")
  private val out = {
    val f = tempPath.getFileSystem(hadoopConf)
    if (!f.exists(tempPath.getParent)) f.mkdirs(tempPath.getParent)
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      f.create(tempPath, true), StandardCharsets.UTF_8))
  }

  override def write(row: InternalRow): Unit = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append('\t')
      // the format has no null representation (SURVEY §1.2) — reject
      // loudly rather than NPE on strings or silently zero numerics
      if (row.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft-txt cannot represent NULL (column $i of $finalName)")
      types(i) match {
        case IntegerType => sb.append(row.getInt(i))
        case FloatType   => sb.append(row.getFloat(i))
        case _ =>
          val s = row.getUTF8String(i).toString
          // the format has no escaping (like the reference's): a tab or
          // newline inside a value would shift every later column
          if (s.indexOf('\t') >= 0 || s.indexOf('\n') >= 0)
            throw new IllegalArgumentException(
              s"graft-txt cannot represent tab/newline in strings " +
                s"(column $i of $finalName)")
          sb.append(s)
      }
      i += 1
    }
    // a row whose whole encoding is empty (single string column holding
    // "") would round-trip as a blank line, which the reader skips as
    // padding — a silently LOST row (probe-confirmed: wrote 3, read 2).
    // The format cannot represent it; reject loudly like NULL and
    // tab/newline above.
    if (sb.length() == 0)
      throw new IllegalArgumentException(
        s"graft-txt cannot represent a row that encodes to an empty " +
          s"line (single empty string, $finalName)")
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TextFileCommitted(tempPath.toString,
      new Path(path, finalName).toString)
  }

  override def abort(): Unit = {
    out.close()
    tempPath.getFileSystem(hadoopConf).delete(tempPath, false)
  }

  override def close(): Unit = ()
}

private[sources] class TextScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Accept exactly the comparisons the evaluator handles; anything else
  // stays with Spark (returned as not-pushed). Accepted filters are
  // fully applied in the reader, so they are not re-evaluated upstream.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) =
      filters.partition(f => TextFilters.supports(f, fullSchema))
    pushed = sup
    unsup
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = TextScan(fullSchema, required, pushed, path)
}

private[sources] case class TextScan(
    fullSchema: StructType,
    required: StructType,
    filters: Array[Filter],
    path: String) extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Report the on-disk byte size (files are uncompressed text, so
    * bytes ≈ data volume) — without this a V2 source reports
    * `defaultSizeInBytes` and a broadcast-sized text table would never
    * be broadcast by the join planner. Column pruning scales the
    * estimate down by the projected fraction of columns, mirroring how
    * the file-source relation sizes pruned scans. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val totalBytes: Long = TextTables.dataBytes(path)
    private val frac: Double =
      if (fullSchema.isEmpty) 1.0
      else required.length.toDouble / fullSchema.length
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        math.max(1L, (totalBytes * frac).toLong))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def description(): String =
    s"GraftTextScan path: $path, " +
      s"ReadSchema: ${required.catalogString}, " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    TextTables.dataFiles(path).map(f => TextFilePartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    TextReaderFactory(fullSchema.fields.map(f => f.name -> f.dataType),
      required.fieldNames.map(fullSchema.fieldIndex),
      filters, TextTables.broadcastHadoopConf())
}

private[sources] case class TextFilePartition(file: String)
    extends InputPartition

private[sources] case class TextReaderFactory(
    cols: Array[(String, DataType)],
    requiredIdx: Array[Int],
    filters: Array[Filter],
    conf: Broadcast[SerializableConfiguration]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new TextPartitionReader(p.asInstanceOf[TextFilePartition].file,
      cols, requiredIdx, filters, conf.value.value)
}

/** Streams one data file line by line: split on tabs, coerce by declared
  * type (Integer/Float parse, mirroring ConvertTxtToTbl.java:56-66) —
  * but ONLY for columns the query projects or filters on (the pruning
  * promise made to the planner is kept as avoided parse work, and a
  * malformed value in an untouched column cannot fail the scan) — apply
  * the pushed filters on the typed values, then materialize the pruned
  * columns into the output row. Numeric fields are trimmed before
  * parsing (the reference layout pads with a trailing tab per field);
  * strings are taken verbatim so the write path round-trips exactly. */
private[sources] class TextPartitionReader(
    file: String,
    cols: Array[(String, DataType)],
    requiredIdx: Array[Int],
    filters: Array[Filter],
    hadoopConf: Configuration) extends PartitionReader[InternalRow] {

  private val in: BufferedReader = {
    val p = new Path(file)
    val fs = p.getFileSystem(hadoopConf)
    new BufferedReader(
      new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
  }
  private val predicate = TextFilters.compile(filters, cols)
  private val needed: Array[Boolean] = {
    val n = Array.fill(cols.length)(false)
    requiredIdx.foreach(n(_) = true)
    val byName = cols.map(_._1).zipWithIndex.toMap
    filters.flatMap(_.references).foreach(c => byName.get(c).foreach(n(_) = true))
    n
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val parts = line.split("\t", -1)
        val typed = new Array[Any](cols.length)
        var i = 0
        while (i < cols.length) {
          if (needed(i)) {
            val raw = if (i < parts.length) parts(i) else ""
            typed(i) = cols(i)._2 match {
              case IntegerType => raw.trim.toInt
              case FloatType   => raw.trim.toFloat
              case _           => raw
            }
          }
          i += 1
        }
        if (predicate(typed)) {
          val out = new Array[Any](requiredIdx.length)
          var j = 0
          while (j < requiredIdx.length) {
            out(j) = typed(requiredIdx(j)) match {
              case s: String => UTF8String.fromString(s)
              case v         => v
            }
            j += 1
          }
          row = new GenericInternalRow(out)
          return true
        }
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** The pushed-filter evaluator: the six reference comparison operators
  * over the three reference types, on already-typed values. No nulls
  * exist in the format (SURVEY §1.2), so null semantics never arise. */
private[sources] object TextFilters {

  def supports(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(c, v)            => comparable(c, v, schema)
    case GreaterThan(c, v)        => comparable(c, v, schema)
    case GreaterThanOrEqual(c, v) => comparable(c, v, schema)
    case LessThan(c, v)           => comparable(c, v, schema)
    case LessThanOrEqual(c, v)    => comparable(c, v, schema)
    case _                        => false
  }

  // accept only when the literal's runtime type matches the column's
  // declared type — a mismatched pushed filter would otherwise throw
  // per-row inside the scan; declining keeps it with Spark instead
  // (defense in depth: Spark's cast insertion makes this hard to reach)
  private def comparable(c: String, v: Any, schema: StructType): Boolean =
    schema.fields.find(_.name == c).exists { f =>
      (f.dataType, v) match {
        case (IntegerType, _: Int)   => true
        case (FloatType, _: Float)   => true
        case (StringType, _: String) => true
        case _                       => false
      }
    }

  def compile(filters: Array[Filter],
      cols: Array[(String, DataType)]): Array[Any] => Boolean = {
    val idx = cols.map(_._1).zipWithIndex.toMap
    def cmp(c: String, v: Any): Array[Any] => Int = {
      val i = idx(c)
      r => (r(i), v) match {
        case (a: Int, b: Int)       => java.lang.Integer.compare(a, b)
        case (a: Float, b: Float)   => java.lang.Float.compare(a, b)
        case (a: String, b: String) => a.compareTo(b)
        case (a, b) => throw new IllegalArgumentException(
          s"type mismatch comparing $a to $b on column $c")
      }
    }
    val compiled: Array[Array[Any] => Boolean] = filters.map {
      case EqualTo(c, v)            => val k = cmp(c, v); r => k(r) == 0
      case GreaterThan(c, v)        => val k = cmp(c, v); r => k(r) > 0
      case GreaterThanOrEqual(c, v) => val k = cmp(c, v); r => k(r) >= 0
      case LessThan(c, v)           => val k = cmp(c, v); r => k(r) < 0
      case LessThanOrEqual(c, v)    => val k = cmp(c, v); r => k(r) <= 0
      case f => throw new IllegalArgumentException(s"unsupported filter $f")
    }
    r => compiled.forall(_(r))
  }
}

/** Driver-side helpers: locate/parse the `.det` sidecar, enumerate data
  * files, and the write path that lays a DataFrame out in the
  * reference's format (sharded data files + one sidecar). */
object TextTables {

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-txt requires a path")
    p
  }

  /** The session's Hadoop configuration (fs credentials, HA nameservices,
    * custom schemes the user set via spark conf) — falls back to a bare
    * default only when no session is active (e.g. standalone tooling).
    * Driver-side metadata ops call [[hadoopConf]]; executor-side readers
    * and writers receive it once per executor via [[broadcastHadoopConf]]. */
  private[sources] def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private[sources] def broadcastHadoopConf(): Broadcast[SerializableConfiguration] = {
    val spark = SparkSession.active
    spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
  }

  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf())

  /** Data files of a table path: for a directory, every visible file
    * that is not the sidecar (the csv writer's `part-*` shards and any
    * `*.txt`); for a single file, just it. Sorted for deterministic
    * partition numbering. */
  def dataFiles(path: String): Array[String] = {
    val p = new Path(path)
    val f = fs(p)
    if (f.getFileStatus(p).isDirectory)
      f.listStatus(p).filter(_.isFile).map(_.getPath)
        .filter { q =>
          val n = q.getName
          !n.endsWith(".det") && !n.startsWith("_") && !n.startsWith(".")
        }
        .map(_.toString).sorted
    else Array(path)
  }

  /** Total bytes of a table's data files (drives the scan's reported
    * statistics) — one listing, lengths from the statuses it already
    * carries (no per-file round trip). */
  def dataBytes(path: String): Long = {
    val p = new Path(path)
    val f = fs(p)
    if (f.getFileStatus(p).isDirectory)
      f.listStatus(p).filter(_.isFile)
        .filter { s =>
          val n = s.getPath.getName
          !n.endsWith(".det") && !n.startsWith("_") && !n.startsWith(".")
        }.map(_.getLen).sum
    else f.getFileStatus(p).getLen
  }

  /** The sidecar for a table path: `<dir>/schema.det` (or the single
    * `.det` file present) for a directory, `<file-minus-ext>.det` for a
    * single data file. */
  def sidecarOf(path: String): Path = {
    val p = new Path(path)
    val f = fs(p)
    if (f.getFileStatus(p).isDirectory) {
      val dets = f.listStatus(p).filter(_.getPath.getName.endsWith(".det"))
      require(dets.nonEmpty, s"no .det schema sidecar in $path")
      dets.map(_.getPath).minBy(_.getName)
    } else {
      val name = p.getName
      val base = if (name.contains('.')) name.substring(0, name.lastIndexOf('.'))
        else name
      new Path(p.getParent, base + ".det")
    }
  }

  /** Parse a `.det` sidecar into a StructType. Header lines (bare
    * integers: column count, tuple size) are skipped; each remaining
    * line contributes `<colname> <type>` (extra generator fields
    * ignored). */
  def schemaAt(path: String): StructType = {
    val side = sidecarOf(path)
    val in = new BufferedReader(new InputStreamReader(
      fs(side).open(side), StandardCharsets.UTF_8))
    try {
      val lines = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map(_.trim).filter(_.nonEmpty).toList
      val fields = lines.filterNot(_.matches("\\d+")).map { line =>
        val toks = line.split("\\s+")
        require(toks.length >= 2, s"bad .det line: $line")
        StructField(toks(0), toks(1) match {
          case "INTEGER" => IntegerType
          case "STRING"  => StringType
          case "REAL"    => FloatType
          case t => throw new IllegalArgumentException(
            s"unknown .det type $t (line: $line)")
        }, nullable = false)
      }
      require(fields.nonEmpty, s"empty .det sidecar $side")
      StructType(fields)
    } finally in.close()
  }

  /** Lay `df` out as a graft-txt table at `dir` through the V2 write
    * path: tab-delimited sharded data files (a distributed two-phase-
    * commit write — each task owns one shard, the parallel twin of
    * RandomDB's single `.txt`) plus the `schema.det` sidecar. Only the
    * reference's three column types are allowed (enforced in
    * [[TextWriteBuilder]] before any task launches). */
  def write(df: DataFrame, dir: String): Unit =
    df.write.format("graft-txt").mode(SaveMode.Overwrite).save(dir)

  /** The `schema.det` sidecar with the reference's header lines —
    * written by the V2 job commit, after the data files are in place. */
  def writeSidecar(schema: StructType, dir: String): Unit = {
    val side = new Path(dir, "schema.det")
    val out = fs(side).create(side, true)
    try {
      val detType: DataType => String = {
        case IntegerType => "INTEGER"
        case StringType  => "STRING"
        case FloatType   => "REAL"
        case t => throw new IllegalArgumentException(t.toString)
      }
      // header: column count, then a nominal tuple byte size mirroring
      // the reference layout (INT/REAL 4 bytes, STRING 2x a nominal 10)
      val sizes = schema.fields.map(f =>
        if (f.dataType == StringType) 20 else 4)
      val body = (Seq(schema.length.toString, sizes.sum.toString) ++
        schema.fields.zip(sizes).map { case (f, sz) =>
          s"${f.name} ${detType(f.dataType)} 0 NK $sz"
        }).mkString("", "\n", "\n")
      out.write(body.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** Read a graft-txt table through the V2 source. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-txt").load(dir)
}
