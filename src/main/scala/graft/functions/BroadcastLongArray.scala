package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** A long-array constant shipped as a TRUE Spark broadcast variable
  * and surfaced as an `array<bigint>` expression — the static-side
  * lookup structure of the streaming verbatim-leak scanner.
  *
  * Why not `crossJoin(broadcast(oneRowArrayFrame))`: the joined OUTPUT
  * row owns its bytes, so UnsafeWriter memcpies the entire array into
  * every document row — ~8 MB × rows at a 10⁶-gram eval suite, which
  * DoorScanBench measured as the scanner's actual bottleneck (the
  * probe itself is O(log n)). And why not `lit(array)`: a Literal
  * rides the serialized task binary, re-shipped with every task of
  * every stage — a broadcast ships once per executor. Here the
  * expression carries only the broadcast HANDLE (bytes move through
  * Spark's torrent protocol once per executor), and every row reads
  * the same per-JVM lazily-wrapped [[UnsafeArrayData]] — zero per-row
  * copies, zero per-task payload.
  *
  * CodegenFallback is deliberate: the node evaluates to a cached
  * object reference, so "generated code" could only ever be a call to
  * [[eval]] anyway, and the hot consumer (the scanner's `filter` HOF
  * lambda) is interpreted by Spark regardless. */
case class BroadcastLongArray(bc: Broadcast[Array[Long]])
    extends LeafExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "broadcast_long_array"

  // The wrap is cached PER BROADCAST in the companion, not per
  // expression instance: expressions deserialize once per TASK, so an
  // instance-level lazy would re-run fromPrimitiveArray's memcpy (8 MB
  // at a 10⁶-gram suite) on every task — only bc.value is
  // executor-cached by Spark, not anything derived from it.
  @transient private lazy val arr: ArrayData =
    BroadcastLongArray.wrapped(bc)

  override def eval(input: InternalRow): Any = arr
}

object BroadcastLongArray {
  // One entry per live broadcast — the per-executor "wrap once" the
  // expression's scaladoc promises — keyed WEAKLY on the broadcast's
  // VALUE array (identity): all task-level Broadcast instances of one
  // id return the same block-manager-cached array, so the wrap is
  // still computed once per executor, and when ContextCleaner (or a
  // context teardown) drops the broadcast block the key dies and the
  // entry is expunged — no unbounded growth in a long-lived process
  // that rebuilds scanners, and no stale-value collision when a new
  // SparkContext restarts broadcast ids from 0. (Keying on bc.id had
  // both defects; keying on the Broadcast INSTANCE would re-wrap per
  // task, because tasks deserialize their own Broadcast handles.)
  // The UnsafeArrayData value is a copy holding no reference back to
  // the key, so the entry cannot keep itself alive.
  private val wrapCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[Long], ArrayData]())

  private[functions] def wrapped(bc: Broadcast[Array[Long]]): ArrayData =
    wrapCache.computeIfAbsent(bc.value,
      a => UnsafeArrayData.fromPrimitiveArray(a))

  /** Test hook: live entries after expunging stale refs (forces a
    * size() walk — WeakHashMap expunges on access). */
  private[graft] def cacheSize: Int = wrapCache.size()

  /** Column API: broadcast `values` through `s` and expose it as an
    * `array<bigint>` column. */
  def broadcastLongArray(s: SparkSession, values: Array[Long]): Column =
    ColumnBridge.column(BroadcastLongArray(s.sparkContext.broadcast(values)))
}
