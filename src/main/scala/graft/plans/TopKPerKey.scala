package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Whole-operator extension per the preference ladder in SURVEY §7: a
  * native per-key top-k — logical node + planner strategy + two-phase
  * physical operator — registered through `GraftExtensions`.
  *
  * Spark's built-in answer to "top k rows per key" is
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= k`,
  * which plans Exchange → SORT of every row in each partition → Window
  * → Filter: the full input is sorted even though all but k rows per
  * key are discarded. This operator keeps a BOUNDED HEAP of k rows per
  * key instead:
  *
  *  - partial pass before the shuffle: every map task reduces its slice
  *    to ≤k rows per key, so the exchange moves at most
  *    tasks × keys × k rows no matter how large the input —
  *    the same contract as partial aggregation (and why this beats the
  *    window form at scale: the shuffle and the sort disappear);
  *  - final pass after a hash exchange on the key (EnsureRequirements
  *    inserts it from the declared ClusteredDistribution): merges the
  *    partial winners into the exact per-key top-k.
  *
  * Memory per task is keys-in-task × k rows — the operator never
  * materializes or sorts a full partition. On a high-cardinality key
  * that bound is itself a heap risk, so the PARTIAL pass caps its map
  * at `graft.topk.partialKeyCap` keys (default 262144) and passes rows
  * of any further key through unreduced — a correctness-safe no-op
  * (the final pass computes the exact top-k either way), trading
  * shuffle volume for bounded map-task memory. The FINAL pass cannot
  * cap (it must hold every key it owns), so `TopKRewriteRule` also
  * honors `graft.topk.rewrite.enabled=false` to keep Spark's spillable
  * sort-based WindowExec where per-partition key cardinality is known
  * to be extreme. The caller's sort order must
  * be TOTAL (include a tiebreak column) for the result set to be
  * deterministic; rows are emitted in no particular order, exactly like
  * any other unsorted relational result.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true),
        partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  // the final pass needs all rows of a key co-located; the partial pass
  // runs wherever the data already is (that is the point of it). With no
  // keys (a GLOBAL top-k — e.g. a constant partition key the optimizer
  // folded away) the final pass needs the single-partition distribution,
  // and the partials have already capped each task's contribution at k.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    // partial-pass key cap: beyond this many distinct keys in one map
    // task, further keys' rows pass through unreduced (no-op is exact);
    // the final pass must hold all its keys, so no cap there
    val keyCap =
      if (partial) {
        val raw = conf.getConfString("graft.topk.partialKeyCap", "262144")
        val parsed = try raw.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft.topk.partialKeyCap must be a positive integer, got '$raw'")
        }
        // a non-positive cap would silently disable ALL map-side
        // reduction (every row shuffles unreduced) — reject it loudly
        require(parsed > 0,
          s"graft.topk.partialKeyCap must be a positive integer, got $parsed")
        parsed
      } else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = RowOrdering.create(sortOrder, schema)
      // max-heap under the sort order: head = the row that sorts LAST
      // among the kept k (the current worst), so admission is one compare
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val passedThrough = iter.flatMap { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            if (heaps.size < keyCap) {
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              h += row.copy()
              heaps.put(key.copy(), h)
              Iterator.empty
            } else Iterator.single(row) // map full: emit unreduced
          case Some(h) =>
            if (h.size < limit) h += row.copy()
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue()
              h += row.copy()
            }
            Iterator.empty
        }
      }
      // `++` is by-name: the heap drain only starts after the input is
      // exhausted, so every reduced row is in its final heap by then
      passedThrough ++ heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKey {
  /** The exact top-`k` rows per `keys` group under `order` — SQL
    * expression strings, each order entry paired with `ascending`
    * (include a tiebreak for determinism). Expressions are built
    * through the catalyst parser rather than the Column API: parsed
    * trees are plain catalyst nodes, so they serialize cleanly into
    * the executor-side closures of the physical operator (Column-
    * derived trees retain non-serializable ColumnNode internals). */
  def topK(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    val keyExprs = keys.map(PlanBridge.parseExpression(spark, _))
    val sortOrder = order.map { case (sql, asc) =>
      SortOrder(PlanBridge.parseExpression(spark, sql),
        if (asc) Ascending else Descending)
    }
    PlanBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, sortOrder, k, PlanBridge.logicalPlan(df)))
  }
}
