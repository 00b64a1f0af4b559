package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan display + expected-cost reporting: the Spark-native equivalent of
  * the reference's `Debug.PPrint(root)` pretty-printer
  * (/root/reference/src/qp/operators/Debug.java:95-177) and `PlanCost`
  * estimate (/root/reference/src/qp/optimizer/PlanCost.java:123-320).
  *
  * Where the reference prints a hand-built operator tree and a page-IO
  * count from `.stat` files, Spark exposes the same information from the
  * query execution: the optimized logical plan with Catalyst CBO
  * statistics (row counts / sizes from parquet metadata) and the chosen
  * physical plan with join strategies and exchanges.
  */
object Explain {

  /** Logical + physical plan, like `Debug.PPrint`. */
  def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("extended"))

  /** Plan with per-node size/row-count statistics, like `PlanCost`'s
    * expected cost (Catalyst's estimate instead of page IOs). */
  def cost(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("cost"))

  /** Physical plan with codegen spans — what actually runs; the analogue
    * of the reference's final `makeExecPlan` tree
    * (RandomOptimizer.java:45-98). */
  def physical(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Estimated output row count of the optimized plan, when statistics
    * allow one — the headline number of `PlanCost.getCost`. */
  def estimatedRowCount(df: DataFrame): Option[BigInt] =
    df.queryExecution.optimizedPlan.stats.rowCount
}
