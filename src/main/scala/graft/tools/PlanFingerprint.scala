package graft.tools

import graft.{Session, SparkEntry}

/** Mechanical physical-plan fingerprints: the multiset of
  * shape-relevant operator nodes (exchanges, join strategies, sorts,
  * windows, aggregates, native heap operators) in a query's executed
  * plan. PlanShapeSpec pins these for the whole bench headline list so
  * any plan regression — a lost broadcast, an extra shuffle, a window
  * that used to be a bounded heap — fails CI as a diff against the
  * recorded fingerprint instead of surfacing rounds later as a bench
  * forensic.
  *
  *   sbt "runMain graft.tools.PlanFingerprint [sfDir]"   # print all
  */
object PlanFingerprint {

  /** Node names that define a plan's scale shape. Leaf scans, projects
    * and filters are deliberately absent: they vary with column lists
    * without changing how the query moves data. */
  val Interesting: Set[String] = Set(
    "Exchange", "BroadcastExchange", "ReusedExchange",
    "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "TakeOrderedAndProject", "TopKPerKeyPartial", "TopKPerKeyFinal",
    "Sort", "Window", "WindowGroupLimit",
    "HashAggregate", "ObjectHashAggregate", "SortAggregate",
    "Generate", "Expand")

  def of(plan: String): Map[String, Int] =
    plan.linesIterator
      .flatMap(l => "[A-Za-z]+".r.findFirstIn(l))
      .filter(Interesting)
      .toSeq.groupBy(identity).view.mapValues(_.size).toMap

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Session.local()
    // no checkpoint truncation, no cached artifacts: fingerprint the
    // FULL plan a cold consumer would run
    spark.conf.set("graft.stage.materialize", "none")
    spark.conf.set("graft.artifacts.reuse", "false")
    graft.Bench.headline.foreach { name =>
      val fp = of(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString)
      val body = fp.toSeq.sorted.map { case (k, v) => s""""$k" -> $v""" }
        .mkString(", ")
      println(s"""    "$name" -> Map($body),""")
    }
    spark.stop()
  }
}
