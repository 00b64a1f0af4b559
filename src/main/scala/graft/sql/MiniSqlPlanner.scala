package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Exact
import graft.Tables
import graft.sql.MiniSql._

/** Plans a parsed mini-SQL query as declarative DataFrame algebra and lets
  * Catalyst do what the reference's RandomOptimizer did by hand:
  *
  *  - selections are applied directly on their base table (predicate
  *    pushdown "by construction", RandomInitialPlan.java:109-128 — and
  *    Catalyst would push them anyway);
  *  - join order: tables are folded in connectivity order over the join
  *    conditions (createJoinOp, RandomInitialPlan.java:133-170); the
  *    randomized iterative-improvement search (RandomOptimizer.java:126-216)
  *    is replaced wholesale by Catalyst's cost-based/AQE planning;
  *  - join method (NJ/BNJ/SMJ, makeExecPlan RandomOptimizer.java:45-98) is
  *    Spark's broadcast/shuffle-hash/sort-merge selection at runtime;
  *  - literals are coerced by the referenced column's type, mirroring
  *    `Integer.parseInt`/`Float.parseFloat` of the string rhs at eval time
  *    (Select.java:140-147,196-197);
  *  - GROUPBY without aggregates keeps the reference's semantics —
  *    duplicate elimination on the grouping columns, project ⊆ group cols
  *    (RandomInitialPlan.java:172-203); with aggregates we run the real
  *    aggregation the reference only declared (Project.java:66-70 aborts),
  *    honoring the declared output types COUNT→INT, AVG→REAL
  *    (Attribute.java:113-121).
  *
  * Divergences from reference quirks (sane semantics, SURVEY.md §7.3):
  * `DISTINCT *` really deduplicates; FROM tables unreachable via join
  * conditions become a cross join instead of being silently dropped; a
  * theta comparison between two tables' columns is executed as written,
  * not silently as an equi-join (Tuple.java:49-60).
  */
object MiniSqlPlanner {

  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame =
    plan(spark, sfDir, MiniSql.parse(sql))

  def plan(spark: SparkSession, sfDir: String, q: Query): DataFrame = {
    val bases: Map[String, DataFrame] =
      q.tables.map(t => t -> Tables(spark, sfDir, t.toLowerCase)).toMap

    // Every table referenced by a projection, condition, group or sort key
    // must appear in FROM — a typo would otherwise silently drop its
    // conditions (returning wrong rows with no diagnostic).
    val referenced = (q.projs ++ q.groupBy ++ q.orderBy).map(_.table) ++
      q.conds.flatMap(c => c.lhs.table +: (c.rhs match {
        case AttrRhs(a) => Seq(a.table); case _ => Nil
      }))
    val unknown = referenced.distinct.filterNot(bases.contains)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"table(s) ${unknown.mkString(", ")} referenced but not in FROM " +
          s"(${q.tables.mkString(", ")})")

    def colType(a: Attr): DataType = {
      val df = bases.getOrElse(a.table,
        throw new IllegalArgumentException(s"unknown table ${a.table}"))
      df.schema(a.name).dataType
    }

    def compare(lhs: Column, op: String, rhs: Column): Column = op match {
      case "<"  => lhs < rhs
      case ">"  => lhs > rhs
      case "<=" => lhs <= rhs
      case ">=" => lhs >= rhs
      case "="  => lhs === rhs
      case "!=" => lhs =!= rhs
    }

    def condExpr(c: Cond): Column = {
      val lhs = col(c.lhs.name)
      val rhs = c.rhs match {
        // String literal coerced by the lhs column's type
        // (Select.java:140-147): "10" against an INT column compares as 10.
        case LitRhs(v)  => lit(v).cast(colType(c.lhs))
        case AttrRhs(a) => col(a.name)
      }
      compare(lhs, c.op, rhs)
    }

    val (joinConds, selConds) = q.conds.partition(_.isJoin)

    // Selections directly on their base table.
    val filtered: Map[String, DataFrame] = bases.map { case (t, df) =>
      val mine = selConds.filter(_.lhs.table == t)
      t -> mine.foldLeft(df)((d, c) => d.filter(condExpr(c)))
    }

    // Fold tables in join-connectivity order; all conditions linking the
    // new table to the already-joined set are ANDed into one equi/theta
    // join node (multi-key joins, Tuple.checkJoin Tuple.java:49-60).
    var joined = filtered(q.tables.head)
    var in: Set[String] = Set(q.tables.head)
    var remaining = q.tables.tail.toList
    var pendingConds = joinConds
    while (remaining.nonEmpty) {
      def links(t: String) = pendingConds.filter { c =>
        val ts = Set(c.lhs.table) ++ (c.rhs match {
          case AttrRhs(a) => Set(a.table); case _ => Set.empty[String]
        })
        ts.contains(t) && (ts - t).subsetOf(in)
      }
      remaining.find(t => links(t).nonEmpty) match {
        case Some(t) =>
          val cs = links(t)
          joined = joined.join(filtered(t), cs.map(condExpr).reduce(_ && _))
          pendingConds = pendingConds.filterNot(cs.contains)
          in += t; remaining = remaining.filterNot(_ == t)
        case None => // unconnected table: cross join (sane divergence)
          val t = remaining.head
          joined = joined.crossJoin(filtered(t))
          in += t; remaining = remaining.tail
      }
    }
    // Conditions whose endpoints only became co-located later (cycles).
    joined = pendingConds.foldLeft(joined)((d, c) => d.filter(condExpr(c)))

    val hasAgg = q.projs.exists(_.agg.isDefined)
    val projected =
      if (hasAgg) {
        // Real aggregation (the reference declares it but aborts at run
        // time); output types per Attribute.getProjectedType.
        val aggExprs = q.projs.filter(_.agg.isDefined).map { a =>
          val c = col(a.name)
          val out = a.agg.get match {
            case "COUNT" => Exact.icount(c)
            case "AVG"   => Exact.ravg(c)
            case "SUM"   => sum(c).cast(colType(a)) // SUM keeps column type
            case "MAX"   => max(c)
            case "MIN"   => min(c)
          }
          out.as(aggAlias(a))
        }
        val plain = q.projs.filter(_.agg.isEmpty)
        if (q.groupBy.isEmpty && plain.nonEmpty)
          throw new IllegalArgumentException(
            s"non-aggregated column(s) ${plain.map(_.name).mkString(", ")} " +
              "require a GROUPBY")
        val grouped =
          if (q.groupBy.nonEmpty)
            joined.groupBy(q.groupBy.map(a => col(a.name)): _*)
          else joined.groupBy()
        val g = grouped.agg(aggExprs.head, aggExprs.tail: _*)
        // project in declared order (plain attrs must be ⊆ groupby)
        g.select(q.projs.map(a =>
          if (a.agg.isDefined) col(aggAlias(a)) else col(a.name)): _*)
      } else if (q.groupBy.nonEmpty) {
        // Reference GROUPBY = distinct on group cols, project ⊆ group cols
        // (RandomInitialPlan.java:189-196).
        joined.dropDuplicates(q.groupBy.map(_.name))
          .select(q.projs.map(a => col(a.name)): _*)
      } else if (q.star) joined
      else joined.select(q.projs.map(a => col(a.name)): _*)

    val distincted = if (q.distinct) projected.distinct() else projected

    if (q.orderBy.nonEmpty)
      distincted.orderBy(q.orderBy.map(a =>
        if (q.orderDesc) col(a.name).desc else col(a.name).asc): _*)
    else distincted
  }

  /** Deterministic output name for an aggregate column, e.g.
    * `MAX(customer.c_acctbal)` → `max_c_acctbal`. */
  def aggAlias(a: Attr): String =
    s"${a.agg.get.toLowerCase}_${a.name}"
}
