package graft.sql

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sql.MiniSql._

/** Semantic property for the mini-SQL front end: generated well-formed
  * queries over a small concrete schema run through parse → plan →
  * Spark, and the result must equal an INDEPENDENT driver-side
  * interpreter of the same Query AST (plain Scala: filter → cross
  * product → join conds → project/group/aggregate → distinct → sort).
  * The interpreter shares no code with the planner, so agreement over
  * hundreds of random queries pins the dialect semantics — including
  * the documented quirks (comma = AND, literal coerced by the lhs
  * column's type, GROUPBY-without-aggregates = distinct on group cols,
  * one global ASC/DESC flag, unconnected FROM tables = cross join).
  *
  * Values are chosen so floating aggregates are EXACT on both sides
  * (v is a multiple of 0.25 with ≤2 decimals: exact in DECIMAL(12,2),
  * exact as dyadic doubles under any summation order), so rows compare
  * by string equality with no tolerance band. Ties under ORDER BY are
  * compared as multisets plus a sortedness check, since Spark's sort
  * is not stable across equal keys. */
object MiniSqlSemanticsPropertySpec
    extends Properties("MiniSqlSemantics") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(200)

  private lazy val spark = graft.SparkSpec.spark

  // ---- the concrete schema + deterministic data --------------------------

  /** (table, column) -> type family: "int" | "real" | "str". */
  private val schema: Map[String, Seq[(String, String)]] = Map(
    "tt" -> Seq("id" -> "int", "k" -> "int", "v" -> "real", "s" -> "str"),
    "uu" -> Seq("id" -> "int", "k" -> "int", "s" -> "str"),
    "ww" -> Seq("k" -> "int", "s" -> "str"))

  private val alphabet = Vector("aa", "ab", "ba", "bb", "ca")

  /** Rows as column-name -> value maps (Int / Double / String). */
  private val data: Map[String, Seq[Map[String, Any]]] = Map(
    "tt" -> (1 to 10).map(i => Map[String, Any](
      "id" -> i, "k" -> i % 3, "v" -> i * 0.25,
      "s" -> alphabet(i % 5))),
    "uu" -> (1 to 12).map(i => Map[String, Any](
      "id" -> i % 7, "k" -> i % 4, "s" -> alphabet(i % 3))),
    "ww" -> (1 to 8).map(i => Map[String, Any](
      "k" -> i % 5, "s" -> alphabet((i + 2) % 5))))

  private lazy val frames: Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "tt" -> data("tt").map(r => (r("id").asInstanceOf[Int],
          r("k").asInstanceOf[Int], r("v").asInstanceOf[Double],
          r("s").asInstanceOf[String]))
        .toDF("id", "k", "v", "s"),
      "uu" -> data("uu").map(r => (r("id").asInstanceOf[Int],
          r("k").asInstanceOf[Int], r("s").asInstanceOf[String]))
        .toDF("id", "k", "s"),
      "ww" -> data("ww").map(r => (r("k").asInstanceOf[Int],
          r("s").asInstanceOf[String])).toDF("k", "s"))
  }

  private def fam(a: Attr): String =
    schema(a.table).find(_._1 == a.name).get._2

  // ---- query generator ----------------------------------------------------

  private def attrOf(tables: Seq[String]): Gen[Attr] = for {
    t <- Gen.oneOf(tables)
    (c, _) <- Gen.oneOf(schema(t))
  } yield Attr(t, c)

  private def attrOfFam(tables: Seq[String], f: String): Gen[Attr] = {
    val pool = for {
      t <- tables; (c, cf) <- schema(t) if cf == f
    } yield Attr(t, c)
    Gen.oneOf(pool)
  }

  private def litFor(f: String): Gen[String] = f match {
    case "int"  => Gen.choose(-1, 12).map(_.toString)
    case "real" => Gen.oneOf("0.25", "0.75", "1.0", "1.75", "2.5")
    case "str"  => Gen.oneOf(alphabet :+ "zz")
  }

  private val opGen = Gen.oneOf("<", ">", "<=", ">=", "=", "!=")

  private def condOf(tables: Seq[String]): Gen[Cond] = for {
    lhs <- attrOf(tables)
    op <- opGen
    rhs <- Gen.frequency(
      3 -> litFor(fam(lhs)).map(LitRhs),
      2 -> attrOfFam(tables, fam(lhs)).map(AttrRhs))
  } yield Cond(lhs, op, rhs)

  private def aggFor(a: Attr): Gen[String] =
    if (fam(a) == "str") Gen.oneOf("MAX", "MIN", "COUNT")
    else Gen.oneOf("MAX", "MIN", "SUM", "COUNT", "AVG")

  private val queryGen: Gen[Query] = for {
    tables <- Gen.someOf(schema.keys.toSeq).suchThat(_.nonEmpty)
      .map(ts => scala.util.Random.javaRandomToRandom(
        new java.util.Random(ts.mkString.hashCode)).shuffle(ts.toSeq))
    nConds <- Gen.choose(0, 3)
    conds <- Gen.listOfN(nConds, condOf(tables))
    distinct <- Gen.oneOf(true, false)
    shape <- Gen.frequency(4 -> "plain", 3 -> "refgroup", 3 -> "agg")
    q <- shape match {
      case "plain" => for {
        projs <- Gen.nonEmptyListOf(attrOf(tables)).map(_.take(3))
        order <- Gen.someOf(projs.distinct).map(_.take(2).toSeq)
        desc <- Gen.oneOf(true, false)
      } yield Query(distinct, star = false, projs, tables, conds,
        Nil, order, order.nonEmpty && desc)
      case "refgroup" => for {
        groups <- Gen.nonEmptyListOf(attrOf(tables)).map(_.distinct.take(2))
        projs <- Gen.nonEmptyListOf(Gen.oneOf(groups)).map(_.take(3))
        order <- Gen.someOf(projs.distinct).map(_.take(2).toSeq)
        desc <- Gen.oneOf(true, false)
      } yield Query(distinct, star = false, projs, tables, conds,
        groups, order, order.nonEmpty && desc)
      case "agg" => for {
        groups <- Gen.listOf(attrOf(tables)).map(_.distinct.take(2))
        nAggs <- Gen.choose(1, 2)
        aggs <- Gen.listOfN(nAggs, for {
          a <- attrOf(tables); f <- aggFor(a)
        } yield a.copy(agg = Some(f)))
        plains <- if (groups.isEmpty) Gen.const(Nil)
          else Gen.someOf(groups).map(_.toSeq)
        // colliding aggAlias names (MAX(tt.k), MAX(uu.k)) are allowed:
        // the planner qualifies them on collision
        projs = (plains ++ aggs).distinct
        order <- Gen.someOf(plains.distinct).map(_.take(2).toSeq)
        desc <- Gen.oneOf(true, false)
      } yield Query(distinct, star = false, projs, tables, conds,
        groups, order, order.nonEmpty && desc)
    }
  } yield q

  // ---- render back to dialect text (parse must see real input) -----------

  private def rAttr(a: Attr): String = a.agg match {
    case Some(f) => s"$f(${a.table}.${a.name})"
    case None    => s"${a.table}.${a.name}"
  }

  private def render(q: Query): String = {
    val sb = new StringBuilder("SELECT ")
    if (q.distinct) sb.append("DISTINCT ")
    sb.append(q.projs.map(rAttr).mkString(", "))
    sb.append(" FROM ").append(q.tables.mkString(", "))
    if (q.conds.nonEmpty)
      sb.append(" WHERE ").append(q.conds.map { c =>
        val rhs = c.rhs match {
          case LitRhs(v)  => "\"" + v + "\""
          case AttrRhs(a) => rAttr(a)
        }
        s"${rAttr(c.lhs)} ${c.op} $rhs"
      }.mkString(", "))
    if (q.groupBy.nonEmpty)
      sb.append(" GROUPBY ").append(q.groupBy.map(rAttr).mkString(", "))
    if (q.orderBy.nonEmpty) {
      sb.append(" ORDERBY ").append(q.orderBy.map(rAttr).mkString(", "))
      sb.append(if (q.orderDesc) " DESC" else " ASC")
    }
    sb.toString
  }

  // ---- the independent interpreter ----------------------------------------

  /** A joined row: (table, column) -> value. */
  private type JRow = Map[(String, String), Any]

  private def cmp(x: Any, y: Any): Int = (x, y) match {
    case (a: Int, b: Int)       => a.compareTo(b)
    case (a: Number, b: Number) =>
      a.doubleValue().compareTo(b.doubleValue())
    case (a: String, b: String) => a.compareTo(b)
    case _ => throw new IllegalStateException(s"cmp($x, $y)")
  }

  private def opHolds(op: String, c: Int): Boolean = op match {
    case "<" => c < 0; case ">" => c > 0; case "<=" => c <= 0
    case ">=" => c >= 0; case "=" => c == 0; case "!=" => c != 0
  }

  /** Literal coerced by the lhs column's family, the dialect rule. */
  private def coerce(v: String, f: String): Any = f match {
    case "int"  => v.toInt
    case "real" => v.toDouble
    case "str"  => v
  }

  private def evalCond(r: JRow, c: Cond): Boolean = {
    val l = r((c.lhs.table, c.lhs.name))
    val rv = c.rhs match {
      case LitRhs(v)  => coerce(v, fam(c.lhs))
      case AttrRhs(a) => r((a.table, a.name))
    }
    opHolds(c.op, cmp(l, rv))
  }

  private def interpret(q: Query): Seq[Seq[Any]] = {
    // cross product of the FROM tables, all conditions as filters —
    // order-insensitive, so it cannot share the planner's join-fold bug
    // surface
    val joined0: Seq[JRow] = q.tables.foldLeft(Seq(Map.empty: JRow)) {
      (acc, t) => for {
        r <- acc; row <- data(t)
      } yield r ++ row.map { case (c, v) => (t, c) -> v }
    }
    val joined = joined0.filter(r => q.conds.forall(evalCond(r, _)))

    val hasAgg = q.projs.exists(_.agg.isDefined)
    val projected: Seq[Seq[Any]] =
      if (hasAgg) {
        val groups: Seq[(Seq[Any], Seq[JRow])] =
          if (q.groupBy.isEmpty) Seq(Nil -> joined)
          else joined.groupBy(r =>
              q.groupBy.map(g => r((g.table, g.name)))).toSeq
            .map { case (k, v) => (k, v) }
        val kept = // a GLOBAL aggregate emits its row even on empty input
          if (q.groupBy.isEmpty) groups else groups.filter(_._2.nonEmpty)
        kept.map { case (key, rows) =>
          q.projs.map { a =>
            def vals = rows.map(r => r((a.table, a.name)))
            a.agg match {
              case None => key(q.groupBy.indexOf(a))
              case Some("COUNT") => rows.length // INT contract
              case Some(f) if rows.isEmpty => null // SUM/AVG/MAX/MIN
              case Some("MAX") => vals.max(Ordering.fromLessThan[Any](
                (x, y) => cmp(x, y) < 0))
              case Some("MIN") => vals.min(Ordering.fromLessThan[Any](
                (x, y) => cmp(x, y) < 0))
              case Some("SUM") => fam(a) match {
                case "int" => vals.map(_.asInstanceOf[Int].toLong).sum.toInt
                case _     => vals.map(_.asInstanceOf[Double]).sum
              }
              case Some("AVG") => // exact decimal sum, then double / count
                val sum = vals.map(v => BigDecimal(v match {
                  case i: Int => i.toDouble; case d: Double => d
                }).setScale(2)).sum
                (sum.toDouble / rows.length).toFloat
              case Some(other) =>
                throw new IllegalStateException(other)
            }
          }
        }
      } else if (q.groupBy.nonEmpty) {
        // reference GROUPBY: distinct on group cols, project ⊆ groups
        joined.map(r => q.groupBy.map(g => r((g.table, g.name))))
          .distinct
          .map(row => q.projs.map(p => row(q.groupBy.indexOf(p))))
      } else joined.map(r => q.projs.map(p => r((p.table, p.name))))

    if (q.distinct) projected.distinct else projected
  }

  // ---- the property --------------------------------------------------------

  private def cell(x: Any): String = x match {
    case null      => "NULL"
    case f: Float  => "f:" + f
    case d: Double => "d:" + d
    case i: Int    => "i:" + i
    case l: Long   => "i:" + l
    case s: String => "s:" + s
    case o         => o.getClass.getName + ":" + o
  }

  property("plan(sql) rows == independent interpreter rows") =
    forAll(queryGen) { q =>
      val sql = render(q)
      val actual = MiniSqlPlanner.run(spark, t => frames(t), sql)
        .collect().toSeq
        .map(r => (0 until r.length).map(i => r.get(i)))
      val expected = interpret(q)
      val (as, es) = (actual.map(_.map(cell)).sortBy(_.mkString("|")),
        expected.map(_.map(cell)).sortBy(_.mkString("|")))
      val multisetOk = as == es
      // sortedness of the ACTUAL output per the one global flag
      val sortedOk = q.orderBy.isEmpty || {
        val keyIdx = q.orderBy.map(o => q.projs.indexOf(o))
        val keys = actual.map(r => keyIdx.map(r))
        keys.zip(keys.drop(1)).forall { case (a, b) =>
          val c = a.zip(b).iterator.map { case (x, y) => cmp(x, y) }
            .find(_ != 0).getOrElse(0)
          if (q.orderDesc) c >= 0 else c <= 0
        }
      }
      if (!multisetOk || !sortedOk)
        println(s"COUNTEREXAMPLE sql=$sql\n actual=$as\n expected=$es" +
          s"\n sortedOk=$sortedOk")
      multisetOk && sortedOk
    }
}
