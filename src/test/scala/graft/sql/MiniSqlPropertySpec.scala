package graft.sql

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sql.MiniSql._

/** Property: any well-formed AST rendered to dialect text parses back to
  * the same AST (render ∘ parse = id on the grammar's range). */
object MiniSqlPropertySpec extends Properties("MiniSql") {

  private val identGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val attrGen: Gen[Attr] = for {
    t <- identGen; c <- identGen
    agg <- Gen.option(Gen.oneOf(AggNames.toSeq))
  } yield Attr(t, c, agg)

  private val plainAttrGen: Gen[Attr] = attrGen.map(_.copy(agg = None))

  private val condGen: Gen[Cond] = for {
    lhs <- plainAttrGen
    op <- Gen.oneOf("<", ">", "<=", ">=", "=", "!=")
    rhs <- Gen.oneOf(
      Gen.listOfN(4, Gen.alphaNumChar).map(cs => LitRhs(cs.mkString)),
      plainAttrGen.map(AttrRhs))
  } yield Cond(lhs, op, rhs)

  private val queryGen: Gen[Query] = for {
    distinct <- Gen.oneOf(true, false)
    projs <- Gen.nonEmptyListOf(attrGen).map(_.take(4))
    tables <- Gen.nonEmptyListOf(identGen).map(_.take(3))
    conds <- Gen.listOf(condGen).map(_.take(3))
    groupBy <- Gen.listOf(plainAttrGen).map(_.take(2))
    orderBy <- Gen.listOf(plainAttrGen).map(_.take(2))
    desc <- Gen.oneOf(true, false)
  } yield Query(distinct, star = false, projs, tables, conds, groupBy,
    orderBy, orderBy.nonEmpty && desc)

  private def renderAttr(a: Attr): String = a.agg match {
    case Some(f) => s"$f(${a.table}.${a.name})"
    case None    => s"${a.table}.${a.name}"
  }

  private def render(q: Query): String = {
    val sb = new StringBuilder("SELECT ")
    if (q.distinct) sb.append("DISTINCT ")
    sb.append(q.projs.map(renderAttr).mkString(", "))
    sb.append(" FROM ").append(q.tables.mkString(", "))
    if (q.conds.nonEmpty)
      sb.append(" WHERE ").append(q.conds.map { c =>
        val rhs = c.rhs match {
          case LitRhs(v)  => "\"" + v + "\""
          case AttrRhs(a) => renderAttr(a)
        }
        s"${renderAttr(c.lhs)} ${c.op} $rhs"
      }.mkString(", "))
    if (q.groupBy.nonEmpty)
      sb.append(" GROUPBY ").append(q.groupBy.map(renderAttr).mkString(", "))
    if (q.orderBy.nonEmpty) {
      sb.append(" ORDERBY ").append(q.orderBy.map(renderAttr).mkString(", "))
      if (q.orderDesc) sb.append(" DESC")
    }
    sb.toString
  }

  property("render-then-parse is identity") = forAll(queryGen) { q =>
    // identifiers that collide with keywords render ambiguously; the
    // generator's alpha identifiers can land on e.g. "max" only by chance
    val attrs = q.projs ++ q.groupBy ++ q.orderBy ++
      q.conds.flatMap(c => c.lhs +: (c.rhs match {
        case AttrRhs(a) => Seq(a); case _ => Nil
      }))
    val idents = q.tables ++ attrs.flatMap(a => Seq(a.table, a.name))
    val kw = Set("SELECT", "DISTINCT", "FROM", "WHERE", "GROUPBY",
      "ORDERBY", "DESC", "ASC") ++ MiniSql.AggNames
    idents.exists(s => kw(s.toUpperCase)) || MiniSql.parse(render(q)) == q
  }
}
