package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.MiniSql._

class MiniSqlParserSpec extends AnyFunSuite {

  test("basic select-from-where") {
    val q = MiniSql.parse(
      """SELECT customer.c_name FROM customer WHERE customer.c_acctbal > "100"""")
    assert(!q.distinct && !q.star)
    assert(q.projs == Seq(Attr("customer", "c_name")))
    assert(q.tables == Seq("customer"))
    assert(q.conds == Seq(
      Cond(Attr("customer", "c_acctbal"), ">", LitRhs("100"))))
  }

  test("star projection") {
    val q = MiniSql.parse("SELECT * FROM nation")
    assert(q.star && q.projs.isEmpty)
  }

  test("comma-separated conditions are conjunctive") {
    val q = MiniSql.parse(
      """SELECT t.a FROM t WHERE t.a = "1", t.b != "2", t.c <= "3"""")
    assert(q.conds.map(_.op) == Seq("=", "!=", "<="))
  }

  test("join vs selection classification") {
    val q = MiniSql.parse(
      """SELECT a.x FROM a, b WHERE a.x = b.y, a.x < a.z, a.x > "5"""")
    assert(q.conds.map(_.isJoin) == Seq(true, false, false))
  }

  test("aggregate-tagged attributes") {
    val q = MiniSql.parse(
      "SELECT t.k, MAX(t.v), COUNT(t.v), AVG(t.v) FROM t GROUPBY t.k")
    assert(q.projs.map(_.agg) ==
      Seq(None, Some("MAX"), Some("COUNT"), Some("AVG")))
    assert(q.groupBy == Seq(Attr("t", "k")))
  }

  test("single-token GROUPBY and ORDERBY with global DESC") {
    val q = MiniSql.parse(
      "SELECT t.a FROM t GROUPBY t.a, t.b ORDERBY t.a, t.b DESC")
    assert(q.groupBy.map(_.name) == Seq("a", "b"))
    assert(q.orderBy.map(_.name) == Seq("a", "b"))
    assert(q.orderDesc)
  }

  test("ORDERBY defaults to ASC") {
    assert(!MiniSql.parse("SELECT t.a FROM t ORDERBY t.a").orderDesc)
  }

  test("DISTINCT flag") {
    assert(MiniSql.parse("SELECT DISTINCT t.a FROM t").distinct)
  }

  test("keywords are case-insensitive, identifiers keep case") {
    val q = MiniSql.parse("select T1.Col from T1")
    assert(q.projs == Seq(Attr("T1", "Col")))
  }

  test("both quote styles accepted") {
    val q = MiniSql.parse("SELECT t.a FROM t WHERE t.a = 'x'")
    assert(q.conds.head.rhs == LitRhs("x"))
  }

  test("rejects malformed input") {
    assert(intercept[IllegalArgumentException](
      MiniSql.parse("SELECT FROM t")).getMessage.nonEmpty)
    assert(intercept[IllegalArgumentException](
      MiniSql.parse("SELECT t.a FROM t WHERE t.a ! \"1\"")).getMessage.nonEmpty)
    assert(intercept[IllegalArgumentException](
      MiniSql.parse("SELECT t.a FROM t extra")).getMessage.nonEmpty)
    assert(intercept[IllegalArgumentException](
      MiniSql.parse("SELECT t.a FROM t WHERE t.a = \"unterminated"))
      .getMessage.nonEmpty)
  }
}
