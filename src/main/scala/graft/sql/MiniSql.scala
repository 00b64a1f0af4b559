package graft.sql

/** AST + recursive-descent parser for the reference's mini-SQL dialect.
  *
  * Grammar (from /root/reference/src/qp/parser/parser.cup:53-281 and
  * scaner.lex:37-169):
  *
  * {{{
  * query     := SELECT [DISTINCT] (attlist | *) FROM tablelist
  *              [WHERE condlist] [GROUPBY attlist]
  *              [ORDERBY attlist [DESC|ASC]]
  * attlist   := attr (, attr)*
  * attr      := TABLE.col | MAX(attr) | MIN | SUM | COUNT | AVG
  * tablelist := ID (, ID)*
  * condlist  := cond (, cond)*          -- comma means AND
  * cond      := attr op "stringlit" | attr op attr
  * op        := < | > | <= | >= | = | !=
  * }}}
  *
  * Dialect quirks preserved: `GROUPBY`/`ORDERBY` are single tokens, all
  * literals are quoted strings (coerced later by the referenced column's
  * type, per Select.java:140-147), one global ASC/DESC flag for all sort
  * keys (Sort.java:28-41). Divergences (documented in SURVEY.md §7.3): we
  * execute `SELECT DISTINCT *` as a real distinct and unconnected FROM
  * tables as a cross join, instead of reproducing the reference's silent
  * drops.
  */
object MiniSql {

  val AggNames = Set("MAX", "MIN", "SUM", "COUNT", "AVG")

  /** `TABLE.col`, optionally wrapped in an aggregate tag
    * (Attribute.java:18-23). */
  final case class Attr(table: String, name: String, agg: Option[String] = None)

  sealed trait Rhs
  final case class LitRhs(value: String) extends Rhs
  final case class AttrRhs(attr: Attr) extends Rhs

  /** One comparison `lhs op rhs` (Condition.java:7-28). */
  final case class Cond(lhs: Attr, op: String, rhs: Rhs) {
    /** Attr-vs-attr on two different tables → join condition; everything
      * else is a selection (SQLQuery.java:52-70). */
    def isJoin: Boolean = rhs match {
      case AttrRhs(a) => a.table != lhs.table
      case _          => false
    }
  }

  final case class Query(
      distinct: Boolean,
      star: Boolean,
      projs: Seq[Attr],
      tables: Seq[String],
      conds: Seq[Cond],
      groupBy: Seq[Attr],
      orderBy: Seq[Attr],
      orderDesc: Boolean)

  // ---- lexer -------------------------------------------------------------

  sealed trait Tok
  final case class Ident(s: String) extends Tok
  final case class Lit(s: String) extends Tok
  final case class Sym(s: String) extends Tok // , . ( ) * < > <= >= = !=
  final case class Kw(s: String) extends Tok // upper-cased keyword

  private val Keywords = Set("SELECT", "DISTINCT", "FROM", "WHERE",
    "GROUPBY", "ORDERBY", "DESC", "ASC") ++ AggNames

  def tokenize(input: String): Seq[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var i = 0
    def err(msg: String) =
      throw new IllegalArgumentException(s"$msg at offset $i in: $input")
    while (i < input.length) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'') {
        val end = input.indexOf(c, i + 1)
        if (end < 0) err("unterminated string literal")
        out += Lit(input.substring(i + 1, end)); i = end + 1
      } else if (c.isLetter || c == '_') {
        val j = input.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i)
        val end = if (j < 0) input.length else j
        val word = input.substring(i, end)
        val up = word.toUpperCase
        out += (if (Keywords(up)) Kw(up) else Ident(word)); i = end
      } else if (c == '<' || c == '>' || c == '!') {
        if (i + 1 < input.length && input(i + 1) == '=') {
          out += Sym(s"$c="); i += 2
        } else if (c == '!') err("expected != ")
        else { out += Sym(c.toString); i += 1 }
      } else if ("=,.()*".contains(c)) { out += Sym(c.toString); i += 1 }
      else err(s"unexpected character '$c'")
    }
    out.toSeq
  }

  // ---- parser ------------------------------------------------------------

  def parse(sql: String): Query = new Parser(tokenize(sql)).query()

  private final class Parser(toks: Seq[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = {
      val t = toks.lift(pos).getOrElse(fail("unexpected end of query"))
      pos += 1; t
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$msg (at token ${toks.lift(pos).getOrElse("<eof>")})")
    private def expectKw(k: String): Unit = next() match {
      case Kw(`k`) => ()
      case t       => fail(s"expected $k, got $t")
    }
    private def expectSym(s: String): Unit = next() match {
      case Sym(`s`) => ()
      case t        => fail(s"expected '$s', got $t")
    }
    private def ident(): String = next() match {
      case Ident(s) => s
      case t        => fail(s"expected identifier, got $t")
    }

    def query(): Query = {
      expectKw("SELECT")
      val distinct = peek.contains(Kw("DISTINCT")) && { pos += 1; true }
      val (star, projs) =
        if (peek.contains(Sym("*"))) { pos += 1; (true, Nil) }
        else (false, attList())
      expectKw("FROM")
      val tables = identList()
      val conds =
        if (peek.contains(Kw("WHERE"))) { pos += 1; condList() } else Nil
      val groupBy =
        if (peek.contains(Kw("GROUPBY"))) { pos += 1; attList() } else Nil
      val (orderBy, desc) =
        if (peek.contains(Kw("ORDERBY"))) {
          pos += 1
          val keys = attList()
          val d = peek match {
            case Some(Kw("DESC")) => pos += 1; true
            case Some(Kw("ASC"))  => pos += 1; false
            case _                => false
          }
          (keys, d)
        } else (Nil, false)
      if (pos != toks.length) fail("trailing tokens after query")
      Query(distinct, star, projs, tables, conds, groupBy, orderBy, desc)
    }

    private def attList(): Seq[Attr] = {
      val out = scala.collection.mutable.ArrayBuffer(attr())
      while (peek.contains(Sym(","))) { pos += 1; out += attr() }
      out.toSeq
    }

    private def identList(): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer(ident())
      while (peek.contains(Sym(","))) { pos += 1; out += ident() }
      out.toSeq
    }

    private def attr(): Attr = peek match {
      case Some(Kw(agg)) if AggNames(agg) =>
        pos += 1; expectSym("(")
        val a = attr(); expectSym(")")
        a.copy(agg = Some(agg))
      case _ =>
        val t = ident(); expectSym("."); Attr(t, ident())
    }

    private def condList(): Seq[Cond] = {
      val out = scala.collection.mutable.ArrayBuffer(cond())
      while (peek.contains(Sym(","))) { pos += 1; out += cond() }
      out.toSeq
    }

    private def cond(): Cond = {
      val lhs = attr()
      val op = next() match {
        case Sym(s) if Set("<", ">", "<=", ">=", "=", "!=")(s) => s
        case t => fail(s"expected comparison operator, got $t")
      }
      val rhs = peek match {
        case Some(Lit(v)) => pos += 1; LitRhs(v)
        case _            => AttrRhs(attr())
      }
      Cond(lhs, op, rhs)
    }
  }
}
