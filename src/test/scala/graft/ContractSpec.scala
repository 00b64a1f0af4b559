package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query has a DuckDB oracle twin (the
  * correctness gate is only as wide as this mapping) and names follow the
  * module prefixes. */
class ContractSpec extends AnyFunSuite {

  test("every query key has an oracleSql twin") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
  }

  test("every oracle key has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are prefixed by module family") {
    val ok = SparkEntry.queries.keys.forall(k =>
      k.startsWith("q") || k.startsWith("p") || k.startsWith("s"))
    assert(ok)
  }

  test("no duplicate keys across modules") {
    // flatMap over modules would silently drop dupes in toMap; sizes must agree
    val names = Seq(queries.Relational, queries.Pipeline, queries.Dialect)
      .flatMap(_.queries.keys)
    assert(names.distinct.sizeIs == names.size)
  }
}
