package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Planner semantics at sf0.001: each parser-driven plan must equal the
  * handwritten DataFrame algebra, row for row. */
class MiniSqlPlannerSpec extends SparkSpec {

  private def run(sql: String): DataFrame =
    MiniSqlPlanner.run(spark, sf, sql)

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("literal is coerced by column type (int column, string literal)") {
    val got = run("""SELECT * FROM nation WHERE nation.n_regionkey = "2"""")
    val want = Tables.nation(spark, sf).filter(col("n_regionkey") === 2)
    assertSameRows(got, want)
    assert(got.count() > 0)
  }

  test("conjunctive selections and projection") {
    val got = run(
      """SELECT customer.c_custkey, customer.c_name FROM customer
        |WHERE customer.c_nationkey = "5", customer.c_acctbal > "1000"""".stripMargin)
    val want = Tables.customer(spark, sf)
      .filter(col("c_nationkey") === 5 && col("c_acctbal") > 1000)
      .select("c_custkey", "c_name")
    assertSameRows(got, want)
  }

  test("two-table equi-join") {
    val got = run(
      """SELECT customer.c_name, orders.o_orderkey FROM customer, orders
        |WHERE customer.c_custkey = orders.o_custkey""".stripMargin)
    val want = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .select("c_name", "o_orderkey")
    assertSameRows(got, want)
    assert(got.count() > 0)
  }

  test("unconnected table becomes a cross join (divergence from drop quirk)") {
    val got = run("SELECT region.r_name, nation.n_name FROM region, nation")
    assert(got.count() ==
      Tables.region(spark, sf).count() * Tables.nation(spark, sf).count())
  }

  test("GROUPBY without aggregates is distinct-on-group-cols") {
    val got = run(
      """SELECT orders.o_orderstatus FROM orders
        |GROUPBY orders.o_orderstatus, orders.o_orderpriority""".stripMargin)
    val want = Tables.orders(spark, sf)
      .dropDuplicates("o_orderstatus", "o_orderpriority")
      .select("o_orderstatus")
    assertSameRows(got, want)
  }

  test("aggregates execute for real with contract output types") {
    val got = run(
      """SELECT customer.c_nationkey, MAX(customer.c_acctbal),
        |COUNT(customer.c_custkey) FROM customer
        |GROUPBY customer.c_nationkey""".stripMargin)
    assert(got.columns.toSeq ==
      Seq("c_nationkey", "max_c_acctbal", "count_c_custkey"))
    assert(got.schema("count_c_custkey").dataType.typeName == "integer")
    val want = Tables.customer(spark, sf).groupBy("c_nationkey")
      .agg(max("c_acctbal").as("max_c_acctbal"),
        count("c_custkey").cast("int").as("count_c_custkey"))
    assertSameRows(got, want)
  }

  test("a condition on a table missing from FROM is an error, not a no-op") {
    val e = intercept[IllegalArgumentException](run(
      """SELECT customer.c_name FROM customer
        |WHERE custmer.c_acctbal > "100"""".stripMargin))
    assert(e.getMessage.contains("custmer"))
  }

  test("non-aggregated projection without GROUPBY is an error") {
    val e = intercept[IllegalArgumentException](run(
      "SELECT customer.c_name, MAX(customer.c_acctbal) FROM customer"))
    assert(e.getMessage.contains("GROUPBY"))
  }

  test("ORDERBY DESC applies one global flag to all keys") {
    val got = run(
      """SELECT orders.o_orderkey, orders.o_totalprice FROM orders
        |ORDERBY orders.o_totalprice, orders.o_orderkey DESC""".stripMargin)
      .limit(5).collect()
    val want = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      .select("o_orderkey", "o_totalprice").limit(5).collect()
    assert(got.toSeq == want.toSeq)
  }
}
