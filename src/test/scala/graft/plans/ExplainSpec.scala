package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ExplainSpec extends SparkSpec {

  private def df = Tables.customer(spark, sf)
    .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
    .select("n_name", "c_custkey")

  test("plan shows logical and physical trees") {
    val s = Explain.plan(df)
    assert(s.contains("== Optimized Logical Plan ==")
      && s.contains("== Physical Plan =="))
  }

  test("cost mode carries statistics") {
    assert(Explain.cost(df).contains("Statistics("))
  }

  test("formatted physical plan names the scan and join") {
    val s = Explain.physical(df)
    assert(s.contains("Scan parquet"))
    assert(s.contains("Join") || s.contains("BroadcastHashJoin"))
  }

  test("filter and projection are pushed into the parquet scan") {
    val q = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10)
      .select("l_orderkey", "l_quantity")
    val s = Explain.physical(q)
    assert(s.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10"))
    // pruned read schema: only the two referenced columns reach the scan
    assert(s.contains("l_orderkey") && !s.contains("l_comment"))
  }
}
