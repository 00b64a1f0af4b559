// Cost of spark.read.parquet plan construction: schema inference +
// file listing per call, vs a pre-supplied schema, vs a cached Dataset.
//   sbt -batch "runMain graft.tools.ReadCostProbe <sfDir>"
package graft.tools

import graft.Session

object ReadCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Session.local()
    val tables = Seq("lineitem", "orders", "customer", "nation", "region",
      "supplier", "part", "events", "documents", "embeddings")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"READCOST $label min=${ts.min}%.4f times=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // warm
    tables.foreach(t => spark.read.parquet(s"$sfDir/$t.parquet"))
    time("read_infer_all10") {
      tables.foreach(t => spark.read.parquet(s"$sfDir/$t.parquet"))
    }
    val schemas = tables.map(t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet").schema).toMap
    time("read_with_schema_all10") {
      tables.foreach(t =>
        spark.read.schema(schemas(t)).parquet(s"$sfDir/$t.parquet"))
    }
    val cached = tables.map(t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet")).toMap
    time("cached_noop_all10") { tables.foreach(t => cached(t)) }
    // chained analysis cost: 6-table join chain like q31, from fresh reads
    import org.apache.spark.sql.functions._
    time("q31_shape_fresh") {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val su = spark.read.parquet(s"$sfDir/supplier.parquet")
      r.join(n, col("r_regionkey") === col("n_regionkey"))
        .join(c, col("n_nationkey") === col("c_nationkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name")).agg(count(lit(1)))
    }
    time("q31_shape_cached_reads") {
      r2(cached)
    }
    def r2(m: Map[String, org.apache.spark.sql.DataFrame]): Unit = {
      m("region").join(m("nation"), col("r_regionkey") === col("n_regionkey"))
        .join(m("customer"), col("n_nationkey") === col("c_nationkey"))
        .join(m("orders"), col("c_custkey") === col("o_custkey"))
        .join(m("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(m("supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name")).agg(count(lit(1))): Unit
    }
    spark.stop()
  }
}
