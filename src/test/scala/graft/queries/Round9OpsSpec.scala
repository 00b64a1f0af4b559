package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariants of the round-9 operators (p82–p85) on the real sf0.001
  * tables — properties that must hold on ANY corpus. */
class Round9OpsSpec extends SparkSpec {

  private def run(name: String) = Pipeline.queries(name)(spark, sf)

  test("p82: every doc weighted once, cluster mass sums to one") {
    val rows = run("p82_soft_dedup_weights").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      val (n, w) = (r.getAs[Long]("n_members"), r.getAs[Double]("weight"))
      assert(n >= 1)
      assert(math.abs(w - 1.0 / n) < 5e-7, s"weight $w != 1/$n")
      // cluster label is the component's smallest doc_id
      assert(r.getAs[Long]("cluster_id") <= r.getAs[Long]("doc_id"))
    }
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (c, rs) =>
      val mass = rs.map(_.getAs[Double]("weight")).sum
      assert(math.abs(mass - 1.0) < 1e-5 * rs.length,
        s"cluster $c mass $mass over ${rs.length} members")
      assert(rs.forall(_.getAs[Long]("n_members") == rs.length))
    }
  }

  test("p83: survivors carry unbiased inverse-propensity weights") {
    val rows = run("p83_quality_sampling").collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length < nDocs, "sampling must thin the corpus")
    rows.foreach { r =>
      val (p, w) = (r.getAs[Double]("accept_p"), r.getAs[Double]("weight"))
      assert(p >= 0.05 && p <= 1.0, s"accept_p $p outside clamp")
      assert(math.abs(p * w - 1.0) < 1e-4, s"weight $w not ~1/$p")
    }
    // the hash coin makes the sample a deterministic function of the data
    val again = run("p83_quality_sampling").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted
      .sameElements(again.map(_.getAs[Long]("doc_id")).sorted))
  }

  test("p84: every flagged cell clears the integer 3-sigma gate") {
    val rows = run("p84_hourly_anomaly").collect()
    rows.foreach { r =>
      val (dev2, nvar) = (r.getAs[Long]("dev2"), r.getAs[Long]("nvar"))
      assert(dev2 > 9L * nvar, s"flagged cell fails its own gate")
      assert(r.getAs[Long]("c") >= 1 && r.getAs[Long]("n_hours") >= 2)
    }
  }

  test("p87: orphan counts equal the simulated drift slices") {
    val rows = run("p87_ref_integrity").collect()
      .map(r => r.getAs[String]("category") ->
        (r.getAs[Long]("n_orphans"), r.getAs[Long]("min_id"),
          r.getAs[Long]("max_id"))).toMap
    assert(rows.keySet == Set("doc_without_vec", "vec_without_doc"))
    // ids align 1:1 in the driver tables, so each side's orphans are
    // exactly the OTHER side's dropped slice minus its own
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val docKept = ids.filter(_ % 13 != 5)
    val vecKept = ids.filter(_ % 10 != 3)
    val dwv = docKept -- vecKept
    val vwd = vecKept -- docKept
    assert(rows("doc_without_vec") == ((dwv.size.toLong, dwv.min, dwv.max)))
    assert(rows("vec_without_doc") == ((vwd.size.toLong, vwd.min, vwd.max)))
  }

  test("p88: ranks cover exactly the pair-graph nodes, floor above base") {
    val rows = run("p88_dup_pagerank").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("degree"), r.getAs[Long]("rank")))).toMap
    val clustered = run("p32_dup_clusters").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(rows.keySet == clustered, "rank node set != component node set")
    rows.values.foreach { case (deg, rank) =>
      assert(deg >= 1)
      // every node receives >= its damped base; a leaf hanging off any
      // neighbor also receives a positive damped contribution
      assert(rank > Pipeline.PrBase, s"rank $rank not above damped base")
    }
    // integer arithmetic makes reruns bit-identical
    assert(run("p88_dup_pagerank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"))).toMap ==
      rows.map { case (k, v) => k -> v._2 })
  }

  test("p84's int64 envelope guard passes real scales, fails loudly beyond") {
    import spark.implicits._
    val ok = (("click", "h1", 100L) +: (2 to 11).map(i =>
      ("click", s"h$i", 5L))).toDF("event_type", "hour", "c")
    // within the envelope: the guard is invisible and the 3σ gate flags
    // the hot hour
    assert(Pipeline.p84Gate(ok).collect().map(_.getString(1)).toSeq == Seq("h1"))
    // beyond n_hours*max_c >= 1e9 the int64 products could wrap: the job
    // must DIE with the envelope message, never emit a silent verdict
    val hot = Seq(("click", "h1", 600000000L), ("click", "h2", 500000000L))
      .toDF("event_type", "hour", "c")
    val e = intercept[Exception] { Pipeline.p84Gate(hot).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("envelope")),
      s"wrong failure: ${messages(e)}")
  }

  test("p89: one profile row per column, counts reconcile exactly") {
    val rows = run("p89_table_profile").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val docs = Tables.documents(spark, sf)
    assert(rows.keySet == docs.columns.toSet)
    val n = docs.count()
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == 0L) // driver tables carry no nulls
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[Long]("top_cnt") >= 1L)
      assert(r.getAs[String]("min_value") <= r.getAs[String]("max_value"))
    }
    // a primary key profiles as all-distinct with a count-1 mode
    assert(rows("doc_id").getAs[Long]("n_distinct") == n)
    assert(rows("doc_id").getAs[Long]("top_cnt") == 1L)
    // the modal lang matches a direct computation
    val (topLang, topCnt) = docs.groupBy("lang").count()
      .orderBy(col("count").desc, col("lang").asc).limit(1)
      .collect().map(r => (r.getString(0), r.getLong(1))).head
    assert(rows("lang").getAs[String]("top_value") == topLang)
    assert(rows("lang").getAs[Long]("top_cnt") == topCnt)
  }

  test("p90: schema enumeration rediscovers every true FK edge") {
    val rows = run("p90_fk_discovery").collect()
      .map(r => (r.getAs[String]("child_col"), r.getAs[String]("parent_col"))
        -> (r.getAs[Long]("n_unmatched"), r.getAs[Int]("is_fk"))).toMap
    // all seven true TPC-H edges must fall out of the enumeration
    val trueEdges = Seq(
      "lineitem.l_orderkey" -> "orders.o_orderkey",
      "lineitem.l_partkey" -> "part.p_partkey",
      "lineitem.l_suppkey" -> "supplier.s_suppkey",
      "orders.o_custkey" -> "customer.c_custkey",
      "customer.c_nationkey" -> "nation.n_nationkey",
      "supplier.s_nationkey" -> "nation.n_nationkey",
      "nation.n_regionkey" -> "region.r_regionkey")
    trueEdges.foreach { e =>
      assert(rows.contains(e), s"true edge $e not discovered")
      assert(rows(e) == (0L, 1), s"true edge $e not flagged FK: ${rows(e)}")
    }
    // enumeration produces candidates beyond the hand-list — and at least
    // one fails containment, proving the negative side is exercised
    assert(rows.size > trueEdges.size, "enumeration degenerated to a hand list")
    assert(rows.values.exists { case (unm, fk) => fk == 0 && unm > 0 },
      "no near-miss candidate surfaced — the negative path is dead")
    // the gate invariants: an FK row never carries unmatched values, a
    // non-FK row always does, and no within-table pair ever appears
    rows.foreach { case ((c, p), (unm, fk)) =>
      assert(if (fk == 1) unm == 0L else unm > 0L, s"($c,$p) inconsistent")
      assert(c.split("\\.")(0) != p.split("\\.")(0), s"within-table pair $c->$p")
    }
  }

  test("p91: a key vanishes iff its latest row is a tombstone") {
    val latest = run("p85_upsert_latest").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("event_id")).toMap
    val kept = run("p91_upsert_tombstones").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("event_id")).toMap
    val (deleted, surviving) = latest.partition(_._2 % 17 == 0)
    assert(kept == surviving, "survivors differ from p85 minus tombstones")
    assert(deleted.nonEmpty, "fixture produced no tombstoned key; weak test")
    assert(deleted.keySet.intersect(kept.keySet).isEmpty)
  }

  test("p85: exactly the latest row per key survives compaction") {
    val rows = run("p85_upsert_latest").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
      .toMap
    val expect = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max }
    assert(rows == expect)
  }
}
