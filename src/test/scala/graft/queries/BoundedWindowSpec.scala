package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The bounded-window invariant, asserted mechanically (VERDICT r14
  * item 5): an UNPARTITIONED window funnels its whole input through one
  * task, so it is a scale-killer unless its input is provably bounded —
  * a fixed grid, a ≤K-row range table, a per-probe top-k already capped
  * upstream. Several ops deliberately carry such windows over bounded
  * shapes (declared below, each with the boundedness argument); this
  * suite walks EVERY gate query's optimized plan and fails if an
  * unpartitioned window appears anywhere else, so a refactor that
  * quietly drops a partition key (the exact regression the suite log's
  * WindowExec warnings would bury) turns into a red test naming the
  * query. The allowlist is checked both ways — an entry whose query no
  * longer plans an unpartitioned window is stale and fails too. */
class BoundedWindowSpec extends SparkSpec {

  /** query → why its unpartitioned window's input is bounded. */
  private val declaredBounded: Map[String, String] = Map(
    "p18_bigram_top" -> ("global top-k rank over the salted local ranks'" +
      " survivors: <= 64 salts x 25 rows"),
    "p25_pmi_collocations" -> ("global top-k rank over the salted local" +
      " ranks' survivors: <= 64 salts x 15 rows"),
    "p28_token_shards" -> ("prefix-sum offsets over the RANGE table:" +
      " corpus/RangeDocs rows (100x reduction; recurses another level" +
      " when that overwhelms one task - docCumTokens scaladoc)"),
    "p60_pack_whole_docs" -> ("same docCumTokens range-table offsets" +
      " as p28"),
    "p105_training_order" -> ("offsets over at most OrderRanges distinct" +
      " hash-range buckets - a fixed constant"),
    "p107_padding_audit" -> ("two offset windows: one over the p28 range" +
      " table, one over <= PadCtx (64) distinct length buckets"),
    "p48_hist_quantiles" -> "CDF over the 32-row histogram, never the corpus",
    "p73_perplexity_buckets" -> ("CDF over distinct quantized" +
      " bits-per-token values - a value-domain-bounded score histogram," +
      " not corpus rows"),
    "p97_weighted_sample" -> ("rank over the already-limited sample:" +
      " <= SampleK rows"),
    "p120_budget_allocation" -> ("rank over one row per SOURCE - the" +
      " small source enumeration"),
  )

  test("unpartitioned windows appear only over declared bounded inputs") {
    // full lineage: no checkpoint truncation, no cached artifact scans
    spark.conf.set("graft.stage.materialize", "none")
    spark.conf.set("graft.artifacts.reuse", "false")
    try {
      val offenders = scala.collection.mutable.ListBuffer[String]()
      val carriers = scala.collection.mutable.Set[String]()
      for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val unpart = q(spark, sf).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (unpart.nonEmpty) {
          carriers += name
          if (!declaredBounded.contains(name)) offenders += name
        }
      }
      assert(offenders.isEmpty,
        s"UNDECLARED unpartitioned window(s) in: ${offenders.mkString(", ")}" +
          " — either re-partition the window or declare the input bounded" +
          " here with the boundedness argument")
      val stale = declaredBounded.keySet.diff(carriers)
      assert(stale.isEmpty,
        s"stale declarations (no unpartitioned window planned): " +
          stale.mkString(", "))
    } finally {
      spark.conf.unset("graft.stage.materialize")
      spark.conf.unset("graft.artifacts.reuse")
    }
  }
}
