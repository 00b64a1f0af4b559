package graft

import org.apache.spark.sql.functions._

import graft.queries.Pipeline

/** The session artifact registry (graft.Artifacts): the near-dup pair
  * graph and its cluster labels are built ONCE per (session, dataset)
  * and shared by every consumer — the round-10 production shape, where
  * signature/pair tables are persisted side-tables, not per-query
  * rebuilds. */
class ArtifactsSpec extends SparkSpec {

  test("nearDupPairs is the same materialized frame on every request") {
    val a = Pipeline.nearDupPairs(spark, sf)
    val b = Pipeline.nearDupPairs(spark, sf)
    assert(a eq b, "second request must return the cached frame")
    val c = Pipeline.dupClusterLabels(spark, sf)
    assert(c eq Pipeline.dupClusterLabels(spark, sf))
  }

  test("graft.artifacts.reuse=false restores rebuild-per-consumer") {
    spark.conf.set("graft.artifacts.reuse", "false")
    try {
      val a = Pipeline.nearDupPairs(spark, sf)
      val b = Pipeline.nearDupPairs(spark, sf)
      assert(!(a eq b), "reuse=false must build a fresh frame per call")
    } finally spark.conf.unset("graft.artifacts.reuse")
  }

  test("cached and rebuilt pair graphs hold identical rows") {
    val cached = Pipeline.nearDupPairs(spark, sf)
      .orderBy("doc_a", "doc_b").collect()
    val fresh = {
      spark.conf.set("graft.artifacts.reuse", "false")
      try Pipeline.nearDupPairs(spark, sf).orderBy("doc_a", "doc_b").collect()
      finally spark.conf.unset("graft.artifacts.reuse")
    }
    assert(cached.toSeq == fresh.toSeq)
  }

  test("artifacts are keyed per dataset dir, not globally") {
    val a = Pipeline.nearDupPairs(spark, sf)
    val mini = graft.queries.PipelineMiniSpec.dir
    val m = Pipeline.nearDupPairs(spark, mini)
    assert(!(a eq m), "different dirs must not share an artifact")
    // the mini corpus plants exactly the (0,1),(0,2),(1,2) triangle
    val pairs = m.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("invalidate drops this session's artifacts") {
    val a = Pipeline.nearDupPairs(spark, sf)
    Artifacts.invalidate(spark)
    val b = Pipeline.nearDupPairs(spark, sf)
    assert(!(a eq b), "invalidate must force a rebuild")
  }

  test("invalidate clears the sizing-scalar memo too — a rewritten " +
      "corpus must not keep the old corpus's sizing") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scalar-memo").toString
    var builds = 0
    def count(): Long =
      Artifacts.cachedScalar(spark, dir, "rowcount:documents") {
        builds += 1; 100L * builds
      }
    assert(count() == 100L && count() == 100L && builds == 1,
      "the scalar is built once per session and dir")
    Artifacts.invalidate(spark)
    assert(count() == 200L,
      "after invalidate the scalar must be recomputed")
  }

  test("graft.artifacts.dir persists artifacts across sessions") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-artifact-store").toString
    spark.conf.set("graft.artifacts.dir", store)
    try {
      Artifacts.invalidate(spark)
      val rows = Pipeline.nearDupPairs(spark, sf)
        .orderBy("doc_a", "doc_b").collect().toSeq
      // the store now holds the parquet side-table with its marker
      val stored = new java.io.File(store).listFiles()
      assert(stored != null && stored.length == 1, "one dataset key")
      val table = new java.io.File(stored(0), "neardup_pairs")
      assert(new java.io.File(table, "_SUCCESS").exists(),
        s"no _SUCCESS under $table")
      // a "new session" (registry invalidated) READS the side-table,
      // not the corpus — proven by tampering: truncate the stored
      // table to its first row and the next request must see ONE row
      val one = spark.read.parquet(table.toString).limit(1)
      val tmp = new java.io.File(stored(0), "tamper")
      one.write.parquet(tmp.toString)
      spark.read.parquet(tmp.toString).write
        .mode("overwrite").parquet(table.toString)
      Artifacts.invalidate(spark)
      val again = Pipeline.nearDupPairs(spark, sf).collect().toSeq
      assert(again.length == 1,
        "a fresh session must read the (tampered) store, not rebuild")
      // and the marker is the visibility gate: drop it and the
      // artifact must REBUILD (half-write protection)
      assert(new java.io.File(table, "_SUCCESS").delete())
      Artifacts.invalidate(spark)
      val rebuilt = Pipeline.nearDupPairs(spark, sf)
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(rebuilt == rows)
      assert(new java.io.File(table, "_SUCCESS").exists(),
        "rebuild must rewrite the side-table with its marker")
    } finally {
      spark.conf.unset("graft.artifacts.dir")
      Artifacts.invalidate(spark)
    }
  }
}
