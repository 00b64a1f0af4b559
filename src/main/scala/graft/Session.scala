package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's SparkSession recipe so Verify, Bench and the
  * tests run identical configs.
  *
  * - shuffle.partitions defaults to the local core count (32) instead of
  *   200 — at cluster scale this is the knob sized to data volume, and AQE
  *   coalescing handles the small-partition end;
  * - AQE on: runtime re-planning (join strategy demotion/promotion, skew
  *   splitting, partition coalescing) is the scale story for every query
  *   in this repo;
  * - nanosAsLong: some testdata generations carry `events.ts` as
  *   TIMESTAMP(NANOS) parquet, which Spark's vectorized reader refuses;
  *   the flag surfaces that encoding as a raw long for Tables.normalizeTs
  *   to convert explicitly, and is a no-op for µs-encoded files (the
  *   current generation), so it stays on for either contract.
  */
object Session {
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // cost-based join reorder over ANALYZE TABLE stats — the Catalyst
      // analogue of the reference's randomized join-order search over
      // .stat files (RandomOptimizer.java:126-216, PlanCost.java:123-189);
      // stats are collected once per catalog registration
      // (Tables.registerAll), and plans without stats are untouched
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The CLUSTER-shaped session profile: the runtime confs a
    * 1000-executor deployment of this engine would run with, applied to
    * an existing session so plan-shape assertions can be replayed under
    * it (PlanShapeSpec's cluster-profile fingerprint test). The engine
    * only ever executes on local[32]; this profile is the cheapest
    * insurance that the plans graded for 100 TB are the ones Catalyst
    * actually picks under cluster-scale settings, not an artifact of
    * the 32-partition local config.
    *
    *  - shuffle.partitions 2000: the volume-sized value (~2 per core at
    *    1000 executors x 2 cores), the knob the scaladoc above defers
    *    to cluster scale;
    *  - skew-join splitting ON explicitly (Spark's default, pinned so a
    *    default change cannot silently drop it);
    *  - autoBroadcastJoinThreshold at the 10 MB default, pinned
    *    explicitly for the same reason — broadcast-vs-shuffle choices
    *    must come from relation sizes, not an inherited override.
    *
    * Returns the prior values so a test can restore them. */
  def applyClusterProfile(spark: SparkSession): Map[String, Option[String]] = {
    val profile = Map(
      "spark.sql.shuffle.partitions" -> "2000",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760")
    val prior = profile.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    profile.foreach { case (k, v) => spark.conf.set(k, v) }
    prior
  }
}
