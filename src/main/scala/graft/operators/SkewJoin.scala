package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins — the manual fallback for the cases
  * AQE's skew-join splitting can't reach (e.g. a skewed aggregation
  * feeding a join, or a build side that must stay a shuffle join).
  *
  * A hot key that would land an entire 10-GB partition on one reducer is
  * split across `numSalts` reducers: the probe side gets a deterministic
  * salt derived from its row content, the build side is replicated once
  * per salt value, and the join key becomes (key, salt). Replication
  * multiplies the build side by `numSalts`, so this is for
  * moderate-cardinality build sides; results are identical to the
  * unsalted join because every probe row still meets every matching build
  * row exactly once.
  */
object SkewJoin {

  /** Inner equi-join of `probe` (large, skewed) with `build` on
    * `probeKey == buildKey`, spreading each probe key over `numSalts`
    * partitions.
    *
    * `saltCols` names the probe columns the per-row salt is hashed from;
    * empty (the default) hashes the whole row, which requires every probe
    * column to be hashable — pass an explicit subset when the probe
    * carries map-typed columns. The internal working column is named to
    * avoid collision with both inputs' schemas. */
  def saltedInner(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      numSalts: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val salt = Iterator.iterate("__salt")(_ + "_")
      .dropWhile(n => probe.columns.contains(n) || build.columns.contains(n))
      .next()
    // Deterministic per-row salt: hash of the salt-source columns spreads
    // even a single hot key uniformly (rows identical on those columns
    // co-locate, which only costs balance, never correctness).
    val src = if (saltCols.nonEmpty) saltCols else probe.columns.toSeq
    val saltedProbe = probe.withColumn(salt,
      pmod(hash(src.map(probe(_)): _*), lit(numSalts)))
    val replicatedBuild = build.withColumn(salt,
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedProbe
      .join(replicatedBuild,
        saltedProbe(probeKey) === replicatedBuild(buildKey) &&
          saltedProbe(salt) === replicatedBuild(salt))
      .drop(salt)
  }
}
