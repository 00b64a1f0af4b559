package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout: pre-shuffle a table ONCE at write time so every
  * later equi-join or aggregation on the bucket key runs shuffle-free.
  *
  * This is the storage-level answer to "minimize shuffles" at 100 TB:
  * two fact tables bucketed by the same key into the same bucket count
  * sort-merge-join with zero Exchange on either side (verified by
  * BucketingSpec against the physical plan). The reference engine has no
  * equivalent — its data layout is a flat serialized heap file
  * (/root/reference/src/ConvertTxtToTbl.java:16-75).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table registered in the
    * catalog under `name`, stored externally at `path`. */
  def writeBucketed(
      df: DataFrame,
      name: String,
      path: String,
      key: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(name)

  /** Join two same-bucketed tables on their bucket keys — planner elides
    * both exchanges when bucket specs line up. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
