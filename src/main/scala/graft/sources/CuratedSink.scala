package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Production output layout for a curated document corpus — the write
  * side of the pipeline family (p23/p30/p46 produce exactly this
  * shape):
  *
  *  - `partitionBy(lang, source)`: downstream consumers filter on
  *    language/source mixtures, so those predicates must prune
  *    DIRECTORIES at the scan (PartitioningSpec proves the read side);
  *  - one shuffle keyed on the partition columns BEFORE the write, so
  *    each task owns whole output partitions — without it every task
  *    appends a file into every (lang, source) directory and a
  *    1000-task write of a 30-partition corpus emits 30k files;
  *  - `sortWithinPartitions(doc_id)`: stable row-group order makes the
  *    output deterministic file-by-file and keeps doc-id range scans
  *    splittable;
  *  - `maxRecordsPerFile`: bounds any single file no matter how skewed
  *    a (lang, source) cell is — the en/web cell of a real corpus is
  *    orders of magnitude larger than the rest.
  */
object CuratedSink {
  def write(df: DataFrame, outDir: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(col("lang"), col("source"))
      // the partition columns lead the sort: the planned write REQUIRES
      // child ordering on them and would otherwise insert its own sort
      // above this one, wasting a pass and losing the doc_id order
      .sortWithinPartitions("lang", "source", "doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("lang", "source")
      .parquet(outDir)
}
