package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (local iteration);
    // the driver passes two args and gets the full dump
    val only = args.lift(2).map(_.split(",").toSet)
    val spark = Session.local()
    // Opt-in cross-session artifact store for renewal runs: with
    // SPARK_GRAFT_ARTIFACTS_DIR set, the dedup pair graph / cluster
    // labels / codebooks build ONCE per (store, dataset) and every
    // later full-gate run reads them back instead of rebuilding —
    // the production corpus-build shape. Results are bit-identical
    // (ArtifactStoreDualSessionSpec pins row identity); the driver
    // never sets the env, so gate runs stay standalone by default.
    sys.env.get("SPARK_GRAFT_ARTIFACTS_DIR").filter(_.nonEmpty)
      .foreach(d => spark.conf.set("graft.artifacts.dir", d))
    new java.io.File(outDir).mkdirs()
    // A query that throws (at construction OR execution) must be a loud red
    // row in the gate, never an omission: round 8 lost 49 green rows
    // silently because failures only went to stderr. errors.json rides
    // along with the parquet dumps so the driver (and a human) can see
    // exactly which queries died and why.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // per-query wall time on stderr: the big scale rungs (sf1/sf10)
        // use the dump itself as a pathology probe, and a superlinear
        // query shows up here long before the sweep total does
        System.err.println(
          f"[verify] $name ok ${(System.nanoTime - t0) / 1e9}%.1fs")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // exit 0 even with failures: the driver must still consume the partial
    // dump + errors.json (a nonzero exit could zero the whole round)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
    spark.stop()
  }
}
