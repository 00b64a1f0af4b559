package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Session
import graft.plans.Explain
import graft.sources.{Ingest, RandomDb, TextTables}
import graft.sql.MiniSqlPlanner

/** The reference's flagship CLI, end to end — the one entry point that
  * had no single-command analogue (`/root/reference/src/QueryMain.java:
  * 22-40,139-226`, driven by `demo/test.sh`): a mini-SQL query FILE in,
  * the optimized plan + expected-cost display, an optional interactive
  * confirm ("enter 1 to continue, 0 to abort"), and a result FILE out.
  *
  * Where the reference reads `.tbl` tuples from the working directory,
  * the table side here is pluggable, covering every lifecycle the
  * reference's demo scripts exercise:
  *   --data <dir>           parquet tables of a scale-factor directory,
  *                          resolved through the ANALYZEd catalog so the
  *                          CBO reorders joins (the RandomOptimizer
  *                          analogue);
  *   --txt <dir>            graft-txt TEXT tables at <dir>/<TABLE> (the
  *                          ConvertTxtToTbl interop format, read through
  *                          the DSv2 source);
  *   --random <det>=<rows>  tables generated on the fly from every
  *                          `.det` schema in <det> (the RandomDB +
  *                          setup.sh analogue).
  * The buffer/page-size arguments have no Spark meaning (memory is the
  * executor's, not a hand-managed pool) and are deliberately absent.
  *
  * Usage:
  *   graft.tools.QueryMain <query.sql> <resultfile> [auto]
  *     [--data <dir> | --txt <dir> | --random <detDir>=<rows>]
  */
object QueryMain {

  def main(args: Array[String]): Unit = {
    var positional = Vector.empty[String]
    var auto = false
    var data: Option[String] = None
    var txt: Option[String] = None
    var random: Option[(String, Long)] = None
    var i = 0
    def die(msg: String): Nothing = { System.err.println(msg); sys.exit(1) }
    def value(flag: String): String = {
      if (i + 1 >= args.length) die(s"$flag needs a value")
      i += 1; args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "auto"   => auto = true
        case "--data" => data = Some(value("--data"))
        case "--txt"  => txt = Some(value("--txt"))
        case "--random" =>
          value("--random").split("=", 2) match {
            case Array(dir, n) => random = Some((dir, n.toLong))
            case _ => die("--random wants <detDir>=<numRows>")
          }
        case flag if flag.startsWith("--") => die(s"unknown flag $flag")
        case p => positional :+= p
      }
      i += 1
    }
    if (Seq(data, txt, random).count(_.isDefined) > 1)
      die("--data, --txt and --random are mutually exclusive")
    if (positional.length != 2)
      die("usage: graft.tools.QueryMain <query.sql> <resultfile> [auto] " +
        "[--data <dir> | --txt <dir> | --random <detDir>=<rows>]")
    val Vector(queryFile, resultFile) = positional
    if (!Files.exists(Paths.get(queryFile)))
      die(s"File not found: $queryFile") // the reference's exact complaint
    val sql =
      new String(Files.readAllBytes(Paths.get(queryFile)),
        StandardCharsets.UTF_8)

    val spark = Session.local()
    val resolve: String => DataFrame = (data, txt, random) match {
      case (_, Some(dir), _) => t => TextTables.read(spark, s"$dir/$t")
      case (_, _, Some((detDir, n))) =>
        val dets = Option(new java.io.File(detDir).list()).getOrElse(Array())
          .filter(_.endsWith(".det")).map(_.stripSuffix(".det"))
        if (dets.isEmpty) die(s"no .det schemas in $detDir")
        val tables = RandomDb.generateAll(spark, detDir,
          dets.map(_ -> n).toMap)
        t => tables.getOrElse(t, die(s"no .det schema for table $t"))
      case _ =>
        val dir = data.getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
        graft.sql.SparkSqlRunner.ensureRegistered(spark, dir)
        t => spark.table(t.toLowerCase)
    }

    run(spark, resolve, sql, display => {
      println(display)
      auto || {
        println("enter 1 to continue, 0 to abort")
        Option(scala.io.StdIn.readLine()).map(_.trim).contains("1")
      }
    }) match {
      case None =>
        spark.stop()
        sys.exit(1) // the reference aborts with exit 1 on flag 0
      case Some(df) =>
        val t0 = System.nanoTime()
        writeResult(df, resultFile)
        println(f"Execution time = ${(System.nanoTime() - t0) / 1e9}%.3f")
        spark.stop()
    }
  }

  /** Parse + plan, hand the plan/cost display to `confirm`, return the
    * planned frame if confirmed — None is the reference's abort path.
    * Factored from main so specs (and embedders) drive the exact CLI
    * flow without a process boundary. */
  def run(spark: SparkSession, resolve: String => DataFrame, sql: String,
      confirm: String => Boolean): Option[DataFrame] = {
    val df = MiniSqlPlanner.run(spark, resolve, sql)
    val display =
      "----------------------Execution Plan----------------\n" +
        Explain.cost(df) +
        Explain.estimatedRowCount(df)
          .fold("")(n => s"\nExpected rows: $n")
    if (confirm(display)) Some(df) else None
  }

  /** The result file: ONE tab-separated file (header + rows) at
    * `outFile`, the reference's result contract modulo the formatting
    * deltas documented on [[Ingest.writeDelimited]]. The distributed
    * write lands in a temp dir; the single part file then moves to the
    * requested path. */
  def writeResult(df: DataFrame, outFile: String): Unit = {
    val tmp = Files.createTempDirectory("graft-querymain")
    // coalesce(1)'s order-preserving single file only when the query
    // actually SORTED (a global Sort at the plan root, under any
    // column-shaping nodes) — for everything else the repartition(1)
    // path keeps the final stage parallel
    Ingest.writeDelimited(df, tmp.toString, preserveOrder = isSorted(df))
    val part = Option(tmp.toFile.listFiles()).getOrElse(Array())
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"no part file under $tmp — empty write?"))
    val target = Paths.get(outFile).toAbsolutePath
    Option(target.getParent).foreach(Files.createDirectories(_))
    Files.move(part.toPath, target, StandardCopyOption.REPLACE_EXISTING)
    Option(tmp.toFile.listFiles()).getOrElse(Array()).foreach(_.delete())
    Files.deleteIfExists(tmp): Unit
  }

  /** Does the query end in a global ORDER BY? Walks through the
    * column-shaping nodes Catalyst may leave above the Sort. */
  private def isSorted(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, SubqueryAlias}
    @annotation.tailrec
    def walk(p: LogicalPlan): Boolean = p match {
      case s: Sort          => s.global
      case pr: Project      => walk(pr.child)
      case a: SubqueryAlias => walk(a.child)
      case _                => false
    }
    walk(df.queryExecution.optimizedPlan)
  }
}
