package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, StringType}

/** Deterministic analogue of the reference's synthetic table generator
  * (/root/reference/src/RandomDB.java:7-196): parses the same `.det`
  * table definitions (`<colname> <INTEGER|STRING|REAL> <range>
  * <PK|FK|NK> <bytes>` after two header lines, RandomDB.java:40-111)
  * and produces the same SHAPE of data —
  *
  *  - `INTEGER PK`: unique values inside `[0, range)`
  *    (RandomDB.java:126-133 draws without replacement via a bitmap);
  *    here a seeded affine permutation `(shift + i·mult) mod range`
  *    with `gcd(mult, range) = 1`, which is injective for
  *    `numRows ≤ range` — uniqueness holds BY CONSTRUCTION on every
  *    executor independently, no coordination, no driver bitmap;
  *  - `INTEGER FK/NK`: uniform in `[0, range)` (RandomDB.java:134-139;
  *    the reference tracks FK value pools only for `.stat` statistics —
  *    values are plain uniform draws, not samples of the parent's PK);
  *  - `STRING`: `range` lowercase letters (randString,
  *    RandomDB.java:178-183);
  *  - `REAL`: uniform in `[0, range)` — implemented for real here; the
  *    reference's generator branch tests for the token "FLOAT" while
  *    the parser admits only "REAL", so its REAL columns silently emit
  *    NOTHING (RandomDB.java:117,75-80) — a bug, not a capability, and
  *    we implement the declared intent.
  *
  * Everything derives from `xxhash64(seed, table, column, row[, pos])`
  * column expressions, so generation is one embarrassingly-parallel
  * `spark.range(n)` projection — no RNG state, no driver loop, the
  * same rows at any partitioning and any cluster size, reproducible by
  * seed. The `.stat` sidecar (row count + per-column distinct counts,
  * RandomDB.java:147-170) is not reproduced: its consumer is the
  * reference's PlanCost, and the Spark-side twin of those statistics
  * is parquet footers + `ANALYZE TABLE` CBO stats (SURVEY §4.4).
  *
  * Write the result through [[TextTables.write]] to get the reference's
  * on-disk layout back (sharded `.txt` + `.det`), readable by the
  * `graft-txt` DataSourceV2 source — the full RandomDB →
  * ConvertTxtToTbl → Scan lifecycle, distributed end to end.
  */
object RandomDb {

  final case class DetColumn(name: String, dtype: DataType, range: Int,
      key: String)
  final case class DetTable(name: String, columns: Seq[DetColumn])

  /** Parse `.det` text: two integer header lines (column count, tuple
    * bytes) then one column per line. */
  def parseDet(tableName: String, det: String): DetTable = {
    val lines = det.linesIterator.map(_.trim).filter(_.nonEmpty).toList
    val colLines = lines.filterNot(_.matches("\\d+"))
    val cols = colLines.map { line =>
      val t = line.split("\\s+")
      require(t.length >= 4, s"bad .det column line: $line")
      val dtype = t(1) match {
        case "INTEGER" => IntegerType
        case "STRING"  => StringType
        case "REAL"    => FloatType
        case other => throw new IllegalArgumentException(
          s"unknown .det type $other in line: $line")
      }
      DetColumn(t(0), dtype, t(2).toInt, t(3))
    }
    require(cols.nonEmpty, s"no columns in .det for $tableName")
    DetTable(tableName, cols)
  }

  def loadDet(tableName: String, path: String): DetTable =
    parseDet(tableName, new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8))

  /** Greatest common divisor, for the PK permutation's coprime step. */
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Seeded multiplier coprime with `range` (any odd range: works;
    * range 1: degenerate single value). */
  private def coprimeMult(range: Int, seed: Long): Long = {
    if (range <= 2) 1L
    else {
      var m = Math.floorMod(seed * 2862933555777941757L + 3037000493L,
        (range - 1).toLong) + 1L
      while (gcd(m, range.toLong) != 1L) m = (m % (range - 1)) + 1L
      m
    }
  }

  private val Alphabet = array(('a' to 'z').map(c => lit(c.toString)): _*)

  /** Generate `numRows` rows of `det` as a DataFrame. Same (table,
    * seed) → identical data, independent of partitioning. */
  def generate(spark: SparkSession, det: DetTable, numRows: Long,
      seed: Long = 42L): DataFrame = {
    val id = col("id")
    def h(c: DetColumn, extra: Column*): Column =
      xxhash64((Seq(lit(seed), lit(det.name), lit(c.name), id) ++
        extra): _*)
    val cols: Seq[Column] = det.columns.map { c =>
      val out = c.dtype match {
        case IntegerType if c.key == "PK" =>
          require(numRows <= c.range,
            s"PK ${det.name}.${c.name}: $numRows rows exceed range ${c.range}")
          val mult = coprimeMult(c.range, seed ^ det.name.hashCode)
          val shift = Math.floorMod(seed + det.name.hashCode * 31L +
            c.name.hashCode, c.range.toLong)
          pmod(lit(shift) + id * lit(mult), lit(c.range.toLong))
            .cast(IntegerType)
        case IntegerType =>
          pmod(h(c), lit(c.range.toLong)).cast(IntegerType)
        case FloatType =>
          // uniform in [0, range): 24 hash bits → [0,1) like nextFloat
          ((pmod(h(c), lit(1L << 24)).cast(DoubleType) / (1L << 24).toDouble)
            * c.range).cast(FloatType)
        case StringType =>
          concat_ws("", transform(sequence(lit(1), lit(c.range)),
            j => element_at(Alphabet,
              (pmod(h(c, j), lit(26L)) + 1).cast(IntegerType))))
        case t => throw new IllegalArgumentException(t.toString)
      }
      out.as(c.name)
    }
    spark.range(numRows).select(cols: _*)
  }

  /** Generate every `.det` in `detDir` for the given (table → rows)
    * map — e.g. the reference's whole testcase schema in one call. */
  def generateAll(spark: SparkSession, detDir: String,
      rows: Map[String, Long], seed: Long = 42L): Map[String, DataFrame] =
    rows.map { case (t, n) =>
      t -> generate(spark, loadDet(t, s"$detDir/$t.det"), n, seed)
    }
}
