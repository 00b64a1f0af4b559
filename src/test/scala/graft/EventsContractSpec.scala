package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-contract canary for `events.ts`.
  *
  * The driver regenerates testdata between rounds and has already shipped
  * the column under two physical encodings (TIMESTAMP(NANOS) through round
  * 7, `timestamp[us]` NTZ from round 8) — the round-8 gate silently lost 49
  * queries when the code assumed one of them. This spec builds tiny events
  * fixtures in every encoding [[Tables.normalizeTs]] supports and asserts
  * they all normalize to the *identical* microsecond instants as session-UTC
  * TimestampType, so the next regeneration flips a test red instead of
  * darking the gate.
  */
class EventsContractSpec extends SparkSpec {

  // instants kept < 2262-04-11 so the nanos-as-long encoding can't overflow
  private val microInstants = Seq(0L, 1705322096789012L, 4102444800123456L)

  private def writeFixture(dir: java.nio.file.Path)(ts: DataFrame => DataFrame): String = {
    val base = spark.createDataFrame(
      java.util.Arrays.asList(
        microInstants.zipWithIndex.map { case (m, i) =>
          org.apache.spark.sql.Row(i.toLong, m)
        }: _*),
      StructType(Seq(
        StructField("event_id", LongType), StructField("us", LongType))))
    ts(base).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private def normalized(dir: String): (DataType, Seq[(Long, Long)]) = {
    val df = Tables.events(spark, dir)
    (df.schema("ts").dataType,
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  private val expected = microInstants.zipWithIndex.map { case (m, i) => (i.toLong, m) }

  test("every shipped ts encoding normalizes to the same UTC microsecond instants") {
    val tmp = java.nio.file.Files.createTempDirectory("events-contract")

    // rounds ≤7: TIMESTAMP(NANOS), surfaced as a raw long by nanosAsLong —
    // a plain int64 column is scan-indistinguishable from that path; the
    // +999 ns residue checks the ns→µs truncation direction
    val longDir = writeFixture(tmp.resolve("nanos")) { df =>
      df.select(col("event_id"), (col("us") * 1000L + 999L).as("ts"))
    }
    // round 8+: timestamp[us] isAdjustedToUTC=false → TimestampNTZType
    val ntzDir = writeFixture(tmp.resolve("ntz")) { df =>
      df.select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    }
    // a future UTC-adjusted µs generation → TimestampType pass-through
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val tzDir =
      try writeFixture(tmp.resolve("tz")) { df =>
        df.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      }
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }

    for ((label, dir) <- Seq("nanos-as-long" -> longDir, "ntz-micros" -> ntzDir,
                             "utc-micros" -> tzDir)) {
      val (dt, rows) = normalized(dir)
      assert(dt == TimestampType, s"$label: ts must normalize to TimestampType, got $dt")
      assert(rows == expected, s"$label: instants diverged")
    }
  }

  test("the driver's CURRENT events.parquet is an encoding normalizeTs handles") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.where(col("ts").isNotNull).limit(1).count() == 1)
  }

  test("an unrecognized ts encoding fails loudly at construction") {
    val tmp = java.nio.file.Files.createTempDirectory("events-contract-bad")
    val dir = writeFixture(tmp) { df =>
      df.select(col("event_id"), col("us").cast(StringType).as("ts"))
    }
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("normalizeTs"))
  }
}
