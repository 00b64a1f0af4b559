package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, date_format, lit}
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.queries.Pipeline
import graft.streaming.Streams._

/** The batch/streaming CUSUM twin contract, proven row for row: ONE
  * event series is driven through BOTH paths — batch
  * [[Pipeline.cusumDriftOf]] over the p122 hourly groupBy, and
  * streaming [[Streams.cusumDrift]] over a MemoryStream of the same
  * events — and every phase-II (hour, c, cusum8nb, alarm) row must be
  * identical. This is the claim that motivated unifying
  * [[Pipeline.CusumBaselineHours]]: with one declared phase-I window,
  * the two paths ARE the same control chart, not merely similar ones.
  * Two event types with different shapes (one drifting, one healthy)
  * also prove per-key independence of the shared baseline. */
class CusumTwinSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Int): Timestamp =
    new Timestamp(T0.getTime + minutes * 60000L)

  // one declared series per type: 12 baseline hours (the shared
  // CusumBaselineHours window) then 12 phase-II hours — type "d"
  // drifts to 13/hour (CUSUM-loud), type "ok" stays at baseline
  // rates (quiet, and its S keeps resetting toward zero)
  private val driftCounts =
    (0 until 12).map(i => if (i % 2 == 0) 9L else 11L) ++ Seq.fill(12)(13L)
  private val okCounts =
    (0 until 24).map(i => if (i % 2 == 0) 9L else 11L)

  private def events: Seq[Event] = {
    var id = 0L
    def burst(tpe: String, hour: Int, k: Long): Seq[Event] =
      (0 until k.toInt).map { i =>
        id += 1
        Event(id, at(hour * 60 + (i % 60)), 7L, tpe, 1.0, """{"k": 1}""")
      }
    driftCounts.zipWithIndex.flatMap { case (c, h) => burst("d", h, c) } ++
      okCounts.zipWithIndex.flatMap { case (c, h) => burst("ok", h, c) }
  }

  test("batch p122 and streaming cusumDrift emit identical rows for " +
      "one series") {
    assert(Pipeline.CusumBaselineHours == Streams.CusumBaselineHours,
      "the twins must declare ONE phase-I window")

    // batch path: the literal p122 hourly groupBy, then the core
    val evDf = events.toDF()
    val hourly = evDf
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("c"))
    val batchRows = Pipeline.cusumDriftOf(hourly).collect()
      .map(r => (r.getString(0), r.getString(1),
        (r.getLong(2), r.getLong(3), r.getInt(4))))

    // streaming path: same events through MemoryStream, hours closed
    // by one far-future event per type (the per-key watermark)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = cusumDrift(in.toDS())
      .writeStream.format("memory").queryName("cusum_twin")
      .outputMode(OutputMode.Append).start()
    val streamRows =
      try {
        in.addData(events: _*)
        in.addData(Event(999998L, at(5000), 7L, "d", 1.0, "{}"),
          Event(999999L, at(5000), 7L, "ok", 1.0, "{}"))
        q.processAllAvailable()
        spark.table("cusum_twin")
          .select(col("event_type"),
            date_format(org.apache.spark.sql.functions
              .expr("timestamp_millis(hour_start_ms)"),
              "yyyy-MM-dd HH").as("hour"),
            col("c"), col("cusum8nb"), col("alarm"))
          .collect()
          .map(r => (r.getString(0), r.getString(1),
            (r.getLong(2), r.getLong(3), r.getInt(4))))
      } finally q.stop()

    // row-for-row: same keys, same (c, cusum8nb, alarm) at every hour
    assert(batchRows.nonEmpty && streamRows.nonEmpty)
    val batchMap = batchRows.map(r => ((r._1, r._2), r._3)).toMap
    val streamMap = streamRows.map(r => ((r._1, r._2), r._3)).toMap
    assert(batchMap.size == batchRows.length &&
      streamMap.size == streamRows.length)
    assert(streamMap == batchMap)
    // both types produced phase-II rows; only the drifting one alarms
    val byType = batchRows.groupBy(_._1)
    assert(byType("d").exists(_._3._3 == 1))
    assert(byType("ok").forall(_._3._3 == 0))
  }
}
