package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Streams._

/** Streaming semantics driven through MemoryStream: watermark-finalized
  * windows, session splits, and custom keyed state. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = Timestamp.valueOf("2024-01-01 10:00:00")
  private def at(minutes: Int): Timestamp =
    new Timestamp(T0.getTime + minutes * 60000L)

  private def ev(id: Long, m: Int, user: Long, typ: String, v: Double) =
    Event(id, at(m), user, typ, v, """{"k": 1}""")

  test("hourlyCounts finalizes a window once the watermark passes it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = hourlyCounts(in.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 0, 7, "click", 1.5), ev(2, 30, 7, "view", 2.0),
        ev(3, 10, 8, "click", 0.5))
      q.processAllAvailable()
      // push the watermark (2h) beyond the 10:00-11:00 window end
      in.addData(ev(4, 250, 9, "view", 9.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 2.0), ("view", 1L, 2.0)))
    } finally q.stop()
  }

  test("sessionCounts splits on the >10-minute gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionCounts(in.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 7: events at 0 and 5 min (one session), then 30 min (new one)
      in.addData(ev(1, 0, 7, "click", 1.0), ev(2, 5, 7, "view", 2.0),
        ev(3, 30, 7, "click", 4.0))
      q.processAllAvailable()
      in.addData(ev(4, 120, 9, "view", 0.0)) // advance watermark past both
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .filter($"user_id" === 7)
        .select("n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("fileStream reads the events parquet layout (nanos ts) end to end") {
    val dir = graft.queries.PipelineMiniSpec.dir // events.parquet with long-nanos ts
    val q = sessionCounts(fileStream(spark, s"$dir/events.parquet"))
      .writeStream.format("memory").queryName("file_sessions")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // Append mode only emits watermark-closed sessions; the mini batch
      // ends at t0+25min so nothing finalizes — the check is that the
      // deploy-path schema/conversion COMPLETES without error.
      assert(q.awaitTermination(60000), "AvailableNow run did not terminate")
      assert(q.exception.isEmpty)
      assert(spark.table("file_sessions").columns.contains("session_start"))
    } finally q.stop()
  }

  test("fileStream adapts to the driver's CURRENT events encoding") {
    // reads the real driver file, whatever physical ts type this round's
    // testdata regeneration produced — the streaming twin of the events
    // data contract (EventsContractSpec pins the batch side). The file
    // is staged into a directory because FileStreamSource tails table
    // DIRECTORIES, the deploy layout.
    import java.nio.file.{Files => JF, Paths}
    val dir = JF.createTempDirectory("graft-driver-events")
    JF.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val q = sessionCounts(fileStream(spark, dir.toString))
      .writeStream.format("memory").queryName("driver_file_sessions")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow run did not terminate")
      assert(q.exception.isEmpty)
      assert(spark.table("driver_file_sessions").columns
        .contains("session_start"))
    } finally q.stop()
  }

  test("hourlyAnomalies flags the spike hour, stays quiet on uniform") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = hourlyAnomalies(in.toDS())
      .writeStream.format("memory").queryName("anomalies")
      .outputMode(OutputMode.Append).start()
    try {
      // hours 0..9: two events each (uniform); hour 10: a 20-event spike
      var id = 0L
      def burst(hour: Int, k: Int): Seq[Event] = (0 until k).map { i =>
        id += 1; ev(id, hour * 60 + i, 7, "a", 1.0)
      }
      in.addData((0 to 9).flatMap(burst(_, 2)) ++ burst(10, 20): _*)
      q.processAllAvailable()
      // nothing flagged yet: hours 0..7 closed quiet (dev = 0)
      assert(spark.table("anomalies").count() == 0)
      // advance this type's clock past hour 10's close (lateness 2h)
      in.addData(ev(9999, 800, 7, "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("anomalies").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("c"),
          r.getAs[Long]("n_hours"), r.getAs[Long]("dev2"),
          r.getAs[Long]("nvar")))
      // the spike hour is the single emission: n=11, s=40, ss=440,
      // dev = 11*20-40 = 180, nvar = 11*440-1600 = 3240; 32400 > 29160
      assert(rows.toSet == Set(("a", 20L, 11L, 32400L, 3240L)))
      // a late arrival for a long-closed hour is dropped, not refolded
      in.addData(ev(10000, 0, 7, "a", 1.0))
      q.processAllAvailable()
      assert(spark.table("anomalies").count() == 1)
    } finally q.stop()
  }

  test("skewMonitor: sharded MG bounds contain exact counts; hot key wins") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = skewMonitor(in.toDS(), k = 4, shards = 4)
      .writeStream.format("memory").queryName("skew")
      .outputMode(OutputMode.Update).start()
    try {
      var id = 0L
      def e(user: Long, typ: String): Event = {
        id += 1; ev(id, 0, user, typ, 1.0)
      }
      // a 40-row hot user + 20 singletons spread over 4 shards with
      // only 4 MG counters each: decrement rounds must happen, and the
      // bounds must still bracket the truth
      in.addData(((1 to 40).map(_ => e(7L, "a")) ++
        (100L to 119L).map(u => e(u, "b"))): _*)
      q.processAllAvailable()
      def latest(): Map[(String, Int), (Long, String, Long, Long)] =
        spark.table("skew").collect()
          .map(r => (r.getString(0), r.getInt(1)) ->
            (r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))
          .groupBy(_._1).view
          .mapValues(_.map(_._2).maxBy(_._1)).toMap
      val s1 = latest()
      // merge rule: global n = sum of shard totals (exact); hot = best
      // shard winner by (hot_lb desc, key asc) — exact HERE because the
      // planted winner's lb clears every other shard's ub; in general
      // the emitted bounds make any overlap visible
      def merged(domain: String) = {
        val rows = s1.filter(_._1._1 == domain).values.toSeq
        (rows.map(_._1).sum,
          rows.map(r => (r._2, r._3, r._4)).minBy(t => (-t._2, t._1)))
      }
      val (nUser, (hotUser, lbU, ubU)) = merged("events.user_id")
      assert(nUser == 60L)
      assert(hotUser == "7" && lbU <= 40L && 40L <= ubU && lbU > 1L)
      val (nType, (hotType, lbT, ubT)) = merged("events.event_type")
      assert(nType == 60L)
      assert(hotType == "a" && lbT <= 40L && 40L <= ubT)
      // emit-on-change: another burst for the hot user re-emits its
      // shard with grown bounds; untouched shards stay silent
      val before = spark.table("skew").count()
      in.addData((1 to 5).map(_ => e(7L, "a")): _*)
      q.processAllAvailable()
      assert(spark.table("skew").count() > before)
      val s2 = latest()
      val userRows = s2.filter(_._1._1 == "events.user_id").values.toSeq
      assert(userRows.map(_._1).sum == 65L)
      val (_, hk2, lb2, ub2) = userRows.maxBy(_._3)
      assert(hk2 == "7" && lb2 <= 45L && 45L <= ub2)
    } finally q.stop()
  }

  test("cusumDrift freezes the baseline then alarms on sustained drift") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = cusumDrift(in.toDS())
      .writeStream.format("memory").queryName("cusum")
      .outputMode(OutputMode.Append).start()
    try {
      var id = 0L
      def burst(hour: Int, k: Long): Seq[Event] = (0 until k.toInt).map { i =>
        id += 1; ev(id, hour * 60 + (i % 60), 7, "d", 1.0)
      }
      // the batch p122 fixture: 12 baseline hours alternating 9/11,
      // then 12 drifted hours at 13
      val counts = (0 until 12).map(i => if (i % 2 == 0) 9L else 11L) ++
        Seq.fill(12)(13L)
      in.addData(counts.zipWithIndex
        .flatMap { case (c, h) => burst(h, c) }: _*)
      in.addData(ev(99999, 5000, 7, "d", 1.0)) // close every hour
      q.processAllAvailable()
      val rows = spark.table("cusum").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .sortBy(_._1)
      // phase II = the 12 drifted hours, in order, with the exact
      // batch recurrence (nb = 12 matches the twin's half-split here)
      val nb = 12L
      val base = counts.take(12)
      val (sb, ssb) = (base.sum, base.map(c => c * c).sum)
      var run = 0L
      val want = counts.drop(12).map { c =>
        run = math.max(0L, run + 8L * nb * c - 9L * sb)
        (c, run, if (run * run > 4096L * (nb * ssb - sb * sb)) 1 else 0)
      }
      assert(rows.length == 12)
      assert(rows.map(t => (t._2, t._3, t._4)).toSeq == want)
      assert(rows.map(_._1).distinct.length == 12 &&
        rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
      assert(want.exists(_._3 == 1) && want.exists(_._3 == 0))
    } finally q.stop()
  }

  test("latestPerKey maintains the newest row per key, emit-on-change") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = latestPerKey(in.toDS())
      .writeStream.format("memory").queryName("latest")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(1, 5, 7, "click", 1.0), ev(2, 3, 7, "click", 2.0),
        ev(3, 0, 8, "view", 3.0))
      q.processAllAvailable()
      // an OLDER row for a current key must not re-emit (no new output)
      in.addData(ev(4, 1, 7, "click", 9.0))
      q.processAllAvailable()
      // redelivery of the reigning row is absorbed too
      in.addData(ev(1, 5, 7, "click", 1.0))
      q.processAllAvailable()
      // a genuinely newer row replaces and re-emits
      in.addData(ev(5, 8, 7, "click", 4.0))
      q.processAllAvailable()
      val hist = spark.table("latest")
        .select("user_id", "event_type", "event_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // update-mode memory sink keeps the emission history: the 7/click
      // key emitted exactly twice (id 1 on arrival, id 5 on replace)
      assert(hist.count(t => t._1 == 7L && t._2 == "click") == 2)
      assert(hist.filter(t => t._1 == 7L).map(_._3).toSet == Set(1L, 5L))
      assert(hist.count(t => t._1 == 8L) == 1)
    } finally q.stop()
  }

  test("latestPerKey resolves sub-millisecond updates by true microseconds") {
    implicit val sqlCtx = spark.sqlContext
    // two updates for one key INSIDE the same millisecond: the higher-µs
    // row must reign even though its event_id is LOWER — the p85 batch
    // twin orders by unix_micros(ts), and the r9 getTime*1000 truncation
    // would have fallen back to the event_id tiebreak here (id 21 wins)
    def atMicros(us: Int): Timestamp = {
      val t = new Timestamp(T0.getTime)
      t.setNanos(us * 1000); t
    }
    val in = MemoryStream[Event]
    val q = latestPerKey(in.toDS())
      .writeStream.format("memory").queryName("latest_us")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(Event(21L, atMicros(250), 9L, "click", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(Event(20L, atMicros(750), 9L, "click", 2.0, "{}"))
      q.processAllAvailable()
      val hist = spark.table("latest_us")
        .select("event_id", "ts_us").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(hist.length == 2, "the newer-µs row must re-emit")
      assert(hist.last._1 == 20L, s"µs order lost: $hist")
      // and the state carries full microseconds, not ms*1000
      assert(hist.map(_._2).toSet == Set(T0.getTime * 1000 + 250,
        T0.getTime * 1000 + 750))
    } finally q.stop()
  }

  test("contaminationMatches flags a streamed doc overlapping the eval set") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.queries.Pipeline
    val evalDoc = "a b c d e f g h i j k l m n o p"
    val evalGrams = Pipeline.shingleRowsOf(
        Seq((7L, evalDoc)).toDF("doc_id", "text"), Pipeline.ContamW)
      .select(graft.functions.Portable.h60(col("shingle")).as("g"))
      .distinct()
    val in = MemoryStream[(Long, String)]
    val q = contaminationMatches(
        in.toDF().toDF("doc_id", "text"), evalGrams)
      .writeStream.format("memory").queryName("contam")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        // shares the 8-gram "c d e f g h i j" (and more) with the eval doc
        (100L, "x y c d e f g h i j k z w v u t"),
        // clean: same vocabulary, never 8 aligned tokens
        (101L, "a b c q d e f q g h i q j k l q"),
        // too short for any 8-gram: must be dropped, not crash
        (102L, "a b c"))
      q.processAllAvailable()
      val rows = spark.table("contam").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.map(_._1).toSeq == Seq(100L), s"wrong docs flagged: ${rows.toSeq}")
      val (_, n, c) = rows.head
      assert(n == 9 && c == 2, s"expected 2 of 9 grams contaminated, got $c of $n")
    } finally q.stop()
  }

  test("semanticContamMatches is row-identical to batch p126 on the " +
      "same vectors") {
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Pipeline
    val sf = "/root/testdata/sf0.01"
    // ground truth: the batch op's own output (hash-gated vs DuckDB)
    val batch = Pipeline.queries("p126_semantic_decontam")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(batch.nonEmpty, "fixture must produce semantic flags")
    val em = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val evalVecs = em.filter(_._1 % 29 == 7).toSeq.toDF("eval_id", "evv")
    val train = em.filter(_._1 % 29 != 7).toSeq
    val in = MemoryStream[(Long, Seq[Float])]
    val q = semanticContamMatches(in.toDF().toDF("vec_id", "v"), evalVecs)
      .writeStream.format("memory").queryName("semcontam")
      .outputMode(OutputMode.Append).start()
    try {
      // two deliveries: flags must not depend on batch boundaries
      val (first, rest) = train.splitAt(train.length / 2)
      in.addData(first: _*)
      q.processAllAvailable()
      in.addData(rest: _*)
      q.processAllAvailable()
      val rows = spark.table("semcontam").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      assert(rows.length == rows.distinct.length, "a doc flagged twice")
      assert(rows.toSet == batch,
        "streamed flags must equal the batch op's rows exactly")
    } finally q.stop()
  }

  test("runningProfile refines per-column counts and HLL distincts per batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val in = MemoryStream[(Long, String, String)]
    val q = runningProfile(in.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("profile")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, "alpha", "en"), (2L, "beta", "en"))
      q.processAllAvailable()
      in.addData((3L, "alpha", "fr"))
      q.processAllAvailable()
      // update-mode memory sink keeps emission history; last emission per
      // column carries the refined totals
      val last = spark.table("profile").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, v) => k -> v.last._2 }
      assert(last.keySet == Set("doc_id", "text", "lang"))
      last.values.foreach { case (n, nulls, _) =>
        assert(n == 3L && nulls == 0L)
      }
      // HLL at tiny cardinalities runs linear counting: near-exact
      def est(c: String) = last(c)._3
      assert(math.abs(est("doc_id") - 3.0) < 0.3, s"doc_id ${est("doc_id")}")
      assert(math.abs(est("text") - 2.0) < 0.2, s"text ${est("text")}")
      assert(math.abs(est("lang") - 2.0) < 0.2, s"lang ${est("lang")}")
    } finally q.stop()
  }

  test("stream-stream join pairs clicks with purchases in the window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = clickPurchaseJoin(in.toDF())
      .writeStream.format("memory").queryName("cpjoin")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        ev(1, 0, 7, "click", 0.0),
        ev(2, 5, 7, "purchase", 9.99), // within 10 min of click 1
        ev(3, 30, 7, "purchase", 1.0), // outside the window
        ev(4, 0, 8, "purchase", 5.0))  // different user
      q.processAllAvailable()
      // advance BOTH sides' watermarks: the advancing events must survive
      // each side's event_type filter (a 'view' would be filtered out
      // before the EventTimeWatermark node and advance nothing)
      in.addData(ev(5, 180, 9, "click", 0.0), ev(6, 180, 10, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("cpjoin")
        .select("click_id", "purchase_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSet == Set((1L, 9.99)))
    } finally q.stop()
  }

  test("dedupEvents keeps the first occurrence per event_id") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = dedupEvents(in.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 0, 7, "click", 1.0), ev(1, 0, 7, "click", 1.0),
        ev(2, 1, 7, "view", 2.0))
      q.processAllAvailable()
      in.addData(ev(1, 2, 7, "click", 1.0)) // duplicate across batches
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("file-to-parquet sink resumes exactly-once from its checkpoint") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val root = JFiles.createTempDirectory("graft-stream-sink")
    val (src, out, chk) = (s"$root/src", s"$root/out", s"$root/chk")
    JFiles.createDirectories(Paths.get(src))
    // two arrival batches in the deploy layout (long-nanos ts)
    def drop(name: String, ids: Seq[Long]): Unit = {
      val tmp = s"$root/tmp-$name"
      spark.range(0, 1).sparkSession.createDataFrame(
        ids.map(i => (i, 1700000000000000000L + i, 7L, "click", 1.0,
          """{"k":1}"""))).toDF(
        "event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp)
      val part = Paths.get(tmp).toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      JFiles.move(part, Paths.get(s"$src/$name.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    def runOnce(): Unit = {
      val q = fileStream(spark, src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000))
      assert(q.exception.isEmpty)
    }
    drop("b1", Seq(1L, 2L, 3L))
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
    drop("b2", Seq(4L, 5L))
    runOnce()
    // restart processed ONLY the new file: 5 rows total, no b1 re-ingest
    val back = spark.read.parquet(out)
    assert(back.count() == 5)
    assert(back.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("contaminationHits flags a streamed doc containing an eval gram") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Portable.h60
    val evalDoc = "alpha beta gamma delta epsilon zeta eta"
    val evalGrams = graft.queries.Pipeline.shingleRowsOf(
      Seq((99L, evalDoc)).toDF("doc_id", "text"),
      graft.queries.Pipeline.DecontamW)
      .select(h60($"shingle").as("hv")).distinct()
    val in = MemoryStream[(Long, String)]
    val q = contaminationHits(
      in.toDF().toDF("doc_id", "text"), evalGrams)
      .writeStream.format("memory").queryName("contam")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        // quotes 5 consecutive eval tokens -> one 5-gram hit
        (1L, "intro alpha beta gamma delta epsilon outro"),
        (2L, "completely unrelated clean text with many words here"))
      q.processAllAvailable()
      val hits = spark.table("contam").select("doc_id").collect()
        .map(_.getLong(0)).toSeq
      assert(hits == Seq(1L))
    } finally q.stop()
  }

  test("nearDupMatches flags a streamed near-duplicate of a corpus doc") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "entirely different content about databases and query planning"))
      .toDF("doc_id", "text")
    val sig = graft.queries.Pipeline.minhashSigOf(corpus)
    val index = graft.queries.Pipeline.capBuckets(
      graft.queries.Pipeline.bandRowsOf(sig))
    val in = MemoryStream[(Long, String)]
    val q = nearDupMatches(in.toDF().toDF("doc_id", "text"), index, sig)
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        // word-for-word copy of corpus doc 10 -> identical shingle set
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "totally novel words sharing no three gram with that corpus"))
      q.processAllAvailable()
      val rows = spark.table("neardup").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // the copy matches its original at jaccard exactly 1.0 (the
      // stream-side array sketch is bit-identical to the batch sketch);
      // the novel doc matches nothing
      assert(rows == Set((1L, 10L, 1.0)))
    } finally q.stop()
  }

  test("mirrorCounts accumulates per source pair, emit-on-change") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "entirely different content about databases and query planning"))
      .toDF("doc_id", "text")
    val sources = Seq((10L, "wiki"), (11L, "web")).toDF("doc_id", "source")
    val sig = graft.queries.Pipeline.minhashSigOf(corpus)
    val index = graft.queries.Pipeline.capBuckets(
      graft.queries.Pipeline.bandRowsOf(sig))
    val in = MemoryStream[(Long, String, String)]
    val q = mirrorCounts(in.toDF().toDF("doc_id", "source", "text"),
        index, sig, sources)
      .writeStream.format("memory").queryName("mirror")
      .outputMode(OutputMode.Update).start()
    try {
      // a crawl copy of the wiki doc -> (crawl, wiki) cell at 1
      in.addData((1L, "crawl",
        "the quick brown fox jumps over the lazy dog again and again"))
      q.processAllAvailable()
      val got1 = spark.table("mirror").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got1 == Set(("crawl", "wiki", 1L)))
      // a second crawl copy -> same cell re-emits at 2; a novel doc
      // matches nothing and emits nothing
      in.addData(
        (2L, "crawl",
          "the quick brown fox jumps over the lazy dog again and again"),
        (3L, "crawl", "totally novel words sharing no three gram at all"))
      q.processAllAvailable()
      val latest = spark.table("mirror").collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(latest == Map(("crawl", "wiki") -> 2L))
    } finally q.stop()
  }

  test("bpeTokenizeStream applies the statically learned merges to a doc stream") {
    implicit val sqlCtx = spark.sqlContext
    // corpus: 'the'x3 + 'cat' -> learned merges, in rank order:
    //   r1 (h,e) cnt 3 (ties (t,h) on count, wins the pair tiebreak)
    //   r2 (t,he) cnt 3   r3 (a,t) cnt 1 (ties (c,a), wins tiebreak)
    val corpusWords = Seq(("the", 3L), ("cat", 1L)).toDF("w", "freq")
    val (merges, _) = graft.queries.Pipeline.bpeLearnRounds(corpusWords, 3)
    val in = MemoryStream[(Long, String)]
    val q = bpeTokenizeStream(in.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpetok")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "the cat sat"))
      q.processAllAvailable()
      val rows = spark.table("bpetok").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
          r.getString(4))).toSet
      assert(rows == Set(
        (1L, "the", 3, 1, "the"),   // fully merged by r1+r2
        (1L, "cat", 3, 2, "c at"),  // r3 merges the (a,t) pair
        (1L, "sat", 3, 2, "s at"))) // unseen word, same vocab applies
    } finally q.stop()
  }

  test("topEventsPerType maintains a ranked top-k and emits only on change") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = topEventsPerType(in.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(1, 0, 7, "click", 1.0), ev(2, 1, 7, "click", 5.0),
        ev(3, 2, 8, "click", 3.0), ev(4, 3, 8, "view", 2.0))
      q.processAllAvailable()
      val batch1 = spark.table("topk")
        .filter($"event_type" === "click")
        .select("rnk", "event_id", "value").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch1 == Set((1, 2L, 5.0), (2, 3L, 3.0)))
      val viewRows = spark.table("topk").filter($"event_type" === "view").count()
      // a new arrival displaces rank 2; the untouched "view" key must
      // emit NOTHING for this batch (change-detection contract)
      in.addData(ev(5, 4, 9, "click", 4.0))
      q.processAllAvailable()
      val after = spark.table("topk")
        .filter($"event_type" === "click").collect()
      val last = after.map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value"))).toSet
      assert(last.contains((1, 2L, 5.0)) && last.contains((2, 5L, 4.0)))
      assert(spark.table("topk").filter($"event_type" === "view").count()
        == viewRows)
      // below-threshold arrival: no click emission either
      val clickRows = spark.table("topk").filter($"event_type" === "click").count()
      in.addData(ev(6, 5, 9, "click", 0.5))
      q.processAllAvailable()
      assert(spark.table("topk").filter($"event_type" === "click").count()
        == clickRows)
    } finally q.stop()
  }

  test("weightedReservoir keeps the k best E-S priorities, batch-identically") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val in = MemoryStream[(Long, String)]
    val q = weightedReservoir(in.toDF().toDF("doc_id", "text"), k = 2)
      .writeStream.format("memory").queryName("wres")
      .outputMode(OutputMode.Update).start()
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b"),
      (3L, "a b c d e f g h i j k l m n o p q r s t u v w x"),
      (4L, "one two three four five six seven eight nine ten"))
    // the stream must sample by the BATCH operator's own key — compute
    // the expected priorities with p97's expressions on a batch frame
    val p = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.queries.Pipeline.wsamplePriority(col("doc_id"),
          graft.queries.Pipeline.wsampleWeight(col("text"))).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def expect(ids: Seq[Long]): Seq[(Int, Long)] =
      ids.sortBy(id => (p(id), id)).take(2).zipWithIndex
        .map { case (id, i) => (i + 1, id) }
    try {
      in.addData(docs.take(3): _*)
      q.processAllAvailable()
      val rows1 = spark.table("wres").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      expect(Seq(1L, 2L, 3L)).foreach(e =>
        assert(rows1.contains(e), s"missing $e in $rows1 (p=$p)"))
      // redelivery of a kept doc changes nothing — deterministic coin,
      // duplicate check: no emission at all
      val n1 = spark.table("wres").count()
      val kept = expect(Seq(1L, 2L, 3L)).head._2
      in.addData(docs.find(_._1 == kept).get)
      q.processAllAvailable()
      assert(spark.table("wres").count() == n1, "redelivery re-emitted")
      // a fourth arrival: either it displaces (new reservoir emitted) or
      // it doesn't (still no emission) — both derived from the batch key
      in.addData(docs(3))
      q.processAllAvailable()
      val e2 = expect(Seq(1L, 2L, 3L, 4L))
      if (e2 == expect(Seq(1L, 2L, 3L)))
        assert(spark.table("wres").count() == n1, "non-displacing emitted")
      else {
        val rows2 = spark.table("wres").collect()
          .map(r => (r.getInt(0), r.getLong(1))).toSet
        e2.foreach(e => assert(rows2.contains(e), s"missing $e in $rows2"))
      }
    } finally q.stop()
  }

  test("topEventsPerType ignores an at-least-once redelivery of a kept event") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = topEventsPerType(in.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_redeliver")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(1, 0, 7, "click", 5.0), ev(2, 1, 7, "click", 3.0))
      q.processAllAvailable()
      // redeliver the rank-1 event alongside a genuinely new rank-2
      // arrival: the duplicate must NOT occupy a second slot (which
      // would evict the new distinct member)
      in.addData(ev(1, 0, 7, "click", 5.0), ev(3, 2, 7, "click", 4.0))
      q.processAllAvailable()
      val top = spark.table("topk_redeliver").collect()
        .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("event_id"),
          r.getAs[Double]("value"))).toSet
      assert(top.contains((1, 1L, 5.0)) && top.contains((2, 3L, 4.0)),
        s"redelivery displaced a distinct member: $top")
    } finally q.stop()
  }

  test("annProbeMatches scores streamed probes against the static quantized index") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{broadcast, col}
    import graft.functions.VectorDotLong.vdotl
    val index = graft.queries.Pipeline.quantizedVectors(spark, sf)
    // expected top-3 for a probe that IS an index vector: its quantized
    // codes equal the index row's, so the integer scores are exactly
    // the index-side qv dot products
    def expectedFor(p: Long): Seq[(Int, Long, Long)] = index
      .filter(col("vec_id") === p).select(col("qv").as("qpv"))
      .crossJoin(broadcast(index.select(col("vec_id"), col("qv"))))
      .select(col("vec_id"), vdotl(col("qpv"), col("qv")).as("qsim"))
      .orderBy(col("qsim").desc, col("vec_id").asc).limit(3)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1, r.getLong(0), r.getLong(1)) }.toSeq
    val probeVecs = index.filter(col("vec_id").isin(1L, 2L))
      .select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val in = MemoryStream[(Long, Seq[Float])]
    val q = annProbeMatches(
      in.toDF().toDF("probe_id", "v"), index, k = 3)
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, probeVecs(1L)))
      q.processAllAvailable()
      val got1 = spark.table("ann_stream").collect()
        .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("qsim"))).toSet
      assert(got1 == expectedFor(1L).toSet, s"probe 1 mismatch: $got1")
      // a second probe emits only its own rows; probe 1 stays silent
      val n1 = spark.table("ann_stream").count()
      in.addData((2L, probeVecs(2L)))
      q.processAllAvailable()
      val probe2 = spark.table("ann_stream")
        .filter(col("probe_id") === 2L).collect()
        .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("qsim"))).toSet
      assert(probe2 == expectedFor(2L).toSet, s"probe 2 mismatch: $probe2")
      assert(spark.table("ann_stream").filter(col("probe_id") === 1L).count()
        == n1, "probe 1 re-emitted without change")
      // redelivering probe 1 changes nothing: every candidate is either
      // already on the list or below its tail -> zero new rows
      val nAll = spark.table("ann_stream").count()
      in.addData((1L, probeVecs(1L)))
      q.processAllAvailable()
      assert(spark.table("ann_stream").count() == nAll,
        "redelivered probe produced output")
    } finally q.stop()
  }

  test("cellCensus assigns streamed vectors to the batch codebook cells") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val index = graft.queries.Pipeline.quantizedVectors(spark, sf)
    val centroids = graft.queries.Pipeline.kmeansCentroids(spark, sf)
    val cents = centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // driver-side replay of the batch assignment rule (min d2, min cell)
    val vecs = index.filter(col("vec_id").isin(20L, 21L, 22L))
      .select("vec_id", "qv", "v").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Byte](1).map(_.toLong), r.getSeq[Float](2)))
      .toMap
    def expCell(q: Seq[Long]): Long =
      cents.toSeq.map { case (c, cv) =>
        (q.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, c)
      }.min._2
    val in = MemoryStream[(Long, Seq[Float])]
    val q = cellCensus(in.toDF().toDF("vec_id", "v"), index, centroids)
      .writeStream.format("memory").queryName("cell_census")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((20L, vecs(20L)._2))
      q.processAllAvailable()
      val got1 = spark.table("cell_census").collect()
        .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("n")))
      assert(got1.toSeq == Seq((expCell(vecs(20L)._1), 1L)))
      // a second batch: counts accumulate per cell; only touched cells
      // re-emit
      val before = spark.table("cell_census").count()
      in.addData((21L, vecs(21L)._2), (22L, vecs(22L)._2))
      q.processAllAvailable()
      val expected = Seq(20L, 21L, 22L)
        .map(id => expCell(vecs(id)._1))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val latest = spark.table("cell_census").collect()
        .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("n")))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(latest == expected, s"latest counts $latest vs $expected")
      val emitted = spark.table("cell_census").count() - before
      val touched = Seq(21L, 22L).map(id => expCell(vecs(id)._1)).distinct
      assert(emitted == touched.size.toLong,
        s"$emitted rows emitted for ${touched.size} touched cells")
    } finally q.stop()
  }

  test("runningUserTotals accumulates keyed state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(1, 0, 7, "click", 1.25), ev(2, 1, 7, "view", 2.50))
      q.processAllAvailable()
      in.addData(ev(3, 2, 7, "click", 0.25))
      q.processAllAvailable()
      val latest = spark.table("totals")
        .filter($"user_id" === 7)
        .orderBy($"n_events".desc).head
      assert(latest.getAs[Long]("n_events") == 3L)
      assert(latest.getAs[Double]("sum_value") == 4.0)
    } finally q.stop()
  }

  test("runningUserTotals propagates a non-finite event value raw " +
      "instead of crashing the stateful stream (ADVICE r15: " +
      "BigDecimal.valueOf(Inf) throws)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("totals_nonfinite")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(1, 0, 9, "click", 1.25),
        ev(2, 1, 9, "view", Double.PositiveInfinity))
      q.processAllAvailable() // pre-fix: NumberFormatException here
      in.addData(ev(3, 2, 9, "click", 0.25))
      q.processAllAvailable()
      val latest = spark.table("totals_nonfinite")
        .filter($"user_id" === 9).orderBy($"n_events".desc).head
      assert(latest.getAs[Long]("n_events") == 3L)
      // Spark round()'s pass-through convention: the poisoned total
      // stays Inf (degraded, visible) rather than killing the query
      assert(latest.getAs[Double]("sum_value").isPosInfinity)
    } finally q.stop()
  }

  test("chunkStream chunks a document stream with the batch expressions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = chunkStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunks")
      .outputMode(OutputMode.Append).start()
    try {
      val words = (1 to 40).map(i => s"w$i").mkString(" ")
      in.addData((1L, words), (2L, "short doc"))
      q.processAllAvailable()
      val rows = spark.table("chunks").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("chunk_id"),
          r.getAs[Long]("n_tok")))
      // 40 tokens on a 24 stride -> chunks of 32 (tokens 1-32) and 16
      // (tokens 25-40); 2 tokens -> a single whole-doc chunk
      assert(rows.toSet ==
        Set((1L, 0L, 32L), (1L, 1L, 16L), (2L, 0L, 2L)))
    } finally q.stop()
  }

  test("dedupDocStream emits each content hash once across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = dedupDocStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: B duplicates A within the batch -> min doc_id survives
      in.addData((2L, "aaa"), (1L, "aaa"), (3L, "bbb"))
      q.processAllAvailable()
      // batch 2: another "aaa" is state-suppressed; "ccc" is new
      in.addData((4L, "aaa"), (5L, "ccc"))
      q.processAllAvailable()
      val kept = spark.table("doc_dedup").collect()
        .map(r => r.getAs[Long]("doc_id")).toSet
      assert(kept == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("qualityGate filters a document stream with the batch expressions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = qualityGate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (1L, "the quick brown fox jumps over the lazy dog"), // passes
        (2L, "alpha beta gamma delta epsilon"),              // no stopwords
        (3L, "the end"))                                     // too short
      q.processAllAvailable()
      in.addData((4L, "this is a stream of words with the gate on")) // passes
      q.processAllAvailable()
      val kept = spark.table("curated").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 4L))
    } finally q.stop()
  }
}
