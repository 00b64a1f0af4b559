package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Exact._
import graft.Stage.StageOps
import graft.Tables
import graft.functions.Portable._
import graft.functions.VectorDot.vdot
import graft.functions.VectorDotLong.vdotl

/** Event analytics and monitoring: JSON props, sessionization, as-of /
  * range / interval joins, funnels, CDC upserts + tombstones,
  * referential integrity, 3-sigma hourly anomalies, CUSUM drift +
  * changepoint, PSI source drift, and the shuffle-skew audit.
  *
  * Implementation module of [[Pipeline]] (mixed into the one public
  * object; members are package-private to graft.queries). Split from
  * the former monolith in round 12 with zero behavior change. */
trait PipelineEvents extends PipelineMultimodal {


  // ---- event analytics (JSON props, time windows, sessions) --------------

  /** Typed extraction from a JSON props column + per-type aggregates.
    * `get_json_object` is a codegen'd expression; the aggregate is one
    * keyed shuffle on a low-cardinality key with map-side combine. */
  private[queries] def p09EventsProps: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        dsum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))


  /** Tumbling 1-hour event-time windows (batch analogue of the streaming
    * windowed aggregation): truncate-then-group is one keyed shuffle and
    * AQE-coalescible; the hour is emitted as a string so both engines
    * agree on type and format. */
  private[queries] def p10EventsHourly: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))


  /** Sessionization: per user, a new session starts after a >10-minute
    * gap. lag + running sum over a (user_id, ts) window — one shuffle
    * keyed on user_id, each partition processed independently, which is
    * exactly how it scales to 10^9 users. Timestamps are compared and
    * emitted in exact epoch microseconds. */
  private[queries] def p11EventsSessions: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 600000000L, 1).otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(w))
      .groupBy("user_id", "sess")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
  }


  /** As-of join: each click matched to the latest prior-or-equal purchase
    * of the same user. Spark has no ASOF JOIN operator; the scalable
    * composition is a tagged union + ignore-nulls running `last` over a
    * (user, time)-ordered window — ONE shuffle on user_id and a linear
    * state-free pass per partition, instead of the range-join's
    * candidate-interval explosion. DuckDB's native ASOF LEFT JOIN is the
    * oracle. */
  private[queries] def p15AsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
    // purchases keep their event_id so the window order below is TOTAL —
    // two purchases in the same microsecond would otherwise tie and make
    // last(p) pick a shuffle-dependent winner.
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"), col("event_id"),
        struct(col("ts_us").as("p_ts_us"), col("value").as("p_value")).as("p"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(1).as("tag"), col("event_id"),
        lit(null).cast("struct<p_ts_us:bigint,p_value:double>").as("p"))
    // purchase sorts before click at equal ts (tag 0 < 1) → "prior or equal"
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("lastp", last(col("p"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("lastp.p_ts_us").as("p_ts_us"), col("lastp.p_value").as("p_value"))
  }


  /** Range join: for each purchase, count the same user's events inside
    * the following 10 minutes. Planned as an equi-join on user_id with
    * the time range as a post-filter — candidates are bounded per user
    * key, so this shuffles each side once and never builds the
    * interval-overlap cross product a naive range join would. */
  private[queries] def p16RangeJoin: Q = (s, d) => {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts_us").as("p_ts"))
    purchases
      .join(ev.select(col("user_id"), col("ts_us")), "user_id")
      .filter(col("ts_us") >= col("p_ts") &&
        col("ts_us") <= col("p_ts") + lit(600000000L))
      .groupBy("p_event_id")
      .agg(count(lit(1)).as("n_follow"))
  }


  /** Conversion funnel: of users whose first click exists, how many made
    * a purchase within 30 minutes of it. Two keyed shuffles on user_id
    * (first-click agg, then purchase match) and a single global roll-up
    * row — per-user work is independent, so the shape holds at any user
    * count. */
  private[queries] def p26Funnel: Q = (s, d) => {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min(col("ts_us")).as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"))
    firstClick.join(purchases, Seq("user_id"), "left_outer")
      .withColumn("hit",
        when(col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + lit(1800000000L), 1).otherwise(0))
      .groupBy("user_id").agg(max(col("hit")).as("converted"))
      .agg(
        count(lit(1)).as("n_clickers"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast(DoubleType) / col("n_clickers"), 4))
  }


  /** Cohort retention matrix: users grouped by first-active day, then
    * distinct active users counted per (cohort, day-offset) — the
    * product-analytics standard. Every stage is a keyed
    * map-side-combinable aggregation: (user, day) dedup, per-user min,
    * a user-keyed join, then the cohort-cell count-distinct (two-phase,
    * so no cell funnels all users through one reducer). */
  private[queries] def p34RetentionCohorts: Q = (s, d) => {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = days.groupBy("user_id").agg(min(col("day")).as("cohort"))
    days.join(cohorts, "user_id")
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).cast(LongType).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }


  private[queries] val IntervalW = 600000000L // 10 min, microseconds


  /** Interval-overlap join WITHOUT an equi key — the general range join
    * that p16 cannot express (p16 rides the user_id equi key). Every
    * purchase opens a [ts, ts+10min] window; the query counts ALL events
    * from ANY user inside each window. Binning turns it into a keyed
    * equi-join: both sides map to coarse buckets the width of the
    * interval — a point lands in exactly one bucket, an interval in at
    * most two — so candidate pairs exist only bucket-locally and the
    * exact containment filter runs on candidates, never on
    * |intervals|×|events|. Bucket arithmetic is integer `div` (no float
    * division near bucket boundaries), the shuffle key is the bucket, and
    * a skewed bucket salts like any keyed join. This is how Spark's own
    * range-join hints bin under the hood — expressed here with public
    * operators only. */
  private[queries] def p50IntervalJoinBinned: Q = (s, d) => {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("ts_us").as("lo"),
        (col("ts_us") + IntervalW).as("hi"))
      .withColumn("bucket", explode(sequence(
        expr(s"lo div $IntervalW"), expr(s"hi div $IntervalW"))))
    val pts = ev.select(col("ts_us"),
      expr(s"ts_us div $IntervalW").as("bucket"))
    iv.join(pts, "bucket")
      .filter(col("ts_us") >= col("lo") && col("ts_us") <= col("hi"))
      .groupBy("p_event_id")
      .agg(count(lit(1)).as("n_overlap"))
  }


  /** Distribution-drift monitor: population stability index of each
    * source's doc-length distribution against the rest of the corpus over
    * fixed 100-char bins — the standing data-quality alarm a continuously
    * ingested corpus needs (PSI > 0.2 is the classic "investigate" line),
    * here in log2 bits via `qlog2` rather than libm nats so the score is
    * engine-deterministic. With 0.5-per-bin Laplace smoothing, p and q are
    * exact integer ratios — p = (2c+1)/(2T+B), q = (2(gc−c)+1)/(2(N−T)+B)
    * — so log2(p/q) is a qlog2 DELTA of two integer products, and each
    * bin's term is built from single correctly-rounded IEEE ops; the
    * per-source sum runs as a bin-SORTED fold (p67's rule: never an
    * unordered float SUM), making the output bit-identical to the oracle.
    * Scale shape: one (source, bin)-keyed count shuffle over the corpus,
    * then everything is bounded by sources×bins rows (the broadcast bin
    * grid densifies absent bins); no window, no pairwise work. At corpus
    * scale the bin counts would be pre-scaled to proportions (PSI is
    * scale-invariant) to keep the qlog2 products inside a long. */
  private[graft] val PsiMaxBin = 5

  /** ONE declared phase-I/window sizing shared by batch p124 and its
    * streaming twin ([[graft.streaming.Streams.psiDrift]] takes them
    * as defaults), the [[CusumBaselineHours]] rule applied to the PSI
    * family: per source, the first [[PsiBaselineDocs]] docs (by doc_id
    * — the stream's arrival order) freeze the baseline histogram, and
    * every [[PsiWindowDocs]] docs thereafter close a scored window.
    * Sized so the gate corpus (25 docs per source at sf0.01) yields
    * two full windows per source; a production deploy would raise
    * both with its traffic, exactly like a CUSUM phase-I width. */
  private[graft] val PsiBaselineDocs = 12L
  private[graft] val PsiWindowDocs = 6L

  /** Range width for p124's two-level per-source rank — the p28
    * `RangeDocs` rule (declared there, above this trait in the mixin
    * chain, hence re-stated): ranges only bound the window fan-in,
    * never the result. */
  private[graft] val PsiRangeDocs = 100L

  /** Batch PSI baseline drift — p81's sibling in the OTHER standard
    * PSI contract: p81 contrasts each source against the rest of the
    * same snapshot; p124 contrasts each source's later windows against
    * its own FROZEN phase-I baseline (the deployment form — drift
    * relative to what this source looked like when monitoring began,
    * exactly [[graft.streaming.Streams.psiDrift]]'s semantics, proven
    * row for row by PsiTwinSpec). Same add-½ smoothing and the same
    * integer-exact qlog2 fixed-point log2 as p81, so the DuckDB twin
    * is bit-exact; `level` applies the standard PSI bands on the
    * ROUNDED psi (0 < 0.1 ≤ 1 < 0.25 ≤ 2). Sources too small to
    * finish phase I plus one full window emit nothing (the streaming
    * twin's silence); only COMPLETE windows score.
    *
    * Scale shape: one narrow (source, bin) projection, a TWO-LEVEL
    * per-source rank (the p105/p28 distributed prefix-sum shape:
    * doc_ids bucket into [[PsiRangeDocs]]-wide ranges, per-(source,
    * range) counts cumulate in a broadcast offsets table, and each
    * doc ranks only within its own range — so no source ever
    * concentrates in one task, the skew shape p115 flags and the
    * pre-round-13 per-source global window had), two keyed count
    * aggregations over bounded (source × window × 6-bin) frames, and
    * a bin-ordered fold per window — no corpus-sized state, no
    * cross-source work. At 100 TB the deployment path is still the
    * STREAMING twin (no rank at all, state per source is two
    * histograms); batch p124 is the at-rest audit/backfill twin,
    * now safe to run over a giant source as-is. */
  private[queries] def p124PsiBaselineDrift: Q = (s, d) =>
    psiBaselineDriftOf(Tables.documents(s, d))

  private[graft] def psiBaselineDriftOf(docs: DataFrame,
      baselineDocs: Long = PsiBaselineDocs,
      windowDocs: Long = PsiWindowDocs): DataFrame = {
    val binsB = PsiMaxBin + 1
    val s = docs.sparkSession
    // two-level per-source rank (p105/p28 shape): doc_ids bucket into
    // PsiRangeDocs-wide ranges; the per-(source, range) counts cumulate
    // through an ordered window over the RANGE table only (corpus/100
    // rows, broadcast back); each doc then ranks within its own range.
    // idx is identical to a per-source global row_number in doc_id
    // order — the offsets are exact — without any single task ever
    // holding a whole source.
    val binned = docs.select(col("source"), col("doc_id"),
        least(lit(PsiMaxBin.toLong), expr("n_chars div 100")).as("bin"))
      .withColumn("rng", expr(s"doc_id div $PsiRangeDocs"))
    val offsets = binned.groupBy("source", "rng")
      .agg(count(lit(1)).as("rn"))
      .withColumn("off", coalesce(
        sum(col("rn")).over(Window.partitionBy("source").orderBy("rng")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "rng", "off")
    val ranked = binned.join(broadcast(offsets), Seq("source", "rng"))
      .withColumn("idx", col("off") +
        row_number().over(Window.partitionBy("source", "rng")
          .orderBy("doc_id")))
      .staged // read by the baseline and the window aggregations
    val baseCnt = ranked.filter(col("idx") <= baselineDocs)
      .groupBy("source", "bin").agg(count(lit(1)).as("bc"))
    val winRows = ranked.filter(col("idx") > baselineDocs)
      .withColumn("window_idx",
        expr(s"(idx - ${baselineDocs + 1}) div $windowDocs"))
    val complete = winRows.groupBy("source", "window_idx")
      .agg(count(lit(1)).as("nw"))
      .filter(col("nw") === windowDocs)
      .select("source", "window_idx")
    val winCnt = winRows.groupBy("source", "window_idx", "bin")
      .agg(count(lit(1)).as("wc"))
    // densify both histograms over the full bin grid (absent bins
    // carry the smoothing mass alone)
    val grid = complete.crossJoin(
      broadcast(s.range(0, binsB).toDF("bin")))
    val f = grid
      .join(winCnt, Seq("source", "window_idx", "bin"), "left_outer")
      .join(baseCnt, Seq("source", "bin"), "left_outer")
      .select(col("source"), col("window_idx"), col("bin"),
        (lit(2L) * coalesce(col("wc"), lit(0L)) + lit(1L)).as("pn"),
        lit(2L * windowDocs + binsB).as("pd"),
        (lit(2L) * coalesce(col("bc"), lit(0L)) + lit(1L)).as("qn"),
        lit(2L * baselineDocs + binsB).as("qd"))
    val dq = (qlog2(col("pn") * col("qd")) - qlog2(col("qn") * col("pd")))
      .cast(DoubleType)
    val term = (col("pn").cast(DoubleType) / col("pd").cast(DoubleType)
      - col("qn").cast(DoubleType) / col("qd").cast(DoubleType)) *
      dq / lit(65536.0)
    val psi = f.select(col("source"), col("window_idx"),
        col("bin"), term.as("term"))
      .groupBy("source", "window_idx")
      .agg(round(aggregate(
        array_sort(collect_list(struct(col("bin"), col("term")))),
        lit(0.0), (acc, x) => acc + x.getField("term")), 6).as("psi"))
    psi.select(col("source"), col("window_idx"), col("psi"),
      when(col("psi") >= 0.25, 2).when(col("psi") >= 0.1, 1)
        .otherwise(0).cast(IntegerType).as("level"))
  }

  private[queries] def p81SourceDriftPsi: Q = (s, d) => {
    val binsB = PsiMaxBin + 1 // number of bins = total smoothing mass ×2
    val binned = Tables.documents(s, d)
      .select(col("source"),
        least(lit(PsiMaxBin.toLong), expr("n_chars div 100")).as("bin"))
    val counts = binned.groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val grid = binned.select("source").distinct()
      .crossJoin(broadcast(s.range(0, PsiMaxBin + 1).toDF("bin")))
    // densified (source, bin, c) is read by three aggregations below —
    // stage it once instead of re-running the scan+groupBy per consumer
    val f = grid.join(counts, Seq("source", "bin"), "left_outer")
      .select(col("source"), col("bin"), coalesce(col("c"), lit(0L)).as("c"))
      .staged
    val tot = f.groupBy("source").agg(sum("c").as("t"))
    val gl  = f.groupBy("bin").agg(sum("c").as("gc"))
    val n   = f.agg(sum("c").as("n"))
    val pn = lit(2L) * col("c") + lit(1L)
    val pd = lit(2L) * col("t") + lit(binsB.toLong)
    val qn = lit(2L) * (col("gc") - col("c")) + lit(1L)
    val qd = lit(2L) * (col("n") - col("t")) + lit(binsB.toLong)
    val dq = (qlog2(pn * qd) - qlog2(qn * pd)).cast(DoubleType)
    val term = (pn.cast(DoubleType) / pd.cast(DoubleType)
      - qn.cast(DoubleType) / qd.cast(DoubleType)) * dq / lit(65536.0)
    f.join(tot, "source").join(gl, "bin").crossJoin(broadcast(n))
      .select(col("source"), col("bin"), term.as("term"))
      .groupBy("source")
      .agg(round(aggregate(
          array_sort(collect_list(struct(col("bin"), col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")), 6).as("psi"))
  }


  /** Event-volume anomaly detection: flags the (event_type, hour) cells
    * whose count deviates more than 3σ from that type's own hourly mean —
    * the standing alarm over an ingestion feed. The z² test is cleared of
    * floats entirely: z² > 9 ⟺ (n·c − s)² > 9(n·ss − s²) with s = Σc,
    * ss = Σc² per type, so the gate is exact 64-bit integer arithmetic
    * (at production volumes the counts would be pre-scaled or the test
    * run in doubles; the integer form is what makes the oracle exact).
    * Shape: one (type, hour)-keyed count shuffle over the feed, a
    * per-type aggregate bounded by |types| rows, and a broadcast join
    * back — no window, no sort. */
  private[queries] def p84HourlyAnomaly: Q = (s, d) =>
    p84Gate(Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("c")))


  /** The 3σ gate over an (event_type, hour, c) counts frame — split from
    * the scan so the int64-envelope guard is testable with synthetic
    * counts no real fixture could reach. */
  private[graft] def p84Gate(hourly: DataFrame): DataFrame = {
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("n_hours"), sum(col("c")).as("s"),
      sum(col("c") * col("c")).as("ss"), max(col("c")).as("max_c"))
    val dev = col("n_hours") * col("c") - col("s")
    // int64 safety envelope, enforced loudly: with M = max hourly count
    // and n hours, every product the gate forms is bounded by (n·M)² and
    // 9(n·M)², so n·M < 1e9 keeps all of them under Long.Max — a feed
    // beyond it must fail the job (pre-scale the counts), never silently
    // wrap and flip the 3σ verdict. assert_true returns NULL on pass, so
    // the filter keeps every row and cannot be pruned out of the plan.
    hourly.join(broadcast(stats), "event_type")
      .filter(assert_true(col("n_hours") * col("max_c") < lit(1000000000L),
        concat(lit("p84: hourly counts exceed the exact-int64 z² envelope" +
          " (n_hours*max_c >= 1e9) for event_type "), col("event_type")))
        .isNull)
      .filter(col("n_hours") >= 2 &&
        dev * dev > lit(9L) * (col("n_hours") * col("ss") - col("s") * col("s")))
      .select(col("event_type"), col("hour"), col("c"), col("n_hours"),
        (dev * dev).as("dev2"),
        (col("n_hours") * col("ss") - col("s") * col("s")).as("nvar"))
  }


  /** CUSUM drift monitor — the slow-change complement to p84's 3σ
    * spike gate (Page 1954; the control-charts pairing every
    * monitoring text prescribes): a one-sided upper CUSUM over each
    * event type's hourly count series detects a SUSTAINED upward
    * shift that no single hour's z-score would flag. Control-chart
    * discipline: the baseline μ₀/σ₀ come from each type's FIRST-HALF
    * hours (phase I — a drifted tail must never inflate its own
    * baseline, the self-masking failure of a full-series mean) and
    * the CUSUM runs over the second half with reference k = μ₀/8
    * (detects sustained shifts ≥ μ₀/4), alarm at 8σ₀ of cumulated
    * deviation. House integer-exact form: in 8nb-scaled units
    * S_t = max(0, S_{t−1} + 8nb·c_t − 9sb) is an exact int64
    * recurrence and the alarm squares to S² > 4096(nb·ssb − sb²) —
    * one integer compare. Int64 envelope asserts (every hour count
    * < 2.5e8 for exact steps, every S < 2e9 so S² cannot wrap) fail
    * loudly instead of wrapping, p84's rule.
    *
    * Scale shape: one (type, hour) counting shuffle (p84's), then the
    * sequential recurrence runs INSIDE a per-type `aggregate` HOF
    * over that type's collected hour array — hours per type are
    * time-bounded (a year is 8,760 entries), so the fold state is a
    * bounded array, never corpus-sized, and types process in
    * parallel. The oracle computes the identical recurrence as a
    * recursive CTE. */
  private[queries] def p122CusumDrift: Q = (s, d) =>
    cusumDriftOf(Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("c")))


  /** Closed hours a type's baseline freezes after — ONE declared
    * phase-I window shared by this batch op and its streaming twin
    * ([[graft.streaming.Streams.cusumDrift]] takes it as its default),
    * so the two are literally the same control chart: CusumTwinSpec
    * drives one series through both paths and asserts identical
    * (c, cusum8nb, alarm) rows. A fixed window (not the series
    * midpoint) is the control-chart deployment form — a stream cannot
    * know its own midpoint. */
  val CusumBaselineHours = 12L


  /** The p122 core over any (event_type, hour, c) frame —
    * Round10dOpsSpec drives a drifting synthetic series through it
    * (every hour 3σ-quiet, the CUSUM loud) and replays the
    * recurrence driver-side. Phase I/II split: baseline moments
    * (nb, sb, ssb) come from each type's FIRST [[CusumBaselineHours]]
    * hours (phase I, frozen — a drifted tail must not inflate its own
    * baseline) and the CUSUM runs over every later hour:
    * S_t = max(0, S_{t−1} + 8nb·c_t − 9sb)
    * (the k = μ₀/8 reference in 8nb-scaled exact integers), alarm
    * when S_t > 8σ₀, squared to S² > 4096(nb·ssb − sb²). Types with
    * no hours beyond the baseline window emit nothing — exactly the
    * streaming twin's phase-I silence. */
  private[graft] def cusumDriftOf(hourly: DataFrame,
      baselineHours: Long = CusumBaselineHours): DataFrame =
    hourly.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("hour"), col("c"))))
        .as("hs"))
      .filter(size(col("hs")) > baselineHours)
      .withColumn("nb", lit(baselineHours))
      .withColumn("sb", expr(
        "aggregate(slice(hs, 1, CAST(nb AS INT)), CAST(0 AS BIGINT)," +
          " (a, x) -> a + x.c)"))
      .withColumn("ssb", expr(
        "aggregate(slice(hs, 1, CAST(nb AS INT)), CAST(0 AS BIGINT)," +
          " (a, x) -> a + x.c * x.c)"))
      .withColumn("cmax", expr(
        "aggregate(hs, CAST(0 AS BIGINT), (a, x) -> greatest(a, x.c))"))
      // int64 envelope, loud — the streaming twin's exact guards
      // (graft.streaming.Streams.cusumDrift), re-derived from the
      // quantities the alarm actually squares rather than a cumulative
      // total that grows forever on healthy feeds: (1) every hour
      // count < 2.5e8 keeps each recurrence step's products exact;
      // (2) every emitted S < 2e9 (checked after the explode, below)
      // keeps S² < 4e18 < 2^63 in the alarm compare. Feeds beyond
      // either must pre-scale.
      .filter(assert_true(
        col("cmax") < lit(250000000L),
        concat(lit("p122: hour count exceeds the exact-int64 CUSUM" +
          " envelope (c >= 2.5e8) for event_type "), col("event_type")))
        .isNull)
      // threshold-side exactness: the alarm compares S^2 (< 4e18 under
      // the envelope above) against 4096*(nb*ssb - sb^2); nb*ssb < 2^50
      // keeps that product under 2^62 so the compare is exact int64 on
      // both sides even for baselines with extreme hourly mass (the
      // 4*n*s envelope alone does not bound it)
      .filter(assert_true(
        col("nb") * col("ssb") < lit(1L << 50),
        concat(lit("p122: baseline moments exceed the exact-int64 alarm" +
          " envelope (nb*ssb >= 2^50) for event_type "), col("event_type")))
        .isNull)
      .select(col("event_type"), col("nb"), col("sb"), col("ssb"),
        explode(expr(
          """aggregate(
            |  slice(hs, CAST(nb AS INT) + 1, size(hs) - CAST(nb AS INT)),
            |  named_struct(
            |    'run', CAST(0 AS BIGINT),
            |    'out', CAST(array() AS
            |      array<struct<hour:string,c:bigint,cusum:bigint>>)),
            |  (acc, x) -> named_struct(
            |    'run', greatest(CAST(0 AS BIGINT),
            |      acc.run + 8 * nb * x.c - 9 * sb),
            |    'out', concat(acc.out, array(named_struct(
            |      'hour', x.hour, 'c', CAST(x.c AS BIGINT),
            |      'cusum', greatest(CAST(0 AS BIGINT),
            |        acc.run + 8 * nb * x.c - 9 * sb))))),
            |  acc -> acc.out)""".stripMargin)).as("r"))
      // streaming-twin S guard: each emitted cusum IS the post-update
      // run, so asserting every row < 2e9 is exactly the per-step
      // check in Streams.cusumDrift. The first violating step is
      // computed exactly (prior S < 2e9, |step| ≤ 9·nb·2.5e8 under
      // cmax), so it cannot wrap before this catches it.
      .filter(assert_true(
        col("r.cusum") < lit(2000000000L),
        concat(lit("p122: CUSUM statistic exceeds the exact-int64 alarm" +
          " envelope (S >= 2e9) for event_type "), col("event_type")))
        .isNull)
      .select(col("event_type"), col("r.hour").as("hour"),
        col("r.c").as("c"), col("r.cusum").as("cusum8nb"),
        when(col("r.cusum") * col("r.cusum") >
          lit(4096L) * (col("nb") * col("ssb") - col("sb") * col("sb")), 1)
          .otherwise(0).cast(IntegerType).as("alarm"))


  /** Drift changepoint estimator — the CUSUM companion report: for
    * each event type whose p122 CUSUM alarms, WHEN did the shift
    * begin? The standard CUSUM changepoint MLE is the hour after the
    * statistic's LAST ZERO before the first alarm (the last reset —
    * everything since has accumulated into the alarm), plus the
    * detection delay in hours. This is the row an on-call pages on:
    * p122 says "drifting", p123 says "since 14:00, detected in 5
    * hours". Types that never alarm emit nothing.
    *
    * Scale shape: runs entirely over p122's phase-II output (types ×
    * bounded hours), per-type windows and keyed self-joins on that
    * bounded frame — the corpus-sized work is p122's one counting
    * shuffle, already paid. */
  private[queries] def p123DriftChangepoint: Q = (s, d) =>
    driftChangepointOf(cusumDriftOf(Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("c"))))


  /** The p123 core over any p122-shaped (event_type, hour, c,
    * cusum8nb, alarm) frame — Round10dOpsSpec replays it on the
    * drift fixture where the changepoint is known by construction. */
  private[queries] def driftChangepointOf(cu: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour")
    val rnk = cu.withColumn("rn", row_number().over(w)).staged
    val fa = rnk.filter(col("alarm") === 1)
      .groupBy("event_type").agg(min(col("rn")).as("arn"))
    val lz = rnk.join(fa, "event_type")
      .filter(col("cusum8nb") === 0L && col("rn") < col("arn"))
      .groupBy("event_type").agg(max(col("rn")).as("zrn"))
    val cp = fa.join(lz, Seq("event_type"), "left_outer")
      .select(col("event_type"), col("arn"),
        coalesce(col("zrn") + 1, lit(1)).as("crn"))
    cp.join(rnk.select(col("event_type"), col("rn"),
        col("hour").as("first_alarm_hour")),
        col("rn") === col("arn") && rnk("event_type") === cp("event_type"))
      .drop(rnk("event_type")).drop("rn")
      .join(rnk.select(col("event_type").as("et2"), col("rn"),
        col("hour").as("changepoint_hour")),
        col("rn") === col("crn") && col("et2") === col("event_type"))
      .select(col("event_type"), col("first_alarm_hour"),
        col("changepoint_hour"),
        (col("arn") - col("crn") + 1L).cast(LongType)
          .as("hours_to_detect"))
  }


  /** CDC keep-latest compaction (the read side of an upsert/merge): the
    * events feed is split into a snapshot and a change batch (event_id
    * mod 10 = 9, tagged `from_batch`), and each (user_id, event_type)
    * key resolves to its single latest row by (ts, event_id) — the
    * merge-on-read compaction every changelog-backed table needs. Runs
    * through the native bounded-heap top-k operator with k=1, so each
    * task retains at most one row per key it sees and the shuffle
    * carries ≤ tasks×keys rows instead of the full feed — a window
    * row_number would sort-shuffle every event. Key-count overflow
    * degrades to the operator's spillable-sort fallback, never OOM. */
  private[queries] def p85UpsertLatest: Q = (s, d) => {
    val u = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"),
        when(pmod(col("event_id"), lit(10L)) === 9, 1).otherwise(0)
          .as("from_batch"))
    graft.plans.TopKPerKey.topK(u, Seq("user_id", "event_type"),
      Seq(("ts_us", false), ("event_id", false)), 1)
  }


  /** Referential-integrity audit between the document corpus and its
    * embedding index — the reconciliation check a multi-table pipeline
    * runs after every incremental build (every doc embedded? every
    * vector backed by a live doc?). Drift is simulated by hash slices
    * (the p36/p63 pattern): embedding shards `vec_id % 10 = 3` are
    * "lost", documents `doc_id % 13 = 5` are "not yet ingested". Each
    * direction is one keyed LEFT ANTI join — at scale a shuffle join on
    * the id (or a broadcast when one side is small, which AQE decides) —
    * followed by a single-row summary aggregate, so the audit output is
    * category rows, never a data copy. */
  private[queries] def p87RefIntegrity: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(13L)) =!= 5)
    val vecs = Tables.embeddings(s, d).select(col("vec_id"))
      .filter(pmod(col("vec_id"), lit(10L)) =!= 3)
    def summarize(ids: DataFrame, idCol: String, category: String) =
      ids.agg(count(lit(1)).as("n_orphans"),
          min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
        .select(lit(category).as("category"), col("n_orphans"),
          col("min_id"), col("max_id"))
    summarize(docs.join(vecs, col("doc_id") === col("vec_id"), "left_anti"),
        "doc_id", "doc_without_vec")
      .unionAll(summarize(
        vecs.join(docs, col("vec_id") === col("doc_id"), "left_anti"),
        "vec_id", "vec_without_doc"))
  }


  /** Tombstone-aware CDC compaction — p85 completed with DELETE
    * semantics: change rows whose event_id ≡ 0 (mod 17) are tombstones,
    * and a key whose LATEST row is a tombstone disappears from the
    * compacted view entirely (the delete half of merge-on-read; a stale
    * tombstone under a newer upsert is ignored like any superseded row).
    * Same native bounded-heap top-1 per key as p85 — the tombstone
    * filter is applied AFTER the latest-row resolution, a codegen'd map
    * over ≤ keys rows, so deletes add zero shuffle. */
  private[queries] def p91UpsertTombstones: Q = (s, d) => {
    val u = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"),
        when(pmod(col("event_id"), lit(17L)) === 0, 1).otherwise(0)
          .as("is_delete"))
    graft.plans.TopKPerKey.topK(u, Seq("user_id", "event_type"),
        Seq(("ts_us", false), ("event_id", false)), 1)
      .filter(col("is_delete") === 0)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts_us"), col("value"))
  }


  /** The shuffle-key domains [[p115SkewAudit]] profiles — (table,
    * column) pairs the engine's own heavy operators shuffle on (p11/
    * p15/p54 key on events.user_id, p84 on event_type, q30/q32 on
    * l_orderkey and o_custkey, p30/p46/p79 on documents.source/lang).
    * Shared verbatim with the oracle builder. */
  private[graft] val SkewDomains: Seq[(String, String)] = Seq(
    "events" -> "user_id",
    "events" -> "event_type",
    "lineitem" -> "l_orderkey",
    "orders" -> "o_custkey",
    "documents" -> "source",
    "documents" -> "lang")


  /** Shuffle-skew audit — the pre-flight instrument for every keyed
    * shuffle the engine runs: per declared key domain
    * ([[SkewDomains]]), total rows, distinct keys, the hottest key and
    * its row count, and the skew factor max/avg — the number that
    * decides whether a 1000-executor job needs salting or AQE
    * skew-splitting BEFORE it runs (a skew factor of k means the
    * hottest reducer does k× the average work; Spark's own
    * skewedPartitionFactor trips at 5). Hot key reported as the
    * minimum key among ties so both engines agree.
    *
    * Scale shape: per domain one keyed counting shuffle (map-side
    * combined, carries one row per DISTINCT key) feeding a 1-row
    * summary; the hot-key pick filters the bounded counts table
    * against the broadcast 1-row max and takes MIN — no sort, no
    * window. The skew factor is exact-ppm integer division (p107's
    * rule) under an in-plan envelope assert (keys × max_rows < 9e9
    * keeps the ppm product inside ldiv's 2^53 exactness bound — at
    * production volumes pre-scale the counts, and the gate fails
    * LOUDLY rather than rounding). Empty domains keep their row with
    * zero counts and NULL skew (p100's grid rule). */
  private[queries] def p115SkewAudit: Q = (s, d) => {
    val frames = Map(
      "events" -> Tables.events(s, d),
      "lineitem" -> Tables.lineitem(s, d),
      "orders" -> Tables.orders(s, d),
      "documents" -> Tables.documents(s, d))
    skewAuditOf(SkewDomains.map { case (t, c) =>
      (s"$t.$c", frames(t), c) })
  }


  /** The p115 core over any (domain-name, frame, key-column) list —
    * Round10dOpsSpec replays it against driver-side counting on a
    * hand-skewed fixture. */
  private[queries] def skewAuditOf(
      domains: Seq[(String, DataFrame, String)]): DataFrame =
    domains.map { case (name, df, key) =>
      val counts = df.select(col(key).cast(StringType).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .staged // read by the summary and the hot-key pick
      val tot = counts.agg(
        coalesce(sum(col("c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"),
        coalesce(max(col("c")), lit(0L)).as("max_rows"))
      val hot = counts.join(broadcast(tot),
          col("c") === col("max_rows"))
        .agg(min(col("k")).as("hot_key"))
      tot.crossJoin(hot)
        .filter(assert_true(
          col("n_keys") * col("max_rows") < lit(9000000000L),
          lit(s"$name: skew ppm outside the exact-int64 envelope — " +
            "pre-scale the counts")).isNull)
        .select(lit(name).as("domain"), col("n_rows"), col("n_keys"),
          col("max_rows"), col("hot_key"),
          when(col("n_rows") === 0L, lit(null).cast(DoubleType))
            .otherwise(ldiv(
              col("max_rows") * col("n_keys") * lit(1000000L),
              col("n_rows")).cast(DoubleType) / lit(1000000.0))
            .as("skew"))
    }.reduce(_.union(_))
}
