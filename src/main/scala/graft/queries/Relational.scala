package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Exact._
import graft.Tables

/** The reference's full relational surface (SURVEY.md §2) re-expressed as
  * declarative DataFrame algebra, plus the standard SQL operators the
  * reference lacks (real aggregates, outer/semi/anti joins, set ops, window
  * functions, scalar functions) so a reference user gets a strict superset.
  *
  * Design notes for 100 TB scale:
  *  - every query is a pure LogicalPlan: Catalyst pushes filters/pruning
  *    into the parquet scan, picks join strategies, and AQE re-plans at
  *    runtime — nothing is collected to the driver;
  *  - constant-size dimension tables (region 5 rows, nation 25 rows) are
  *    explicitly `broadcast()`; anything that grows with sf is left to AQE
  *    so the plan degrades to a shuffle join instead of OOMing at scale;
  *  - aggregates use decimal partial aggregation (graft.Exact) which is
  *    shuffle-order-insensitive → map-side combine is safe and exact.
  *
  * Reference capability citations are per-query in comments
  * (paths relative to /root/reference/).
  */
object Relational extends QueryModule {

  /** Per-JVM unique staging token for q54's on-disk text table, with a
    * shutdown hook that removes the whole staging dir — concurrent gate
    * runs on one host get disjoint directories and leave nothing behind. */
  private[queries] lazy val runToken: String = {
    val tok = java.util.UUID.randomUUID().toString
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-txt-gate-$tok")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
    }))
    tok
  }

  // ---- relational core: parity with SURVEY.md §2 -------------------------

  /** Bare scan (Scan.java:19-109; testcases/query1.sql `SELECT *`). */
  private def q01Scan: Q = (s, d) => Tables.region(s, d)

  /** Equality + inequality selection with conjunctive AND
    * (Select.java:130-220; parser comma-AND, parser.cup:183-194). */
  private def q02FilterEqNe: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") =!= "F")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")

  /** Range predicates <, <=, >, >= (Select.java:149-218). */
  private def q03FilterRange: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 10 && col("l_quantity") <= 40 &&
        col("l_extendedprice") >= 1000 && col("l_discount") < 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")

  /** Column-vs-column selection on the same table
    * (SQLQuery.java:62-67 classifies these as selections). */
  private def q04FilterColCol: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_discount") < col("l_tax"))
      .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")

  /** Pure projection / column subset (Project.java:203-209). Catalyst
    * prunes the parquet scan to exactly these columns. */
  private def q05Project: Q = (s, d) =>
    Tables.lineitem(s, d).select("l_orderkey", "l_partkey", "l_quantity")

  /** 2-table inner equi-join (NestedJoin/BlockNestedJoin/SortMergeJoin;
    * testcases/query3.sql shape). */
  private def q06Join2: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")

  /** 3-table join chain (testcases/query4.sql shape). */
  private def q07Join3: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select("c_custkey", "o_orderkey", "l_linenumber", "l_quantity")

  /** 4-table join chain with filters (testcases/query6/7.sql shape).
    * region/nation are broadcast: at 100 TB the only shuffle left is
    * customer⋈orders on custkey. */
  private def q08Join4: Q = (s, d) =>
    broadcast(Tables.region(s, d))
      .join(broadcast(Tables.nation(s, d)),
        col("r_regionkey") === col("n_regionkey"))
      .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_totalprice") > 100000 && col("r_name") === "ASIA")
      .select("r_name", "n_name", "c_custkey", "o_orderkey", "o_totalprice")

  /** Multi-condition (multi-key) equi-join — all conditions ANDed key
    * equalities (Join.java:12-41, Tuple.checkJoin Tuple.java:49-60).
    * Expressed as a window aggregate over the composite key: semantically
    * the self-join `lineitem ⋈ (lineitem GROUP BY key)`, but one scan and
    * one shuffle instead of two of each — the plan that survives 100 TB. */
  private def q09JoinMultiKey: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey"), col("l_partkey"))
    Tables.lineitem(s, d)
      .withColumn("qty_sum", sum(dec(col("l_quantity"))).over(w).cast(DoubleType))
      .select("l_orderkey", "l_partkey", "l_linenumber", "qty_sum")
  }

  /** Join-method choice, broadcast flavor (METHODCHOICE analogue,
    * RandomOptimizer.java:224-238 — here an explicit physical hint). */
  private def q10JoinBroadcast: Q = (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_name")

  /** Join-method choice, sort-merge flavor (SortMergeJoin.java:14-249). */
  private def q11JoinMerge: Q = (s, d) =>
    Tables.orders(s, d).hint("merge")
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_totalprice", "l_linenumber", "l_extendedprice")

  /** Join-method choice, hash flavor (the reference declares HASHJOIN but
    * never plans it — JoinType.java:14-18; we make it real). */
  private def q12JoinShuffleHash: Q = (s, d) =>
    Tables.customer(s, d).hint("shuffle_hash")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .select("c_custkey", "o_orderkey", "o_orderstatus")

  /** ORDER BY descending (Sort.java:14-261, global DESC flag). The
    * trailing unique key makes the order total so results are
    * deterministic under any parallelism. */
  private def q13SortDesc: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** ORDER BY multi-key ascending (one global ASC flag for all keys,
    * Sort.java:28-41). */
  private def q14SortMultiKey: Q = (s, d) =>
    // balanced: a global sort reads its input TWICE (range-boundary
    // sampling pass + the exchange itself); on an under-split scan both
    // passes are single-task parquet decodes. Spreading the rows once
    // moves the second decode + both serializations onto all cores
    // (A/B: 0.93→0.83 s at sf0.1); the guard disables this at wide inputs
    // where the sort exchange is already fed in parallel.
    Tables.balanced(s, d, "lineitem", Seq("l_orderkey"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc,
        col("l_orderkey").asc, col("l_linenumber").asc)
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")

  /** DISTINCT, single column (Project distinct=true, Project.java:122-296;
    * testcases/query9.sql). */
  private def q15Distinct: Q = (s, d) =>
    Tables.customer(s, d).select("c_nationkey").distinct()

  /** DISTINCT, multi column (dedup on all projected columns). */
  private def q16DistinctMulti: Q = (s, d) =>
    Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()

  /** Reference GROUPBY semantics: distinct on the grouping columns, then
    * project a subset (RandomInitialPlan.java:172-203; demo/groupby.sql).
    * NOT SQL GROUP BY — the oracle twin uses a DISTINCT subquery. */
  private def q17GroupByDistinct: Q = (s, d) =>
    Tables.orders(s, d)
      .dropDuplicates("o_orderstatus", "o_orderpriority")
      .select("o_orderstatus")

  /** Global aggregates MAX/MIN/SUM/COUNT/AVG — declared-but-unimplemented
    * in the reference (Project.java:66-70); we implement them for real,
    * honoring the declared output types COUNT→INT, AVG→REAL
    * (Attribute.java:113-121). */
  private def q18AggGlobal: Q = (s, d) =>
    Tables.lineitem(s, d).agg(
      icount(col("l_orderkey")).as("cnt"),
      dsum(col("l_quantity")).as("sum_qty"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      ravg(col("l_quantity")).as("avg_qty"))

  /** Grouped aggregation, TPC-H Q1 pricing-summary shape
    * (testcases/query8.sql `MAX(...) GROUPBY` generalized). */
  private def q19AggGroup: Q = (s, d) =>
    // balanced: the partial decimal aggregation is the heavy map stage;
    // on an under-split scan it runs single-task (A/B: 0.71→0.58 s at
    // sf0.1, OPTIMIZATION_r17.md). The filter still pushes to the scan
    // (PushedFilters unchanged); at a properly-split 100 TB input the
    // guard leaves the plan untouched.
    Tables.balanced(s, d, "lineitem", Seq("l_orderkey"))
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** MAX + GROUPBY — the literal testcases/query8.sql capability. */
  private def q20AggMaxGroupBy: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(max(col("c_acctbal")).as("max_bal"),
        icount(col("c_custkey")).as("cnt"),
        ravg(col("c_acctbal")).as("avg_bal"))

  // ---- beyond-reference standard SQL (SURVEY.md §2.7 gaps made real) -----

  /** Left outer join (absent in reference — §2.4). */
  private def q21JoinLeftOuter: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .select("c_custkey", "o_orderkey", "o_totalprice")

  /** Left semi join ≡ WHERE EXISTS. */
  private def q22JoinSemi: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")

  /** Left anti join ≡ WHERE NOT EXISTS. */
  private def q23JoinAnti: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_nationkey")

  /** Set operations (absent in reference — Schema.checkCompat is vestigial,
    * Schema.java:114-126). */
  private def q24SetOps: Q = (s, d) => {
    val custKeys = Tables.customer(s, d)
      .filter(col("c_nationkey") < 5).select(col("c_custkey").as("k"))
    val orderCust = Tables.orders(s, d).select(col("o_custkey").as("k"))
    custKeys.intersect(orderCust)
  }

  private def q25Except: Q = (s, d) => {
    val custKeys = Tables.customer(s, d).select(col("c_custkey").as("k"))
    val orderCust = Tables.orders(s, d).select(col("o_custkey").as("k"))
    custKeys.except(orderCust)
  }

  /** Union (distinct) of two filtered key sets over the same table —
    * planned as ONE scan with an OR filter (same rows as
    * UNION-of-two-scans since both branches project the key): half the IO
    * of the textbook plan at any scale. */
  private def q26Union: Q = (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_nationkey") === 1 || col("c_acctbal") > 9000)
      .select(col("c_custkey").as("k"))
      .distinct()

  /** Scalar functions (string/date/math — absent in reference, §2.7). */
  private def q27ScalarFuncs: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderpriority")).as("prio_len"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_tag"),
        year(col("o_orderdate")).as("order_year"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice")).as("price_ceil"),
        abs(col("o_totalprice") - 250000.0).as("price_dev"))

  /** Window functions (absent in reference, §2.7): top-3 customers by
    * account balance per nation, deterministic tie-break on key. */
  private def q28WindowRank: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("c_nationkey", "rnk", "c_custkey", "c_acctbal")
  }

  // ---- headline analytics (bench set; TPC-H-ish shapes) ------------------

  /** Q3-style shipping priority: join fact-to-fact, aggregate, total-order
    * top-10. */
  private def q30TopRevenue: Q = (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      // balanced on the orders side: whichever join strategy Catalyst
      // picks, orders is the streamed side here (CBO broadcasts pruned
      // lineitem at bench scale), and an under-split scan runs the
      // whole probe + partial-agg pipeline on one task. The o_orderkey
      // hash partitioning propagates through the join's key equivalence,
      // so the groupBy below needs no second exchange.
      .join(Tables.balanced(s, d, "orders", Seq("o_orderkey")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      // group on the raw date; the string form is projected AFTER the
      // top-10, so the formatter runs 10 times, not once per fact row
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("rev"))
      .orderBy(col("rev").desc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("rev"))

  /** Q5-style local supplier volume: 6-table star join. Only the
    * constant-size dims (region 5 rows, nation 25 rows) are hard-broadcast;
    * supplier grows linearly with sf, so its join is left un-hinted — AQE
    * broadcasts it while it fits and falls back to a shuffle join at scale
    * instead of OOMing the executors. */
  private def q31LocalVolume: Q = (s, d) =>
    broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
      .join(broadcast(Tables.nation(s, d)),
        col("r_regionkey") === col("n_regionkey"))
      .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      // NOT balanced (A/B: 0.657 plain vs 0.713 balanced at sf0.1): the
      // broadcast probes per lineitem row are cheaper than the serial
      // shuffle write a rebalance would pay — the win only exists where
      // the moved work exceeds one row serialization (q19's decimal agg,
      // q30's unfiltered probe+agg chain)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("rev"))

  /** Q10-style returned-item losses per customer (top-20, total order). */
  private def q32ReturnedItems: Q = (s, d) =>
    // balanced: first A/B read a wash (0.527 plain vs 0.523), the
    // re-run after the p02/probe changes reads a consistent win
    // (0.598 plain vs 0.553 balanced, 5/6 samples lower) — the R
    // filter keeps ~25% of rows but the surviving probe+partial-agg
    // chain still outweighs one serial row serialization
    Tables.balanced(s, d, "lineitem", Seq("l_orderkey"))
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("rev"))
      .orderBy(col("rev").desc, col("c_custkey").asc)
      .limit(20)

  /** Q14-ish promo revenue share by brand: part ⋈ lineitem with the part
    * side un-hinted (it grows with sf — AQE broadcasts while it fits,
    * shuffle-joins beyond), grouped on a low-cardinality dimension. */
  private def q33BrandRevenue: Q = (s, d) =>
    Tables.part(s, d).filter(col("p_size") <= 20)
      .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("rev"),
        count(lit(1)).as("n_items"))

  /** ROLLUP hierarchy subtotals (status → priority → grand total) — a
    * grouping-sets shape the reference cannot express; one shuffle, null
    * markers for subtotal rows in both engines. */
  private def q34Rollup: Q = (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  /** CUBE grouping sets (all four combinations of the two dimensions) —
    * the full-lattice companion of q34's ROLLUP; still one shuffle (Spark
    * expands the grouping sets map-side). */
  private def q39Cube: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  /** KMV (k-minimum-values) distinct-count sketch — the composable
    * alternative to exact COUNT DISTINCT at 100 TB. Every value is hashed
    * to 60 bits; each partition keeps only its k smallest hashes (the
    * `limit` after `orderBy` plans as TakeOrderedAndProject — partial
    * top-k per partition, merge on the driver, never a global sort), and
    * the estimate is (k-1) / (h_k / 2^60). Unlike HLL the hash is
    * engine-portable (md5 via Portable.h60), so DuckDB reproduces the
    * sketch BIT-EXACTLY — estimate, exact count, and relative error all
    * hash-match. Estimated vs exact distinct custkeys over orders. */
  private def q40KmvDistinct: Q = (s, d) => {
    import graft.functions.Portable.h60
    val k = 256
    val kth = Tables.orders(s, d)
      .select(h60(col("o_custkey").cast(StringType)).as("hv")).distinct()
      .orderBy(col("hv").asc).limit(k)
      .agg(max(col("hv")).as("kth"), count(lit(1)).as("kk"))
    val exact = Tables.orders(s, d)
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    kth.crossJoin(exact)
      .select(
        col("kk").cast(IntegerType).as("k"),
        round((col("kk") - 1).cast(DoubleType) * lit(math.pow(2, 60)) /
          col("kth"), 4).as("est_distinct"),
        col("exact_distinct"))
      .withColumn("rel_err",
        round(abs(col("est_distinct") - col("exact_distinct")) /
          col("exact_distinct"), 4))
  }

  /** Cross join — inexpressible in the reference (a multi-table query
    * without join conditions silently DROPS tables,
    * RandomInitialPlan.java:93-102); made explicit here, deliberately
    * only between the two constant-size dims where an all-pairs product
    * is safe at any scale. */
  private def q41CrossJoin: Q = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select("r_name", "n_name")

  /** CASE expression banding + aggregate over the derived column (no
    * conditional expressions exist in the reference grammar, §2.7). The
    * CASE is codegen'd into the scan projection; the groupBy shuffles
    * three band rows per partition. */
  private def q42CaseBands: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("large").as("band"),
        col("o_totalprice"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  /** LIKE pattern filters — contains + prefix (no LIKE token exists in the
    * reference lexer, scaner.lex:37-169). The prefix pattern stays
    * pushable as a parquet StringStartsWith filter. */
  private def q43LikeFilter: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_name").like("%o%") && col("p_type").like("SMALL%"))
      .select("p_partkey", "p_name", "p_type", "p_brand")

  /** Running total per customer over their order history — the frame-
    * bounded window aggregate (rowsBetween) the reference lacks (§2.7).
    * One exchange on o_custkey; each partition is a linear pass with one
    * accumulator. Decimal partials keep the running sum engine-exact at
    * every prefix, and the (date, orderkey) order is total so prefixes
    * are deterministic. */
  private def q44RunningTotal: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        sum(dec(col("o_totalprice"))).over(w).cast(DoubleType)
          .as("running_total"))
  }

  /** Offset window functions lag/lead/first_value over each customer's
    * order sequence — prior/next order price and first order date. Same
    * single-exchange shape as q44. */
  private def q45LagLead: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        date_format(first_value(col("o_orderdate")).over(w), "yyyy-MM-dd")
          .as("first_order_date"))
  }

  /** Date arithmetic (datediff / date_add / month truncation) — the date
    * half of the scalar-function surface the reference lacks (§2.7). All
    * derived dates are emitted as yyyy-MM-dd strings so both engines
    * agree on type and format. */
  private def q46DateArith: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        datediff(lit("1998-12-31").cast(DateType), col("o_orderdate"))
          .as("days_to_eoy"),
        date_format(date_add(col("o_orderdate"), 7), "yyyy-MM-dd").as("plus7"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"))

  /** NULL-handling functions over outer-join-produced nulls: COALESCE
    * defaulting, IS NULL flags, CASE tagging. The reference has no NULLs
    * in its data path at all (SURVEY §1.2). */
  private def q47NullHandling: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .select(
        col("c_custkey"),
        col("o_orderkey"),
        coalesce(col("o_totalprice"), lit(0.0)).as("price_or_zero"),
        col("o_orderkey").isNull.as("no_big_order"),
        when(col("o_orderkey").isNotNull, "has").otherwise("none").as("tag"))

  /** UNION ALL — bag union, no dedup shuffle at all (q26 is the DISTINCT
    * flavor). Planned as a pure concatenation of the two scans. */
  private def q48UnionAll: Q = (s, d) =>
    Tables.customer(s, d).filter(col("c_nationkey") === 1)
      .select(col("c_custkey").as("k"))
      .unionAll(Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("k")))

  /** EXCEPT ALL — bag difference with multiplicity (each occurrence on
    * the right cancels one on the left), the multiset cousin of q25. */
  private def q49ExceptAll: Q = (s, d) =>
    Tables.orders(s, d).select(col("o_custkey").as("k"))
      .exceptAll(Tables.customer(s, d)
        .filter(col("c_nationkey") < 13).select(col("c_custkey").as("k")))

  /** Distribution window functions — NTILE quartiles and percent_rank
    * per nation over a total (balance, key) order. percent_rank's
    * (rank-1)/(n-1) is a single division of exact integers, rounded so
    * both engines agree to the last bit. */
  private def q50Ntile: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
  }

  /** Sorted string aggregation (LISTAGG analogue): distinct priorities
    * per status as one sorted CSV. `collect_set` alone is
    * order-nondeterministic under parallelism — `array_sort` before the
    * join makes the result identical on any partitioning, matching
    * DuckDB's `string_agg(DISTINCT ... ORDER BY ...)`. */
  private def q51ListAgg: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(concat_ws(",", array_sort(collect_set(col("o_orderpriority"))))
        .as("prios"))

  /** TPC-H Q18 shape (large-volume orders): aggregate the fact table per
    * order, keep orders whose quantity total clears a threshold (HAVING
    * over an exact decimal sum), then join BACK through orders and
    * customer for the reporting columns. The agg runs FIRST, so the two
    * reporting joins see only the qualifying keys — the decorrelated
    * plan a correlated `IN (SELECT ... HAVING)` rewrites to, with AQE
    * free to broadcast the shrunken agg side at any scale. */
  private def q52BigOrders: Q = (s, d) => {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"))
      .filter(col("sq") > 150)
    big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("sq").cast(DoubleType).as("tot_qty"))
  }

  /** Top-3 customers per nation through the NATIVE per-key top-k
    * operator (graft.plans.TopKPerKey: logical node + strategy +
    * two-phase bounded-heap physical exec, injected via
    * GraftExtensions) — the whole-operator extension tier of the
    * custom-operator ladder, gated here against the same DuckDB oracle
    * as any built-in. The plan is heap → one hash exchange of ≤
    * tasks×keys×k rows → heap; no sort, no window (plan-asserted in
    * TopKPerKeySpec). */
  private def q53TopkNative: Q = (s, d) =>
    graft.plans.TopKPerKey.topK(
      Tables.customer(s, d).select("c_nationkey", "c_custkey", "c_acctbal"),
      Seq("c_nationkey"), Seq("c_acctbal" -> false, "c_custkey" -> true), 3)

  /** Exact continuous percentiles per group (median + p90). Spark's
    * `percentile` is the exact sort-based aggregate; DuckDB's
    * quantile_cont matches its interpolation; outputs rounded so the
    * one-interpolation arithmetic can never differ in the last ULP. */
  private def q35Percentiles: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"))

  /** Variance/stddev made engine-exact: moments are EXACT decimal sums
    * (order-insensitive, map-side combinable), converted to double once,
    * then the textbook (s2 − s1²/n)/n in identical double arithmetic —
    * unlike the built-in var_pop whose partial-merge order perturbs the
    * last ULPs across engines and partitionings. */
  private def q36ExactStats: Q = (s, d) => {
    val x = dec(col("o_totalprice"))
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("s1"),
        sum(x * x).cast(DoubleType).as("s2"))
      // clamp at 0: textbook cancellation can land a hair below zero for a
      // near-constant group, where Spark's sqrt says NaN but DuckDB errors
      .withColumn("v",
        greatest((col("s2") - col("s1") * col("s1") / col("n")) / col("n"),
          lit(0.0)))
      .select(col("o_orderstatus"), col("n"),
        round(col("v"), 4).as("var_pop"),
        round(sqrt(col("v")), 4).as("stddev_pop"))
  }

  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  /** PIVOT: order counts by status × priority, priorities as columns.
    * The value list is explicit, so the pivot is a single groupBy with
    * conditional aggregates — one shuffle, no second pass to discover
    * column values (which at 100 TB would be its own job). */
  private def q37Pivot: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)))
      // an empty combo pivots to NULL; the oracle's filtered COUNT says 0
      .na.fill(0L, Priorities)

  /** UNPIVOT (melt): the inverse reshape, priorities back to rows. Pure
    * map — each input row emits one row per unpivoted column. The n=0
    * rows that q37's na.fill manufactured for absent (status, priority)
    * combos are dropped so the result matches a plain GROUP BY on any
    * data, not just data where every combo occurs. */
  private def q38Unpivot: Q = (s, d) =>
    q37Pivot(s, d).unpivot(
      Array(col("o_orderstatus")),
      Priorities.map(col).toArray, "o_orderpriority", "n")
      .filter(col("n") > 0)

  /** The reference's own on-disk table format read through the
    * DataSourceV2 source (graft.sources.TextTableProvider): customer is
    * laid out as sharded tab-delimited text + `.det` sidecar — the
    * RandomDB/ConvertTxtToTbl layout (/root/reference/src/RandomDB.java:32-111,
    * ConvertTxtToTbl.java:16-75) — then scanned back with the filter and
    * projection PUSHED INTO THE V2 SCAN (plan-asserted in TextTableSpec:
    * ReadSchema = 2 columns, PushedFilters carries both comparisons).
    * The oracle reads the parquet twin, so the hash match proves the
    * text path is byte-faithful, not just shaped right. */
  private def q54Dsv2TextScan: Q = (s, d) => {
    // per-JVM unique token: two concurrent gate runs on one host never
    // share a directory (and repeated calls in one session overwrite
    // rather than accumulate); the shutdown hook clears the staging dir
    // so nothing persists across runs
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-txt-gate-" +
      Relational.runToken + "/customer-" + d.replaceAll("[^A-Za-z0-9.]", "_")
    graft.sources.TextTables.write(
      Tables.customer(s, d).select(col("c_custkey").cast(IntegerType),
        col("c_name"), col("c_nationkey"), col("c_mktsegment")), dir)
    graft.sources.TextTables.read(s, dir)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_nationkey") >= 10)
      .select("c_custkey", "c_name")
  }

  // ---- registry ----------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q01_scan" -> q01Scan,
    "q02_filter_eq_ne" -> q02FilterEqNe,
    "q03_filter_range" -> q03FilterRange,
    "q04_filter_col_col" -> q04FilterColCol,
    "q05_project" -> q05Project,
    "q06_join2" -> q06Join2,
    "q07_join3" -> q07Join3,
    "q08_join4" -> q08Join4,
    "q09_join_multikey" -> q09JoinMultiKey,
    "q10_join_broadcast" -> q10JoinBroadcast,
    "q11_join_merge" -> q11JoinMerge,
    "q12_join_shuffle_hash" -> q12JoinShuffleHash,
    "q13_sort_desc" -> q13SortDesc,
    "q14_sort_multikey" -> q14SortMultiKey,
    "q15_distinct" -> q15Distinct,
    "q16_distinct_multi" -> q16DistinctMulti,
    "q17_groupby_distinct" -> q17GroupByDistinct,
    "q18_agg_global" -> q18AggGlobal,
    "q19_agg_group" -> q19AggGroup,
    "q20_agg_max_groupby" -> q20AggMaxGroupBy,
    "q21_join_left_outer" -> q21JoinLeftOuter,
    "q22_join_semi" -> q22JoinSemi,
    "q23_join_anti" -> q23JoinAnti,
    "q24_intersect" -> q24SetOps,
    "q25_except" -> q25Except,
    "q26_union" -> q26Union,
    "q27_scalar_funcs" -> q27ScalarFuncs,
    "q28_window_rank" -> q28WindowRank,
    "q30_top_revenue" -> q30TopRevenue,
    "q31_local_volume" -> q31LocalVolume,
    "q32_returned_items" -> q32ReturnedItems,
    "q33_brand_revenue" -> q33BrandRevenue,
    "q34_rollup" -> q34Rollup,
    "q35_percentiles" -> q35Percentiles,
    "q36_exact_stats" -> q36ExactStats,
    "q37_pivot" -> q37Pivot,
    "q38_unpivot" -> q38Unpivot,
    "q39_cube" -> q39Cube,
    "q40_kmv_distinct" -> q40KmvDistinct,
    "q41_cross_join" -> q41CrossJoin,
    "q42_case_bands" -> q42CaseBands,
    "q43_like_filter" -> q43LikeFilter,
    "q44_running_total" -> q44RunningTotal,
    "q45_lag_lead" -> q45LagLead,
    "q46_date_arith" -> q46DateArith,
    "q47_null_handling" -> q47NullHandling,
    "q48_union_all" -> q48UnionAll,
    "q49_except_all" -> q49ExceptAll,
    "q50_ntile" -> q50Ntile,
    "q51_listagg" -> q51ListAgg,
    "q52_big_orders" -> q52BigOrders,
    "q53_topk_native" -> q53TopkNative,
    "q54_dsv2_text_scan" -> q54Dsv2TextScan,
  )

  val oracleSql: Map[String, String] = Map(
    "q01_scan" -> "SELECT r_regionkey, r_name FROM region",
    "q02_filter_eq_ne" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem WHERE l_returnflag = 'A' AND l_linestatus <> 'F'""".stripMargin,
    "q03_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity > 10 AND l_quantity <= 40
        |  AND l_extendedprice >= 1000 AND l_discount < 0.05""".stripMargin,
    "q04_filter_col_col" ->
      """SELECT l_orderkey, l_linenumber, l_discount, l_tax
        |FROM lineitem WHERE l_discount < l_tax""".stripMargin,
    "q05_project" -> "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
    "q06_join2" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "q07_join3" ->
      """SELECT c_custkey, o_orderkey, l_linenumber, l_quantity
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
    "q08_join4" ->
      """SELECT r_name, n_name, c_custkey, o_orderkey, o_totalprice
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |WHERE o_totalprice > 100000 AND r_name = 'ASIA'""".stripMargin,
    "q09_join_multikey" ->
      s"""SELECT l_orderkey, l_partkey, l_linenumber,
         |  CAST(SUM(${sqlDec("l_quantity")}) OVER
         |    (PARTITION BY l_orderkey, l_partkey) AS DOUBLE) AS qty_sum
         |FROM lineitem""".stripMargin,
    "q10_join_broadcast" ->
      """SELECT n_name, c_custkey, c_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q11_join_merge" ->
      """SELECT o_orderkey, o_totalprice, l_linenumber, l_extendedprice
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
    "q12_join_shuffle_hash" ->
      """SELECT c_custkey, o_orderkey, o_orderstatus
        |FROM customer JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "q13_sort_desc" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey DESC""".stripMargin,
    "q14_sort_multikey" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber""".stripMargin,
    "q15_distinct" -> "SELECT DISTINCT c_nationkey FROM customer",
    "q16_distinct_multi" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q17_groupby_distinct" ->
      """SELECT o_orderstatus FROM
        |(SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders) t""".stripMargin,
    "q18_agg_global" ->
      s"""SELECT CAST(COUNT(l_orderkey) AS INT) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  MIN(l_quantity) AS min_qty,
         |  MAX(l_quantity) AS max_qty,
         |  ${sqlRavg("l_quantity")} AS avg_qty
         |FROM lineitem""".stripMargin,
    "q19_agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(${sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q20_agg_max_groupby" ->
      s"""SELECT c_nationkey, MAX(c_acctbal) AS max_bal,
         |  CAST(COUNT(c_custkey) AS INT) AS cnt,
         |  ${sqlRavg("c_acctbal")} AS avg_bal
         |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q21_join_left_outer" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey""".stripMargin,
    "q22_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q23_join_anti" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q24_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_nationkey < 5
        |INTERSECT
        |SELECT o_custkey AS k FROM orders""".stripMargin,
    "q25_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders""".stripMargin,
    "q26_union" ->
      """SELECT c_custkey AS k FROM customer WHERE c_nationkey = 1
        |UNION
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000""".stripMargin,
    "q27_scalar_funcs" ->
      """SELECT o_orderkey,
        |  UPPER(o_orderpriority) AS prio_upper,
        |  SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
        |  CAST(LENGTH(o_orderpriority) AS INT) AS prio_len,
        |  o_orderstatus || '-' || o_orderpriority AS status_tag,
        |  CAST(YEAR(o_orderdate) AS INT) AS order_year,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
        |  ABS(o_totalprice - 250000.0) AS price_dev
        |FROM orders WHERE o_orderkey < 1000""".stripMargin,
    "q28_window_rank" ->
      """SELECT c_nationkey, rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3""".stripMargin,
    "q30_top_revenue" ->
      s"""SELECT l_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
         |  CAST(SUM(${sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS rev
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey, order_date
         |ORDER BY rev DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q31_local_volume" ->
      s"""SELECT n_name,
         |  CAST(SUM(${sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS rev
         |FROM region
         |JOIN nation ON r_regionkey = n_regionkey
         |JOIN customer ON n_nationkey = c_nationkey
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name""".stripMargin,
    "q32_returned_items" ->
      s"""SELECT c_custkey, c_name,
         |  CAST(SUM(${sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS rev
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name
         |ORDER BY rev DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q33_brand_revenue" ->
      s"""SELECT p_brand,
         |  CAST(SUM(${sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS rev,
         |  COUNT(*) AS n_items
         |FROM part JOIN lineitem ON p_partkey = l_partkey
         |WHERE p_size <= 20
         |GROUP BY p_brand""".stripMargin,
    "q34_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    "q35_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q36_exact_stats" ->
      s"""WITH m AS (
         |  SELECT o_orderstatus, COUNT(*) AS n,
         |    ${sqlDsum("o_totalprice")} AS s1,
         |    CAST(SUM(${sqlDec("o_totalprice")} * ${sqlDec("o_totalprice")})
         |      AS DOUBLE) AS s2
         |  FROM orders GROUP BY o_orderstatus),
         |v AS (SELECT o_orderstatus, n,
         |  greatest((s2 - s1 * s1 / n) / n, 0.0) AS v FROM m)
         |SELECT o_orderstatus, n,
         |  round(v, 4) AS var_pop,
         |  round(sqrt(v), 4) AS stddev_pop
         |FROM v""".stripMargin,
    "q37_pivot" ->
      s"""SELECT o_orderstatus,
         |${Priorities.map(p =>
             s"""  COUNT(*) FILTER (o_orderpriority = '$p') AS "$p"""")
             .mkString(",\n")}
         |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q38_unpivot" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus, o_orderpriority""".stripMargin,
    "q39_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q40_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT
         |    ${graft.functions.Portable.sqlH60("CAST(o_custkey AS VARCHAR)")} AS hv
         |  FROM orders),
         |mins AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
         |sk AS (SELECT MAX(hv) AS kth, COUNT(*) AS kk FROM mins),
         |e AS (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders),
         |est AS (SELECT CAST(kk AS INT) AS k,
         |    round((kk - 1) * 1152921504606846976.0 / kth, 4) AS est_distinct,
         |    exact_distinct
         |  FROM sk, e)
         |SELECT k, est_distinct, exact_distinct,
         |  round(abs(est_distinct - exact_distinct) / exact_distinct, 4)
         |    AS rel_err
         |FROM est""".stripMargin,
    "q41_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "q42_case_bands" ->
      s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
         |  WHEN o_totalprice < 300000 THEN 'mid' ELSE 'large' END AS band,
         |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1""".stripMargin,
    "q43_like_filter" ->
      """SELECT p_partkey, p_name, p_type, p_brand FROM part
        |WHERE p_name LIKE '%o%' AND p_type LIKE 'SMALL%'""".stripMargin,
    "q44_running_total" ->
      s"""SELECT o_custkey, o_orderkey,
         |  STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
         |  CAST(SUM(${sqlDec("o_totalprice")}) OVER (
         |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS running_total
         |FROM orders WHERE o_custkey < 100""".stripMargin,
    "q45_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  STRFTIME(FIRST_VALUE(o_orderdate) OVER w, '%Y-%m-%d')
        |    AS first_order_date
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q46_date_arith" ->
      """SELECT o_orderkey,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
        |    AS INT) AS days_to_eoy,
        |  STRFTIME(CAST(o_orderdate AS DATE) + 7, '%Y-%m-%d') AS plus7,
        |  STRFTIME(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders WHERE o_orderkey < 1000""".stripMargin,
    "q47_null_handling" ->
      """SELECT c_custkey, o_orderkey,
        |  coalesce(o_totalprice, 0.0) AS price_or_zero,
        |  o_orderkey IS NULL AS no_big_order,
        |  CASE WHEN o_orderkey IS NOT NULL THEN 'has' ELSE 'none' END AS tag
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey""".stripMargin,
    "q48_union_all" ->
      """SELECT c_custkey AS k FROM customer WHERE c_nationkey = 1
        |UNION ALL
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000""".stripMargin,
    "q49_except_all" ->
      """SELECT o_custkey AS k FROM orders
        |EXCEPT ALL
        |SELECT c_custkey AS k FROM customer WHERE c_nationkey < 13""".stripMargin,
    "q50_ntile" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  round(PERCENT_RANK() OVER w, 6) AS pct_rank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "q51_listagg" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |    AS prios
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q52_big_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, SUM(${sqlDec("l_quantity")}) AS sq
         |  FROM lineitem GROUP BY 1 HAVING SUM(${sqlDec("l_quantity")}) > 150)
         |SELECT c_custkey, c_name, o_orderkey,
         |  STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
         |  CAST(sq AS DOUBLE) AS tot_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q54_dsv2_text_scan" ->
      """SELECT CAST(c_custkey AS INTEGER) AS c_custkey, c_name
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_nationkey >= 10""".stripMargin,
    "q53_topk_native" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM customer
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey ASC) <= 3""".stripMargin,
  )
}
