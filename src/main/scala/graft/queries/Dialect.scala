package graft.queries

import graft.Exact._
import graft.sql.MiniSqlPlanner

/** The reference's ten SQL test cases (/root/reference/testcases/
  * query1.sql–query10.sql plus the demo queries) re-targeted at the TPC-H
  * schema and
  * executed through the mini-SQL front end (graft.sql.MiniSql →
  * MiniSqlPlanner → DataFrame). Each entry's `queries` function parses the
  * dialect text at call time — these rows prove the parser+planner path
  * end-to-end against the DuckDB oracle.
  */
object Dialect extends QueryModule {

  /** name → (reference-dialect SQL, ANSI oracle twin). */
  val cases: Map[String, (String, String)] = Map(
    // query1.sql shape: SELECT * with a coerced literal filter
    "s01_sql_scan_filter" -> (
      """SELECT * FROM nation WHERE nation.n_regionkey = "2"""",
      "SELECT * FROM nation WHERE n_regionkey = 2"),
    // query2.sql shape: projection + conjunctive filters
    "s02_sql_project_filter" -> (
      """SELECT customer.c_custkey, customer.c_name FROM customer
        |WHERE customer.c_nationkey = "5", customer.c_acctbal > "1000"""".stripMargin,
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey = 5 AND c_acctbal > 1000""".stripMargin),
    // same-table column-vs-column selection (SQLQuery.java:62-67)
    "s03_sql_col_col" -> (
      """SELECT lineitem.l_orderkey, lineitem.l_discount, lineitem.l_tax
        |FROM lineitem WHERE lineitem.l_discount < lineitem.l_tax""".stripMargin,
      """SELECT l_orderkey, l_discount, l_tax FROM lineitem
        |WHERE l_discount < l_tax""".stripMargin),
    // query3.sql shape: 2-table equi-join
    "s04_sql_join2" -> (
      """SELECT customer.c_name, orders.o_orderkey FROM customer, orders
        |WHERE customer.c_custkey = orders.o_custkey""".stripMargin,
      """SELECT c_name, o_orderkey FROM customer
        |JOIN orders ON c_custkey = o_custkey""".stripMargin),
    // query4/6.sql shape: 3-table chain + range filter
    "s05_sql_join3_filter" -> (
      """SELECT customer.c_custkey, orders.o_orderkey, lineitem.l_linenumber
        |FROM customer, orders, lineitem
        |WHERE customer.c_custkey = orders.o_custkey,
        |  orders.o_orderkey = lineitem.l_orderkey,
        |  orders.o_totalprice > "100000"""".stripMargin,
      """SELECT c_custkey, o_orderkey, l_linenumber FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_totalprice > 100000""".stripMargin),
    // query9.sql shape: DISTINCT projection
    "s06_sql_distinct" -> (
      "SELECT DISTINCT orders.o_orderstatus, orders.o_orderpriority FROM orders",
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"),
    // query10.sql shape: join + filter + ORDERBY ... DESC
    "s07_sql_orderby" -> (
      """SELECT nation.n_name, customer.c_custkey, customer.c_acctbal
        |FROM nation, customer
        |WHERE nation.n_nationkey = customer.c_nationkey,
        |  customer.c_acctbal > "9000"
        |ORDERBY customer.c_acctbal, customer.c_custkey DESC""".stripMargin,
      """SELECT n_name, c_custkey, c_acctbal FROM nation
        |JOIN customer ON n_nationkey = c_nationkey
        |WHERE c_acctbal > 9000
        |ORDER BY c_acctbal DESC, c_custkey DESC""".stripMargin),
    // query8.sql shape: aggregates + GROUPBY (the capability the reference
    // declares but aborts on — Project.java:66-70)
    "s08_sql_agg_groupby" -> (
      """SELECT customer.c_nationkey, MAX(customer.c_acctbal),
        |  COUNT(customer.c_custkey), AVG(customer.c_acctbal)
        |FROM customer GROUPBY customer.c_nationkey""".stripMargin,
      s"""SELECT c_nationkey, MAX(c_acctbal) AS max_c_acctbal,
         |  CAST(COUNT(c_custkey) AS INT) AS count_c_custkey,
         |  ${sqlRavg("c_acctbal")} AS avg_c_acctbal
         |FROM customer GROUP BY c_nationkey""".stripMargin),
    // demo/groupby.sql shape: GROUPBY without aggregates = duplicate
    // elimination on the group cols (RandomInitialPlan.java:172-203)
    "s09_sql_groupby_distinct" -> (
      """SELECT orders.o_orderstatus FROM orders
        |GROUPBY orders.o_orderstatus, orders.o_orderpriority""".stripMargin,
      """SELECT o_orderstatus FROM
        |(SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders) t""".stripMargin),
  )

  /** ANSI front-end cases (graft.sql.SparkSqlRunner): shapes the
    * reference grammar cannot express at all — correlated and IN
    * subqueries. The SAME statement text is the DuckDB oracle, proving
    * the ANSI surface end-to-end. The correlated threshold is an exact
    * decimal sum divided once, so both engines compute the identical
    * double and the comparison can never flip on a last-ULP average. */
  val ansiCases: Map[String, String] = Map(
    // TPC-H Q7 shape: bidirectional nation-pair shipping volume by ship
    // year. Revenue stays exact decimal until one output cast; the year
    // is cast to INT so both engines agree on the dtype.
    "s21_sql_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(vol) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(YEAR(l_shipdate) AS INT) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2))
        |         - CAST(l_discount AS DECIMAL(12,2))) AS vol
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,
    // TPC-H Q8 shape: one supplier nation's market share of an ASIA
    // PROMO market by order year. Both operands of the share division
    // are exact decimal sums cast to double ONCE, so the quotient is
    // the same IEEE division in both engines — no rounding guard needed.
    "s22_sql_market_share" ->
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN vol
        |                ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2))
        |         - CAST(l_discount AS DECIMAL(12,2))) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |) all_nations
        |GROUP BY o_year""".stripMargin,
    // TPC-H Q22 shape: dormant above-average customers by country code.
    // The driver schema has no c_phone, so the code is c_nationkey
    // itself; "no orders" would be empty here (every customer ordered),
    // so dormancy is "no order in the data's final years". The
    // above-average threshold avoids a cross-engine AVG: acctbal×count
    // > sum, all exact decimals — the s20 integer-multiply trick.
    "s23_sql_dormant_customers" ->
      """SELECT CAST(c_nationkey AS INT) AS cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer
        |WHERE c_nationkey IN (2, 5, 7, 11, 14, 17, 20)
        |  AND CAST(c_acctbal AS DECIMAL(12,2)) * (
        |    SELECT COUNT(*) FROM customer c2
        |    WHERE c2.c_acctbal > 0
        |      AND c2.c_nationkey IN (2, 5, 7, 11, 14, 17, 20))
        |  > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
        |     FROM customer c2
        |     WHERE c2.c_acctbal > 0
        |       AND c2.c_nationkey IN (2, 5, 7, 11, 14, 17, 20))
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin,
    // TPC-H Q1 shape: the pricing-summary scan — every aggregate stays
    // an exact decimal sum (the disc-price/charge products widen scale,
    // still exact); averages divide the identical double by the
    // identical count once at output. The two product sums are rounded
    // back to MONEY scale (2) before the final DOUBLE cast: at sf1 the
    // scale-6 charge sum carries 17 significant digits, where the two
    // engines' decimal→double conversions legitimately differ by one
    // ULP (DuckDB double-rounds through int128/10^6; Spark converts the
    // unscaled BigDecimal correctly rounded). At scale 2 the unscaled
    // value stays below 2^53 for decades of growth, so BOTH conversions
    // are a single exact-to-double rounding of the same rational —
    // bit-identical by construction, and the output is the money amount
    // TPC-H reports anyway. ROUND, not a decimal downcast: Spark's cast
    // rounds HALF_UP but DuckDB's TRUNCATES (probed: 1.019::dec(10,2)
    // = 1.01), while both engines' ROUND is half-away-from-zero.
    "s28_sql_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2))
        |       - CAST(l_discount AS DECIMAL(12,2)))), 2)
        |    AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2))
        |       - CAST(l_discount AS DECIMAL(12,2)))
        |    * (CAST(1 AS DECIMAL(12,2))
        |       + CAST(l_tax AS DECIMAL(12,2)))), 2)
        |    AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // TPC-H Q3 shape: unshipped-order revenue. The driver schema has no
    // o_shippriority; o_orderpriority rides along instead.
    "s29_sql_shipping_priority" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2))
        |       - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue,
        |  o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY o_orderkey, o_orderpriority""".stripMargin,
    // TPC-H Q4 shape: order-priority checking via a correlated EXISTS
    // with date arithmetic in the correlated predicate. The schema has
    // no commit/receipt dates; "late" is a shipment >90 days after the
    // order date.
    "s30_sql_priority_check" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL '90' DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    // TPC-H Q5 shape: local-supplier volume — the SQL twin of the q31
    // flagship (customer and supplier constrained to the same nation).
    "s31_sql_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2))
        |       - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    // TPC-H Q6 shape: the forecasting-revenue-change scan. The discount
    // band compares exact decimals against decimal literals.
    "s32_sql_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // TPC-H Q9 shape: product-type profit by nation and year. No
    // partsupp/supplycost in the driver schema, so profit is the
    // discounted price; the year comes out of an inner subquery so the
    // outer GROUP BY names a plain column (the s21 idiom).
    "s33_sql_product_profit" ->
      """SELECT nation, o_year,
        |  CAST(SUM(vol) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2))
        |         - CAST(l_discount AS DECIMAL(12,2))) AS vol
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%'
        |) profit
        |GROUP BY nation, o_year""".stripMargin,
    // TPC-H Q10 shape: returned-item reporting. c_acctbal passes
    // through as a group key untouched — no arithmetic, no cast needed.
    "s34_sql_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2))
        |       - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue,
        |  c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-10-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin,
    // TPC-H Q12 shape: priority counts by line class. The schema has no
    // l_shipmode; l_returnflag is the grouping axis. Integer CASE sums
    // are cast to BIGINT so DuckDB's HUGEINT sum and Spark's BIGINT sum
    // land on the same dtype.
    "s35_sql_priority_lines" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,
    // TPC-H Q14 shape: promo-revenue share. Both division operands are
    // exact decimal sums cast to double once — the s22 pattern.
    "s36_sql_promo_revenue" ->
      """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2))
        |         - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE 0 END) AS DOUBLE) * 100
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2))
        |       - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    // TPC-H Q16 shape: supplier count by part attributes, with a NOT IN
    // exclusion subquery. lineitem is the part↔supplier fact (no
    // partsupp); negative account balance stands in for complaints.
    "s37_sql_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    // TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate
    // mixing both join sides — the classic pushdown stress shape (each
    // disjunct constrains part AND lineitem columns). No p_container;
    // p_size bands stand in.
    "s38_sql_or_of_ands_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2))
        |       - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity >= 1 AND l_quantity <= 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity >= 10 AND l_quantity <= 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    // JOIN with a non-key predicate in the ON clause (kept rows must
    // still appear with count 0) feeding a second-level aggregation.
    // Counts only; nothing float-sensitive.
    "s24_sql_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count""".stripMargin,
    // TPC-H Q17 shape: small-quantity-order revenue — a correlated
    // scalar AVG threshold per part. The 0.2·AVG comparison is applied
    // as qty × 5 × count < sum with every operand an exact decimal or
    // integer (the s20/s23 integer-multiply trick), so the predicate
    // can never flip on a last-ULP average; the yearly average divides
    // identical doubles by 7.0 once at output.
    "s25_sql_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#13'
        |  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * (
        |    SELECT COUNT(*) FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey)
        |  < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(12,2)))
        |     FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    // TPC-H Q18 shape: large-volume orders — IN over a groupBy-HAVING
    // on the same fact table, then a three-table rollup keyed by the
    // qualifying orders. Quantity sums stay exact decimal, cast to
    // double once at output; o_orderdate is omitted from the output
    // (cross-engine date dtypes diverge — see the verify recipe).
    "s26_sql_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice""".stripMargin,
    // TPC-H Q20 shape: suppliers of excess stock — a two-level nested
    // IN chain (supplier ← qualifying lineitem group ← part name scan).
    // The driver schema has no partsupp; lineitem is the part↔supplier
    // fact and the excess threshold is a per-supplier shipped-quantity
    // sum over the LIKE-selected parts, kept exact decimal.
    "s27_sql_excess_suppliers" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (
        |    SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        |  GROUP BY l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 2000)""".stripMargin,
    "s10_sql_corr_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    / COUNT(*)
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin,
    "s11_sql_in_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_nationkey = 3)""".stripMargin,
    "s12_sql_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,
    "s13_sql_having" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
        |GROUP BY o_orderstatus HAVING COUNT(*) > 1000""".stripMargin,
    "s14_sql_not_exists" ->
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_suppkey = s.s_suppkey
        |    AND l.l_quantity = 50 AND l.l_discount > 0.09)""".stripMargin,
    // TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact table —
    // suppliers who were the ONLY supplier with a returned item in a
    // finished multi-supplier order (receipt/commit dates are not in the
    // driver schema; returnflag carries the "at fault" role)
    "s16_sql_exists_pair" ->
      """SELECT l1.l_suppkey, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY l1.l_suppkey""".stripMargin,
    // TPC-H Q15 shape: aggregate view + equality against its own MAX —
    // the revenue sum is exact decimal cast once to double, so the
    // max-equality can never split on a ULP between engines
    "s18_sql_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2))
        |         - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin,
    // TPC-H Q2 shape: correlated minimum-cost supplier — for each
    // EUROPE-sourced part of one size, the supplier(s) hitting the
    // region-wide MINIMUM price, via a correlated scalar subquery that
    // re-joins the same supplier→nation→region chain. (The driver
    // schema has no partsupp; lineitem is the part↔supplier fact and
    // l_extendedprice its cost. The comparison is an EQUALITY against a
    // MIN of stored doubles — no arithmetic — so it cannot split on a
    // ULP between engines.)
    "s19_sql_min_cost_supplier" ->
      """SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name,
        |  l.l_extendedprice AS min_price
        |FROM part p, supplier s, nation n, region r, lineitem l
        |WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        |  AND s.s_nationkey = n.n_nationkey
        |  AND n.n_regionkey = r.r_regionkey
        |  AND r.r_name = 'EUROPE' AND p.p_size = 15
        |  AND l.l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p.p_partkey
        |      AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')""".stripMargin,
    // TPC-H Q11 shape: HAVING over a fraction of a grand total via an
    // uncorrelated scalar subquery — parts whose NATION_7-sourced value
    // exceeds 1/10000 of that nation's total. Both sides of the
    // comparison stay EXACT decimals (the fraction is applied as an
    // integer multiply on the left, never a decimal divide), so the
    // threshold can never flip on summation order; the reported value
    // is cast to double once at output.
    "s20_sql_value_fraction" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS part_value
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE n_name = 'NATION_7'
        |GROUP BY l_partkey
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * CAST(l_quantity AS DECIMAL(12,2))) * 10000 > (
        |  SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2))
        |      * CAST(l2.l_quantity AS DECIMAL(12,2)))
        |  FROM lineitem l2
        |  JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |  WHERE n2.n_name = 'NATION_7')""".stripMargin,
    "s15_sql_cte_window" ->
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, rk
        |FROM ranked WHERE rk <= 2""".stripMargin,
  )

  /** ANSI cases whose oracle needs engine-specific function spellings
    * (here: `date_format` vs `STRFTIME`) — (Spark SQL, DuckDB SQL).
    * s17 proves Spark 4's recursive CTE support end-to-end: a month
    * spine unfolded recursively from the data's own min/max, then a
    * left join that keeps empty months. */
  val ansiPairs: Map[String, (String, String)] = Map(
    // the recursion carries the stop bound as a COLUMN: a scalar
    // subquery in the step term would re-scan the fact table once per
    // iteration (measured 13.9 s → 1.8 s at sf0.1 for 80 months)
    "s17_sql_recursive_spine" -> (
      """WITH RECURSIVE months(m, hi) AS (
        |  SELECT CAST(DATE_TRUNC('MONTH', MIN(o_orderdate)) AS DATE),
        |    CAST(DATE_TRUNC('MONTH', MAX(o_orderdate)) AS DATE)
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE), hi FROM months
        |  WHERE m < hi)
        |SELECT date_format(m, 'yyyy-MM') AS month,
        |  COUNT(o_orderkey) AS n_orders
        |FROM months LEFT JOIN orders
        |  ON CAST(DATE_TRUNC('MONTH', o_orderdate) AS DATE) = m
        |GROUP BY m""".stripMargin,
      """WITH RECURSIVE months(m, hi) AS (
        |  SELECT CAST(DATE_TRUNC('month', MIN(o_orderdate)) AS DATE),
        |    CAST(DATE_TRUNC('month', MAX(o_orderdate)) AS DATE)
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months
        |  WHERE m < hi)
        |SELECT STRFTIME(m, '%Y-%m') AS month,
        |  COUNT(o_orderkey) AS n_orders
        |FROM months LEFT JOIN orders
        |  ON CAST(DATE_TRUNC('month', o_orderdate) AS DATE) = m
        |GROUP BY m""".stripMargin),
  )

  val queries: Map[String, Q] =
    cases.map { case (name, (dialectSql, _)) =>
      name -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        MiniSqlPlanner.run(s, d, dialectSql)): (String, Q)
    } ++ ansiCases.map { case (name, sql) =>
      name -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.sql.SparkSqlRunner.run(s, d, sql)): (String, Q)
    } ++ ansiPairs.map { case (name, (sparkSql, _)) =>
      name -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.sql.SparkSqlRunner.run(s, d, sparkSql)): (String, Q)
    }

  val oracleSql: Map[String, String] =
    cases.map { case (name, (_, oracle)) => name -> oracle } ++ ansiCases ++
      ansiPairs.map { case (name, (_, oracle)) => name -> oracle }
}
