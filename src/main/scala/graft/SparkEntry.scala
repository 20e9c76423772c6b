package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Every `queries` key has a matching DuckDB `oracleSql` entry with identical
  * column names, deterministic ordering and rounding (SURVEY.md §5).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Relational.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))
  }

  private def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => { GraftSession.tune(s); f(s, dir) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q2_filter_project" -> q((s, d) => Relational.filterProject(Tables.lineitem(s, d))),
    "q3_shipping_priority" -> q((s, d) =>
      Relational.shippingPriority(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q4_broadcast_join" -> q((s, d) => Relational.brandRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q5_local_supplier" -> q((s, d) =>
      Relational.localSupplierVolume(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
        Tables.supplier(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q6_forecast_revenue" -> q((s, d) => Relational.forecastRevenue(Tables.lineitem(s, d))),
    "q7_window_topk" -> q((s, d) => TopK.topOrdersPerCustomer(Tables.orders(s, d))),
    "q8_window_running" -> q((s, d) => Relational.customerRunningSpend(Tables.orders(s, d))),
    "q9_rollup" -> q((s, d) => Relational.returnsRollup(Tables.lineitem(s, d))),
    "q10_cube" -> q((s, d) => Relational.priorityCube(Tables.orders(s, d))),
    "q11_semi_join" -> q((s, d) => Relational.customersWithOpenOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q12_anti_join" -> q((s, d) => Relational.partsNeverShipped(Tables.part(s, d), Tables.lineitem(s, d))),
    "q13_scalar_subquery" -> q((s, d) => Relational.aboveAvgLineitems(Tables.lineitem(s, d))),
    "q14_conditional_agg" -> q((s, d) => Relational.priorityShipmentStats(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q15_distinct_agg" -> q((s, d) =>
      Relational.segmentDistinctParts(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q16_union_set" -> q((s, d) => Relational.highValueAccounts(Tables.customer(s, d), Tables.supplier(s, d))),
    "q17_sort_limit" -> q((s, d) => TopK.globalTopLineitems(Tables.lineitem(s, d))),
    "q18_asof_join" -> q((s, d) => AsofJoin.purchaseAfterSignup(Tables.events(s, d))),
    "q19_range_join" -> q((s, d) => RangeJoin.priceBands(s, Tables.lineitem(s, d))),
    "q20_approx_quantiles" -> q((s, d) => Relational.priceQuantiles(Tables.lineitem(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),4) AS sum_disc_price,
        | round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),4) AS sum_charge,
        | round(avg(l_quantity),6) AS avg_qty,
        | round(avg(l_extendedprice),6) AS avg_price,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
        |  AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | o_orderpriority,
        | round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q4_broadcast_join" ->
      """SELECT p_brand,
        | round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue,
        | count(*) AS line_count
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),4) AS revenue, count(*) AS line_count
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin,

    "q7_window_topk" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS o_totalprice, rk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q8_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | round(o_totalprice,2) AS o_totalprice,
        | round(sum(o_totalprice) OVER w_run, 4) AS running_spend,
        | round(avg(o_totalprice) OVER w_tr3, 6) AS moving_avg3,
        | round(coalesce(lag(o_totalprice,1) OVER w_ord, 0.0), 2) AS prev_price
        |FROM orders WHERE o_custkey < 200
        |WINDOW
        | w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        | w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        | w_tr3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q9_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_extendedprice),4) AS sum_price,
        | round(sum(l_quantity),4) AS sum_qty,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q10_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | round(sum(o_totalprice),4) AS sum_price, count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q11_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q12_anti_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01')
        |ORDER BY p_partkey""".stripMargin,

    "q13_scalar_subquery" ->
      """SELECT l_returnflag, count(*) AS n, round(avg(l_quantity),6) AS avg_qty
        |FROM lineitem
        |WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q14_conditional_agg" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
        | round(sum(l_extendedprice),4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q15_distinct_agg" ->
      """SELECT c_mktsegment,
        | count(DISTINCT l_partkey) AS distinct_parts,
        | count(DISTINCT o_orderkey) AS distinct_orders,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q16_union_set" ->
      """SELECT 'customer' AS kind, c_custkey AS acct_key, round(c_acctbal,2) AS acctbal
        |FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT 'supplier' AS kind, s_suppkey AS acct_key, round(s_acctbal,2) AS acctbal
        |FROM supplier WHERE s_acctbal > 9000
        |ORDER BY kind, acct_key""".stripMargin,

    "q17_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice,2) AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q18_asof_join" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
        | s.event_id AS signup_event_id,
        | epoch_ms(p.ts) - epoch_ms(s.ts) AS wait_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
        | ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,

    "q19_range_join" ->
      """SELECT band, count(*) AS n,
        | round(sum(l_extendedprice),4) AS sum_price,
        | round(avg(l_discount),6) AS avg_disc
        |FROM lineitem
        |JOIN (SELECT * FROM (VALUES
        |  ('B0',0.0,10000.0),('B1',10000.0,20000.0),('B2',20000.0,30000.0),('B3',30000.0,40000.0),
        |  ('B4',40000.0,50000.0),('B5',50000.0,60000.0),('B6',60000.0,70000.0),('B7',70000.0,80000.0))
        |  b(band, lo, hi)) bands
        | ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q20_approx_quantiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.25),4) AS p25,
        | round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.75),4) AS p75,
        | round(quantile_cont(l_extendedprice, 0.99),4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
