package graft.operators

import graft.plans.Checkpoints._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational query surface (SURVEY.md §2.1).
  *
  * Conventions shared with the DuckDB oracles (SURVEY.md §5): every result is
  * deterministically ordered, every computed column is explicitly aliased,
  * floating aggregates are rounded, integer aggregates are 64-bit, and dates
  * are surfaced as `yyyy-MM-dd` strings.
  *
  * Scale notes: fact tables (`lineitem`, `orders`) shuffle only on their
  * join/group keys; dimension sides are explicitly `broadcast()`. All
  * aggregates are algebraic (map-side partial agg). Final `orderBy` runs on
  * post-aggregation results that are orders of magnitude smaller than the
  * input, or is a distributed top-N (TakeOrderedAndProject).
  */
object Relational {

  private def tsLit(s: String) = lit(s).cast("timestamp")

  /** q1: TPC-H Q1-shape scan → groupBy multi-aggregate. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") < tsLit("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q2: selective scan — predicate + projection pushdown reach the parquet
    * reader (verified in RelationalSpec via the formatted plan). */
  def filterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
              col("l_shipdate") <  tsLit("1997-02-01") &&
              col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")

  /** q3: TPC-H Q3 shape — 3-way join, agg, order, limit. Customer dim is
    * broadcast; orders⋈lineitem shuffles on orderkey only. */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") > tsLit("1998-01-01"))
      .join(orders.filter(col("o_orderdate") < tsLit("1998-01-01")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .select(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** q4: broadcast hash join of the fact table to a small dimension. */
  def brandRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy("p_brand")

  /** q5: TPC-H Q5 shape — six-table join chain; all dims broadcast, single
    * fact-fact shuffle on orderkey. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                          supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders.filter(col("o_orderdate") >= tsLit("1996-01-01") &&
                          col("o_orderdate") <  tsLit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** q6: TPC-H Q6 shape — fully pushed selective scan, single-row aggregate,
    * zero joins, zero wide shuffles. */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
              col("l_shipdate") <  tsLit("1997-01-01") &&
              col("l_discount").between(0.02, 0.04) &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
           count(lit(1)).as("line_count"))

  /** q8: running/window aggregates per customer ordered by order date. */
  def customerRunningSpend(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trailing3 = w.rowsBetween(-2, Window.currentRow)
    orders
      .filter(col("o_custkey") < 200)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        round(sum(col("o_totalprice")).over(running), 4).as("running_spend"),
        round(avg(col("o_totalprice")).over(trailing3), 6).as("moving_avg3"),
        round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2).as("prev_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q9: ROLLUP hierarchical aggregation. */
  def returnsRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 4).as("sum_price"),
           round(sum(col("l_quantity")), 4).as("sum_qty"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** q10: CUBE aggregation over order status × priority. */
  def priorityCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 4).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** q11: LEFT SEMI join (EXISTS). */
  def customersWithOpenOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") === "O"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** q12: LEFT ANTI join (NOT EXISTS) — parts never shipped in 2001. */
  def partsNeverShipped(part: DataFrame, lineitem: DataFrame): DataFrame =
    part
      .join(lineitem.filter(col("l_shipdate") >= tsLit("2001-01-01")),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy("p_partkey")

  /** q13: scalar-subquery predicate (above-global-average filter).
    * Quantities are small integers so the avg threshold is bit-identical
    * across engines (exact integer sums < 2^53). */
  def aboveAvgLineitems(lineitem: DataFrame): DataFrame = {
    val threshold = lineitem.agg(avg(col("l_quantity")).as("t"))
    lineitem
      .join(broadcast(threshold))
      .filter(col("l_quantity") > col("t"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(avg(col("l_quantity")), 6).as("avg_qty"))
      .orderBy("l_returnflag")
  }

  /** q14: CASE-based conditional aggregation (TPC-H Q12 shape). */
  def priorityShipmentStats(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy("l_linestatus")

  /** q15: exact distinct-count aggregation per market segment. */
  def segmentDistinctParts(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("o_orderkey")).as("distinct_orders"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  /** q16: UNION ALL across heterogeneous branches with a shared shape. */
  def highValueAccounts(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val c = customer.filter(col("c_acctbal") > 9000)
      .select(lit("customer").as("kind"), col("c_custkey").as("acct_key"),
        round(col("c_acctbal"), 2).as("acctbal"))
    val s = supplier.filter(col("s_acctbal") > 9000)
      .select(lit("supplier").as("kind"), col("s_suppkey").as("acct_key"),
        round(col("s_acctbal"), 2).as("acctbal"))
    c.unionAll(s).orderBy("kind", "acct_key")
  }

  /** q20: exact interpolated percentiles per group (matches DuckDB
    * quantile_cont). One array-argument percentile aggregate — a single
    * per-group value map instead of four (4× less buffer merge work).
    * Scale paths, by requirement: approx → `approxPriceQuantiles` (q30,
    * mergeable t-digest sketch, bounded state); exact at quarter points →
    * `plans.QuarterQuantiles` over integer cents (two-pass bucketed
    * selection, bounded state; p99 is not a quarter point, hence the value
    * buffer stays the exact-arbitrary-p implementation here). */
  def priceQuantiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.99D))").as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"),
        round(element_at(col("ps"), 4), 4).as("p99"))
      .orderBy("l_returnflag")

  /** q21: PIVOT — returnflag rows × linestatus columns of revenue. */
  def returnStatusPivot(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4))
      .orderBy("l_returnflag")

  /** q22: correlated-subquery shape — lineitems priced at their part's
    * minimum (decorrelated into a broadcast min-join, which is exactly what
    * Catalyst does to the EXISTS/scalar-subquery form). */
  def cheapestLinePerPart(lineitem: DataFrame): DataFrame = {
    val mins = lineitem.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    lineitem.join(broadcast(mins),
        col("l_partkey") === col("mk") && col("l_extendedprice") === col("min_price"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        round(col("l_extendedprice"), 2).as("l_extendedprice"))
      .orderBy("l_partkey", "l_suppkey", "l_orderkey")
  }

  /** q23: the SQL front door — identical semantics whether built via the
    * DataFrame API or `spark.sql` over registered views. */
  def sqlNationYearRevenue(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    graft.tables.Tables.all.foreach { n =>
      // events needs the nanos-aware loader; plain parquet read would throw
      val df = if (n == "events") graft.tables.Tables.events(spark, dir)
               else graft.tables.Tables.load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    spark.sql(
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        | count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
        |FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY n_name, yr""".stripMargin)
  }

  /** q25: GROUPING SETS — per-flag and per-status marginals plus the grand
    * total in one aggregation pass (no union of groupBys), with grouping_id
    * disambiguating the null rows. */
  def flagStatusGroupingSets(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
           round(sum(col("l_extendedprice")), 4).as("sum_price"),
           count(lit(1)).as("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** q26: distribution window functions — quartile bucket, percent_rank and
    * cume_dist of each order inside its priority class. Bounded output via
    * custkey filter; all three functions share one window sort. */
  def priorityPriceDistribution(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"), col("o_orderkey"))
    orders
      .filter(col("o_custkey") < 100)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** q27: INTERSECT / EXCEPT set operators — customers active in both years
    * vs churned after year one. */
  def customerYearSets(orders: DataFrame): DataFrame = {
    def active(year: Int) =
      orders.filter(col("o_orderdate") >= tsLit(s"$year-01-01") &&
                    col("o_orderdate") < tsLit(s"${year + 1}-01-01"))
        .select(col("o_custkey"))
    val y1 = active(1996)
    val y2 = active(1997)
    val retained = y1.intersect(y2).select(lit("retained").as("cohort"), col("o_custkey"))
    val churned = y1.except(y2).select(lit("churned").as("cohort"), col("o_custkey"))
    retained.unionAll(churned).orderBy("cohort", "o_custkey")
  }

  /** q28: value-position window functions — first/last/2nd order price per
    * customer over the full partition frame. */
  def customerOrderEndpoints(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        round(first(col("o_totalprice")).over(w), 2).as("first_price"),
        round(last(col("o_totalprice")).over(w), 2).as("last_price"),
        round(nth_value(col("o_totalprice"), 2).over(w), 2).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q29: nested/array aggregation — per-customer sorted distinct order
    * years collected into an array (surfaced as a joined string so the
    * cross-engine hash compare sees a scalar). collect_set is
    * order-nondeterministic; array_sort makes the result canonical. */
  def customerYearArrays(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_custkey") < 200)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(array_sort(collect_set(year(col("o_orderdate")).cast("long"))), ",").as("years"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** q31: RANGE window frame — trailing-30-day spend per customer. The frame
    * is value-based (epoch-day bounds), not row-based: gaps in order dates
    * change which rows the frame holds, which ROWS BETWEEN cannot express. */
  def trailingSpend(orders: DataFrame, days: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_date(to_date(col("o_orderdate"))))
      .rangeBetween(-days, 0)
    orders
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(sum(col("o_totalprice")).over(w), 4).as("trailing_spend"),
        count(lit(1)).over(w).as("orders_in_window"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q32: statistical aggregate suite — Pearson correlation, sample
    * covariance/stddev/variance, and exact interpolated median per group.
    * Everything except median is algebraic (map-side partial + merge);
    * median is the one value-buffering aggregate here — scale paths:
    * approx_percentile (q30, mergeable sketch) or the bounded exact
    * `plans.QuarterQuantiles` over quantity quarter-units (the ev_dwell /
    * ev_conversion_time rewrite); kept native here because this operator's
    * spec is the engine-aggregate suite itself. */
  def priceStatistics(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        (round(corr(col("l_quantity"), col("l_extendedprice")), 6) + lit(0.0)).as("qty_price_corr"),
        (round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4) + lit(0.0)).as("qty_price_covar"),
        round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"),
        round(var_samp(col("l_discount")), 6).as("disc_var"),
        round(median(col("l_quantity")), 4).as("median_qty"))
      .orderBy("l_returnflag")

  /** q33: fuzzy string-similarity join — the distinct name domain self-joined
    * under a levenshtein edit-distance band. The distinct projection bounds
    * the quadratic factor to the value *dictionary* (names, not rows), which
    * stays small at any data scale, and the dictionary broadcasts. */
  def fuzzyNameMatch(part: DataFrame, maxDist: Int = 3): DataFrame = {
    val names = part.select(col("p_name")).distinct()
    names.select(col("p_name").as("name_a"))
      .join(broadcast(names.select(col("p_name").as("name_b"))),
        col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .orderBy("name_a", "name_b")
  }

  /** q34: LATERAL VIEW posexplode — tokens exploded with their positions,
    * two-level aggregation plus a per-position top-token window rank. The
    * window partitions by position (bounded key set after the maxPos
    * filter), so no global sort appears anywhere. */
  def tokenPositionStats(documents: DataFrame, maxPos: Int = 10): DataFrame = {
    val tok = documents
      .select(posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos0", "token")))
      .withColumn("pos", col("pos0").cast("long") + 1)
      .filter(col("pos") <= maxPos)
    val counts = tok.groupBy(col("pos"), col("token")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("pos")).orderBy(col("c").desc, col("token"))
    counts
      .withColumn("rk", row_number().over(w))
      .groupBy(col("pos"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        min(when(col("rk") === 1, col("token"))).as("top_token"),
        min(when(col("rk") === 1, col("c"))).as("top_n"))
      .orderBy("pos")
  }

  /** q35: ratio-to-report — each nation's share of global revenue. The
    * unpartitioned windows run over the 25-row post-aggregation table, not
    * the fact table; the fact scan shuffles once on the group key. */
  def nationRevenueShare(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    val rev = orders
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("o_totalprice")).as("rev"))
    rev.select(col("n_name"),
        round(col("rev"), 4).as("revenue"),
        round(col("rev") * 100.0 / sum(col("rev")).over(Window.partitionBy()), 6).as("share_pct"),
        rank().over(Window.orderBy(col("rev").desc, col("n_name"))).cast("long").as("rk"))
      .orderBy("rk", "n_name")
  }

  /** q36: LISTAGG / string_agg — the top-k customers by account balance per
    * market segment with their names joined in rank order. The window
    * partitions by segment (bounded key set) and the collect_list runs over
    * ≤ k rows per group after the rank filter, so list state is bounded. */
  def segmentTopNames(customer: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("c_mktsegment"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("rk"), col("c_name")))),
          x => x.getField("c_name")), ",").as("top_names"),
        round(sum(col("c_acctbal")), 4).as("top_bal"))
      .orderBy("c_mktsegment")
  }

  /** q37: gaps & islands — longest consecutive-day activity streak per user.
    * The classic `day − row_number` island key, computed per user (high-
    * cardinality partition key; no global window anywhere). */
  def activityStreaks(events: DataFrame): DataFrame = {
    val daily = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = daily
      .withColumn("grp", datediff(col("day"), lit("1970-01-01").cast("date")) - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("streak_days"), min(col("day")).as("start_day"))
    val best = Window.partitionBy(col("user_id"))
      .orderBy(col("streak_days").desc, col("start_day"))
    islands
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("streak_days").as("best_streak"),
        date_format(col("start_day"), "yyyy-MM-dd").as("streak_start"))
      .orderBy("user_id")
  }

  /** q38: histogram binning — fixed-width buckets over order value, one
    * map-side-combinable aggregation (the bucket id is arithmetic, so the
    * whole query is a single shuffle on a handful of bins). */
  def priceHistogram(orders: DataFrame, binWidth: Double = 20000.0): DataFrame =
    orders
      .groupBy((floor(col("o_totalprice") / binWidth) * binWidth.toLong).cast("long").as("bin_lo"))
      .agg(count(lit(1)).as("n_orders"),
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        round(sum(col("o_totalprice")), 4).as("sum_price"))
      .orderBy("bin_lo")

  /** q39: month-over-month growth — lag over the monthly revenue series.
    * The unpartitioned window runs over the ~80-row post-aggregation table,
    * never the fact table. */
  def monthlyGrowth(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy(col("month"))
    monthly
      .select(col("month"), round(col("rev"), 4).as("revenue"),
        round(col("rev") - lag(col("rev"), 1).over(w), 4).as("delta"),
        round((col("rev") / lag(col("rev"), 1).over(w) - 1.0) * 100.0, 6).as("growth_pct"))
      .orderBy("month")
  }

  /** q40: date-spine zero-fill — a generated month sequence crossed with the
    * nation dim, left-joined to monthly revenue so empty (nation, month)
    * cells surface as explicit zeros. The spine is generator-built (no table
    * scan) and broadcast; the fact side aggregates before the join. */
  def nationMonthSpine(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    val rev = orders
      .join(customer.select(col("c_custkey"), col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
    val bounds = orders.agg(
      date_trunc("month", min(col("o_orderdate"))).as("lo"),
      date_trunc("month", max(col("o_orderdate"))).as("hi"))
    val months = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("m"))
      .select(date_format(col("m"), "yyyy-MM").as("month"))
    val spine = months.crossJoin(nation.select(col("n_name")))
    broadcast(spine)
      .join(rev, Seq("n_name", "month"), "left")
      .select(col("n_name"), col("month"),
        round(coalesce(col("rev"), lit(0.0)), 4).as("revenue"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("n_name", "month")
  }

  /** q41: weighted aggregation — quantity-weighted mean unit price per brand
    * (sum(w·x)/sum(w), pure algebraic aggregates; part dim broadcast). */
  def brandWeightedPrice(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 6)
          .as("wavg_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) /
              sum(col("l_extendedprice")), 6).as("eff_price_ratio"),
        round(sum(col("l_quantity")), 4).as("total_qty"))
      .orderBy("p_brand")

  /** q42: regex extraction + aggregation — part names decomposed with
    * regexp_extract (codegen'd, stays inside WholeStageCodegen) and
    * re-aggregated per extracted noun. */
  def partNameComponents(part: DataFrame): DataFrame =
    part
      .withColumn("adjective", regexp_extract(col("p_name"), "^(\\w+) (\\w+)$", 1))
      .withColumn("noun", regexp_extract(col("p_name"), "^(\\w+) (\\w+)$", 2))
      .filter(col("noun") =!= "")
      .groupBy(col("noun"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("adjective")).as("n_adjectives"),
        round(avg(col("p_retailprice")), 6).as("avg_retail"))
      .orderBy("noun")

  /** q43: deterministic MODE — the busiest order month and the modal order
    * status per priority, with explicit tie-breaks (count desc, value asc)
    * instead of the engine-dependent built-in `mode`. Two grouped counts +
    * per-priority rank windows over the tiny (priority × month) table. */
  def priorityModes(orders: DataFrame): DataFrame = {
    def modeOf(dim: org.apache.spark.sql.Column, name: String) = {
      val counts = orders.groupBy(col("o_orderpriority"), dim.as(name))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("c").desc, col(name))
      counts.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("o_orderpriority"), col(name), col("c").as(s"${name}_n"))
    }
    modeOf(date_format(col("o_orderdate"), "yyyy-MM"), "mode_month")
      .join(modeOf(col("o_orderstatus"), "mode_status"), Seq("o_orderpriority"))
      .orderBy("o_orderpriority")
  }

  /** q44: two-level percent-of-parent — nation revenue as a share of its
    * region, and region as a share of the total, both windows running over
    * the 25-row post-aggregation table. */
  def regionNationShare(orders: DataFrame, customer: DataFrame,
                        nation: DataFrame, region: DataFrame): DataFrame = {
    val rev = orders
      .join(customer.select(col("c_custkey"), col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val wr = Window.partitionBy(col("r_name"))
    val wt = Window.partitionBy()
    rev.select(col("r_name"), col("n_name"),
        round(col("rev"), 4).as("revenue"),
        round(col("rev") * 100.0 / sum(col("rev")).over(wr), 6).as("pct_of_region"),
        round(sum(col("rev")).over(wr) * 100.0 / sum(col("rev")).over(wt), 6).as("region_pct_of_total"))
      .orderBy("r_name", "n_name")
  }

  /** q45: top-k WITH TIES — rank() (not row_number) keeps every month tied
    * at the boundary, the ANSI `FETCH FIRST k ROWS WITH TIES` semantics. */
  def busiestMonthsWithTies(orders: DataFrame, k: Int = 3): DataFrame = {
    val counts = orders.groupBy(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("n").desc)
    counts.withColumn("rk", rank().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("o_orderpriority"), col("month"), col("n"), col("rk"))
      .orderBy("o_orderpriority", "rk", "month")
  }

  /** q46: FILTER'd distinct aggregation — several conditional distinct
    * counts in one pass (count(DISTINCT CASE WHEN ...) on both engines;
    * Spark expands to one expand + one aggregate, still a single shuffle). */
  def yearlyDistinctCustomers(orders: DataFrame): DataFrame =
    orders
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        countDistinct(col("o_custkey")).as("customers"),
        countDistinct(when(col("o_orderpriority") === "1-URGENT", col("o_custkey"))).as("urgent_customers"),
        countDistinct(when(col("o_orderstatus") === "F", col("o_custkey"))).as("finished_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("order_year")

  /** Sketch-based quantiles for the 100 TB path — a log-linear (HDR-style,
    * [[graft.plans.CrossSketch]]) histogram sketch that is CROSS-ENGINE
    * DETERMINISTIC, so the DuckDB oracle recomputes the estimates
    * bit-for-bit (the GK `approx_percentile` this replaces was bound to
    * Spark's merge order and could only ever be envelope-checked).
    * Quantiles surfaced as scalar columns (not an array) so downstream
    * row-wise tooling needs no array handling.
    *
    * Mechanics: prices quantized to integer cents, bucketed by
    * (octave = floor(log₂) via the binary string, 32 linear sub-buckets
    * per octave) — pure integer arithmetic every engine computes
    * identically. Per flag the bucket histogram is EXACT (a count per
    * bucket), so the smallest bucket whose cumulative count reaches the
    * discrete target rank ⌈p·n⌉ PROVABLY contains the rank-t value; the
    * estimate is that bucket's midpoint, giving a guaranteed relative
    * error ≤ 1/(2·idx) ≤ 1/65 in the log-linear regime — `max_rel_halfwidth`
    * carries the realized bound and `within_bound` asserts, per quantile,
    * (halfwidth ≤ 1/(2·SubBuckets)) OR (the chosen bucket is a unit bucket,
    * where the estimate is exact to half a cent — the small-value regime).
    * Target ranks use ⌈num·n/den⌉ in integer arithmetic — no float
    * boundary can flip a rank.
    *
    * Scale contract: sketch state is the (flag, oct, idx) histogram —
    * ≤ ~32·octaves rows per flag, constant in row count, merged map-side;
    * the only window runs over that bounded per-flag histogram, never
    * over data. This is the documented scale twin of q20's exact
    * value-buffering percentile (and of the exact bounded-state
    * `plans.QuarterQuantiles` at quarter points). */
  def approxPriceQuantiles(lineitem: DataFrame): DataFrame = {
    import graft.plans.CrossSketch.{SubBucketBits, SubBuckets}
    val ps = Seq(("p25", 25), ("p50", 50), ("p75", 75), ("p99", 99))
    val hist = lineitem
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn("oct", length(bin(col("cents"))) - lit(1))
      // sub-2^s values get exact unit buckets (shift 0) — the HDR small-
      // value regime; keeps shiftright's bit count non-negative
      .withColumn("sh", greatest(col("oct") - lit(SubBucketBits), lit(0)))
      .withColumn("idx", expr("shiftright(cents, sh)"))
      .groupBy(col("l_returnflag"), col("oct"), col("sh"), col("idx"))
      .agg(count(lit(1)).as("cnt"))
    // bounded windows: ≤ 32·octaves histogram rows per flag
    val byBucket = Window.partitionBy("l_returnflag").orderBy("oct", "idx")
    val perFlag = Window.partitionBy("l_returnflag")
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(byBucket))
      .withColumn("n", sum(col("cnt")).over(perFlag))
      .withColumn("mid", expr("shiftleft(2 * idx + 1, sh)") / lit(200.0))
      .withColumn("lo", expr("shiftleft(idx, sh)"))
      .withColumn("hi", expr("shiftleft(idx + 1, sh)"))
    def t(num: Int) = expr(s"($num * n + 99) DIV 100")
    val qCols = ps.map { case (name, num) =>
      round(min(when(col("cum") >= t(num), col("mid"))), 4).as(name)
    }
    // realized guarantee: the chosen bucket's halfwidth over its midpoint,
    // (hi−lo)/(hi+lo) = 1/(2·idx+1); lo/hi are monotone so min() selects
    // the same bucket the estimate came from
    val relW = ps.map { case (_, num) =>
      (min(when(col("cum") >= t(num), col("hi"))) - min(when(col("cum") >= t(num), col("lo")))) * 1.0 /
        (min(when(col("cum") >= t(num), col("hi"))) + min(when(col("cum") >= t(num), col("lo"))))
    }.reduce((a, b) => greatest(a, b))
    // within_bound is PER-QUANTILE regime-aware: the 1/(2·SubBuckets) bound
    // only holds in the log-linear regime (idx >= SubBuckets); a sub-2^s
    // cents value lands in a unit bucket (hi−lo = 1) where the estimate is
    // exact to half a cent even though its RELATIVE halfwidth 1/(2c+1)
    // exceeds the bound — so a unit-bucket pick also satisfies the contract
    val okBound = ps.map { case (_, num) =>
      val hiQ = min(when(col("cum") >= t(num), col("hi")))
      val loQ = min(when(col("cum") >= t(num), col("lo")))
      ((hiQ - loQ) * lit(1.0) / (hiQ + loQ) <= lit(1.0 / (2 * SubBuckets))) or
        (hiQ - loQ === lit(1L))
    }.reduce(_ and _)
    cum.groupBy(col("l_returnflag"))
      .agg(qCols.head, qCols.tail ++ Seq(
        round(relW, 6).as("max_rel_halfwidth"), okBound.as("within_bound")): _*)
      .orderBy("l_returnflag")
  }

  /** q47: reproducible hash sampling (TABLESAMPLE you can re-run): a
    * multiplicative hash of the key picks a fixed pseudo-random 1000-bucket
    * slice, so the same rows are sampled on every engine and every run — no
    * RNG, no seed drift. Per priority: population vs sample counts and means
    * (the estimator-quality report). The key is pre-reduced mod 1000003 so
    * the product stays far from Long overflow at any conceivable key range. */
  def hashSample(orders: DataFrame, keepBuckets: Int = 125): DataFrame =
    orders
      .withColumn("bucket", (col("o_orderkey") % 1000003L) * 2654435761L % 1000L)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_pop"),
        sum(when(col("bucket") < keepBuckets, 1L).otherwise(0L)).as("n_sample"),
        round(avg(col("o_totalprice")), 4).as("pop_avg_price"),
        round(avg(when(col("bucket") < keepBuckets, col("o_totalprice"))), 4).as("sample_avg_price"))
      .withColumn("sample_pct", round(col("n_sample") * 100.0 / col("n_pop"), 4))
      .orderBy("o_orderpriority")

  /** q48: skyline / Pareto frontier — parts that are not dominated on
    * (cheaper price, larger size). Reduced first to per-size minima (≤ the
    * size domain, trivially small), so the frontier window never sees the
    * fact table: the O(n²) dominance self-join becomes one groupBy plus a
    * running min over a bounded dimension table. */
  def priceSizeSkyline(part: DataFrame): DataFrame = {
    val perSize = part.groupBy(col("p_size")).agg(min(col("p_retailprice")).as("min_price"))
    val wLarger = Window.orderBy(col("p_size").desc).rowsBetween(Window.unboundedPreceding, -1)
    perSize
      .withColumn("best_larger", min(col("min_price")).over(wLarger))
      .filter(col("best_larger").isNull || col("min_price") < col("best_larger"))
      .select(col("p_size"), round(col("min_price"), 4).as("skyline_price"))
      .orderBy("p_size")
  }

  /** q49: Spearman rank correlation of price vs quantity per return flag.
    * Quantity ranks come from the tiny distinct-value table (min-rank = 1 +
    * running count of smaller values, ≤ flags × qty domain) and broadcast-
    * join back; price ranks are one rank() window — a single fact shuffle
    * total. The per-flag window sort is the low-cardinality caveat: at
    * 100 TB the price side becomes a two-phase rank (range-partition within
    * flag, local rank + per-range offsets), same semantics. */
  def spearmanPriceQty(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
    val wq = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val qtyRanks = base.groupBy(col("l_returnflag"), col("l_quantity")).agg(count(lit(1)).as("c"))
      .withColumn("rq", (coalesce(sum(col("c")).over(wq), lit(0L)) + 1L).cast("double"))
      .drop("c")
    val wp = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    base
      .join(broadcast(qtyRanks), Seq("l_returnflag", "l_quantity"))
      .withColumn("rp", rank().over(wp).cast("double"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), (round(corr(col("rp"), col("rq")), 6) + lit(0.0)).as("spearman_rho"))
      .orderBy("l_returnflag")
  }

  /** q50: chi-square independence test for returnflag × linestatus. One
    * map-side-combinable count per cell; the margins and the statistic are
    * windows/aggregates over the contingency table itself (a handful of
    * rows), so nothing after the first shuffle touches fact-table volume. */
  def flagStatusChiSq(lineitem: DataFrame): DataFrame = {
    val obs = lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("o"))
    val expected = obs
      .withColumn("row_tot", sum(col("o")).over(Window.partitionBy(col("l_returnflag"))))
      .withColumn("col_tot", sum(col("o")).over(Window.partitionBy(col("l_linestatus"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .withColumn("e", col("row_tot") * col("col_tot") / col("n"))
    expected.agg(
        max(col("n")).as("n"),
        count(lit(1)).as("cells"),
        ((countDistinct(col("l_returnflag")) - 1) * (countDistinct(col("l_linestatus")) - 1)).as("dof"),
        round(sum(pow(col("o") - col("e"), 2) / col("e")), 6).as("chi2"))
  }

  /** q51: strict ordered funnel (MATCH_RECOGNIZE shape): first signup, then
    * first click strictly after it, then first purchase strictly after that
    * — three conditional-min stages, each one user-keyed aggregation +
    * broadcast-size join; no per-user event sorting, no session windows. */
  def strictFunnel(events: DataFrame): DataFrame = {
    // s1/s2 each feed the next stage AND their own count branch — cut both
    // so each fact scan+agg runs once (user-grain).
    val s1 = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .stableCheckpoint()
    val s2 = events.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      .stableCheckpoint()
    val s3 = events.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.agg(count(lit(1)).as("users")).select(lit("1_signup").as("stage"), col("users"))
      .unionAll(s2.agg(count(lit(1)).as("users")).select(lit("2_click_after").as("stage"), col("users")))
      .unionAll(s3.agg(count(lit(1)).as("users")).select(lit("3_purchase_after").as("stage"), col("users")))
      .orderBy("stage")
  }

  /** q61: equi-height histogram — bucket edges from exact quartiles (one
    * fused percentile aggregate), rows assigned by comparing against the
    * broadcast edge row; complements q38's fixed-width binning. Per bucket
    * ≈ n/4 rows by construction, which is the property a CBO wants from
    * height-balanced stats. The quartile edges are exactly the quarter
    * points `plans.QuarterQuantiles` computes with bounded state over
    * integer cents — the drop-in at 10⁹+ rows; the native percentile stays
    * here for the oracle-exact interpolated edges on raw doubles. */
  def priceEquiHeightHistogram(orders: DataFrame): DataFrame = {
    val edges = orders.agg(
      expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))").as("qs"))
      .select(element_at(col("qs"), 1).as("q1"), element_at(col("qs"), 2).as("q2"),
        element_at(col("qs"), 3).as("q3"))
    orders.crossJoin(broadcast(edges))
      .withColumn("bucket",
        when(col("o_totalprice") <= col("q1"), 1L)
          .when(col("o_totalprice") <= col("q2"), 2L)
          .when(col("o_totalprice") <= col("q3"), 3L)
          .otherwise(4L))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy("bucket")
  }

  /** q62: join-key skew diagnosis — the pre-join report that decides
    * whether a key needs salting: NDV, the heaviest key's share, and the
    * max/mean frequency ratio, for each candidate join key. Each column is
    * one map-side-combinable frequency aggregation; the per-key tables
    * collapse to one diagnostic row each. */
  def joinSkewReport(lineitem: DataFrame): DataFrame = {
    def forKey(keyCol: String): DataFrame =
      lineitem.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("f"))
        .agg(count(lit(1)).as("ndv"), sum(col("f")).as("n_rows"),
          max(col("f")).as("max_freq"))
        .select(lit(keyCol).as("join_key"), col("ndv"), col("n_rows"), col("max_freq"),
          round(col("max_freq") * 100.0 / col("n_rows"), 6).as("top_key_pct"),
          round(col("max_freq") * col("ndv") * 1.0 / col("n_rows"), 6).as("skew_factor"))
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(forKey)
      .reduce(_ unionAll _).orderBy("join_key")
  }

  /** q60: ML feature scaling — min-max and z-score normalisation of order
    * totals per priority group. Group stats are one aggregation broadcast
    * back onto the rows (the fit/transform split of a feature pipeline);
    * constant groups (max = min, σ = 0) scale to NULL rather than dividing
    * by zero. Row-level output: the shape a trainer consumes. */
  def featureScaling(orders: DataFrame): DataFrame = {
    val stats = orders.groupBy(col("o_orderpriority"))
      .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"),
        avg(col("o_totalprice")).as("mu"), stddev_pop(col("o_totalprice")).as("sigma"))
    orders
      .join(broadcast(stats), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        when(col("hi") > col("lo"),
          round((col("o_totalprice") - col("lo")) / (col("hi") - col("lo")), 6)).as("minmax"),
        when(col("sigma") > 0.0,
          round((col("o_totalprice") - col("mu")) / col("sigma"), 6)).as("zscore"))
      .orderBy("o_orderkey")
  }

  /** q58: discrete percentiles (percentile_disc semantics: the smallest
    * actual value whose cumulative frequency reaches p) — computed on the
    * distinct-value frequency table, so the cumulative window is
    * NDV-bounded, and spelled out identically in the oracle (no reliance on
    * engine-specific disc-interpolation conventions). */
  def quantityDiscQuartiles(lineitem: DataFrame): DataFrame = {
    val freq = lineitem.groupBy(col("l_returnflag"), col("l_quantity")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(col("l_returnflag"))
    freq
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wTot))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cum") >= col("tot") * 0.25, col("l_quantity"))).as("p25_disc"),
        min(when(col("cum") >= col("tot") * 0.5, col("l_quantity"))).as("p50_disc"),
        min(when(col("cum") >= col("tot") * 0.75, col("l_quantity"))).as("p75_disc"),
        max(col("tot")).as("n"))
      .orderBy("l_returnflag")
  }

  /** q59: customer-growth accounting — new vs cumulative distinct customers
    * per month. Each customer contributes at their *first* month (one
    * user-keyed aggregation), so the cumulative curve is a running sum over
    * the bounded month spine — never a cumulative COUNT DISTINCT. */
  def customerGrowth(orders: DataFrame): DataFrame = {
    val withMonth = orders.withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    val monthly = withMonth.groupBy(col("month")).agg(count(lit(1)).as("n_orders"))
    val firstMonth = withMonth.groupBy(col("o_custkey")).agg(min(col("month")).as("month"))
      .groupBy(col("month")).agg(count(lit(1)).as("new_customers"))
    val wRun = Window.orderBy(col("month")).rowsBetween(Window.unboundedPreceding, 0)
    monthly.join(firstMonth, Seq("month"), "left")
      .withColumn("new_customers", coalesce(col("new_customers"), lit(0L)))
      .withColumn("cum_customers", sum(col("new_customers")).over(wRun))
      .orderBy("month")
  }

  /** q55: market-basket association — brand pairs co-purchased in one
    * order, scored by lift P(ab)/(P(a)P(b)). The pair join runs on the
    * per-order distinct-brand table (≲ brands per order squared, never the
    * fact table squared); brand marginals broadcast. Counts are exact
    * integers so lift is bit-identical across engines. */
  def marketBasket(lineitem: DataFrame, part: DataFrame,
                   minSupport: Long = 5L, topN: Int = 20): DataFrame = {
    // One shuffle to order grain: each order's sorted distinct-brand set is
    // materialised once, and pairs come from an in-line combination
    // generator over that (≤ brands-per-order²) array — no self-join of the
    // order-brand table, no second shuffle of fact-derived rows.
    val orderBrands = lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("p_brand"))).as("bs"))
      .stableCheckpoint()
    val nOrders = orderBrands.count()
    val brandCounts = orderBrands.select(explode(col("bs")).as("p_brand"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_b"))
    val pairs = orderBrands
      .select(explode(expr(
        "flatten(transform(bs, (x, i) -> transform(slice(bs, i + 2, size(bs)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minSupport)
    pairs
      .join(broadcast(brandCounts.withColumnRenamed("p_brand", "brand_a").withColumnRenamed("n_b", "n_a")), "brand_a")
      .join(broadcast(brandCounts.withColumnRenamed("p_brand", "brand_b")), "brand_b")
      .withColumn("support_pct", round(col("n_co") * 100.0 / nOrders, 4))
      .withColumn("lift", round(col("n_co") * nOrders.toDouble / (col("n_a") * col("n_b")), 6))
      .select(col("brand_a"), col("brand_b"), col("n_co"), col("support_pct"), col("lift"))
      .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
      .limit(topN)
  }

  /** Twice the exact interpolated median (v@floor((n+1)/2) + v@ceil((n+1)/2))
    * of an integer-valued column, per flag, via the classic two-pass
    * distributed selection: (1) a coarse `bucketWidth`-wide histogram (one
    * map-side-combinable aggregation — thousands of buckets, not data rows),
    * whose cumulative counts locate the bucket holding each target rank;
    * (2) a rescan of ONLY the straddling bucket's rows (broadcast semi-join)
    * to pick the exact rank inside it. Bounded state everywhere, no sort of
    * the data, works identically when the value domain is near-unique —
    * where a distinct-value frequency table degenerates back into the fact
    * table. k1 == k2 (odd n) is handled by weighting, not duplicating. */
  private def kthMedian2(base: DataFrame, vcol: String, out: String,
                         bucketWidth: Long = 1000L): DataFrame = {
    val hist = base
      .groupBy(col("l_returnflag"), expr(s"$vcol div $bucketWidth").as("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // tot rides the same (tiny) histogram through a second window column —
    // no extra aggregation job, no extra broadcast join.
    val wAll = Window.partitionBy(col("l_returnflag"))
    val targets = hist
      .withColumn("before", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .withColumn("tot", sum(col("cnt")).over(wAll))
      .select(col("l_returnflag").as("tflag"), col("bkt"), col("before"), col("cnt"),
        explode(array(expr("(tot + 1) div 2"), expr("(tot + 2) div 2"))).as("k"))
      .filter(col("before") < col("k") && col("before") + col("cnt") >= col("k"))
      .groupBy(col("tflag"), col("bkt"), col("before"), col("k"))
      .agg(count(lit(1)).as("wgt"))
    val inBucket = base.join(broadcast(targets),
      col("l_returnflag") === col("tflag") && expr(s"$vcol div $bucketWidth") === col("bkt"))
    val wIn = Window.partitionBy(col("l_returnflag"), col("k")).orderBy(col(vcol))
      .rowsBetween(Window.unboundedPreceding, 0)
    inBucket
      .groupBy(col("l_returnflag"), col("k"), col("wgt"), col("before"), col(vcol))
      .agg(count(lit(1)).as("c"))
      .withColumn("cumin", sum(col("c")).over(wIn))
      .groupBy(col("l_returnflag"), col("k"), col("wgt"))
      .agg(min(when(col("before") + col("cumin") >= col("k"), col(vcol))).as("vk"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("vk") * col("wgt")).as(out))
  }

  /** q56: robust outlier detection via MAD (median absolute deviation) —
    * per flag: the 3σ-equivalent 3·1.4826·MAD fence and the rows outside
    * it. Prices are quantized to integer cents, so both medians are *exact*
    * (interpolated, ×2 to stay integral) yet computed by two-pass bucketed
    * selection (see kthMedian2) — no ObjectHashAggregate buffering every
    * group value, no global sort; every shuffle in the plan is a
    * map-side-combined histogram or a broadcast. The fence compare is
    * integer × the 1.4826 constant on both engines, so the boundary is
    * bit-deterministic. */
  def madOutliers(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("pc"))
      .stableCheckpoint()
    val med = kthMedian2(base, "pc", "med2")
    val dev = base.join(broadcast(med), "l_returnflag")
      .withColumn("dev2", abs(col("pc") * 2 - col("med2")))
      .stableCheckpoint()
    val mad = kthMedian2(dev, "dev2", "mad4")
    dev
      .join(broadcast(mad), "l_returnflag")
      .withColumn("outlier", col("dev2") * 2 > lit(3.0 * 1.4826) * col("mad4"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med2")) / 200.0, 4).as("median_price"),
        round(max(col("mad4")) / 400.0, 4).as("mad"),
        sum(when(col("outlier"), 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_pct", round(col("n_outliers") * 100.0 / col("n"), 4))
      .orderBy("l_returnflag")
  }

  /** q63: Pareto / ABC contribution analysis — how many parts carry 50/80/
    * 90/95% of revenue. Revenue is exact integer cents per part; the
    * descending cumulative runs through the two-phase distributed prefix sum
    * (plans.PrefixSum — ordered by negated revenue, no single-partition
    * sort), which is exactly the shape this query needs when the "part"
    * dictionary is 200M skus instead of 20k. Threshold accounting is pure
    * integer compares (cum·100 vs t·total), so tie order inside equal
    * revenues cannot change any count. */
  def paretoRevenue(lineitem: DataFrame, thresholds: Seq[Long] = Seq(50L, 80L, 90L, 95L)): DataFrame = {
    // rev is the query's one fact-table aggregation and feeds two branches
    // (the prefix sum and the totals scalar) — cut it so the lineitem
    // scan+groupBy runs once (part-grain, bounded).
    val rev = lineitem.groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("rev_c"))
      .withColumn("negrev", -col("rev_c"))
      .stableCheckpoint()
    val cum = graft.plans.PrefixSum.prefixSum(rev, "negrev", "rev_c", "cum_c")
    val tot = rev.agg(sum(col("rev_c")).as("tot_c"), count(lit(1)).as("n_parts_total"))
    cum.crossJoin(broadcast(tot))
      .select(col("cum_c"), col("tot_c"), col("n_parts_total"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        (sum(when(col("cum_c") * 100 < col("threshold") * col("tot_c"), 1L).otherwise(0L)) + 1L).as("n_parts"),
        max(col("n_parts_total")).as("n_parts_total"),
        round(min(when(col("cum_c") * 100 >= col("threshold") * col("tot_c"), col("cum_c"))) * 100.0
          / max(col("tot_c")), 4).as("covered_pct"))
      .withColumn("pct_of_parts", round(col("n_parts") * 100.0 / col("n_parts_total"), 4))
      .orderBy("threshold")
  }

  /** q54: SCD2 (slowly-changing-dimension) temporal join — each fact row
    * joins the dimension *version* valid at its event date. Versions are
    * derived deterministically (3 eras per supplier with an era-specific
    * rate); the versioned dim is still dim-sized × versions, so it
    * broadcasts and each fact row matches exactly one validity window —
    * a broadcast range join, no fact-side shuffle before the final agg. */
  def scd2SupplierJoin(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val eras = Seq(("1_era95", "1995-01-01", "1997-01-01"),
                   ("2_era97", "1997-01-01", "1999-01-01"),
                   ("3_era99", "1999-01-01", "9999-12-31"))
    val versions = supplier
      .select(col("s_suppkey"), explode(expr(s"array(${eras.map { case (e, f, t) =>
        s"struct('$e' AS era, '$f' AS vfrom, '$t' AS vto)" }.mkString(", ")})")).as("v"))
      .select(col("s_suppkey"), col("v.era").as("era"),
        col("v.vfrom").cast("timestamp").as("vfrom"), col("v.vto").cast("timestamp").as("vto"))
      .withColumn("rate", (col("s_suppkey") * 7 +
        substring(col("era"), 1, 1).cast("long")) % 5 + 1)
    lineitem
      .join(broadcast(versions),
        col("l_suppkey") === col("s_suppkey") &&
        col("l_shipdate") >= col("vfrom") && col("l_shipdate") < col("vto"))
      .groupBy(col("era"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        round(sum(col("l_extendedprice") * col("rate") / 100.0), 4).as("rated_revenue"))
      .orderBy("era")
  }

  /** q53: UNPIVOT — the wide conditional-agg table (status columns per
    * year) stacked back to long format with `stack()` (codegen'd generator,
    * one pass; the inverse of q21's PIVOT). */
  def yearStatusUnpivot(orders: DataFrame): DataFrame =
    orders
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))), 4).as("rev_f"),
        round(sum(when(col("o_orderstatus") === "O", col("o_totalprice"))), 4).as("rev_o"),
        round(sum(when(col("o_orderstatus") === "P", col("o_totalprice"))), 4).as("rev_p"))
      .select(col("order_year"),
        expr("stack(3, 'F', rev_f, 'O', rev_o, 'P', rev_p) AS (o_orderstatus, revenue)"))
      .filter(col("revenue").isNotNull)
      .orderBy("order_year", "o_orderstatus")

  /** q52: interval-overlap concurrency — how many orders are simultaneously
    * "active" (open for `activeDays`). Classic +1/−1 sweep: per-day net
    * deltas (one shuffle on day), then a running sum over the *day spine*
    * (thousands of rows for years of data — bounded, documented global
    * window), rolled up to monthly peaks. Never materialises pairs. */
  def orderConcurrency(orders: DataFrame, activeDays: Int = 7): DataFrame = {
    val deltas = orders.select(to_date(col("o_orderdate")).as("day"), lit(1L).as("delta"))
      .unionAll(orders.select(date_add(to_date(col("o_orderdate")), activeDays).as("day"), lit(-1L).as("delta")))
    val daily = deltas.groupBy(col("day")).agg(sum(col("delta")).as("net"))
    val wRun = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("active", sum(col("net")).over(wRun))
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"))
      .agg(max(col("active")).as("peak_active"), round(avg(col("active")), 4).as("avg_active"))
      .orderBy("month")
  }

  /** q64: Benford first-digit screen — the leading-digit distribution of
    * order totals against Benford's law, a standard data-quality / fraud
    * filter over financial facts. The first digit comes from the *decimal
    * string of the exact integer cents* (no `log10` on doubles, whose
    * last-ulp platform differences could flip a digit at powers of ten);
    * expected percentages are Scala-side constants injected into both
    * engines, so the only data-dependent math is exact integer counting.
    * One map-side-combinable groupBy over a 9-row domain plus a broadcast
    * total — nothing here changes shape at 100 TB. */
  def benfordScreen(orders: DataFrame): DataFrame = {
    val expected = (1 to 9).map(dd => dd.toLong -> math.log10(1.0 + 1.0 / dd) * 100.0).toMap
    val expCol = (1 to 9).foldLeft(lit(0.0)) { (acc, dd) =>
      when(col("digit") === dd.toLong, lit(expected(dd.toLong))).otherwise(acc)
    }
    val counts = orders
      .select(substring(round(col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    val tot = counts.agg(sum(col("n_orders")).as("n_total"))
    counts.crossJoin(broadcast(tot))
      .withColumn("obs_pct", round(col("n_orders") * 100.0 / col("n_total"), 4))
      .withColumn("exp_pct", round(expCol, 4))
      .withColumn("deviation", round(col("obs_pct") - col("exp_pct"), 4))
      .withColumn("chi2_contrib",
        round(pow(col("obs_pct") - col("exp_pct"), 2) / col("exp_pct"), 6))
      .select("digit", "n_orders", "obs_pct", "exp_pct", "deviation", "chi2_contrib")
      .orderBy("digit")
  }

  /** q65: Gini concentration of customer revenue — the inequality summary a
    * marketplace runs to know how top-heavy its demand is. Ascending revenue
    * ranks come from the two-phase distributed prefix sum (count-of-ones
    * ordered by exact integer cents — no single-partition `Window.orderBy`;
    * `plans.PrefixSum` spreads the sort over 32 key-range buckets, the same
    * plan that ranks 100M customers on a real cluster). The Gini sum
    * `Σ rank·rev` and the top-1%/top-10% cutoffs are tie-invariant: rows
    * with equal revenue contribute `rev·Σrank` whatever their relative
    * order, so the arbitrary tie order inside both engines cannot move any
    * output. Integer headroom: `Σ rank·rev_c` ≈ n²·avg_cents/2, which
    * outgrows a signed 64-bit near ~100M customers × $10k lifetime revenue
    * (n²·avg/2 ≈ 5e21 at 1B × $10k vs int64 max 9.2e18) — so the rank is
    * cast to decimal(38,0) BEFORE the multiply: the whole rank·rev term and
    * its sum stay decimal end to end (no transient int64 product), matching
    * DuckDB's int128; the division to double happens once, on the sums. */
  def giniRevenue(orders: DataFrame): DataFrame = {
    val rev = orders.groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_c"))
      .withColumn("one", lit(1L))
    // ranked feeds the totals scalar and the main aggregate — cut it so
    // the bucketed prefix-sum subtree runs once (customer-grain, bounded).
    val ranked = graft.plans.PrefixSum.prefixSum(rev, "rev_c", "one", "rk")
      .stableCheckpoint()
    val tot = ranked.agg(count(lit(1)).as("n"), sum(col("rev_c")).as("tot_c"))
    ranked.crossJoin(broadcast(tot))
      .agg(
        max(col("n")).as("n_customers"),
        round(sum(col("rk").cast("decimal(38,0)") * col("rev_c")).cast("double") * 2.0
            / (max(col("n")) * 1.0 * max(col("tot_c")))
          - (max(col("n")) + 1.0) / max(col("n")), 6).as("gini"),
        round(sum(when(col("rk") > col("n") - floor(col("n") / 100), col("rev_c")).otherwise(0L))
          * 100.0 / max(col("tot_c")), 4).as("top1_share_pct"),
        round(sum(when(col("rk") > col("n") - floor(col("n") / 10), col("rev_c")).otherwise(0L))
          * 100.0 / max(col("tot_c")), 4).as("top10_share_pct"))
  }

  /** q66: decile gains/lift table — customers ranked by revenue, bucketed
    * into ten equal-count deciles, each decile's revenue share, cumulative
    * share and lift over the average customer. The campaign-targeting report
    * every CRM pulls; also the discrete companion of q65's Gini. Descending
    * ranks come from the same two-phase prefix sum (count-of-ones over
    * negated cents — no global sort); decile membership is pure integer
    * arithmetic on the rank, so revenue ties straddling a boundary cannot
    * move any decile total (tied rows are interchangeable). The cumulative
    * runs over the ten-row decile table. */
  def decileLift(orders: DataFrame): DataFrame = {
    val rev = orders.groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_c"))
      .withColumn("negrev", -col("rev_c"))
      .withColumn("one", lit(1L))
    // ranked feeds the totals scalar and the decile aggregate — cut it so
    // the bucketed prefix-sum subtree runs once (customer-grain, bounded).
    val ranked = graft.plans.PrefixSum.prefixSum(rev, "negrev", "one", "rk")
      .stableCheckpoint()
    val tot = ranked.agg(count(lit(1)).as("n"), sum(col("rev_c")).as("tot_c"))
    val dec = ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr("((rk - 1) * 10) div n") + 1L)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev_c")).as("decile_rev_c"),
        max(col("tot_c")).as("tot_c"), max(col("n")).as("n_total"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow) // ≤ 10 rows
    dec.withColumn("cum_rev_c", sum(col("decile_rev_c")).over(wCum))
      .select(col("decile"), col("n_customers"),
        round(col("decile_rev_c") * 100.0 / col("tot_c"), 4).as("share_pct"),
        round(col("cum_rev_c") * 100.0 / col("tot_c"), 4).as("cum_share_pct"),
        round(col("decile_rev_c") * col("n_total") * 1.0 / (col("tot_c") * col("n_customers")), 4).as("lift"))
      .orderBy("decile")
  }

  /** q68: month-over-month revenue bridge — each month's revenue delta
    * decomposed into NEW (customers absent last month), CHURNED (present
    * last month, gone now), EXPANSION and CONTRACTION (present both,
    * spending more/less). The board-deck waterfall, with the telescoping
    * invariant new − churned + expansion − contraction = Δrevenue held in
    * exact integer cents. One (customer, month) aggregate, self-joined on
    * the customer key one month apart (full outer, so both absences
    * classify) — customer-key partitioned all the way, no windows. */
  def revenueBridge(orders: DataFrame): DataFrame = {
    val cm = orders.groupBy(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_c"))
    val prev = cm.select(col("o_custkey").as("p_custkey"),
      date_format(add_months(to_date(concat(col("month"), lit("-01"))), 1), "yyyy-MM").as("p_next"),
      col("rev_c").as("prev_rev_c"))
    val cur = cm.select(col("o_custkey"), col("month"), col("rev_c"))
    cur.join(prev, col("o_custkey") === col("p_custkey") && col("month") === col("p_next"), "full_outer")
      .withColumn("bridge_month", coalesce(col("month"), col("p_next")))
      .withColumn("cur_c", coalesce(col("rev_c"), lit(0L)))
      .withColumn("prev_c", coalesce(col("prev_rev_c"), lit(0L)))
      .groupBy(col("bridge_month"))
      .agg(
        sum(when(col("prev_rev_c").isNull, col("cur_c")).otherwise(0L)).as("new_c"),
        sum(when(col("rev_c").isNull, col("prev_c")).otherwise(0L)).as("churned_c"),
        sum(when(col("rev_c").isNotNull && col("prev_rev_c").isNotNull && col("cur_c") > col("prev_c"),
          col("cur_c") - col("prev_c")).otherwise(0L)).as("expansion_c"),
        sum(when(col("rev_c").isNotNull && col("prev_rev_c").isNotNull && col("cur_c") < col("prev_c"),
          col("prev_c") - col("cur_c")).otherwise(0L)).as("contraction_c"))
      .withColumn("net_change_c",
        col("new_c") - col("churned_c") + col("expansion_c") - col("contraction_c"))
      .select("bridge_month", "new_c", "churned_c", "expansion_c", "contraction_c", "net_change_c")
      .orderBy("bridge_month")
  }

  /** q67: reorder cadence per market segment — the gap in days between a
    * customer's consecutive orders, aggregated by segment: how fast each
    * segment comes back, the replenishment metric CRM forecasting feeds
    * on. One customer-key window (high cardinality — the same partitioned
    * lag shape as sessionize) and one segment aggregate; gaps are exact
    * integer days, so min/max/avg agree bit-for-bit with the oracle. */
  def reorderCadence(customer: DataFrame, orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = orders
      .withColumn("prev_d", lag(to_date(col("o_orderdate")), 1).over(w))
      .filter(col("prev_d").isNotNull)
      .withColumn("gap_days", datediff(to_date(col("o_orderdate")), col("prev_d")).cast("long"))
    gaps
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("repeat_customers"),
        count(lit(1)).as("n_gaps"),
        min(col("gap_days")).as("min_gap_days"),
        max(col("gap_days")).as("max_gap_days"),
        round(avg(col("gap_days")), 4).as("avg_gap_days"))
      .orderBy("c_mktsegment")
  }

  /** q69: weighted discrete quantiles — the revenue-weighted p25/p50/p75 of
    * order size per return flag ("half the revenue ships in lines of ≤ q
    * units"), the weighted-median family every pricing/capacity analysis
    * leans on. Weights are exact integer cents summed on the
    * (flag, quantity) frequency table, whose cardinality is bounded by the
    * quantity DOMAIN (≤ ~50 distinct values per flag), not by rows — so the
    * cumulative window runs over a provably tiny input (the q58 shape,
    * weighted), and the p·total threshold compare is pure integer
    * arithmetic (cum·100 ≥ p%·total) with no float boundary. One
    * map-side-combinable aggregation feeds everything. */
  def weightedQuantiles(lineitem: DataFrame): DataFrame = {
    val freq = lineitem
      .select(col("l_returnflag"), col("l_quantity"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("wc"))
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(sum(col("wc")).as("w"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(col("l_returnflag"))
    freq
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wTot))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cum") * 100 >= col("tot") * 25, col("l_quantity"))).as("wp25"),
        min(when(col("cum") * 100 >= col("tot") * 50, col("l_quantity"))).as("wp50"),
        min(when(col("cum") * 100 >= col("tot") * 75, col("l_quantity"))).as("wp75"),
        round(max(col("tot")) / 100.0, 2).as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** [[countMinTopK]] hash rows (j, a, b) — spliced into the q70 oracle SQL
    * so the two engines build the identical sketch. h_j(k) = ((a·k+b) mod
    * 2³¹−1) mod w, primes far apart so the rows are pairwise-independent
    * enough for the CM guarantee. */
  val CmHashes: Seq[(Int, Long, Long)] =
    Seq((0, 1299709L, 7L), (1, 15485863L, 11L), (2, 32452843L, 13L), (3, 49979687L, 17L))
  val CmP = 2147483647L

  /** q70: Count-Min sketch heavy-hitter calibration — the other classic
    * bounded-state frequency sketch (Cormode–Muthukrishnan 2005; the batch
    * complement of the streaming SpaceSaving mirror): d=4 hash rows ×
    * `w` counters hold EVERY key's overestimate in O(d·w) integers
    * regardless of key cardinality. The sketch build is one explode(d) +
    * one map-side-combinable aggregation (the d×w counter table is then a
    * broadcast); estimates for the exact top-`topN` keys are min over the
    * d counters. The report carries exact anchors, the structural
    * `overcount ≥ 0` invariant (CM never underestimates) and the ε = e/w
    * error budget — and because the hash rows are explicit LCGs, the WHOLE
    * sketch is engine-deterministic: this sketch query hash-matches a real
    * DuckDB oracle instead of a rows-only self-check. */
  def countMinTopK(lineitem: DataFrame, w: Int = 1024, topN: Int = 20): DataFrame = {
    def bucketOf(j: Int, a: Long, b: Long) =
      struct(lit(j).as("j"), (((col("l_partkey") * a + b) % CmP) % w).as("bucket"))
    val keyed = lineitem.select(col("l_partkey"))
    val counters = keyed
      .select(explode(array(CmHashes.map { case (j, a, b) => bucketOf(j, a, b) }: _*)).as("h"))
      .groupBy(col("h.j").as("j"), col("h.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val exact = keyed.groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("l_partkey")).limit(topN)
    val est = exact
      .select(col("l_partkey"), col("exact_n"),
        explode(array(CmHashes.map { case (j, a, b) => bucketOf(j, a, b) }: _*)).as("h"))
      .join(broadcast(counters),
        col("h.j") === col("j") && col("h.bucket") === col("bucket"))
      .groupBy(col("l_partkey"), col("exact_n")).agg(min(col("c")).as("est_n"))
    val total = keyed.agg(count(lit(1)).as("n_total"))
    est.crossJoin(broadcast(total))
      .withColumn("overcount", col("est_n") - col("exact_n"))
      .withColumn("eps_bound", ceil(lit(math.E) * col("n_total") / w).cast("long"))
      .withColumn("within_eps", col("overcount") <= col("eps_bound"))
      .select(col("l_partkey"), col("exact_n"), col("est_n"), col("overcount"),
        col("eps_bound"), col("within_eps"))
      .orderBy(col("exact_n").desc, col("l_partkey"))
  }

  /** q71: bloom-filtered shuffle join — the runtime-filter pattern
    * (Spark's InjectRuntimeFilter / the classic semi-join reduction) made
    * explicit and measured: build a deterministic k=4 bloom over the
    * filtered build side's join keys, screen the probe side BEFORE the
    * shuffle join, and report exactly how much shuffle volume the filter
    * saves and what it costs in false-positive pass-through. The bit table
    * is ≤ mBits rows and broadcasts (in a real pipeline it pushes into the
    * probe scan, as Spark's runtime filter does); screening happens at
    * KEY grain (one map-side-combinable rollup of the probe, decisions
    * joined back to counts), so no row-grain pass is ever added. All hash
    * positions are the bloomScreen affine LCGs — engine-deterministic,
    * full DuckDB oracle. */
  def bloomJoinStats(orders: DataFrame, lineitem: DataFrame,
                     mBits: Long = 1L << 18, k: Int = 4): DataFrame = {
    val P = 1000003L
    def positions(keyCol: Column) = array((0 until k).map(i =>
      (pmod(keyCol, lit(P)) * (((i + 1).toLong * 2654435761L) % P) +
        (i.toLong * 40503L + 7919L)) % P % mBits): _*)
    val build = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("key")).distinct()
    val bits = build.select(explode(positions(col("key"))).as("pos")).distinct()
    val keyCounts = lineitem.groupBy(col("l_orderkey").as("key"))
      .agg(count(lit(1)).as("rows"))
    val decided = keyCounts
      .select(col("key"), col("rows"), explode(positions(col("key"))).as("pos"))
      .join(broadcast(bits.withColumn("hit", lit(1L))), Seq("pos"), "left")
      .groupBy(col("key"), col("rows"))
      .agg(sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_miss"))
      .withColumn("pass", col("n_miss") === 0L)
      .join(build.withColumn("matched", lit(1L)), Seq("key"), "left")
    val nBuild = build.agg(count(lit(1)).as("build_keys"))
    decided.agg(
        sum(col("rows")).as("probe_rows"),
        sum(when(col("pass"), col("rows")).otherwise(0L)).as("bloom_pass_rows"),
        sum(when(col("matched").isNotNull, col("rows")).otherwise(0L)).as("matched_rows"))
      .crossJoin(broadcast(nBuild))
      .withColumn("fp_rows", col("bloom_pass_rows") - col("matched_rows"))
      .withColumn("shuffle_reduction_pct",
        round((col("probe_rows") - col("bloom_pass_rows")) * 100.0 / col("probe_rows"), 6))
      .withColumn("fp_pass_pct",
        round(col("fp_rows") * 100.0 / (col("probe_rows") - col("matched_rows")), 6))
      .select(col("probe_rows"), col("build_keys"), col("bloom_pass_rows"),
        col("matched_rows"), col("fp_rows"), col("shuffle_reduction_pct"), col("fp_pass_pct"))
  }
}
