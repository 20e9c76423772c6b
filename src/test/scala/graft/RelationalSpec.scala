package graft

import graft.tables.Tables
import graft.operators._

/** Relational core: correctness invariants + plan-shape (pushdown/broadcast)
  * assertions. Value-level correctness is covered by the DuckDB oracle gate
  * (tools/check.py); these specs pin the plan properties that matter at scale.
  */
class RelationalSpec extends SparkSpec {

  private def lineitem = Tables.lineitem(spark, sf0001)
  private def explained(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("q1 pricing summary: six flag/status groups, positive counts") {
    val rows = Relational.pricingSummary(lineitem).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("q2 filter+projection pushdown reach the parquet scan") {
    val plan = explained(Relational.filterProject(lineitem))
    assert(plan.contains("PushedFilters"), "expected parquet PushedFilters")
    assert(plan.contains("l_shipdate"), "shipdate filter should be pushed")
    // projection pruning: scan schema must not include unprojected columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag"), s"column pruning failed: $readSchema")
  }

  test("q4 dim join is a broadcast hash join") {
    val plan = explained(Relational.brandRevenue(lineitem, Tables.part(spark, sf0001)))
    assert(plan.contains("BroadcastHashJoin"), "part should broadcast")
    assert(!plan.contains("SortMergeJoin"), "no SMJ expected for a broadcast dim")
  }

  test("q6 selective scan keeps a single aggregate, no join, no wide shuffle") {
    val plan = explained(Relational.forecastRevenue(lineitem))
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("Join"))
  }

  test("q17 global top-N compiles to TakeOrderedAndProject (no total sort)") {
    val plan = explained(TopK.globalTopLineitems(lineitem))
    assert(plan.contains("TakeOrderedAndProject"), s"expected distributed top-N:\n$plan")
  }

  test("q32 statistical aggregates: correlation bounded, variance consistent with stddev") {
    val rows = Relational.priceStatistics(lineitem).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("qty_price_corr")
      assert(c >= -1.0 && c <= 1.0)
      assert(r.getAs[Double]("price_stddev") >= 0.0)
      assert(r.getAs[Double]("disc_var") >= 0.0)
    }
  }

  test("q33 fuzzy join: pairs oriented, distance within band, dict side broadcast") {
    val df = Relational.fuzzyNameMatch(Tables.part(spark, sf0001))
    val plan = explained(df)
    assert(plan.contains("Broadcast"), "name dictionary should broadcast")
    val rows = df.collect()
    assert(rows.forall(r => r.getAs[String]("name_a") < r.getAs[String]("name_b")))
    assert(rows.forall(_.getAs[Long]("dist") <= 3))
  }

  test("q34 lateral explode: position stats cover positions 1..10") {
    val rows = Relational.tokenPositionStats(Tables.documents(spark, sf0001)).collect()
    assert(rows.map(_.getAs[Long]("pos")).toSeq == (1L to 10L))
    rows.foreach(r => assert(r.getAs[Long]("top_n") <= r.getAs[Long]("n_tokens")))
  }

  test("q35 ratio-to-report: shares sum to 100%") {
    val rows = Relational.nationRevenueShare(
      Tables.orders(spark, sf0001), Tables.customer(spark, sf0001), Tables.nation(spark, sf0001)).collect()
    val total = rows.map(_.getAs[Double]("share_pct")).sum
    assert(math.abs(total - 100.0) < 1e-3, s"shares sum to $total")
    assert(rows.map(_.getAs[Long]("rk")).min == 1L)
  }

  test("grouping sets produce both marginals plus the grand total in one pass") {
    val rows = Relational.flagStatusGroupingSets(lineitem).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(1L, 2L, 3L), s"gids: ${byGid.keySet}")
    val total = byGid(3L).map(_.getAs[Long]("n")).sum
    assert(total == lineitem.count(), "grand-total row counts every input row")
    assert(byGid(1L).map(_.getAs[Long]("n")).sum == total, "per-flag marginal sums to total")
    assert(byGid(2L).map(_.getAs[Long]("n")).sum == total, "per-status marginal sums to total")
  }

  test("set ops: retained and churned cohorts are disjoint") {
    val orders = Tables.orders(spark, sf0001)
    val rows = Relational.customerYearSets(orders).collect()
      .map(r => (r.getAs[String]("cohort"), r.getAs[Long]("o_custkey")))
    val retained = rows.collect { case ("retained", k) => k }.toSet
    val churned = rows.collect { case ("churned", k) => k }.toSet
    assert(retained.intersect(churned).isEmpty)
    assert(retained.nonEmpty && churned.nonEmpty)
  }

  test("hopping windows double-count each event exactly twice") {
    val events = Tables.events(spark, sf0001)
    val hopped = graft.events.Events.hoppingCounts(events)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(hopped == 2 * events.count(), "1h windows hopping every 30min hold each event twice")
  }

  test("range frame holds the current row and the transition matrix covers every follow-up event") {
    val orders = Tables.orders(spark, sf0001)
    Relational.trailingSpend(orders).collect().foreach { r =>
      assert(r.getAs[Long]("orders_in_window") >= 1L, "RANGE frame always includes the current row")
    }
    val events = Tables.events(spark, sf0001)
    val total = graft.events.Events.transitionMatrix(events, topN = 1000).collect()
      .map(_.getAs[Long]("n")).sum
    val expected = events.count() -
      events.select("user_id").distinct().count()
    assert(total == expected, s"each user emits (n_events - 1) transitions: $total vs $expected")
  }

  test("sketch operators carry their own error bounds, all-true at two scale factors") {
    for (sf <- Seq(sf0001, sf001)) {
      // HLL++: the emitted exact anchor must match an independent exact
      // count, and the 5·rsd envelope must hold on every day row
      val events = Tables.events(spark, sf)
      val daily = graft.events.Events.approxDailyUsers(events, verify = true).collect()
      val exact = events
        .groupBy(org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd").as("day"))
        .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("users"))
        .collect().map(r => r.getAs[String]("day") -> r.getAs[Long]("users")).toMap
      assert(daily.nonEmpty)
      daily.foreach { r =>
        val day = r.getAs[String]("day")
        assert(r.getAs[Long]("exact_users") == exact(day), s"$sf $day: exact anchor mismatch")
        assert(r.getAs[Boolean]("within_bound"), s"$sf $day: rel_err ${r.getAs[Double]("rel_err")} breaches 5*rsd")
      }
      // HLL set algebra: the inclusion-exclusion envelope must hold for
      // every type pair, and the exact anchors must match audienceOverlap
      val ov = graft.events.Events.approxAudienceOverlap(events, verify = true).collect()
      val exactPairs = graft.events.Events.audienceOverlap(events).collect()
        .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
          (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))).toMap
      assert(ov.nonEmpty)
      ov.foreach { r =>
        val key = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        assert(r.getAs[Boolean]("within_bound"),
          s"$sf $key: inclusion-exclusion envelope breached (abs_err ${r.getAs[Long]("abs_err")})")
        val j = r.getAs[Double]("jaccard_est")
        assert(j >= 0.0 && j <= 1.0)
        exactPairs.get(key).foreach { case (na, nb, nboth) =>
          assert(r.getAs[Long]("exact_a") == na && r.getAs[Long]("exact_b") == nb
            && r.getAs[Long]("exact_inter") == nboth,
            s"$sf $key: exact anchors diverge from audienceOverlap")
        }
      }
      // HDR histogram sketch: the structural relative-halfwidth bound must
      // hold for every flag (chosen bucket halfwidth ≤ 1/64 of midpoint)
      val li = Tables.lineitem(spark, sf)
      val sketchQ = Relational.approxPriceQuantiles(li).collect()
      assert(sketchQ.nonEmpty)
      sketchQ.foreach { r =>
        assert(r.getAs[Boolean]("within_bound"),
          s"$sf ${r.getAs[String]("l_returnflag")}: HDR halfwidth bound breached")
      }
      // small-value regime: sub-2^s cent prices land in exact unit buckets
      // (shift clamps to 0), so the estimate is within half a cent of the
      // true discrete quantile
      locally {
        import spark.implicits._
        val cents = Seq.tabulate(100)(i => (i % 30) + 1)
        val tiny = cents.map(c => ("A", c / 100.0)).toDF("l_returnflag", "l_extendedprice")
        val row = Relational.approxPriceQuantiles(tiny).collect().head
        val sorted = cents.sorted
        for ((name, p) <- Seq("p25" -> 25, "p50" -> 50, "p75" -> 75, "p99" -> 99)) {
          val target = sorted((p * 100 + 99) / 100 - 1) // rank ceil(p%*n), 1-based
          assert(math.abs(row.getAs[Double](name) * 100 - target) <= 0.5,
            s"small-value $name: ${row.getAs[Double](name)} vs exact cents $target")
        }
        // within_bound asserts the RELATIVE 1/64 guarantee, which only
        // applies in the log-linear regime (idx >= 32); unit buckets
        // guarantee half-a-cent ABSOLUTE error instead (checked above)
      }
      // and the sketch p50 still tracks the exact percentile
      val exactQ = Relational.priceQuantiles(li).collect()
        .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("p50")).toMap
      sketchQ.foreach { r =>
        val p50 = r.getAs[Double]("p50")
        val e = exactQ(r.getAs[String]("l_returnflag"))
        assert(math.abs(p50 - e) / e < 0.05, s"$sf sketch p50 $p50 vs exact $e")
      }
    }
  }

  test("asof join matches each purchase to latest prior signup") {
    val out = AsofJoin.purchaseAfterSignup(Tables.events(spark, sf0001)).collect()
    assert(out.nonEmpty)
    // every matched wait is non-negative
    val waits = out.filter(!_.isNullAt(3)).map(_.getAs[Long]("wait_ms"))
    assert(waits.forall(_ >= 0))
  }

  test("range join band totals cover every row exactly once") {
    val banded = RangeJoin.priceBands(spark, lineitem)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(banded == lineitem.count())
  }

  test("listagg ranks names in balance order and caps at k per segment") {
    val rows = Relational.segmentTopNames(Tables.customer(spark, sf0001), k = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val names = r.getAs[String]("top_names").split(",")
      assert(names.length <= 3 && names.distinct.length == names.length)
    }
  }

  test("islands: best streak is at least 1 day and one row per active user") {
    val ev = Tables.events(spark, sf0001)
    val out = Relational.activityStreaks(ev)
    val users = ev.select("user_id").distinct().count()
    assert(out.count() == users)
    assert(out.collect().forall(_.getAs[Long]("best_streak") >= 1L))
  }

  test("histogram bins partition all orders; spine zero-fills every nation-month") {
    val orders = Tables.orders(spark, sf0001)
    val hist = Relational.priceHistogram(orders)
    assert(hist.agg(org.apache.spark.sql.functions.sum("n_orders")).collect()(0).getLong(0)
      == orders.count())
    val spine = Relational.nationMonthSpine(orders, Tables.customer(spark, sf0001),
      Tables.nation(spark, sf0001))
    val nMonths = spine.select("month").distinct().count()
    val nNations = spine.select("n_name").distinct().count()
    assert(spine.count() == nMonths * nNations, "spine must be the full cross product")
  }

  test("month-over-month deltas telescope to last-minus-first revenue") {
    val rows = Relational.monthlyGrowth(Tables.orders(spark, sf0001))
      .orderBy("month").collect()
    val deltaSum = rows.drop(1).map(_.getAs[Double]("delta")).sum
    val direct = rows.last.getAs[Double]("revenue") - rows.head.getAs[Double]("revenue")
    assert(math.abs(deltaSum - direct) < 1e-2)
  }

  test("rfm/attribution/dwell: users conserved, purchases conserved, gaps positive") {
    import graft.events.Events
    val ev = Tables.events(spark, sf0001)
    val sum = org.apache.spark.sql.functions.sum(_: String)
    val purchasers = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(Events.rfmSegments(ev).agg(sum("users")).collect()(0).getLong(0) == purchasers)
    val purchases = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(Events.lastTouchAttribution(ev).agg(sum("purchases")).collect()(0).getLong(0) == purchases)
    assert(Events.dwellTimes(ev).collect().forall(_.getAs[Double]("avg_gap_min") >= 0.0))
  }

  test("weighted price differs from plain mean and regex extraction is total") {
    val li = lineitem
    val part = Tables.part(spark, sf0001)
    val w = Relational.brandWeightedPrice(li, part).collect()
    assert(w.forall(_.getAs[Double]("wavg_price") > 0))
    val parts = Relational.partNameComponents(part)
    assert(parts.agg(org.apache.spark.sql.functions.sum("n_parts")).collect()(0).getLong(0)
      == part.count(), "every two-word part name must be classified")
  }

  test("hash sample is reproducible and near the target rate") {
    import org.apache.spark.sql.functions.sum
    val orders = Tables.orders(spark, sf0001)
    val a = Relational.hashSample(orders).collect()
    val b = Relational.hashSample(orders).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted), "sampling must be deterministic")
    val tot = a.map(_.getAs[Long]("n_pop")).sum.toDouble
    val smp = a.map(_.getAs[Long]("n_sample")).sum.toDouble
    assert(math.abs(smp / tot - 0.125) < 0.05, s"sample rate ${smp / tot} should be near 12.5%")
  }

  test("skyline points are mutually non-dominated") {
    val sky = Relational.priceSizeSkyline(Tables.part(spark, sf0001)).collect()
      .map(r => (r.getAs[Int]("p_size"), r.getAs[Double]("skyline_price")))
    assert(sky.nonEmpty)
    for ((s1, p1) <- sky; (s2, p2) <- sky if s1 != s2)
      assert(!(s2 >= s1 && p2 < p1), s"($s1,$p1) dominated by ($s2,$p2)")
  }

  test("spearman rho is in [-1,1]; chi-square is non-negative with right dof") {
    val rho = Relational.spearmanPriceQty(lineitem).collect()
    assert(rho.nonEmpty)
    rho.foreach(r => assert(math.abs(r.getAs[Double]("spearman_rho")) <= 1.0))
    val chi = Relational.flagStatusChiSq(lineitem).collect()(0)
    assert(chi.getAs[Double]("chi2") >= 0.0)
    assert(chi.getAs[Long]("dof") == 2L * 1L) // 3 flags x 2 statuses
  }

  test("strict funnel stages are monotonically shrinking") {
    val st = Relational.strictFunnel(Tables.events(spark, sf0001)).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(st("1_signup") >= st("2_click_after"))
    assert(st("2_click_after") >= st("3_purchase_after"))
  }

  test("decay/seasonality/power-user/lifecycle reports conserve events and users") {
    import org.apache.spark.sql.functions.sum
    val ev = Tables.events(spark, sf0001)
    val total = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val decay = graft.events.Events.decayScore(ev).collect()
    assert(decay.length == nUsers)
    decay.foreach(r => assert(r.getAs[Double]("decayed_score") <= r.getAs[Double]("raw_value") + 1e-6,
      "decay can only shrink value"))
    assert(graft.events.Events.seasonality(ev).agg(sum("n_events")).collect()(0).getLong(0) == total)
    assert(graft.events.Events.powerUsers(ev).agg(sum("n_events")).collect()(0).getLong(0) == total)
    assert(graft.events.Events.lifecycle(ev).agg(sum("n_users")).collect()(0).getLong(0) == nUsers)
    val conv = graft.events.Events.conversionTime(ev).collect()
    conv.foreach { r =>
      assert(r.getAs[Double]("p25_hours") <= r.getAs[Double]("p50_hours"))
      assert(r.getAs[Double]("p50_hours") <= r.getAs[Double]("p75_hours"))
    }
  }

  test("equi-height buckets are balanced; skew report sane; path entropy bounded") {
    val orders = Tables.orders(spark, sf0001)
    val hist = Relational.priceEquiHeightHistogram(orders).collect()
    assert(hist.map(_.getAs[Long]("n_rows")).sum == orders.count())
    val counts = hist.map(_.getAs[Long]("n_rows").toDouble)
    assert(counts.max / counts.min < 1.5, "equi-height buckets must be near-balanced")
    val skew = Relational.joinSkewReport(lineitem).collect()
    skew.foreach { r =>
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Double]("skew_factor") >= 1.0 - 1e-9, "max/mean frequency ratio is >= 1")
    }
    val pe = graft.events.Events.pathEntropy(Tables.events(spark, sf0001)).collect()
    pe.foreach { r =>
      val h = r.getAs[Double]("next_entropy")
      assert(h >= 0.0 && h <= math.log(r.getAs[Long]("n_successors").toDouble) + 1e-6)
    }
  }

  test("feature scaling: minmax in [0,1], zscore mean ~0 per group; forecast MAE finite") {
    val orders = Tables.orders(spark, sf0001)
    val scaled = Relational.featureScaling(orders).collect()
    assert(scaled.length == orders.count())
    scaled.filter(!_.isNullAt(3)).foreach { r =>
      val m = r.getAs[Double]("minmax"); assert(m >= 0.0 && m <= 1.0)
    }
    val fc = graft.events.Events.forecastBacktest(Tables.events(spark, sf0001)).collect()
    assert(fc.nonEmpty)
    fc.foreach { r =>
      assert(r.getAs[Double]("mae") >= 0.0)
      assert(r.getAs[Long]("dow") >= 0L && r.getAs[Long]("dow") <= 6L)
    }
  }

  test("disc quartiles are actual data values in order; customer growth telescopes") {
    val dq = Relational.quantityDiscQuartiles(lineitem).collect()
    dq.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25_disc"), r.getAs[Double]("p50_disc"), r.getAs[Double]("p75_disc"))
      assert(p25 <= p50 && p50 <= p75)
      assert(p25 == math.rint(p25), "disc percentile must be an actual (integer) quantity value")
    }
    val orders = Tables.orders(spark, sf0001)
    val g = Relational.customerGrowth(orders).collect()
    val lastCum = g.last.getAs[Long]("cum_customers")
    assert(lastCum == orders.select("o_custkey").distinct().count(),
      "cumulative curve must end at total distinct customers")
    assert(g.map(_.getAs[Long]("new_customers")).sum == lastCum)
  }

  test("native top-k matches the window implementation and plans heap execs, no sort") {
    val orders = Tables.orders(spark, sf0001)
    val native = TopK.nativeTopOrdersPerCustomer(orders).collect().map(_.toString).sorted
    val window = TopK.topOrdersPerCustomer(orders)
      .select("o_custkey", "o_orderkey", "o_totalprice").collect().map(_.toString).sorted
    assert(native.sameElements(window), "native operator must reproduce the window semantics")
    val plan = explained(TopK.nativePerKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3))
    assert(plan.contains("TopKPerKey"), "custom exec must appear in the physical plan")
    assert(plan.linesIterator.count(_.contains("TopKPerKey")) >= 2, "partial + final pass expected")
    assert(!plan.contains("Window") && !plan.contains("Sort "), "no window, no sort")
  }

  test("market basket pairs are oriented with sane support; MAD fences are positive") {
    val mb = Relational.marketBasket(lineitem, Tables.part(spark, sf0001), minSupport = 1L).collect()
    assert(mb.nonEmpty)
    mb.foreach { r =>
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
      assert(r.getAs[Double]("support_pct") > 0.0 && r.getAs[Double]("support_pct") <= 100.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
    val mad = Relational.madOutliers(lineitem).collect()
    mad.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("scd2 join assigns every lineitem row to exactly one dim version") {
    import org.apache.spark.sql.functions.sum
    val li = lineitem
    val out = Relational.scd2SupplierJoin(li, Tables.supplier(spark, sf0001))
    assert(out.agg(sum("n_rows")).collect()(0).getLong(0) == li.count(),
      "validity windows must partition the timeline")
  }

  test("rolling active users: wau >= dau and stickiness in (0,1]") {
    val rows = graft.events.Events.rollingActiveUsers(Tables.events(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"))
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0)
    }
  }

  test("unpivot is the exact inverse of the wide aggregate") {
    import org.apache.spark.sql.functions.{sum, round}
    val orders = Tables.orders(spark, sf0001)
    val long = Relational.yearStatusUnpivot(orders)
    val totalLong = long.agg(round(sum("revenue"), 2)).collect()(0).getDouble(0)
    val totalWide = orders.agg(round(sum("o_totalprice"), 2)).collect()(0).getDouble(0)
    assert(math.abs(totalLong - totalWide) < 0.05, s"$totalLong vs $totalWide")
  }

  test("pareto thresholds are monotone and consistent with the part dictionary") {
    val li = Tables.lineitem(spark, sf0001)
    val rows = Relational.paretoRevenue(li).collect()
      .map(r => r.getAs[Long]("threshold") ->
        (r.getAs[Long]("n_parts"), r.getAs[Double]("covered_pct"))).toMap
    val nParts = li.select("l_partkey").distinct().count()
    assert(rows.keySet == Set(50L, 80L, 90L, 95L))
    assert(rows(50)._1 <= rows(80)._1 && rows(80)._1 <= rows(90)._1 && rows(90)._1 <= rows(95)._1,
      "higher coverage cannot need fewer parts")
    rows.foreach { case (t, (n, covered)) =>
      assert(n >= 1 && n <= nParts)
      assert(covered >= t - 0.0001, s"covered $covered below threshold $t")
    }
  }

  test("interval concurrency peaks are positive and bounded by open orders") {
    val orders = Tables.orders(spark, sf0001)
    val rows = Relational.orderConcurrency(orders).collect()
    assert(rows.nonEmpty)
    val n = orders.count()
    rows.foreach { r =>
      val peak = r.getAs[Long]("peak_active")
      assert(peak >= 0 && peak <= n)
    }
  }

  test("benford digits partition all orders and percentages close") {
    val orders = Tables.orders(spark, sf0001)
    val rows = Relational.benfordScreen(orders).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders.count())
    val obsSum = rows.map(_.getAs[Double]("obs_pct")).sum
    assert(math.abs(obsSum - 100.0) < 0.01, s"obs_pct sums to $obsSum")
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2_contrib") >= 0.0)
      assert(math.abs(r.getAs[Double]("deviation")) <= 100.0)
    }
  }

  test("gini is a proper concentration index and top shares nest") {
    val r = Relational.giniRevenue(Tables.orders(spark, sf0001)).collect()(0)
    val gini = r.getAs[Double]("gini")
    val top1 = r.getAs[Double]("top1_share_pct")
    val top10 = r.getAs[Double]("top10_share_pct")
    assert(gini >= 0.0 && gini < 1.0, s"gini $gini out of range")
    assert(top10 >= top1, "top-10% share must contain the top-1% share")
    // The top decile is floor(n/10) customers, each at or above the mean,
    // so its share is at least (floor(n/10)/n)·100 ≈ 10% (exact at n%10==0).
    assert(top10 >= 10.0 - 100.0 / 15.0, "top decile below its proportional floor")
    assert(top1 >= 0.0 && top10 <= 100.0)
  }

  test("revenue bridge telescopes: components reproduce each month's revenue delta") {
    import org.apache.spark.sql.functions.{col, round, sum, date_format}
    val orders = Tables.orders(spark, sf0001)
    val bridge = Relational.revenueBridge(orders).collect()
      .map(r => r.getAs[String]("bridge_month") -> r.getAs[Long]("net_change_c")).toMap
    val monthly = orders.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"))
      .collect().map(r => r.getAs[String]("m") -> r.getAs[Long]("rev")).toMap
    val months = monthly.keys.toSeq.sorted
    months.sliding(2).foreach {
      case Seq(a, b) =>
        assert(bridge(b) == monthly(b) - monthly(a),
          s"bridge($b) must equal rev($b) - rev($a)")
      case _ =>
    }
    assert(bridge(months.head) == monthly(months.head), "the first month is all-new revenue")
  }

  test("reorder cadence: gaps are non-negative and bounded by the calendar span") {
    val orders = Tables.orders(spark, sf0001)
    val rows = Relational.reorderCadence(Tables.customer(spark, sf0001), orders).collect()
    assert(rows.nonEmpty)
    val span = orders.agg(
      org.apache.spark.sql.functions.datediff(
        org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("o_orderdate"))),
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("o_orderdate"))))
    ).collect()(0).getInt(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_gap_days") >= 0L)
      assert(r.getAs[Long]("min_gap_days") <= r.getAs[Long]("max_gap_days"))
      assert(r.getAs[Long]("max_gap_days") <= span)
      val avg = r.getAs[Double]("avg_gap_days")
      assert(avg >= r.getAs[Long]("min_gap_days") && avg <= r.getAs[Long]("max_gap_days"))
      assert(r.getAs[Long]("n_gaps") >= r.getAs[Long]("repeat_customers"))
    }
  }

  test("decile lift: shares telescope to 100%, lift decreases down the ranking") {
    val rows = Relational.decileLift(Tables.orders(spark, sf0001)).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val shares = rows.map(_.getAs[Double]("share_pct"))
    assert(math.abs(shares.sum - 100.0) < 0.01)
    assert(math.abs(rows.last.getAs[Double]("cum_share_pct") - 100.0) < 0.001)
    val cums = rows.map(_.getAs[Double]("cum_share_pct"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-9 }, "cumulative must be monotone")
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b - 1e-9 },
      "deciles are revenue-ordered so lift cannot increase")
    assert(lifts.head >= 1.0 && lifts.last <= 1.0)
  }

  test("Count-Min sketch: never underestimates, matches a brute-force sketch recompute") {
    import graft.operators.Relational
    for (sf <- Seq(sf0001, sf001)) {
      val li = Tables.lineitem(spark, sf)
      val rows = Relational.countMinTopK(li).collect()
      assert(rows.length == 20)
      // brute-force CM sketch over the same hashes
      val keys = li.select("l_partkey").collect().map(_.getLong(0))
      val w = 1024
      val ctr = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
      keys.foreach(k => Relational.CmHashes.foreach { case (j, a, b) =>
        ctr((j, ((k * a + b) % Relational.CmP) % w)) += 1L
      })
      rows.foreach { r =>
        val k = r.getAs[Long]("l_partkey")
        val est = Relational.CmHashes.map { case (j, a, b) =>
          ctr((j, ((k * a + b) % Relational.CmP) % w)) }.min
        assert(r.getAs[Long]("est_n") == est, s"$sf key $k: sketch estimate diverges")
        assert(r.getAs[Long]("overcount") >= 0L, "CM never underestimates")
        assert(r.getAs[Long]("est_n") >= r.getAs[Long]("exact_n"))
      }
      // the epsilon budget is the e*N/w envelope; report how many keys hold it
      val within = rows.count(_.getAs[Boolean]("within_eps"))
      assert(within == rows.length,
        s"$sf: ${rows.length - within} top keys exceed the eps budget (deterministic, but check w)")
    }
  }

  test("bloom join: zero false negatives, filter strictly shrinks the shuffle, fp rate sane") {
    import graft.operators.Relational
    for (sf <- Seq(sf0001, sf001)) {
      val ord = Tables.orders(spark, sf); val li = Tables.lineitem(spark, sf)
      val r = Relational.bloomJoinStats(ord, li).collect()(0)
      val probe = r.getAs[Long]("probe_rows"); val pass = r.getAs[Long]("bloom_pass_rows")
      val matched = r.getAs[Long]("matched_rows"); val fp = r.getAs[Long]("fp_rows")
      assert(probe == li.count())
      // NO false negatives: every truly-matching row passes the bloom
      assert(pass >= matched, s"$sf: bloom dropped matching rows")
      assert(fp == pass - matched && fp >= 0)
      // the independent exact join agrees with matched_rows
      val exact = li.join(ord.filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .select(org.apache.spark.sql.functions.col("o_orderkey")),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"), "left_semi").count()
      assert(matched == exact, s"$sf: matched_rows $matched vs exact semi-join $exact")
      // the filter must actually reduce the shuffle on this selective build side
      assert(pass < probe, s"$sf: bloom passed everything (useless filter)")
      assert(r.getAs[Double]("shuffle_reduction_pct") > 50.0,
        s"$sf: urgent-priority build side should prune most probe rows")
      assert(r.getAs[Double]("fp_pass_pct") < 20.0, s"$sf: fp rate out of range for m=2^18")
    }
  }
}
