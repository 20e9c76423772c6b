package graft

import graft.tables.Tables

/** Batch specs for the A/B readout, stats freshness and char-trigram LID. */
class PipelineReportsSpec extends SparkSpec {

  test("ab test: variants partition the user base; rates are proper fractions") {
    val ev = Tables.events(spark, sf0001)
    val r = graft.events.Events.abTest(ev).collect()(0)
    val nUsers = ev.select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nUsers)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    assert(r.getAs[Double]("rate_a") >= 0.0 && r.getAs[Double]("rate_a") <= 1.0)
  }

  test("stats freshness: staleness bounded and flag consistent with threshold") {
    val rows = graft.lake.Manifest.statsFreshness(Tables.orders(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getAs[Double]("stale_pct")
      assert(pct >= 0.0 && pct <= 100.0)
      assert(r.getAs[Long]("rows_since_stats") <= r.getAs[Long]("rows_total"))
    }
  }

  test("new-vs-returning conserves users; commit cadence gaps are non-negative") {
    val ev = Tables.events(spark, sf0001)
    val rows = graft.events.Events.newVsReturning(ev).collect()
    assert(rows.map(_.getAs[Long]("new_users")).sum == ev.select("user_id").distinct().count(),
      "every user is new exactly once")
    rows.foreach(r => assert(
      r.getAs[Long]("new_users") + r.getAs[Long]("returning_users") == r.getAs[Long]("active_users")))
    val cad = graft.lake.Snapshots.commitCadence(Tables.orders(spark, sf0001)).collect()
    assert(cad.nonEmpty)
    cad.foreach { r =>
      assert(r.getAs[Double]("median_abs_gap") <= r.getAs[Double]("p95_abs_gap"))
    }
  }

  test("char-trigram language id classifies every doc exactly once") {
    val docs = Tables.documents(spark, sf0001)
    val conf = graft.text.TextAnalysis.charTrigramLangId(docs).collect()
    assert(conf.map(_.getAs[Long]("n")).sum == docs.count(),
      "confusion matrix must account for every document")
  }

  test("burstiness is bounded in (-1, 1) and consistent with its moments") {
    val rows = graft.events.Events.burstiness(Tables.events(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b >= -1.0 && b <= 1.0, s"burstiness $b out of range")
      val mu = r.getAs[Double]("mean_gap_s")
      val sd = r.getAs[Double]("std_gap_s")
      assert(mu > 0.0 && sd >= 0.0)
      // sign(B) == sign(σ − μ) up to the 4dp rounding of the reported moments
      if (sd - mu > 1e-3) assert(b > 0) else if (mu - sd > 1e-3) assert(b < 0)
    }
  }

  test("audience overlap: intersections bounded by set sizes, jaccard proper") {
    val rows = graft.events.Events.audienceOverlap(Tables.events(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, both) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))
      assert(both <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"), "pairs must be oriented")
    }
  }

  test("churn hazard: at-risk telescopes to the user count, hazard in (0,1]") {
    val ev = Tables.events(spark, sf0001)
    val rows = graft.events.Events.churnHazard(ev).collect()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_churned")).sum == nUsers,
      "every user churns in exactly one tenure week")
    assert(rows.head.getAs[Long]("n_at_risk") == nUsers ||
      rows.minBy(_.getAs[Long]("tenure_wk")).getAs[Long]("n_at_risk") == nUsers,
      "week-0 at-risk population is everyone")
    rows.foreach { r =>
      val h = r.getAs[Double]("hazard")
      assert(h > 0.0 && h <= 1.0)
      assert(r.getAs[Long]("n_churned") <= r.getAs[Long]("n_at_risk"))
    }
  }

  test("KM survival: monotone non-increasing, matches hand-rolled product, censoring-consistent") {
    val ev = Tables.events(spark, sf0001)
    val rows = graft.events.Events.survivalCurve(ev).collect().sortBy(_.getAs[Long]("t_hours"))
    assert(rows.nonEmpty)
    val nStarters = ev.filter(org.apache.spark.sql.functions.col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.maxBy(r => r.getAs[Long]("n_at_risk")).getAs[Long]("n_at_risk") == nStarters,
      "first rung's at-risk population is every user who signed up")
    // at-risk telescopes: each rung loses exactly its events + censorings
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_at_risk") ==
          a.getAs[Long]("n_at_risk") - a.getAs[Long]("n_events") - a.getAs[Long]("n_censored"))
      case _ =>
    }
    // survival is a proper non-increasing [0,1] curve equal to the running product
    var prod = 1.0
    var prev = 1.0
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_events"))
      prod *= (n - d).toDouble / n
      val s = r.getAs[Double]("survival")
      assert(s >= 0.0 && s <= prev + 1e-12, s"survival not monotone at ${r.getAs[Long]("t_hours")}")
      assert(math.abs(s - prod) < 1e-4, s"KM product mismatch: $s vs $prod")
      prev = s
    }
  }

  test("markov steady state is a probability distribution over the type alphabet") {
    val rows = graft.events.Events.markovSteady(Tables.events(spark, sf0001)).collect()
    assert(rows.map(_.getAs[String]("event_type")).toSeq == graft.events.Events.EventTypes)
    val pcts = rows.map(_.getAs[Double]("steady_pct"))
    assert(pcts.forall(p => p > 0.0 && p < 100.0))
    assert(math.abs(pcts.sum - 100.0) < 0.001, s"stationary mass sums to ${pcts.sum}")
    rows.foreach(r => assert(r.getAs[Long]("n_out") > 0L))
  }

  test("markov steady state conserves mass when a type is a sink (self-loop guard)") {
    import spark.implicits._
    // 'view' only ever appears as a user's last event -> zero outgoing
    // transitions; its mass must stay on it, not vanish.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val ev = Seq(
      (1L, 1L, t(0), "click"), (1L, 2L, t(1), "click"), (1L, 3L, t(2), "view"),
      (2L, 4L, t(0), "click"), (2L, 5L, t(1), "view"),
      (3L, 6L, t(0), "click"), (3L, 7L, t(1), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val rows = graft.events.Events.markovSteady(ev, types = Seq("click", "view")).collect()
    val pcts = rows.map(_.getAs[Double]("steady_pct"))
    assert(math.abs(pcts.sum - 100.0) < 1e-6, s"sink must not leak mass: ${pcts.sum}")
    val view = rows.find(_.getAs[String]("event_type") == "view").get
    assert(view.getAs[Double]("steady_pct") > 0.0)
  }

  test("behavior knn: k neighbors per probe, cosine bounded and ordered") {
    val rows = graft.events.Events.behaviorKnn(Tables.events(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getAs[Long]("q_user"))
    byProbe.foreach { case (_, g) =>
      assert(g.length <= 3)
      val cs = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "ranks must follow cosine")
      cs.foreach(c => assert(c >= -1.0 && c <= 1.0))
    }
    rows.foreach(r => assert(r.getAs[Long]("neighbor_user") != r.getAs[Long]("q_user")))
  }

  test("seasonal anomalies clear the z threshold against their own slot baseline") {
    val rows = graft.events.Events.seasonalAnomaly(Tables.events(spark, sf0001)).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) > 2.0)
      assert(r.getAs[Long]("n") >= 0L && r.getAs[Double]("baseline_mean") > 0.0)
    }
  }

  test("incremental screen covers the whole batch; dup flags agree with matches") {
    val rows = graft.dedup.Dedup.incrementalScreen(Tables.documents(spark, sf0001)).collect()
    val docs = Tables.documents(spark, sf0001)
    assert(rows.length == docs.filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0).count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_matches")
      assert(r.getAs[Boolean]("is_dup") == (n > 0))
      if (n > 0) assert(r.getAs[Double]("best_est") >= 0.9 - 1e-9)
      else assert(r.getAs[Double]("best_est") == 0.0)
    }
  }

  test("cohort retention: week 0 is 100% and every cell is a proper fraction of its cohort") {
    val ev = Tables.events(spark, sf0001)
    val rows = graft.events.Events.cohortRetention(ev).collect()
    assert(rows.nonEmpty)
    val week0 = rows.filter(_.getAs[Long]("week_n") == 0L)
    week0.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"),
        "every user is active in their own signup week")
      assert(math.abs(r.getAs[Double]("retention_pct") - 100.0) < 1e-9)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("week_n") >= 0L)
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
    }
    assert(rows.map(_.getAs[Long]("cohort_size")).toSet.size == week0.length ||
      week0.nonEmpty)
  }

  test("weighted sample is reproducible, k-sized and key-ordered") {
    val docs = Tables.documents(spark, sf0001)
    val a = graft.text.TextAnalysis.weightedSample(docs).collect()
    val b = graft.text.TextAnalysis.weightedSample(docs).collect()
    assert(a.map(_.getAs[Long]("doc_id")).toSeq == b.map(_.getAs[Long]("doc_id")).toSeq,
      "deterministic uniforms must reproduce the exact sample")
    assert(a.length == math.min(50, docs.count()).toInt)
    assert(a.map(_.getAs[Long]("rk")).toSeq == (1L to a.length))
    val keys = a.map(_.getAs[Double]("ares_key"))
    assert(keys.zip(keys.tail).forall { case (x, y) => x >= y }, "sample ranked by A-Res key")
    assert(a.map(_.getAs[Long]("doc_id")).distinct.length == a.length, "without replacement")
  }

  test("readability counts are positive and scores consistent with the formula") {
    val rows = graft.text.TextAnalysis.readability(Tables.documents(spark, sf0001)).collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      val (w, s, sy) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_sentences"), r.getAs[Long]("n_syllables"))
      assert(w > 0 && s >= 1 && sy >= 0)
      val expected = 206.835 - 1.015 * w / s - 84.6 * sy / w
      assert(math.abs(r.getAs[Double]("flesch_ease") - expected) < 0.001)
    }
  }

  test("power users: prefix-sum deciles are bit-identical to the ntile window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf0001)
    val naive = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("user_value"))
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("n_events").desc, col("user_id"))).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"),
        round(sum(col("user_value")), 4).as("total_value"))
      .withColumn("event_share_pct",
        round(col("n_events") * 100.0 / sum(col("n_events")).over(Window.partitionBy()), 4))
      .orderBy("decile").collect()
    val scaled = graft.events.Events.powerUsers(ev).orderBy("decile").collect()
    assert(scaled.length == naive.length)
    scaled.zip(naive).foreach { case (s, n) =>
      // Decile membership must be bit-identical; the value sums are doubles
      // whose summation order may differ between the two plans.
      assert(s.getAs[Long]("decile") == n.getAs[Long]("decile"))
      assert(s.getAs[Long]("n_users") == n.getAs[Long]("n_users"), s"n_users @ $s vs $n")
      assert(s.getAs[Long]("n_events") == n.getAs[Long]("n_events"), s"n_events @ $s vs $n")
      assert(math.abs(s.getAs[Double]("total_value") - n.getAs[Double]("total_value")) < 1e-6)
      assert(math.abs(s.getAs[Double]("event_share_pct") - n.getAs[Double]("event_share_pct")) < 1e-6)
    }
  }

  test("quarter quantiles equal the native exact percentile on every group") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf0001)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = ev
      .withColumn("gap_ms", unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)))
      .filter(col("gap_ms").isNotNull)
      .select(col("event_type"), col("gap_ms"))
    val native = gaps.groupBy(col("event_type"))
      .agg(expr("percentile(gap_ms, 0.25D)").as("p25"),
        expr("percentile(gap_ms, 0.5D)").as("p50"),
        expr("percentile(gap_ms, 0.75D)").as("p75"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))).toMap
    val qq = graft.plans.QuarterQuantiles.quarterQuantiles(
        gaps, Seq("event_type"), "gap_ms", Seq(1, 2, 3), bucketWidth = 60000L)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("q1_x4"), r.getAs[Long]("q2_x4"), r.getAs[Long]("q3_x4"))).toMap
    assert(qq.keySet == native.keySet)
    qq.foreach { case (k, (q1, q2, q3)) =>
      assert(q1 / 4.0 == native(k)._1, s"p25 mismatch for $k: ${q1 / 4.0} vs ${native(k)._1}")
      assert(q2 / 4.0 == native(k)._2, s"p50 mismatch for $k: ${q2 / 4.0} vs ${native(k)._2}")
      assert(q3 / 4.0 == native(k)._3, s"p75 mismatch for $k: ${q3 / 4.0} vs ${native(k)._3}")
    }
    // Tiny-group edge: quantiles of 1- and 2-row groups interpolate correctly.
    val tiny = ev.sparkSession.createDataFrame(Seq(("a", 10L), ("b", 10L), ("b", 20L)))
      .toDF("g", "v")
    val tq = graft.plans.QuarterQuantiles.quarterQuantiles(tiny, Seq("g"), "v", Seq(1, 2, 3), 7L)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("q1_x4"), r.getAs[Long]("q2_x4"), r.getAs[Long]("q3_x4"))).toMap
    assert(tq("a") == ((40L, 40L, 40L)))
    assert(tq("b") == ((50L, 60L, 70L))) // p25 = 12.5, p50 = 15, p75 = 17.5
  }

  test("feature lags: row grain preserved, ordinals contiguous, features equal brute recompute") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf0001)
    val rows = graft.events.Events.featureLags(ev).collect()
    assert(rows.length == ev.filter(col("event_type") === "purchase").count(),
      "one training row per purchase event")
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("purchase_idx"))
      assert(sorted.map(_.getAs[Long]("purchase_idx")).toSeq == (1L to rs.length).toSeq,
        s"user $uid ordinals not contiguous")
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i == 0) {
          assert(r.isNullAt(r.fieldIndex("lag1_value")) && r.isNullAt(r.fieldIndex("gap_s")),
            s"user $uid first purchase must have NULL history features")
        } else {
          assert(r.getAs[Double]("lag1_value") == sorted(i - 1).getAs[Double]("value"))
          assert(r.getAs[Long]("gap_s") >= 0L)
          val prev = sorted.slice(math.max(0, i - 3), i).map(_.getAs[Double]("value"))
          assert(math.abs(r.getAs[Double]("prev3_mean") - prev.sum / prev.length) < 1e-3,
            s"user $uid idx ${i + 1} rolling mean")
        }
      }
    }
  }

  test("weighted quantiles: monotone, attained, and equal to a brute cumulative-weight scan") {
    import org.apache.spark.sql.functions.{col, round => rnd}
    val li = Tables.lineitem(spark, sf0001)
    val out = graft.operators.Relational.weightedQuantiles(li).collect()
    assert(out.nonEmpty)
    val brute = li.select(col("l_returnflag"), col("l_quantity"),
        rnd(col("l_extendedprice") * 100, 0).cast("long").as("wc"))
      .collect().groupBy(_.getAs[String]("l_returnflag"))
    out.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("wp25"), r.getAs[Double]("wp50"), r.getAs[Double]("wp75"))
      assert(p25 <= p50 && p50 <= p75, "weighted quantiles must be monotone")
      val grp = brute(r.getAs[String]("l_returnflag"))
      val byQ = grp.groupBy(_.getAs[Double]("l_quantity")).view
        .mapValues(_.map(_.getAs[Long]("wc")).sum).toSeq.sortBy(_._1)
      val tot = byQ.map(_._2).sum
      def wq(pct: Long): Double = {
        var cum = 0L
        byQ.find { case (_, w) => cum += w; cum * 100 >= tot * pct }.get._1
      }
      assert(p25 == wq(25) && p50 == wq(50) && p75 == wq(75),
        s"brute weighted quantile mismatch for ${r.getAs[String]("l_returnflag")}")
      assert(grp.map(_.getAs[Double]("l_quantity")).contains(p50),
        "weighted median must be an attained value (disc semantics)")
    }
  }

  test("HTML report: every section renders, tables carry rows, baseline chart present") {
    val html = graft.Report.render(spark, sf0001)
    assert(html.startsWith("<!DOCTYPE html>") && html.endsWith("</html>"))
    // one panel per reference study family (run_all_benchmarks.py's tabs)
    // plus the engine headline panels and the baseline chart
    for (h <- Seq("Pricing summary", "Lake health", "Skip rate", "Delete storm",
                  "Inline budget", "Density-adaptive policy", "Roaring container model",
                  "DV resolution strategies", "Commit cadence", "Adaptive metadata tree",
                  "Wide-table pruning", "Concurrent writers", "Parallel fetch",
                  "Column/file DV update cost", "Compaction plan",
                  "Iceberg table format", "Iceberg compaction",
                  "Iceberg incremental scan", "Iceberg partitions metadata table",
                  "Puffin NDV statistics", "Sort-order skipping",
                  "Mixed delete resolution",
                  "Iceberg 2-level manifest tree", "Iceberg DV delete storm",
                  "Iceberg rewrite_manifests", "Iceberg commit series",
                  "Iceberg wide-table pruning", "Iceberg Z-order rewrite", "Iceberg CDC changelog",
                  "Iceberg changelog resume", "Iceberg 3-level manifest tree",
                  "Iceberg GC storage ladder", "Iceberg v3 row lineage", "Iceberg orphan-file scan",
                  "Iceberg changelog over mixed delete forms",
                  "Iceberg bucket-transform point lookup",
                  "Iceberg bucket MOR point lookup",
                  "Iceberg bucket evolution", "Iceberg files metadata table",
                  "Iceberg manifests + history metadata tables",
                  "Iceberg entries metadata table", "Iceberg rewrite_position_deletes",
                  "SQL front door (DataSourceV2)", "SQL INSERT INTO",
                  "MOR row-level UPDATE", "Rollback + cherry-pick",
                  "Column-file update, executed",
                  "Training-data funnel", "PII scan", "Multimodal quality gate",
                  "Multimodal token budget", "Scene-cut segmentation", "k-center coreset",
                  "Slowest queries"))
      assert(html.contains(s"<h2>$h"), s"missing section $h")
    assert("<section>".r.findAllIn(html).size == 54)
    // every table has at least one data row (the manifests+history and
    // rollback+cherry-pick panels each carry TWO tables in one section)
    val tables = "<tbody>\\n([\\s\\S]*?)</tbody>".r.findAllMatchIn(html).map(_.group(1)).toSeq
    assert(tables.size == 55)
    tables.foreach(t => assert(t.contains("<tr>"), "empty table body"))
    // the baseline chart has 20 bars with numeric values
    assert("class=\"bar\"".r.findAllIn(html).size == 20)
    // all dynamic text passed through the escaper (no raw angle brackets survive values)
    assert(!html.contains("<td><"), "unescaped cell content")
  }

  test("next-event eval: out-of-sample split honored, accuracy equals brute recompute") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf0001)
    val rows = graft.events.Events.nextEventEval(ev).collect()
    assert(rows.nonEmpty)
    // brute force from raw events — ordered by MICROsecond ts (unix_micros)
    // to match the operator's window order exactly: Timestamp.getTime is
    // millisecond-truncated, so two same-user events inside one millisecond
    // whose event_id order differs from their microsecond order would make
    // a ms-ordered brute model diverge (latent flake, not a real failure)
    val raw = ev.select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[String]("event_type")))
    val pairs = raw.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      es.sortBy(e => (e._3, e._2)).map(_._4).toSeq.sliding(2)
        .collect { case Seq(a, b) => (uid, a, b) }.toSeq
    }
    val train = pairs.filter(_._1 % 2 == 0).groupBy(p => (p._2, p._3)).view.mapValues(_.size.toLong)
    val model = train.keys.groupBy(_._1).view.mapValues { ks =>
      ks.toSeq.map(k => (k._2, train(k))).sortBy { case (nt, n) => (-n, nt) }.head._1
    }.toMap
    val evalPairs = pairs.filter(_._1 % 2 == 1)
    rows.foreach { r =>
      val pt = r.getAs[String]("prev_type")
      assert(r.getAs[String]("predicted_next") == model(pt), s"$pt: argmax diverges")
      val ep = evalPairs.filter(_._2 == pt)
      assert(r.getAs[Long]("n_eval") == ep.size.toLong)
      assert(r.getAs[Long]("n_correct") == ep.count(_._3 == model(pt)).toLong)
      assert(r.getAs[Long]("n_train") == train.filter(_._1._1 == pt).values.sum)
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }
}
