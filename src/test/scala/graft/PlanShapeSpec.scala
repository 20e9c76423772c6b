package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LogicalWindow}

/** Plan-shape regression tests: the scale guarantees the round-6 verdict
  * asked for are asserted against the OPTIMIZED PLAN, not just claimed in
  * scaladoc. A query that re-grows a single-partition sort over an unbounded
  * input fails here before any benchmark notices.
  *
  * The boundedness proof used is Catalyst's own static row bound
  * (`LogicalPlan.maxRows`): a global `Window` whose child has
  * `maxRows = Some(k)` can move at most k rows to the one partition — the
  * top-N-limited survivor shape (`orderBy(...).limit(k)` below the window).
  * Queries whose global windows run over parameter-bounded AGGREGATES
  * (PrefixSum's ≤ nBuckets offsets, histogram roll-ups) have no static
  * maxRows; those are covered by the win1 sanction review in `graft.Audit`
  * and the randomized equivalence specs instead. */
class PlanShapeSpec extends SparkSpec {

  private def globalWindows(df: DataFrame): Seq[LogicalWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }

  private def assertBoundedGlobalWindows(df: DataFrame, bound: Long): Unit = {
    val wins = globalWindows(df)
    assert(wins.nonEmpty, "expected the rank window to survive optimization")
    wins.foreach { w =>
      val mr = w.child.maxRows
      assert(mr.isDefined && mr.get <= bound,
        s"global window input not statically bounded (maxRows=$mr, bound=$bound):\n${w.child}")
    }
  }

  test("text_zipf ranks only the top-N-limited survivor table") {
    val docs = tables.Tables.documents(spark, sf0001)
    assertBoundedGlobalWindows(text.TextAnalysis.zipfSlope(docs), 100L)
  }

  test("text_vocab_coverage windows only the top-k-limited survivor table") {
    val docs = tables.Tables.documents(spark, sf0001)
    assertBoundedGlobalWindows(text.TextAnalysis.vocabCoverage(docs), 31L)
  }

  test("text_weighted_sample ranks only the k-limited sample") {
    val docs = tables.Tables.documents(spark, sf0001)
    assertBoundedGlobalWindows(text.TextAnalysis.weightedSample(docs), 50L)
  }

  test("exchange-count ceilings pin the plans of the heaviest queries") {
    // Every exchange is a shuffle or broadcast stage; a plan regression that
    // adds one to a heavy query costs a bench round before anyone notices —
    // so the current (audited) counts are pinned as ceilings. Counted from
    // the physical plan OBJECT with AQE off (same protocol as graft.Audit);
    // ReusedExchange reuse nodes are not Exchange subclasses, so shared
    // subtrees count once. Ceilings are the counts measured at pin time.
    val pins = Seq(
      "dedup_lsh_tuning" -> 11, "text_pipeline_funnel" -> 10,
      "dedup_substring" -> 9, "q56_mad_outliers" -> 9,
      "knn_multiprobe" -> 3, "ev_power_users" -> 20,
      "text_char_langid" -> 11, "text_repetition" -> 1,
      "lake_snapshot_lineage" -> 25, "q68_revenue_bridge" -> 4,
      // round-8 additions, pinned at their shipped counts:
      "dedup_bloom" -> 17, "text_perplexity" -> 14,
      "lake_row_lineage" -> 8, "dedup_minhash_calibration" -> 8)
    pins.foreach { case (name, cap) =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val n = df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.Exchange => e
        }.length
        info(s"$name: $n exchanges (ceiling $cap)")
        assert(n <= cap, s"$name plans $n exchanges, ceiling $cap — a shuffle regressed")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("shipped sketch variants plan no exact-distinct anchor") {
    // The benchVariants overrides exist so Bench/Audit measure sketch-only
    // state; this pins that contract in the plan. An isDistinct aggregate
    // (countDistinct's exact anchor) anywhere in the optimized plan means
    // the verification pass leaked back into the shipped shape — the HLL /
    // GK sketches themselves are plain (non-distinct) aggregate functions.
    for (name <- Seq("ev_approx_users", "q30_approx_quantiles_sketch")) {
      // q30's checked shape IS its shipped shape (no exact anchor), so it
      // has no benchVariants override and falls through to `queries`
      val df = SparkEntry.benchVariants.getOrElse(name, SparkEntry.queries(name))(spark, sf0001)
      val agg = df.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(agg.nonEmpty)
      val distinctAggs = agg.flatMap(_.aggregateExpressions).flatMap(_.collect {
        case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
          if ae.isDistinct => ae
      })
      assert(distinctAggs.isEmpty,
        s"$name shipped variant buffers an exact anchor:\n${distinctAggs.mkString("\n")}")
      // and exactly one scan: no verification re-join of the fact table
      val scans = df.queryExecution.optimizedPlan.collectLeaves()
      assert(scans.size == 1, s"$name shipped variant should scan once, saw ${scans.size}")
    }
  }

  test("ev_rfm and ev_power_users plans carry no global ntile/rank over users") {
    val events = tables.Tables.events(spark, sf0001)
    // Every surviving global window must be over a statically-bounded child
    // (decile/share tables); the per-user tables flow through PrefixSum /
    // QuarterQuantiles whose global windows sit on parameter-bounded
    // aggregates — assert none of them windows a raw per-user relation
    // (aggregates have grouping exprs; a window directly over the user
    // grouping would resurface user cardinality).
    Seq(graft.events.Events.rfmSegments(events),
        graft.events.Events.powerUsers(events)).foreach { df =>
      globalWindows(df).foreach { w =>
        val userCols = w.child.output.map(_.name).filter(_ == "user_id")
        assert(userCols.isEmpty,
          s"global window directly over a user_id-grain relation:\n${w.child}")
      }
    }
  }

  test("mm_scene_cut: every window is per-payload, one shuffle does all the work") {
    val docs = tables.Tables.documents(spark, sf0001)
    val df = graft.multimodal.Multimodal.sceneCut(docs)
    // the lag + running-cut windows and the (doc, scene) aggregate are all
    // keyed by doc_id — a global window here would serialize the corpus
    assert(globalWindows(df).isEmpty, "scene cut must never window globally")
    df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty))
    // one doc_id exchange feeds windows AND the co-partitioned (doc, scene)
    // aggregate (HashPartitioning(doc_id) satisfies the subset clustering);
    // the trailing range exchange is the final orderBy presentation sort
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val n = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.length
      info(s"mm_scene_cut: $n exchanges")
      assert(n <= 2, s"mm_scene_cut plans $n exchanges — a shuffle regressed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
