package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Plan auditor: one line per query with the physical-operator counts that
  * matter at scale (exchanges, join strategies, codegen coverage). Flags
  * CartesianProduct / BroadcastNestedLoopJoin so unintentional quadratic
  * plans can't hide (the range join's BNLJ against a tiny band table is the
  * one sanctioned use), and partition-less WindowExec nodes (a global window
  * moves its whole input to one task — only legitimate over an input whose
  * row count is bounded by a query parameter, never by data volume).
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)

    println(f"${"query"}%-24s ex  bhj smj bnlj cart wsc  win1 flags")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn0) =>
      // Audit the shipped shape: sketch queries are audited without their
      // exact-anchor verification pass (same override Bench uses).
      val fn = SparkEntry.benchVariants.getOrElse(name, fn0)
      try {
        val df = fn(spark, sfDir)
        // The query wrapper re-tunes the session (AQE on) on every call, and
        // an unexecuted AdaptiveSparkPlan string hides both the codegen
        // stage markers and the final join choices — so flip AQE off after
        // building the frame and before forcing the (lazy) physical plan.
        // Join-strategy counts are then the compile-time choices; AQE can
        // only improve them at runtime.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val physical = df.queryExecution.executedPlan
        // Partition-less windows from the plan OBJECT (the partition spec is
        // not reliably greppable from the tree string): every WindowExec in
        // the main tree with an empty partitionSpec.
        var win1 = 0
        physical.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty => win1 += 1
          case _ => ()
        }
        val plan = physical.toString
        def c(s: String) = plan.linesIterator.count(_.contains(s))
        val ex = c("Exchange")
        val bhj = c("BroadcastHashJoin")
        val smj = c("SortMergeJoin")
        val bnlj = c("BroadcastNestedLoopJoin")
        val cart = c("CartesianProduct")
        // Codegen stages render as "*(n) Op" prefixes in the tree string
        // (the literal node name only appears in formatted explain), so
        // count distinct stage ids, not the node name.
        val wsc = plan.linesIterator
          .flatMap(l => "\\*\\((\\d+)\\)".r.findFirstMatchIn(l).map(_.group(1)))
          .toSet.size
        val flags = new StringBuilder
        if (cart > 0) flags.append(" CARTESIAN!")
        // Sanctioned nested-loop joins — every one broadcasts a bounded side:
        // a single-row global aggregate (funnel/skip_rate/zorder/expiry/
        // scalar subquery/decay anchor/stats pin/WAP head/PMI totals/RFM
        // thresholds/retention head), a fixed band/centroid/era/spine table
        // (range join, knn_centroid, sort/branch refs, date/day spines,
        // Heaps checkpoints, coverage k-list), or a bounded query set
        // against the corpus (brute-force KNN, range search,
        // recall/matryoshka reports). dedup_embedding is LSH-banded — no
        // BNLJ — and is deliberately NOT sanctioned.
        val sanctionedBnlj = Set("q19_range_join", "q13_scalar_subquery",
          "knn_brute", "knn_centroid", "knn_kmeans",
          "ev_funnel", "lake_skip_rate", "lake_zorder", "lake_expiry_plan",
          "lake_clustering_depth", "q33_fuzzy_join",
          "ev_decay_score", "ev_rfm", "ev_rolling_active",
          "knn_matryoshka", "knn_range_search", "knn_recall",
          "lake_branch_tags", "lake_retention_ladder", "lake_sort_evolution",
          "lake_stats_freshness", "lake_wap_audit",
          "q40_date_spine", "text_heaps", "text_pmi", "text_vocab_coverage",
          // Two-phase prefix-sum consumers (PrefixSum broadcasts its 1-row
          // key-range aggregate) and other single-row stat broadcasts:
          "lake_commit_log", "lake_compaction_plan", "lake_compaction_execute",
          "q63_pareto", "lake_rowgroup_prune", "dedup_lsh_tuning",
          "ev_forecast_backtest", "q61_equiheight_histogram", "text_drift",
          // Round-4 additions, all 1-row broadcast stats: benford/skew/bucket
          // totals, the gini prefix-sum + total, the source-mix byte floor:
          "q64_benford", "q65_gini", "lake_partition_skew",
          "lake_bucket_pruning", "mm_source_mix",
          // dedup_bloom attaches its 1-row bits_set/fill aggregate:
          "dedup_bloom",
          // Decile lift = prefix-sum + 1-row total; probe sweep broadcasts
          // the 10-centroid table and the 3-row nprobe spine:
          "q66_decile_lift", "knn_probe_sweep",
          // Behavior kNN broadcasts its bounded probe set; the sort-key
          // advisor and threshold sweep broadcast 1-row stat tables:
          "ev_behavior_knn", "lake_sort_key_choice", "knn_threshold_sweep",
          // Column-update cost: the medium-tier 1-row summary is broadcast
          // onto the base-tier 1-row summary before the 4-scenario explode;
          // power users = prefix-sum ranks + two 1-row broadcasts (uid span,
          // population count); fetch latency explodes a 5-rung thread ladder
          // off its broadcast 1-row fragment census:
          "lake_column_update_cost", "ev_power_users", "lake_fetch_latency",
          // Inline budget rides PrefixSum's broadcast 1-row key range:
          "lake_inline_budget",
          // Packing rides PrefixSum's 1-row key range; the mix plan crosses
          // the 4-row alpha spine + 1-row totals; the shard plan's
          // epoch×shard spine is a range()×range() cross of 3×8 rows:
          "text_packing", "text_mix_plan", "text_shard_plan",
          // Quality budget: 5-row target spine range-joined against the
          // ≤1e6-row quantized-quality cumulative histogram (+ PrefixSum's
          // 1-row key range):
          "text_quality_budget",
          // Funnel: the 4-row stage table crosses the broadcast 1-row raw
          // totals for the pct columns; the jaccard sweep broadcasts its
          // 4-row threshold spine + the 1-row corpus count:
          "text_pipeline_funnel", "dedup_jaccard_sweep",
          // Eq-delete write path: the 1-row distinct-key count is broadcast
          // onto the 1-row per-file cost summary before the 3-strategy explode:
          "lake_eq_write_cost",
          // PrefixSum/lagOver/prefixMax broadcast their 1-row key-range
          // aggregate (commit-ordered lake queries routed through them):
          "lake_commit_cadence", "lake_snapshot_lineage",
          // Round-9 additions: the KM curve crosses its 1-row horizon
          // aggregate; rerank joins the 10-row broadcast probe set against
          // the corpus twice (coarse tier + exact ground truth — the
          // knn_brute sanction, threefold); DSIR broadcasts its ≤ 256-row
          // hashed-bucket distribution tables (target + raw):
          "ev_survival", "knn_rerank", "text_dsir",
          // IVF balance: broadcast centroid table (knn_centroid sanction)
          // + the 1-row global stats onto the k-bounded list table:
          "knn_ivf_balance",
          // Sketch set-algebra: the type-pair stage is a non-equi join of
          // two ALPHABET-bounded per-type sketch tables (|types|² rows):
          "ev_approx_overlap",
          // Count-Min calibration: the 1-row stream total crossed onto the
          // topN-bounded estimate table; bloom-join report crosses its
          // 1-row build-key count onto the 1-row probe summary:
          "q70_countmin", "q71_bloom_join",
          // LM backoff: the 1-row train-token total broadcasts onto the
          // scored eval stream:
          "text_lm_backoff",
          // Kneser–Ney: the 1-row t_types scalar broadcasts onto the scored
          // bigram table (TextAnalysis.scala:1181):
          "text_kneser_ney",
          // Puffin NDV (CrossSketch form, r13): the 1-row HLL estimate
          // broadcasts onto the 1-row file census (Manifest.scala:482):
          "lake_puffin_ndv")
        // Sanctioned partition-less windows — every one runs over an input
        // whose row count is bounded by a QUERY PARAMETER or a fixed domain
        // (nBuckets roll-ups, file-model nFiles, a spine/ladder literal, a
        // top-N limit, a calendar/category domain), never by data volume.
        // Reviewed per site in this round's full-audit pass:
        val sanctionedGlobalWindow: Set[String] = Set(
          // plans.PrefixSum / lagOver / prefixMax internals: the ≤ nBuckets-row
          // bucket-offset window and the ≤ 64·nBuckets-row fine-histogram
          // windows (PrefixSum.scala:56, 151-157) — counted once per branch
          // of the duplicated bucketed subtree:
          "ev_power_users", "q63_pareto", "q65_gini", "q66_decile_lift",
          "text_packing", "text_quality_budget", "lake_commit_log",
          "lake_compaction_plan", "lake_compaction_execute",
          "lake_inline_budget", "lake_commit_cadence", "lake_snapshot_lineage",
          // plans.QuarterQuantiles.discreteQuartiles: windows over per-metric
          // histograms bounded by value-range / bucketWidth (Events.rfmSegments
          // scaladoc), not user cardinality:
          "ev_rfm",
          // Top-N-limited survivor tables (TakeOrderedAndProject BEFORE the
          // window): zipf top-100, vocab top-31, weighted-sample top-50:
          "text_zipf", "text_vocab_coverage", "text_weighted_sample",
          // file-model nFiles-bounded (≤ 40-row) per-file summaries:
          "lake_health_report",
          // Fixed calendar/category domains: 168-row dow×hod grid, month and
          // day spines, tenure weeks, 25 nations, bounded brand/size/decile
          // sets (q44 brands, q48/q50 p_size, q66's 10 deciles, ev_power's
          // 10 deciles share window):
          "ev_seasonality", "ev_churn_hazard", "ev_survival", "q35_ratio_report",
          "q39_mom_growth", "q44_two_level_share", "q48_skyline",
          "q50_chi_square", "q52_interval_concurrency", "q59_customer_growth",
          // lake_row_lineage's live-rows cumulative sum runs over the
          // ≤ #months sequence spine (calendar domain):
          "lake_row_lineage",
          // Dictionary-rank oracle mode only (flag-on hashTid removes it;
          // TextAnalysis.scala:90 scaladoc); dedup_bloom rides the same
          // vocab-bounded fingerprint dictionary:
          "text_fingerprint", "dedup_bloom", "text_dsir")
        if (bnlj > 0 && !sanctionedBnlj(name)) flags.append(" BNLJ?")
        if (win1 > 0 && !sanctionedGlobalWindow(name)) flags.append(" WIN1?")
        println(f"$name%-24s $ex%-3d $bhj%-3d $smj%-3d $bnlj%-4d $cart%-4d $wsc%-4d $win1%-4d$flags")
      } catch {
        case e: Throwable => println(f"$name%-24s FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
