package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables

/** Self-contained HTML report — the graft mirror of the reference suite's
  * dashboard layer (`index_original_backup.html` and the images dir): the same
  * headline numbers the queries emit, rendered as static tables plus inline
  * SVG bar charts, zero dependencies, one file a browser (or a CI artifact
  * store) can open as-is.
  *
  * Usage: `runMain graft.Report <sfDir> <out.html>`. Everything in the page
  * comes from `SparkEntry.queries`-registered operators (so the report can
  * never diverge from the verified surface) plus the committed idle-box
  * bench baseline resource.
  */
object Report {

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** A DataFrame as a static HTML table (bounded rows — reports page, they
    * don't stream). */
  def htmlTable(df: DataFrame, maxRows: Int = 60): String = {
    val cols = df.columns
    val rows = df.limit(maxRows).collect()
    val head = cols.map(c => s"<th>${escape(c)}</th>").mkString
    val body = rows.map { r =>
      "<tr>" + cols.indices.map { i =>
        val v = if (r.isNullAt(i)) "∅" else String.valueOf(r.get(i))
        s"<td>${escape(v)}</td>"
      }.mkString + "</tr>"
    }.mkString("\n")
    s"<table>\n<thead><tr>$head</tr></thead>\n<tbody>\n$body\n</tbody></table>"
  }

  /** Horizontal SVG bar chart (label, value) — longest bar = full width. */
  def barChart(data: Seq[(String, Double)], unit: String, width: Int = 640): String = {
    if (data.isEmpty) return "<p>(no data)</p>"
    val barH = 18; val gap = 4; val labelW = 220
    val maxV = math.max(data.map(_._2).max, 1e-9)
    val h = data.size * (barH + gap)
    val bars = data.zipWithIndex.map { case ((label, v), i) =>
      val y = i * (barH + gap)
      val w = math.max(1.0, (width - labelW - 80) * v / maxV)
      s"""<text x="${labelW - 6}" y="${y + 13}" text-anchor="end" class="lbl">${escape(label)}</text>""" +
        s"""<rect x="$labelW" y="$y" width="${w.toInt}" height="$barH" class="bar"/>""" +
        s"""<text x="${labelW + w.toInt + 5}" y="${y + 13}" class="val">${f"$v%.3f"} $unit</text>"""
    }.mkString("\n")
    s"""<svg width="$width" height="$h" role="img">$bars</svg>"""
  }

  private def section(title: String, note: String, body: String): String =
    s"""<section><h2>${escape(title)}</h2><p class="note">${escape(note)}</p>\n$body\n</section>"""

  /** Committed per-query baseline resource → slowest-N chart data.
    *
    * The resource is the FLAT one-level object Bench writes (query name →
    * seconds), so a regex parse is adequate — but guarded, not trusting:
    * any nesting/array syntax rejects the file outright (a restructured
    * resource must fail loudly, not render wrong bars), values must be
    * plain decimals (scientific notation would silently mis-parse), only
    * registered query names count, and at least half the registry must
    * parse (catches truncation). */
  def baselineTop(n: Int): Seq[(String, Double)] = {
    val in = getClass.getResourceAsStream("/graft/bench_baseline_sf0.1.json")
    if (in == null) Seq.empty
    else {
      val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      require(!txt.drop(1).exists(c => c == '{' || c == '['),
        "bench baseline resource is no longer a flat object — update this parser")
      val pairs = """"([A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)(?![0-9eE.])""".r
        .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toSeq
      val known = pairs.filter(p => SparkEntry.queries.contains(p._1))
      require(known.size * 2 >= SparkEntry.queries.size,
        s"parsed only ${known.size} baseline entries for ${SparkEntry.queries.size} registered queries")
      known.sortBy(-_._2).take(n)
    }
  }

  /** One panel per reference study family (the 11-tab dashboard of
    * `run_all_benchmarks.py` / `benchmark-results.html`), every panel
    * rendered from a REGISTERED query — the report can never show numbers
    * the correctness gate doesn't check. */
  def render(spark: SparkSession, sfDir: String): String = {
    def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
    val sections = Seq(
      section("Pricing summary (q1)", "The flagship aggregation — the TPC-H Q1 shape.",
        htmlTable(q("q1_pricing_summary"))),
      section("Lake health", "Fragmentation, delete pressure, small-file and clustering posture " +
        "— the maintenance scheduler's input (mirrors the reference's all_benchmarks_results).",
        htmlTable(q("lake_health_report"))),
      section("Skip rate", "File pruning for the quarter predicate on clustered vs unclustered " +
        "layout — the reference's headline tradeoff.",
        htmlTable(q("lake_skip_rate"))),
      section("Delete storm", "Accumulating DV waves per file: resolution cost growth and the " +
        "compaction trigger point (reference suite 1, test_delete_storm).",
        htmlTable(q("lake_delete_storm"), maxRows = 20)),
      section("Inline budget (GC cliff)", "Manifest inline-payload budget vs the 4KB/10MB " +
        "thresholds the reference validates against S3 TTFB and G1GC humongous objects " +
        "(suite 2, test_gc_performance_cliff).",
        htmlTable(q("lake_inline_budget"), maxRows = 20)),
      section("Density-adaptive policy", "Per-file DV encoding choice and inline/external " +
        "decision (suite 3, test_density_adaptive_policy).",
        htmlTable(q("lake_dv_density"), maxRows = 20)),
      section("Roaring container model", "Byte-accurate array/bitmap/run container accounting " +
        "per DV — the measured-size refinement of the density policy (suite 3's pyroaring sizes).",
        htmlTable(q("lake_dv_roaring"), maxRows = 20)),
      section("DV resolution strategies", "Hash-join vs positional memory, folded-manifest IO " +
        "and write-overhead ladder per manifest-size rung (suite 4, test_dv_resolution_strategies).",
        htmlTable(q("lake_dv_strategies"))),
      section("Commit cadence (single-file commits)", "Streaming commit-rate study: snapshot " +
        "metadata growth per commit cadence (suite 5, test_single_file_commits).",
        htmlTable(q("lake_commit_cadence"), maxRows = 20)),
      section("Adaptive metadata tree", "Manifest-tree depth/fan-out trade at growing file " +
        "counts (suite 6, test_adaptive_metadata_tree).",
        htmlTable(q("lake_manifest_tree"), maxRows = 20)),
      section("Wide-table pruning", "Column-statistics payload vs pruning benefit on wide " +
        "schemas (suite 7, test_wide_table_pruning).",
        htmlTable(q("lake_wide_prune"), maxRows = 20)),
      section("Concurrent writers", "Optimistic-concurrency conflict/retry model per writer " +
        "count (suite 8, test_concurrent_writers; the bench's occ_bench block measures the " +
        "same ladder with real racing threads).",
        htmlTable(q("lake_concurrent_commits"))),
      section("Parallel fetch", "Manifest fetch latency vs parallelism — the ceil(n/p)×TTFB " +
        "ladder (test_parallel_s3_fetching; the bench's fetch_bench block measures it).",
        htmlTable(q("lake_fetch_latency"))),
      section("Column/file DV update cost", "Per-column update amplification across file-count " +
        "tiers (test_column_file_dv_updates).",
        htmlTable(q("lake_column_update_cost"), maxRows = 20)),
      section("Compaction plan", "Which files the maintenance pass would rewrite, and why.",
        htmlTable(q("lake_compaction_plan"))),
      section("Iceberg table format (real metadata)", "Snapshot log of the from-scratch " +
        "Iceberg implementation — real metadata.json / Avro manifests, read with zero data IO.",
        htmlTable(q("iceberg_snapshots"))),
      section("Iceberg compaction", "Merge-on-read materialized into a replace snapshot: " +
        "data/delete file census before vs after, live rows from manifest stats.",
        htmlTable(q("iceberg_compact"))),
      section("Iceberg incremental scan", "What arrived since snapshot 1 — the tailer's " +
        "per-batch view, planned from lineage-scoped manifests alone.",
        htmlTable(q("iceberg_incremental"), maxRows = 20)),
      section("Iceberg partitions metadata table", "Per-partition file/row census + manifest " +
        "bounds, read with zero data IO (the tbl.partitions inspection surface).",
        htmlTable(q("iceberg_meta_tables"), maxRows = 20)),
      section("Puffin NDV statistics", "Real Puffin file (spec byte layout) carrying KMV NDV " +
        "sketches per column, bound to its snapshot via the metadata statistics field.",
        htmlTable(q("iceberg_puffin"))),
      section("Sort-order skipping", "Clustered (rank-block) vs hashed layout at identical " +
        "file counts: files/rows planned for the same two-week probe.",
        htmlTable(q("iceberg_sort_skipping"))),
      section("Mixed delete resolution", "Equality + positional delete files applied in one " +
        "sequence-scoped MOR scan — the general v2 reader case.",
        htmlTable(q("iceberg_mixed_deletes"))),
      section("Iceberg 2-level manifest tree", "The adaptive-tree study on real metadata: " +
        "flat vs year-grouped branch manifests planning the same one-month scan — identical " +
        "results, a fraction of the planner IO.",
        htmlTable(q("iceberg_manifest_tree"))),
      section("Iceberg DV delete storm", "Real v3 deletion-vector waves: fragment growth, " +
        "actual Puffin blob bytes vs the 4KB inline cliff, and the fold commit's byte " +
        "amplification (test_delete_storm on the real format).",
        htmlTable(q("iceberg_delete_storm"))),
      section("Iceberg rewrite_manifests", "Metadata-only maintenance commit re-binning the " +
        "head snapshot's entries into year branches: identical planned files, a fraction of " +
        "the planner IO.",
        htmlTable(q("iceberg_rewrite_manifests"))),
      section("Iceberg commit series", "24 single-month commits: linear manifest-list growth " +
        "with CONSTANT probe IO (range pruning), then the rewrite fold's collapse " +
        "(test_single_file_commits on the real format).",
        htmlTable(q("iceberg_commit_series"), maxRows = 26)),
      section("Iceberg wide-table pruning", "A 3-conjunct predicate answered from real " +
        "manifest bound maps alone (wide integer-canonical stats, zero parquet footers read).",
        htmlTable(q("iceberg_wide_prune"), maxRows = 20)),
      section("Iceberg Z-order rewrite", "rewrite_data_files with a 2-dim Morton sort order: " +
        "the same conjunctive probe planned at the hashed and rewritten snapshots — identical " +
        "matching rows, a fraction of the files/rows because each z file bounds BOTH dims.",
        htmlTable(q("iceberg_zorder_rewrite"))),
      section("Iceberg CDC changelog", "create_changelog_view over the storm history: " +
        "per-snapshot inserts, DV-asserted deletes and NET deletes after position dedup — " +
        "the fold asserts the full union yet nets zero (metadata+blob grain, zero data reads).",
        htmlTable(q("iceberg_changelog"))),
      section("Iceberg changelog resume", "A CDC tailer resuming from the era-2 checkpoint: " +
        "the emitted rows are exactly the tail of the full changelog — " +
        "changelog(0,m] ++ changelog(m,head] partitions the history at every split.",
        htmlTable(q("iceberg_changelog_resume"))),
      section("Iceberg 3-level manifest tree", "The full adaptive-tree ladder on real " +
        "metadata: flat / year branches / index→sub-list→quarter leaves planning one month — " +
        "entries parsed drop monotonically at identical planned rows.",
        htmlTable(q("iceberg_tree3"))),
      section("Iceberg GC storage ladder", "Real Puffin DV bytes against the full " +
        "4KB/64KB/10MB cliff ladder: per-blob verdicts and per-wave payload storage class; " +
        "the dense hashed wave crosses 64KB for real at sf0.1.",
        htmlTable(q("iceberg_gc_cliff"))),
      section("Iceberg v3 row lineage", "first_row_id assignment from the monotone " +
        "next-row-id counter, and survivor _row_id preservation through the " +
        "lineage-materializing compaction — the survivor id SUM pins the exact set.",
        htmlTable(q("iceberg_row_lineage"), maxRows = 20)),
      section("Iceberg orphan-file scan", "remove_orphan_files on the real format: the " +
        "crashed writer's uncommitted month files — invisible to scans, un-GC-able by " +
        "expiry — found by walking disk against the reachable metadata tree.",
        htmlTable(q("iceberg_orphan_scan"))),
      section("Iceberg changelog over mixed delete forms", "The CDC changelog on a history " +
        "written with equality AND positional-parquet deletes (the Flink-writer norm): " +
        "per-step asserted vs net deletes and running live rows, all three delete forms " +
        "resolved in one union-dedup job — no per-snapshot rescan.",
        htmlTable(q("iceberg_changelog_mixed"))),
      section("Iceberg bucket-transform point lookup", "bucket[16](l_orderkey) on the real " +
        "format: each probe key plans one of four branch manifests and one of sixteen files " +
        "from the manifest list's partition summaries — the key-equality pruning identity " +
        "and date specs cannot provide.",
        htmlTable(q("iceberg_bucket_prune"))),
      section("Iceberg bucket MOR point lookup", "The bucket transform composed with v3 " +
        "deletion vectors: one file planned per key, its DV blob anti-joined on position " +
        "before the key filter — a deleted key returns zero rows from a one-file scan.",
        htmlTable(q("iceberg_bucket_mor"))),
      section("Iceberg bucket evolution (identity → bucket)", "Partition evolution across " +
        "transform families: the point lookup prunes the bucket era to one file but scans " +
        "every month-era file; the date-range probe skips the month era at manifest level " +
        "while every hash-scattered bucket file overlaps — the migration trade, censused.",
        htmlTable(q("iceberg_bucket_evolution"))),
      section("Iceberg files metadata table", "SELECT * FROM tbl.files — per-file partition, " +
        "row count, column bounds and entry-grain provenance, straight from manifests with " +
        "zero data IO.",
        htmlTable(q("iceberg_files_meta"), maxRows = 20)),
      section("Iceberg manifests + history metadata tables", "tbl.manifests (manifest-list " +
        "grain: added snapshot, file/row counts, partition summaries) and tbl.history " +
        "(per-snapshot state census) side by side.",
        htmlTable(q("iceberg_manifests_meta")) + htmlTable(q("iceberg_history_meta"))),
      section("Iceberg entries metadata table", "tbl.entries — every current-snapshot " +
        "manifest entry INCLUDING the delete files, with content type and the " +
        "sequence/snapshot coordinates that scope delete application (delete " +
        "entries shown first; the 83 data entries would otherwise fill the cap).",
        htmlTable({
          import org.apache.spark.sql.functions.{col, desc, lit, when}
          // delete files carry an empty partition label — render it
          // explicitly (an empty <td> would trip the escape canary)
          q("iceberg_entries_meta")
            .withColumn("p_month",
              when(col("p_month") === "", lit("(none)")).otherwise(col("p_month")))
            .orderBy(desc("content_type"), col("p_month"))
        }, maxRows = 20)),
      section("Iceberg rewrite_position_deletes", "The v3 migration maintenance action: " +
        "overlapping pos-parquet waves + a DV wave consolidate into ONE deletion vector " +
        "per data file (positions_pre_sum with the overlap double-counted shrinks to the " +
        "exact union), scoping preserved, visible rows unchanged.",
        htmlTable(q("iceberg_rewrite_deletes"))),
      section("SQL front door (DataSourceV2)", "SELECT through the registered GraftCatalog: " +
        "pushed shipdate bounds prune files at the manifest stats (files_scanned vs " +
        "files_total) and the required schema became the parquet projection (cols_read).",
        htmlTable(q("iceberg_sql_select"))),
      section("SQL INSERT INTO", "The write half of the front door: era 2 arrived via " +
        "INSERT INTO routed through the committing append — indistinguishable history, " +
        "incrementally planned at (1, 2].",
        htmlTable(q("iceberg_sql_insert"))),
      section("MOR row-level UPDATE", "One overwrite snapshot pairing a deletion vector on " +
        "the victims' old positions with replacement files: _row_id preserved (distinct ids " +
        "== rows), updated rows carry the update's _last_updated_sequence_number.",
        htmlTable(q("iceberg_update_mor"))),
      section("Rollback + cherry-pick", "Metadata-only retarget of main (bad head still " +
        "time-travelable) and the non-fast-forward WAP publish (staged entries replayed at " +
        "the new sequence; incremental consumers see them exactly once at the pick id).",
        htmlTable(q("iceberg_rollback")) + htmlTable(q("iceberg_cherry_pick"))),
      section("Column-file update, executed", "The same update paid three real ways — CoW " +
        "rewrite, MOR replacement, column-file sidecar keyed by _row_id — with the model's " +
        "byte ordering pinned (sidecar < replacement < full rewrite).",
        htmlTable(q("lake_column_update_exec"))),
      section("Training-data funnel", "Docs and tokens surviving each curation stage.",
        htmlTable(q("text_pipeline_funnel"))),
      section("PII scan", "Redaction pre-pass counts per source and class (explicit zeros).",
        htmlTable(q("text_pii_scan"), maxRows = 20)),
      section("Multimodal quality gate", "Payload ingest cascade (first failing rule wins): " +
        "per-source rule funnel with explicit zero cells — the media twin of the text cascade.",
        htmlTable(q("mm_quality_gate"), maxRows = 24)),
      section("Multimodal token budget", "Text vs vision token pools per source, exact " +
        "basis-point shares, and the media keep-rate that returns an over-cap source to the " +
        "30% vision ceiling.",
        htmlTable(q("mm_token_budget"), maxRows = 20)),
      section("Scene-cut segmentation", "Shot boundaries over binary payloads: scenes tile " +
        "each payload's frame axis (gaps-and-islands over frame-delta cuts) — the curation " +
        "grain a video pipeline samples at.",
        htmlTable(q("mm_scene_cut"), maxRows = 20)),
      section("k-center coreset", "Greedy farthest-point diversity selection over the " +
        "embedding corpus: pick order, distance-when-chosen and the monotone coverage-radius " +
        "curve — when adding centers stops buying coverage.",
        htmlTable(q("knn_coreset"))),
      section("Slowest queries — committed idle-box baseline (sf0.1)",
        "Best observed per-query seconds on a quiet host; the bench artifact's defense baseline.",
        barChart(baselineTop(20), "s")))
    s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>graft report</title>
       |<style>
       | body { font: 14px/1.45 system-ui, sans-serif; margin: 2rem auto; max-width: 72rem; color: #1a1a24; }
       | h1 { font-size: 1.5rem; } h2 { font-size: 1.15rem; margin: 1.6rem 0 .2rem; }
       | .note { color: #667; margin: .1rem 0 .6rem; }
       | table { border-collapse: collapse; font-variant-numeric: tabular-nums; }
       | th, td { border: 1px solid #d8d8e0; padding: .25rem .55rem; text-align: right; }
       | th { background: #f2f2f7; } td:first-child, th:first-child { text-align: left; }
       | .bar { fill: #5b6ee1; } .lbl { font-size: 11px; fill: #334; } .val { font-size: 11px; fill: #667; }
       |</style></head><body>
       |<h1>graft — engine report</h1>
       |<p class="note">Generated from $sfDir via SparkEntry-registered queries only.</p>
       |${sections.mkString("\n")}
       |</body></html>""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/graft_report.html")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val html = render(spark, sfDir)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"report: $out (${html.length} bytes)")
    spark.stop()
  }
}
