package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifest / metadata-tree operators (SURVEY.md §2.2).
  *
  * Re-expresses the reference's root-manifest statistics and manifest-tree
  * planning (`poc/test_wide_table_pruning.py:236` `_build_root_manifest_stats`,
  * `poc/test_adaptive_metadata_tree.py:58` flat tree) as distributed
  * aggregations: a manifest is just a DataFrame of per-file stats, built with
  * one map-side-combinable groupBy over the data — no footer round-trips, no
  * driver loops. Pruning decisions are then joins/filters against that tiny
  * stats table, which Spark broadcasts.
  */
object Manifest {

  /** Per-file column statistics — the "root manifest aggregated stats" that
    * let a planner prune files without reading data (V4's wide-table fix). */
  def fileStats(lineitem: DataFrame, nFiles: Int = 40): DataFrame =
    FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("record_count"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_shipdate"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_shipdate"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        countDistinct(col("l_partkey")).as("distinct_parts"))
      .orderBy("file_id")

  /** Stats-only file pruning for a shipdate range predicate: which files a
    * planner keeps/skips reading zero data footers ("V4 planning"). */
  def pruneForPredicate(lineitem: DataFrame, lo: String, hi: String, nFiles: Int = 40): DataFrame =
    fileStats(lineitem, nFiles)
      .select(col("file_id"), col("min_shipdate"), col("max_shipdate"),
        (col("max_shipdate") >= lo && col("min_shipdate") <= hi).as("keep"))
      .orderBy("file_id")

  /** Wide-table multi-column pruning (the reference's headline V4 fix,
    * `test_wide_table_pruning.py`): root-manifest min/max stats for several
    * columns at once, pruned by a conjunctive predicate across three of
    * them. A file survives only if every conjunct's range overlaps — the
    * "0 footers read" planning decision, per file, with the per-conjunct
    * overlap bits exposed. */
  def widePrune(lineitem: DataFrame, nFiles: Int = 40): DataFrame =
    FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg(
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .withColumn("ship_overlap", col("max_ship") >= "1997-01-01" && col("min_ship") <= "1997-06-30")
      .withColumn("price_overlap", col("max_price") >= 50000.0 && col("min_price") <= 90000.0)
      .withColumn("qty_overlap", col("max_qty") >= 30.0 && col("min_qty") <= 50.0)
      .withColumn("keep", col("ship_overlap") && col("price_overlap") && col("qty_overlap"))
      .select("file_id", "ship_overlap", "price_overlap", "qty_overlap", "keep")
      .orderBy("file_id")

  /** Manifest-tree planning comparison (adaptive-tree flat vs 2-level vs
    * 3-level, `test_adaptive_metadata_tree.py:194/227/270`): for a month-range
    * query, how many index objects each structure reads and how many manifest
    * entries it scans. Flat reads one root but scans every entry; deeper
    * trees prune scan work at the cost of extra index round-trips — the
    * trade-off the reference quantifies. */
  def treePlanning(lineitem: DataFrame, monthLo: String, monthHi: String, nFiles: Int = 40): DataFrame = {
    val entries = FileModel.withFileId(lineitem, nFiles)
      .withColumn("part_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy(col("part_month"), col("file_id"))
      .agg(count(lit(1)).as("record_count"))
    val inRange = col("part_month") >= monthLo && col("part_month") <= monthHi
    val stats = entries.agg(
      count(lit(1)).as("total_entries"),
      sum(when(inRange, 1L).otherwise(0L)).as("matched_entries"),
      countDistinct(when(inRange, col("part_month"))).as("matched_months"),
      countDistinct(when(inRange, substring(col("part_month"), 1, 4))).as("matched_years"))
    stats.select(explode(array(
      struct(lit("flat").as("structure"), lit(1L).as("index_reads"),
        col("total_entries").as("entries_scanned"), col("matched_entries").as("files_matched")),
      struct(lit("three_level").as("structure"),
        (lit(1L) + col("matched_years") + col("matched_months")).as("index_reads"),
        col("matched_entries").as("entries_scanned"), col("matched_entries").as("files_matched")),
      struct(lit("two_level").as("structure"), (lit(1L) + col("matched_months")).as("index_reads"),
        col("matched_entries").as("entries_scanned"), col("matched_entries").as("files_matched"))
    )).as("s"))
      .select(col("s.structure").as("structure"), col("s.index_reads").as("index_reads"),
        col("s.entries_scanned").as("entries_scanned"), col("s.files_matched").as("files_matched"))
      .orderBy("structure")
  }

  /** Parallel-fetch planning (test_parallel_s3_fetching.py): fetching the
    * partition-manifest objects for a range query with a worker pool costs
    * ceil(n/p) sequential round-trips; the report quantifies the speedup per
    * parallelism level over the matched manifest set. The manifest listing is
    * an aggregation; the plan expansion is a tiny generator — no driver math
    * over collected rows. */
  def fetchPlanning(lineitem: DataFrame, monthLo: String, monthHi: String,
                    nFiles: Int = 40): DataFrame = {
    val matched = FileModel.withFileId(lineitem, nFiles)
      .withColumn("part_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .filter(col("part_month") >= monthLo && col("part_month") <= monthHi)
      .groupBy(col("part_month"), col("file_id"))
      .agg(count(lit(1)).as("record_count"))
      .agg(count(lit(1)).as("n_objects"))
    matched
      .select(col("n_objects"), explode(array(Seq(1, 4, 16, 64).map(lit): _*)).as("parallelism"))
      .withColumn("fetch_rounds", ceil(col("n_objects") / col("parallelism")).cast("long"))
      .withColumn("speedup", round(col("n_objects") / col("fetch_rounds"), 4))
      .select(col("parallelism").cast("long").as("parallelism"),
        col("n_objects"), col("fetch_rounds"), col("speedup"))
      .orderBy("parallelism")
  }

  /** External-DV fetch-latency ladder — the inline-vs-external half of the
    * reference's parallel-fetch study (`poc/test_parallel_s3_fetching.py`,
    * `results/parallel_s3_results.json`): a delete storm leaves one external
    * DV object per (file, wave) fragment, and a reader must fetch ALL of
    * them before planning, at one TTFB round-trip (55 ms in the reference's
    * S3 model) per ceil(n/threads) sequential waves of its worker pool.
    * Per thread-pool rung (the reference ladder 1/10/25/50/100):
    *  - `fetch_rounds`, `fetch_ms` — the deterministic latency model
    *    (reference `time_ms` is wall-clock of a sleep-based simulation; the
    *    model rounds×TTFB matches it within scheduling noise);
    *  - `reduction_vs_sequential_pct` — the reference's headline column;
    *  - `speedup_vs_inline_x` — fetch_ms over ONE round-trip (inline MDVs
    *    ride the manifest you already fetched), i.e. the factor the study's
    *    "inline is 27.6× faster than 100-way parallel" conclusion reports.
    * The fragment census is one map-side-combinable aggregation over the
    * storm model (`DeleteVectors.deleteStorm` semantics); the ladder is a
    * 5-element generator over the broadcast 1-row census — no driver math,
    * shape-invariant at any corpus size. */
  def fetchLatency(lineitem: DataFrame, nFiles: Int = 40, waves: Int = 5,
                   ttfbMs: Long = 55L,
                   threads: Seq[Int] = Seq(1, 10, 25, 50, 100)): DataFrame = {
    val census = FileModel.withPos(FileModel.withFileId(lineitem, nFiles))
      .withColumn("wave", col("pos") % 97)
      .filter(col("wave") < waves)
      .groupBy(col("file_id"), col("wave"))
      .agg(count(lit(1)).as("n_deletes"))
      .agg(count(lit(1)).as("n_objects"),
        coalesce(sum(col("n_deletes") * 4 + 100), lit(0L)).as("dv_bytes"))
    census
      .select(col("n_objects"), col("dv_bytes"),
        explode(array(threads.map(t => lit(t.toLong)): _*)).as("threads"))
      .withColumn("fetch_rounds",
        ceil(col("n_objects") / col("threads")).cast("long"))
      .withColumn("fetch_ms", col("fetch_rounds") * ttfbMs)
      .withColumn("reduction_vs_sequential_pct",
        when(col("n_objects") > 0,
          round((col("n_objects") - col("fetch_rounds")) * 100.0 / col("n_objects"), 4))
          .otherwise(lit(0.0)))
      .withColumn("speedup_vs_inline_x", round(col("fetch_ms") / (ttfbMs * 1.0), 4))
      .select(col("threads"), col("n_objects"), col("dv_bytes"),
        col("fetch_rounds"), col("fetch_ms"), col("reduction_vs_sequential_pct"),
        col("speedup_vs_inline_x"))
      .orderBy("threads")
  }

  /** Inline-blob budget ladder — the deterministic half of the reference's
    * GC-cliff study (`poc/test_gc_performance_cliff.py`,
    * `results/gc_cliff_results.json`): as a table accumulates per-file DV
    * blobs inside its inlined manifest, the blob crosses policy cliffs —
    * the 4 KB inline threshold (`test_delete_storm.py`), a JVM G1
    * region-half bound (allocations over half a region go humongous: the
    * `humongous_allocations: 1` flips at ≥10 MB rungs in the reference run),
    * and the 10 MB external cap. Per threshold: how many files fit within
    * the budget, and the file/byte coordinate where the manifest crosses —
    * "how long can this table keep inlining before the cliff".
    *
    * Cumulative blob bytes come from the two-phase `plans.PrefixSum` over
    * the file-id order (no single-partition window — the file census is
    * exactly what grows with the table); the threshold report is a 4-way
    * conditional aggregation over the exploded (file × threshold) grid,
    * which never leaves the per-file metadata grain. Thresholds that are
    * never crossed report files_within_budget = all files and a -1/-0
    * crossing coordinate (spine rows always present). */
  def inlineBudget(lineitem: DataFrame, nFiles: Int = 40,
                   headerBytes: Long = 100L): DataFrame = {
    val thresholds = Seq(
      ("1_inline_4kb", 4096L), ("2_page_64kb", 65536L),
      ("3_region_half_1mb", 1048576L), ("4_external_10mb", 10485760L))
    val perFile = FileModel.withFileId(lineitem, nFiles)
      .filter((col("l_orderkey") * 31 + col("l_linenumber")) % 10 === 3)
      .groupBy(col("file_id"))
      .agg((count(lit(1)) * 4L + headerBytes).as("blob_bytes"))
    val cum = graft.plans.PrefixSum.prefixSum(perFile, "file_id", "blob_bytes", "cum_bytes")
    val tStructs = thresholds.map { case (label, b) =>
      struct(lit(label).as("threshold_label"), lit(b).as("threshold_bytes"))
    }
    cum
      .select(col("file_id"), col("cum_bytes"),
        explode(array(tStructs: _*)).as("t"))
      .groupBy(col("t.threshold_label").as("threshold_label"),
        col("t.threshold_bytes").as("threshold_bytes"))
      .agg(
        sum(when(col("cum_bytes") <= col("t.threshold_bytes"), 1L).otherwise(0L))
          .as("files_within_budget"),
        coalesce(min(when(col("cum_bytes") > col("t.threshold_bytes"), col("file_id"))),
          lit(-1L)).as("crossing_file_id"),
        coalesce(min(when(col("cum_bytes") > col("t.threshold_bytes"), col("cum_bytes"))),
          lit(0L)).as("cum_bytes_at_crossing"))
      .withColumn("crossed", col("crossing_file_id") >= 0)
      .orderBy("threshold_label")
  }

  /** File-size histogram over a fixed power-of-4-ish bucket ladder — the
    * size-distribution view behind the reference's inline/external blob
    * thresholds (4 KB inline cliff, 10 MB external cap). Explicit CASE
    * boundaries keep the bucketing engine-exact (no float log2). */
  def fileSizeHistogram(lineitem: DataFrame, nFiles: Int = 40): DataFrame = {
    val bytes = FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg((count(lit(1)) * 100L).as("file_bytes"))
    val bucket = when(col("file_bytes") < 1024L, "0_lt_1k")
      .when(col("file_bytes") < 4096L, "1_lt_4k")
      .when(col("file_bytes") < 16384L, "2_lt_16k")
      .when(col("file_bytes") < 65536L, "3_lt_64k")
      .when(col("file_bytes") < 262144L, "4_lt_256k")
      .when(col("file_bytes") < 1048576L, "5_lt_1m")
      .when(col("file_bytes") < 4194304L, "6_lt_4m")
      .otherwise("7_ge_4m")
    bytes
      .groupBy(bucket.as("size_bucket"))
      .agg(count(lit(1)).as("n_files"),
           sum(col("file_bytes")).as("total_bytes"),
           min(col("file_bytes")).as("min_bytes"),
           max(col("file_bytes")).as("max_bytes"))
      .orderBy("size_bucket")
  }

  /** Bloom-filter file pruning for a point lookup: each file's bloom "bit
    * set" is the union of two deterministic hash bits per row key; a file
    * may be skipped when either of the query key's bits is absent. Exact
    * containment classifies passes into hits vs false positives — the
    * skip/FP accounting parquet/puffin bloom filters buy a planner.
    * Deterministic (no real bit array, just per-bit max aggregates), so the
    * oracle reproduces it bit-for-bit. */
  def bloomPruning(lineitem: DataFrame, key: Long = 77L, nFiles: Int = 40): DataFrame = {
    def h1(c: org.apache.spark.sql.Column) = (c * 31 + 7) % 1024
    def h2(c: org.apache.spark.sql.Column) = (c * 131 + 3) % 1024
    val k = lit(key)
    FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg(
        max(col("l_partkey") === key).as("contains_key"),
        max(h1(col("l_partkey")) === h1(k)).as("bit1_set"),
        max(h2(col("l_partkey")) === h2(k)).as("bit2_set"))
      .withColumn("bloom_pass", col("bit1_set") && col("bit2_set"))
      .withColumn("class",
        when(col("contains_key"), "hit")
          .when(col("bloom_pass"), "false_positive")
          .otherwise("skipped"))
      .select("file_id", "contains_key", "bloom_pass", "class")
      .orderBy("file_id")
  }

  /** Partition-spec evolution comparison: the same data partitioned monthly
    * vs weekly, pruned by the same ~3-week predicate. Reports how many
    * partitions each spec materialises, how many the predicate matches, and
    * the scanned-row I/O proxy — the planning delta a spec evolution buys.
    * One aggregation per spec over the same scan (generator expansion). */
  def partitionEvolution(lineitem: DataFrame, lo: String, hi: String): DataFrame = {
    val keyed = lineitem.select(col("l_shipdate"),
      explode(array(
        struct(lit("monthly").as("spec"), date_format(col("l_shipdate"), "yyyy-MM").as("pkey")),
        struct(lit("weekly").as("spec"),
          date_format(date_trunc("week", col("l_shipdate")), "yyyy-MM-dd").as("pkey"))
      )).as("p"))
      .select(col("p.spec").as("spec"), col("p.pkey").as("pkey"), col("l_shipdate"))
    keyed
      .groupBy(col("spec"), col("pkey"))
      .agg(count(lit(1)).as("n_rows"),
           max(col("l_shipdate") >= lit(lo).cast("timestamp") &&
               col("l_shipdate") < lit(hi).cast("timestamp")).as("matched"))
      .groupBy(col("spec"))
      .agg(count(lit(1)).as("n_partitions"),
           sum(when(col("matched"), 1L).otherwise(0L)).as("matched_partitions"),
           sum(when(col("matched"), col("n_rows")).otherwise(0L)).as("rows_scanned"),
           sum(col("n_rows")).as("total_rows"))
      .withColumn("scan_pct", round(col("rows_scanned") * 100.0 / col("total_rows"), 4))
      .orderBy("spec")
  }

  /** String-stats truncation: Iceberg manifests store *truncated* string
    * min/max bounds (`truncate(N)` — lower bound prefix-truncated, upper
    * bound the prefix with its last character incremented, Iceberg's
    * increment-last-byte rule, so the bound dominates every string sharing
    * the prefix regardless of alphabet). Truncation keeps manifests small
    * but widens the bounds, so point lookups can falsely keep files. Per
    * file of the part dictionary: full vs truncated bounds and the keep /
    * false-keep bits for one equality predicate. */
  def statsTruncation(part: DataFrame, key: String = "small gizmo",
                      prefixLen: Int = 4, nFiles: Int = 20): DataFrame = {
    val k = lit(key)
    part
      .withColumn("file_id", col("p_partkey") % nFiles)
      .groupBy(col("file_id"))
      .agg(min(col("p_name")).as("min_name"), max(col("p_name")).as("max_name"))
      .withColumn("trunc_min", substring(col("min_name"), 1, prefixLen))
      .withColumn("trunc_max",
        when(length(col("max_name")) <= prefixLen, col("max_name"))
          .otherwise(concat(substring(col("max_name"), 1, prefixLen - 1),
            chr(ascii(substring(col("max_name"), prefixLen, 1)) + 1))))
      .withColumn("keep_full", k >= col("min_name") && k <= col("max_name"))
      .withColumn("keep_trunc", k >= col("trunc_min") && k <= col("trunc_max"))
      .withColumn("false_keep", col("keep_trunc") && !col("keep_full"))
      .select("file_id", "min_name", "max_name", "trunc_min", "trunc_max",
        "keep_full", "keep_trunc", "false_keep")
      .orderBy("file_id")
  }

  /** Small-files health report per month partition: each (partition, file)
    * fragment's byte size against the partition's own mean — a fragment
    * under half the mean is "small", and a partition where more than half
    * the fragments are small should compact. Thresholds are relative, so
    * the report is scale-free (same semantics at sf0.01 and 100 TB). */
  def smallFilesReport(lineitem: DataFrame, nFiles: Int = 40): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("part_month"))
    FileModel.withFileId(lineitem, nFiles)
      .withColumn("part_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy(col("part_month"), col("file_id"))
      .agg((count(lit(1)) * 100L).as("frag_bytes"))
      .withColumn("small", col("frag_bytes") * 2.0 < avg(col("frag_bytes")).over(w))
      .groupBy(col("part_month"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("frag_bytes")).as("partition_bytes"),
        sum(when(col("small"), 1L).otherwise(0L)).as("n_small"))
      .withColumn("small_pct", round(col("n_small") * 100.0 / col("n_files"), 4))
      .withColumn("should_compact", col("n_small") * 2 > col("n_files"))
      .orderBy("part_month")
  }

  /** Scan-cost model: planner's bytes-read estimate for three strategies
    * over the same table — full scan, column-pruned scan (projection reaches
    * the reader), and column + stats-file-pruned scan. Column widths are the
    * physical encodings (8 B numerics/timestamps, 4 B ints, measured bytes
    * for strings); the file-pruning bit reuses the min/max overlap planning
    * of `pruneForPredicate`. */
  def scanCostModel(lineitem: DataFrame, lo: String = "1997-01-01",
                    hi: String = "1997-03-31", nFiles: Int = 40): DataFrame = {
    val fixedWidth = 8L * 8 + 4L // 8 numeric/timestamp cols @8B + linenumber @4B
    val projWidth = 24L          // l_orderkey + l_extendedprice + l_shipdate
    val files = FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("rows"),
        sum(length(col("l_returnflag")) + length(col("l_linestatus"))).as("str_bytes"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"))
      .withColumn("kept", col("max_ship") >= lo && col("min_ship") <= hi)
    files
      .agg(
        count(lit(1)).as("all_files"),
        sum(col("rows")).as("all_rows"),
        sum(col("rows") * fixedWidth + col("str_bytes")).as("full_bytes"),
        sum(col("rows") * projWidth).as("proj_bytes"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_files"),
        sum(when(col("kept"), col("rows")).otherwise(0L)).as("kept_rows"))
      .select(explode(array(
        struct(lit("0_full_scan").as("variant"), col("all_files").as("files_read"),
          col("all_rows").as("rows_scanned"), col("full_bytes").as("bytes_read")),
        struct(lit("1_column_pruned").as("variant"), col("all_files").as("files_read"),
          col("all_rows").as("rows_scanned"), col("proj_bytes").as("bytes_read")),
        struct(lit("2_column_file_pruned").as("variant"), col("kept_files").as("files_read"),
          col("kept_rows").as("rows_scanned"),
          (col("kept_rows") * projWidth).as("bytes_read"))
      )).as("s"))
      .select(col("s.variant").as("variant"), col("s.files_read").as("files_read"),
        col("s.rows_scanned").as("rows_scanned"), col("s.bytes_read").as("bytes_read"))
      .orderBy("variant")
  }

  /** Flat partition-grouped manifest + partition-pruned planning: the entries
    * a query for one partition actually reads (adaptive-tree flat layout). */
  def partitionManifest(lineitem: DataFrame, targetMonth: String, nFiles: Int = 40): DataFrame =
    FileModel.withFileId(lineitem, nFiles)
      .withColumn("partition_key", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy(col("partition_key"), col("file_id"))
      .agg(count(lit(1)).as("record_count"),
           round(sum(col("l_extendedprice")), 4).as("bytes_proxy"))
      .filter(col("partition_key") === targetMonth)
      .orderBy("partition_key", "file_id")

  /** Manifest-list partition summaries: the 2-level stats rollup (file stats
    * → partition stats) that lets the planner skip whole partitions before
    * opening any per-file manifest. Two cascaded map-side-combinable
    * aggregations; the `matches_window` bit is the partition-level prune
    * decision for a date-range predicate. */
  def partitionStats(lineitem: DataFrame, lo: String = "1997-01-01",
                     hi: String = "1997-03-31", nFiles: Int = 40): DataFrame =
    FileModel.withFileId(lineitem, nFiles)
      .withColumn("part_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy(col("part_month"), col("file_id"))
      .agg(count(lit(1)).as("rows"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("f_min"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("f_max"))
      .groupBy(col("part_month"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("rows")).as("n_rows"),
        min(col("f_min")).as("min_ship"),
        max(col("f_max")).as("max_ship"))
      .withColumn("matches_window", col("max_ship") >= lo && col("min_ship") <= hi)
      .orderBy("part_month")

  /** Stats-freshness report: table statistics were last computed at a pinned
    * commit; everything appended since is invisible to the CBO. Per month
    * partition: rows covered by stats vs rows appended after the pin, and
    * the needs-analyze flag once staleness passes `maxStalePct`. One
    * conditional aggregation — the ANALYZE-scheduling input at any scale. */
  def statsFreshness(orders: DataFrame, statsLagCommits: Long = 30L,
                     maxStalePct: Double = 20.0): DataFrame = {
    val withCommit = orders.withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
    val pin = withCommit.agg((max(col("commit_id")) - statsLagCommits).as("stats_commit"))
    withCommit.join(broadcast(pin))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("part_month"))
      .agg(count(lit(1)).as("rows_total"),
        sum(when(col("commit_id") > col("stats_commit"), 1L).otherwise(0L)).as("rows_since_stats"))
      .withColumn("stale_pct", round(col("rows_since_stats") * 100.0 / col("rows_total"), 4))
      .withColumn("needs_analyze", col("rows_since_stats") * 100.0 / col("rows_total") > maxStalePct)
      .orderBy("part_month")
  }

  /** Per-file column NDV statistics (the CBO inputs a lake planner stores in
    * puffin/theta sketches — here exact): distinct join-key counts and the
    * ndv/rows ratio that drives join-strategy and duplicate-factor
    * estimates. One aggregation; Spark expands the two DISTINCTs into a
    * single expand + aggregate pass. */
  def columnNdv(lineitem: DataFrame, nFiles: Int = 40): DataFrame =
    FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("l_partkey")).as("ndv_partkey"),
        countDistinct(col("l_suppkey")).as("ndv_suppkey"))
      .withColumn("partkey_ratio", round(col("ndv_partkey") * 1.0 / col("rows"), 6))
      .withColumn("suppkey_ratio", round(col("ndv_suppkey") * 1.0 / col("rows"), 6))
      .orderBy("file_id")

  /** Puffin-style mergeable NDV statistics (the Iceberg Puffin spec's
    * `apache-datasketches-*-v1` ndv blobs — public spec; cf. also the
    * reference's manifest column-stats study): every data file carries a
    * compact distinct-count sketch, and the TABLE-level NDV is the union of
    * the per-file sketches — never a re-scan. This is the mechanism that
    * makes stats maintenance O(new files) at 100 TB: a commit unions the new
    * files' sketches into the table blob instead of recounting history, and
    * the union is associative so any subset (partition, branch, snapshot
    * diff) aggregates the same way. Here: one per-file HLL register table
    * (the same statistic family Puffin serializes) over two
    * cardinality regimes (l_suppkey moderate, l_orderkey ~rows/4), merged
    * by per-bucket register MAX (the HLL union); output one row per column
    * with the sketch estimate, the total sketch bytes a writer would
    * persist (dense encoding: one byte per register, m bytes per file),
    * and the per-file mean.
    *
    * The sketch is [[graft.plans.CrossSketch]]'s cross-engine
    * deterministic HLL, so the DuckDB oracle recomputes the per-file
    * registers, the union and the ESTIMATE bit-for-bit — a fully
    * hash-checked approximate statistic. With `verify = true` (the
    * correctness harness / specs) each row additionally carries its own
    * accuracy proof: exact NDV from a countDistinct anchor, relative
    * error, and `within_bound` against the 5·rsd envelope
    * (rsd = 1.04/√1024 ≈ 3.25%). Bench/Audit run the sketch-only variant
    * a production writer ships — see SparkEntry.benchVariants. */
  def puffinNdv(lineitem: DataFrame, nFiles: Int = 40, verify: Boolean = false): DataFrame = {
    import graft.plans.CrossSketch._
    val files = FileModel.withFileId(lineitem, nFiles)
    def onecol(c: String): DataFrame = {
      // per-file registers — the sketch a writer would persist per file…
      val perFile = files
        .select(col("file_id"), hash31(col(c)).as("h"))
        .groupBy(col("file_id"), hllBucket(col("h")).as("bucket"))
        .agg(max(hllRank(col("h"))).as("r"))
      // …unioned to table grain by per-bucket MAX (associative, O(new
      // files) maintenance), never a re-scan of history.
      val tableRegs = perFile.groupBy(col("bucket")).agg(max(col("r")).as("r"))
      val est = tableRegs.agg(hllSumCol.as("s"), hllZerosCol.as("v"))
        .select(hllEstimate(col("s"), col("v")).as("est_ndv"))
      val census = files.agg(
          countDistinct(col("file_id")).as("n_files"),
          count(lit(1)).as("table_rows"))
      val base = census.crossJoin(broadcast(est))
        .select(lit(c).as("column"), col("n_files"), col("table_rows"),
          col("est_ndv"), (col("n_files") * lit(HllM.toLong)).as("sketch_bytes"))
        .withColumn("bytes_per_file",
          round(col("sketch_bytes") * 1.0 / col("n_files"), 2))
      if (!verify) base
      else {
        val exact = lineitem.agg(countDistinct(col(c)).as("exact_ndv"))
        base.crossJoin(broadcast(exact))
          .withColumn("rel_err",
            round(abs(col("est_ndv") - col("exact_ndv")) * 1.0 / col("exact_ndv"), 6))
          .withColumn("within_bound", col("rel_err") <= lit(HllErrBound))
      }
    }
    onecol("l_suppkey").unionAll(onecol("l_orderkey")).orderBy("column")
  }
}
