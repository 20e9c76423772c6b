package graft.lake

import graft.plans.Checkpoints._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Commit-log / snapshot operators (SURVEY.md §2.2).
  *
  * Models the reference's commit benchmarks (`poc/test_single_file_commits
  * .py:68` measure_commit / `:111` measure_manifest_growth / `:153`
  * measure_compaction_cost, `poc/test_concurrent_writers.py:57`
  * OptimisticLockManager) as append-log analytics: a commit log is a
  * DataFrame keyed by commit_id; growth and contention accounting are window
  * aggregations over it — per-key partitions, no driver-side loops.
  *
  * Scale note: the commit-log / compaction cumulative sums run through
  * `plans.PrefixSum` — the two-phase (bucketed partials + broadcast bucket
  * offsets) prefix sum — so no operator here puts an unbounded input through
  * a single-partition window, even if a deployment ever accumulates billions
  * of commits or files. The only remaining unpartitioned windows in this
  * file order *bounded* tables (bucket offsets, ref heads, retention rungs).
  */
object Snapshots {

  /** Append-only commit log derived from orders (100 orders per commit):
    * per-commit file/row/byte deltas + cumulative manifest growth (two-phase
    * distributed prefix sum — see PrefixSum). */
  def commitLog(orders: DataFrame): DataFrame = {
    val commits = orders
      .withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
      .groupBy(col("commit_id"))
      .agg(count(lit(1)).as("files_added"),
           round(sum(col("o_totalprice")), 4).as("bytes_added"))
    graft.plans.PrefixSum.prefixSum(commits, "commit_id", "files_added", "total_files")
      .withColumn("manifest_entries", col("total_files"))
      .orderBy("commit_id")
  }

  /** Greedy sequential bin-packing of small files into compaction groups of
    * ~`targetBytes` (the rewrite plan of measure_compaction_cost). The
    * strict-prefix byte total comes from the two-phase prefix sum. */
  def compactionPlan(lineitem: DataFrame, nFiles: Int = 40, targetBytes: Long = 400000): DataFrame = {
    val files = FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg((count(lit(1)) * 100L).as("file_bytes"))
    graft.plans.PrefixSum.prefixSum(files, "file_id", "file_bytes", "bytes_before",
        inclusive = false)
      .withColumn("group_id", (col("bytes_before") / targetBytes).cast("long"))
      .select("file_id", "file_bytes", "group_id")
      .orderBy("file_id")
  }

  /** Compaction execution summary: the post-rewrite manifest the compaction
    * plan produces. Each bin-packed group (same greedy assignment as
    * compactionPlan) becomes one merged file: row/byte totals plus the
    * merged min/max shipdate stats its new manifest entry would carry. */
  def compactionExecute(lineitem: DataFrame, nFiles: Int = 40, targetBytes: Long = 400000): DataFrame = {
    val files = FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg((count(lit(1)) * 100L).as("file_bytes"),
           count(lit(1)).as("file_rows"),
           min(col("l_shipdate")).as("fmin"), max(col("l_shipdate")).as("fmax"))
    graft.plans.PrefixSum.prefixSum(files, "file_id", "file_bytes", "bytes_before",
        inclusive = false)
      .withColumn("group_id", (col("bytes_before") / targetBytes).cast("long"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_files"),
           sum(col("file_rows")).as("group_rows"),
           sum(col("file_bytes")).as("group_bytes"),
           date_format(min(col("fmin")), "yyyy-MM-dd").as("min_ship"),
           date_format(max(col("fmax")), "yyyy-MM-dd").as("max_ship"))
      .orderBy("group_id")
  }

  /** Rollback plan: undoing every commit after `asOf` under the append-log
    * model — per doomed commit, the files it touched and the rows/bytes a
    * rollback removes. The commit-id predicate prunes at the scan just like
    * timeTravel's snapshot read. */
  def rollbackPlan(orders: DataFrame, asOf: Long = 120L, nFiles: Int = 40): DataFrame =
    orders
      .withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
      .filter(col("commit_id") > asOf)
      .groupBy(col("commit_id"))
      .agg(countDistinct(col("o_orderkey") % nFiles).as("files_touched"),
           count(lit(1)).as("rows_to_remove"),
           round(sum(col("o_totalprice")), 4).as("bytes_to_remove"))
      .orderBy("commit_id")

  /** Branches & tags: named refs pinned to commit heads over the append-log
    * model (Iceberg's `refs` metadata — `main` at the log head, a staging
    * branch behind it, an immutable release tag further back). Per ref:
    * commits/rows/bytes visible from its head. The ref table is a literal
    * 3-row generator, broadcast against the per-commit aggregate. */
  def branchTags(orders: DataFrame): DataFrame = {
    val commits = orders
      .withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
      .groupBy(col("commit_id"))
      .agg(count(lit(1)).as("rows_added"), sum(col("o_totalprice")).as("bytes_added"))
    val refs = commits.agg(max(col("commit_id")).as("maxc"))
      .select(explode(array(
        struct(lit("main").as("ref_name"), lit("branch").as("ref_type"),
          col("maxc").as("head_commit")),
        struct(lit("staging").as("ref_name"), lit("branch").as("ref_type"),
          floor(col("maxc") * 6 / 10).cast("long").as("head_commit")),
        struct(lit("v1.0").as("ref_name"), lit("tag").as("ref_type"),
          floor(col("maxc") * 3 / 10).cast("long").as("head_commit"))
      )).as("r"))
      .select(col("r.ref_name").as("ref_name"), col("r.ref_type").as("ref_type"),
        col("r.head_commit").as("head_commit"))
    broadcast(refs)
      .join(commits, col("commit_id") <= col("head_commit"))
      .groupBy(col("ref_name"), col("ref_type"), col("head_commit"))
      .agg(count(lit(1)).as("commits_visible"),
        sum(col("rows_added")).as("rows_visible"),
        round(sum(col("bytes_added")), 4).as("bytes_visible"))
      .orderBy("ref_name")
  }

  /** Write-audit-publish gate: the last `stagedN` commits are staged on an
    * audit branch; each publishes only if its bad-row fraction (quality
    * predicate `o_totalprice < badBelow`) stays within `maxBadPct`. The
    * audit is one aggregation per staged commit — the WAP pattern's quality
    * gate as a set-based operator, no per-commit driver loop. */
  def wapAudit(orders: DataFrame, stagedN: Long = 10L, badBelow: Double = 30000.0,
               maxBadPct: Double = 5.0): DataFrame = {
    val withCommit = orders.withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
    val maxc = withCommit.agg(max(col("commit_id")).as("maxc"))
    withCommit
      .join(broadcast(maxc), col("commit_id") > col("maxc") - stagedN)
      .groupBy(col("commit_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice") < badBelow, 1L).otherwise(0L)).as("n_bad"))
      .withColumn("bad_pct", round(col("n_bad") * 100.0 / col("n_rows"), 4))
      .withColumn("decision",
        when(col("n_bad") * 100.0 / col("n_rows") <= maxBadPct, "publish").otherwise("reject"))
      .orderBy("commit_id")
  }

  /** Incremental read between two snapshot boundaries: what a consumer sees
    * when advancing from snapshot(t1) to snapshot(t2), summarised monthly. */
  def snapshotDiff(orders: DataFrame, t1: String, t2: String): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(t1).cast("timestamp") &&
              col("o_orderdate") < lit(t2).cast("timestamp"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("added_rows"),
           round(sum(col("o_totalprice")), 4).as("added_bytes"))
      .orderBy("month")

  /** Orphan-file detection: listed storage files not referenced by the live
    * manifest (GC candidates). Storage listing is files 0..nStorage-1; the
    * live manifest references only files that hold data. */
  def orphanFiles(spark: SparkSession, lineitem: DataFrame, nFiles: Int = 40, nStorage: Int = 50): DataFrame = {
    val storage = spark.range(nStorage).select(col("id").as("file_id"))
    val live = FileModel.withFileId(lineitem, nFiles).select(col("file_id")).distinct()
    storage.join(live, Seq("file_id"), "left_anti")
      .withColumn("path", concat(lit("data/file_"), format_string("%05d", col("file_id")), lit(".parquet")))
      .orderBy("file_id")
  }

  /** Time travel: reconstruct the table state visible at commit `asOf` under
    * the append-log model (commit_id = o_orderkey/100) and summarise it.
    * A snapshot read is just a commit-id predicate — pushed to the scan. */
  def timeTravel(orders: DataFrame, asOf: Long = 100L): DataFrame =
    orders
      .filter((col("o_orderkey") / 100).cast("long") <= asOf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
           round(sum(col("o_totalprice")), 4).as("total_price"))
      .orderBy("o_orderstatus")

  /** Snapshot-expiry plan: each commit rewrites its files' versions
    * (file_id = o_orderkey % nFiles touched by the commit); a version is
    * removable once a newer commit rewrote the same file AND the version
    * falls outside the retained trailing window of `retain` commits.
    * Reports, per expired commit, how many superseded file versions can be
    * deleted and their byte proxy — the GC accounting of
    * test_gc_performance_cliff.py. */
  def expiryPlan(orders: DataFrame, retain: Long = 50L, nFiles: Int = 40): DataFrame = {
    val versions = orders
      .withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
      .withColumn("file_id", col("o_orderkey") % nFiles)
      .groupBy(col("commit_id"), col("file_id"))
      .agg(round(sum(col("o_totalprice")), 4).as("version_bytes"))
    val global = versions.agg(max(col("commit_id")).as("max_commit"))
    val w = Window.partitionBy(col("file_id"))
    versions
      .withColumn("latest_commit", max(col("commit_id")).over(w))
      .join(broadcast(global))
      .filter(col("commit_id") < col("latest_commit") &&
              col("commit_id") <= col("max_commit") - retain)
      .groupBy(col("commit_id"))
      .agg(count(lit(1)).as("versions_removable"),
           round(sum(col("version_bytes")), 4).as("bytes_reclaimed"))
      .orderBy("commit_id")
  }

  /** CDC between two snapshot boundaries: per month inside the window, how
    * many customer keys are net-new (first order ever lands in the window
    * month) vs updated (key already had orders before t1). The before-image
    * lookup is an aggregated semi-join on the key — no row-level diff. */
  def cdcChangelog(orders: DataFrame, t1: String, t2: String): DataFrame = {
    val before = orders.filter(col("o_orderdate") < lit(t1).cast("timestamp"))
      .select(col("o_custkey")).distinct().withColumn("existed", lit(1L))
    orders
      .filter(col("o_orderdate") >= lit(t1).cast("timestamp") &&
              col("o_orderdate") < lit(t2).cast("timestamp"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"), col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .join(broadcast(before), Seq("o_custkey"), "left")
      .groupBy(col("month"))
      .agg(sum(when(col("existed").isNull, 1L).otherwise(0L)).as("insert_keys"),
           sum(when(col("existed").isNotNull, 1L).otherwise(0L)).as("update_keys"),
           sum(col("n_orders")).as("changed_rows"))
      .orderBy("month")
  }

  /** MERGE INTO semantics (upsert): target = small customer dimension slice,
    * source = per-customer 1997 order revenue. Matched keys update the
    * balance, source-only keys insert, target-only keys keep — expressed as
    * one full-outer join + CASE, which is exactly the distributed plan a
    * MERGE compiles to. Summarised per action for a bounded result. */
  def mergeUpsert(customer: DataFrame, orders: DataFrame): DataFrame = {
    val target = customer.filter(col("c_custkey") < 500)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("balance"))
    val source = orders
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("key"))
      .agg((sum(col("o_totalprice")) * 0.1).as("delta"))
    target.join(source, Seq("key"), "full_outer")
      .withColumn("action",
        when(col("balance").isNotNull && col("delta").isNotNull, "update")
          .when(col("balance").isNull, "insert")
          .otherwise("keep"))
      .withColumn("new_balance",
        coalesce(col("balance"), lit(0.0)) + coalesce(col("delta"), lit(0.0)))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_keys"),
           round(sum(col("new_balance")), 4).as("sum_balance"))
      .orderBy("action")
  }

  /** Iceberg v3 row-lineage accounting (table-spec v3 "Row Lineage", public
    * spec: every row carries a `_row_id` assigned at its first commit and a
    * `_last_updated_sequence_number` stamped by the last commit that
    * rewrote it): models the per-customer balance table maintained by
    * monthly merge commits from the orders stream — sequence number = dense
    * month index of `o_orderdate`, a row's first_seq/last_seq = its first /
    * latest contributing month. Per sequence number: rows whose lineage
    * begins there (`rows_added`), rows whose last update lands there
    * (`rows_last_updated`, first < last), their total row age in commits
    * (`age_sum` — an exact integer so the artifact stays float-free), and
    * the cumulative live row count. The heavy stage is one per-key
    * min/max aggregation over the fact table; everything after runs on the
    * ≤ #months sequence spine (calendar-bounded window, audit-sanctioned). */
  def rowLineage(orders: DataFrame): DataFrame = {
    def seqOf(c: org.apache.spark.sql.Column) =
      ((year(c) - 1992) * 12 + month(c) - 1).cast("long")
    val rows = orders.groupBy(col("o_custkey"))
      .agg(min(seqOf(col("o_orderdate"))).as("first_seq"),
           max(seqOf(col("o_orderdate"))).as("last_seq"))
    val added = rows.groupBy(col("first_seq").as("seq"))
      .agg(count(lit(1)).as("rows_added"))
    val updated = rows.filter(col("last_seq") > col("first_seq"))
      .groupBy(col("last_seq").as("seq"))
      .agg(count(lit(1)).as("rows_last_updated"),
           sum(col("last_seq") - col("first_seq")).as("age_sum"))
    val spine = rows.agg(max(col("last_seq")).as("mx"))
      .select(explode(sequence(lit(0L), col("mx"))).as("seq"))
    spine.join(added, Seq("seq"), "left").join(updated, Seq("seq"), "left")
      .select(col("seq"),
        coalesce(col("rows_added"), lit(0L)).as("rows_added"),
        coalesce(col("rows_last_updated"), lit(0L)).as("rows_last_updated"),
        coalesce(col("age_sum"), lit(0L)).as("age_sum"))
      .withColumn("live_rows", sum(col("rows_added")).over(
        Window.orderBy(col("seq")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("seq")
  }

  /** Snapshot lineage: the parent chain of the commit log, with rewrite
    * commits (every 10th) resetting lineage depth — the ancestry metadata a
    * rollback/branch operation walks. Depth is a running conditional max
    * (last rewrite at-or-before each commit), not a recursive walk. The
    * derived commit table grows with the fact table (o_orderkey/100), so
    * both commit-ordered passes are distributed: the parent chain via
    * `plans.PrefixSum.lagOver` and the last-rewrite via
    * `plans.PrefixSum.prefixMax` — bucketed windows only, never one
    * unpartitioned window over every commit. */
  def snapshotLineage(orders: DataFrame): DataFrame = {
    // The commit table is metadata-grain (|orders|/100 rows) but its lineage
    // is a full fact-table aggregation, and the two PrefixSum passes below
    // reference their input from many plan branches (bucketed lag + carry +
    // range slices, then the same again for prefixMax) — without lineage
    // cuts the orders scan+groupBy re-executed per branch: the BEFORE plan
    // (plans/r18/lake_snapshot_lineage_before.txt) carries 128 parquet
    // scans of orders; the checkpoints cut it to one fact-table pass
    // (same rows — commitCadence got this fix in r12, this query never
    // did). chained is checkpointed too: prefixMax's branches would
    // otherwise each re-run lagOver's whole bucketed-window subtree.
    val commits = orders
      .withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
      .groupBy(col("commit_id"))
      .agg(count(lit(1)).as("files_added"))
      .withColumn("is_rewrite", col("commit_id") % 10 === 5)
      .withColumn("rw_id", when(col("is_rewrite"), col("commit_id")))
      .stableCheckpoint()
    val chained = graft.plans.PrefixSum.lagOver(commits, "commit_id", "commit_id", "parent_id")
      .stableCheckpoint()
    graft.plans.PrefixSum.prefixMax(chained, "commit_id", "rw_id", "last_rewrite")
      .withColumn("lineage_depth",
        col("commit_id") - coalesce(col("last_rewrite"), lit(0L)))
      .select(col("commit_id"), col("parent_id"), col("is_rewrite"),
        col("lineage_depth"), col("files_added"))
      .orderBy("commit_id")
  }

  /** Optimistic-concurrency accounting: `nWriters` writers each land
    * `commitsPerWriter` commits round-robin; a writer's commit conflicts with
    * every commit other writers landed since its previous one (those force
    * CAS retries — the contention cost measured by OptimisticLockManager). */
  def concurrentCommitStats(spark: SparkSession, nWriters: Int = 8, commitsPerWriter: Int = 5): DataFrame = {
    val attempts = spark.range(nWriters.toLong * commitsPerWriter)
      .select(col("id"),
        (col("id") % nWriters).as("writer_id"),
        col("id").as("commit_order"))
    val w = Window.partitionBy(col("writer_id")).orderBy(col("commit_order"))
    attempts
      .withColumn("prev_order", coalesce(lag(col("commit_order"), 1).over(w), lit(-1L)))
      .withColumn("retries", col("commit_order") - col("prev_order") - 1)
      .groupBy(col("writer_id"))
      .agg(count(lit(1)).as("commits"),
           sum(col("retries")).as("total_retries"),
           round(avg(col("retries")), 6).as("avg_retries"))
      .orderBy("writer_id")
  }

  /** Commit-cadence report: inter-commit gaps (in commit-day terms) per
    * year — mean/median/p95 gap and the burstiness ratio (p95/median) that
    * tells an ops team whether writes arrive smoothly or in storms (the
    * cadence half of the single-file-commits latency study). The commit
    * table derives from the fact table (o_orderkey/100) and grows with it,
    * so the previous-commit-day lookup goes through
    * `plans.PrefixSum.lagOver` (bucketed lag + bounded carry table), not an
    * unpartitioned lag window.
    *
    * Percentile state is BOUNDED by construction (the r10 driver artifact
    * flagged the previous exact-`percentile()` shape at cpu exponent 1.94 —
    * Spark's Percentile buffers every per-group value, O(commits/year)
    * aggregation state): |gap| is a small non-negative INTEGER whose domain
    * is calendar-bounded (≤ max observed gap in days, ~10³ values), so the
    * per-(year, gap) FREQUENCY table is metadata-sized at any commit volume.
    * The exact interpolated percentile (0-based pos = p·(n−1), the
    * quantile_cont / Spark-percentile rule) falls out of two ranked lookups
    * over the cumulative frequency — one map-side-combinable aggregation
    * plus windows over the bounded histogram, nothing value-buffering. */
  def commitCadence(orders: DataFrame): DataFrame = {
    // The commit table is METADATA-grain (|orders|/100 rows) but its lineage
    // is a full fact-table aggregation — and lagOver/equiHeightBuckets
    // reference their input from ~5 plan branches (range agg, slice
    // histogram, carry, main), so without a lineage cut the orders shuffle
    // re-executes per branch: the dominant, fact-sized term of this query's
    // growth (r12 driver artifact: cpu exponent 1.69 from exactly that).
    // One eager checkpoint makes every downstream branch read the tiny
    // materialized table instead.
    val commits = orders
      .withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
      .groupBy(col("commit_id"))
      .agg(max(to_date(col("o_orderdate"))).as("commit_day"))
      .stableCheckpoint()
    val gaps = graft.plans.PrefixSum.lagOver(commits, "commit_id", "commit_day", "prev_day")
      .withColumn("gap_days",
        datediff(col("commit_day"), col("prev_day")).cast("double"))
      .filter(col("gap_days").isNotNull)
      .select(year(col("commit_day")).cast("long").as("commit_year"),
        abs(col("gap_days")).cast("long").as("g"))
    val freq = gaps.groupBy(col("commit_year"), col("g")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("commit_year")).orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("commit_year"))
    val ranked = freq
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("pos50", lit(0.5) * (col("n") - 1L).cast("double"))
      .withColumn("pos95", lit(0.95) * (col("n") - 1L).cast("double"))
    // v_lo sits at 1-based rank floor(pos)+1, v_hi one rank later; when pos
    // lands exactly on a rank the v_hi lookup overflows the table and the
    // zero fraction makes the coalesce(v_hi, v_lo) term vanish.
    def lerp(lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column,
             pos: org.apache.spark.sql.Column) =
      lo.cast("double") +
        (pos - floor(pos)) * (coalesce(hi, lo).cast("double") - lo.cast("double"))
    ranked.groupBy(col("commit_year"))
      .agg(max(col("n")).as("n_gaps"),
        sum(col("g") * col("c")).as("sum_g"),
        max(col("pos50")).as("pos50"), max(col("pos95")).as("pos95"),
        min(when(col("cum") >= floor(col("pos50")) + 1L, col("g"))).as("lo50"),
        min(when(col("cum") >= floor(col("pos50")) + 2L, col("g"))).as("hi50"),
        min(when(col("cum") >= floor(col("pos95")) + 1L, col("g"))).as("lo95"),
        min(when(col("cum") >= floor(col("pos95")) + 2L, col("g"))).as("hi95"))
      .select(col("commit_year"), col("n_gaps"),
        round(col("sum_g").cast("double") / col("n_gaps").cast("double"), 6).as("mean_abs_gap"),
        round(lerp(col("lo50"), col("hi50"), col("pos50")), 6).as("median_abs_gap"),
        round(lerp(col("lo95"), col("hi95"), col("pos95")), 6).as("p95_abs_gap"))
      .orderBy("commit_year")
  }

  /** Snapshot-retention ladder: the keep-last-N / daily-for-a-month /
    * weekly-forever policy every lake GC implements. Each commit gets an
    * age (vs the head commit's day) and a decision with its reason; the
    * "last commit of its day/week" bits are windows over the 150-row commit
    * table. The expensive part — per-commit day aggregation — is one
    * map-side-combinable pass over the fact table. */
  def retentionLadder(orders: DataFrame, keepLast: Long = 20L,
                      dailyDays: Int = 30): DataFrame = {
    val commits = orders
      .withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
      .groupBy(col("commit_id"))
      .agg(max(to_date(col("o_orderdate"))).as("commit_day"))
    val head = commits.agg(max(col("commit_id")).as("head_id"), max(col("commit_day")).as("head_day"))
    val wDay = Window.partitionBy(col("commit_day"))
    val wWeek = Window.partitionBy(date_trunc("week", col("commit_day")))
    commits.join(broadcast(head))
      .withColumn("age_days", datediff(col("head_day"), col("commit_day")).cast("long"))
      .withColumn("last_of_day", col("commit_id") === max(col("commit_id")).over(wDay))
      .withColumn("last_of_week", col("commit_id") === max(col("commit_id")).over(wWeek))
      .withColumn("decision",
        when(col("commit_id") > col("head_id") - keepLast, "1_keep_recent")
          .when(col("age_days") <= dailyDays && col("last_of_day"), "2_keep_daily")
          .when(col("age_days") > dailyDays && col("last_of_week"), "3_keep_weekly")
          .otherwise("4_expire"))
      .select(col("commit_id"), date_format(col("commit_day"), "yyyy-MM-dd").as("commit_day"),
        col("age_days"), col("decision"))
      .orderBy("commit_id")
  }

  /** Writer-contention matrix: per pair of concurrent writers, how many data
    * files both touch — the file-overlap that forces optimistic-concurrency
    * retries. Writers and files derive deterministically from lineitem
    * (`l_suppkey % nWriters`, `l_orderkey % nFiles`); the pair join runs on
    * the distinct (file, writer) table, bounded by nFiles × nWriters, never
    * on the fact table. */
  def writerContention(lineitem: DataFrame, nWriters: Int = 6, nFiles: Int = 40): DataFrame = {
    val touched = lineitem
      .select((col("l_suppkey") % nWriters).as("writer"), (col("l_orderkey") % nFiles).as("file_id"))
      .distinct()
    val a = touched.select(col("writer").as("writer_a"), col("file_id"))
    val b = touched.select(col("writer").as("writer_b"), col("file_id"))
    val filesPer = touched.groupBy(col("writer")).agg(count(lit(1)).as("files_touched"))
    a.join(b, "file_id").filter(col("writer_a") < col("writer_b"))
      .groupBy(col("writer_a"), col("writer_b"))
      .agg(count(lit(1)).as("shared_files"))
      .join(broadcast(filesPer.withColumnRenamed("writer", "writer_a")
        .withColumnRenamed("files_touched", "files_a")), "writer_a")
      .withColumn("overlap_pct", round(col("shared_files") * 100.0 / col("files_a"), 4))
      .select("writer_a", "writer_b", "shared_files", "files_a", "overlap_pct")
      .orderBy("writer_a", "writer_b")
  }

  /** Incremental aggregate maintenance (IVM — the reason a lakehouse keeps
    * aggregate STATE instead of rescanning history): the pre-cutoff
    * snapshot collapses to a group-cardinality-bounded state table
    * (n/sum/min/max are all mergeable), the post-cutoff delta aggregates
    * the same way, and the refreshed view is a re-aggregation of the TWO
    * state tables — cost proportional to the delta plus |groups|, never to
    * the snapshot's row count. The output carries the full recompute
    * beside the merged state and a per-group `consistent` flag proving
    * merge ≡ recompute on every measure (exact integer cents, so the
    * equality is bitwise on both engines). At 100 TB this is the
    * difference between a nightly delta scan and a nightly full scan. */
  def incrementalAgg(orders: DataFrame, cutoff: String = "1997-01-01"): DataFrame = {
    val cents = round(col("o_totalprice") * 100, 0).cast("long")
    def state(df: DataFrame) = df
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_c"),
        min(cents).as("min_c"), max(cents).as("max_c"))
    // snap/delta each feed the merge union AND their own count-join
    // branch — cut both so each orders scan+agg runs once (priority-grain,
    // 5 rows).
    val snap = state(orders.filter(col("o_orderdate") < lit(cutoff))).stableCheckpoint()
    val delta = state(orders.filter(col("o_orderdate") >= lit(cutoff))).stableCheckpoint()
    val merged = snap.unionAll(delta)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("merged_n"), sum(col("sum_c")).as("merged_sum_c"),
        min(col("min_c")).as("merged_min_c"), max(col("max_c")).as("merged_max_c"))
    val full = state(orders)
      .select(col("o_orderpriority"), col("n").as("full_n"), col("sum_c").as("full_sum_c"),
        col("min_c").as("full_min_c"), col("max_c").as("full_max_c"))
    merged
      .join(snap.select(col("o_orderpriority"), col("n").as("snap_n")), Seq("o_orderpriority"), "left")
      .join(delta.select(col("o_orderpriority"), col("n").as("delta_n")), Seq("o_orderpriority"), "left")
      .join(full, Seq("o_orderpriority"))
      .withColumn("snap_n", coalesce(col("snap_n"), lit(0L)))
      .withColumn("delta_n", coalesce(col("delta_n"), lit(0L)))
      .withColumn("consistent",
        col("merged_n") === col("full_n") && col("merged_sum_c") === col("full_sum_c") &&
          col("merged_min_c") === col("full_min_c") && col("merged_max_c") === col("full_max_c"))
      .select(col("o_orderpriority"), col("snap_n"), col("delta_n"), col("merged_n"),
        col("merged_sum_c"), col("merged_min_c"), col("merged_max_c"), col("consistent"))
      .orderBy("o_orderpriority")
  }
}
