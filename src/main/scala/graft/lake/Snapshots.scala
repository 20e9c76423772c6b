package graft.lake

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
  * Scale note: `commitLog` / `compactionPlan` use an unpartitioned
  * `Window.orderBy` (single-partition cumulative sum). That is safe here *by
  * construction*: both run over post-aggregation tables with one row per
  * commit / per file — thousands of rows even at 100 TB, since commits and
  * data files are coarse units, not data rows. If a deployment ever had
  * billions of files, the scale path is the standard two-phase prefix sum
  * (per-partition partial sums + broadcast partition offsets).
  */
object Snapshots {

  /** Append-only commit log derived from orders (100 orders per commit):
    * per-commit file/row/byte deltas + cumulative manifest growth. */
  def commitLog(orders: DataFrame): DataFrame = {
    val commits = orders
      .withColumn("commit_id", (col("o_orderkey") / 100).cast("long"))
      .groupBy(col("commit_id"))
      .agg(count(lit(1)).as("files_added"),
           round(sum(col("o_totalprice")), 4).as("bytes_added"))
    val w = Window.orderBy(col("commit_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    commits
      .withColumn("total_files", sum(col("files_added")).over(w))
      .withColumn("manifest_entries", col("total_files"))
      .orderBy("commit_id")
  }

  /** Greedy sequential bin-packing of small files into compaction groups of
    * ~`targetBytes` (the rewrite plan of measure_compaction_cost). */
  def compactionPlan(lineitem: DataFrame, nFiles: Int = 40, targetBytes: Long = 400000): DataFrame = {
    val files = FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id"))
      .agg((count(lit(1)) * 100L).as("file_bytes"))
    val w = Window.orderBy(col("file_id")).rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("bytes_before", coalesce(sum(col("file_bytes")).over(w), lit(0L)))
      .withColumn("group_id", (col("bytes_before") / targetBytes).cast("long"))
      .select("file_id", "file_bytes", "group_id")
      .orderBy("file_id")
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
}
