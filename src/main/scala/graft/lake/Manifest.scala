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
}
