package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Writer-organization / data-layout operators (SURVEY.md §2.2).
  *
  * The reference's headline result (README.md:59-62, images/skip_rates.png):
  * unsorted writes give ~0% file skip rate and ~100% per-file domain span,
  * sorted writes give ~99% skip and ~1% span. `skipRateReport` reproduces
  * that comparison analytically from per-file min/max stats; `writeSorted`
  * is the actual sorted writer (range repartition + in-partition sort, the
  * Spark-native way to get clustered parquet files with tight min/max).
  */
object Layout {

  /** Per-layout skip-rate report for a shipdate range predicate.
    *
    * Layout "unsorted": files assigned by key hash (write arrival order) —
    * every file spans nearly the whole shipdate domain.
    * Layout "sorted": files assigned by shipdate rank (what writeSorted
    * produces) — each file covers a narrow slice.
    */
  def skipRateReport(lineitem: DataFrame, lo: String, hi: String, nFiles: Int = 40): DataFrame = {
    val unsorted = FileModel.withFileId(lineitem, nFiles)
      .select(lit("unsorted").as("layout"), col("file_id"), col("l_shipdate"))
    // Clustered layout model: equal-width date buckets — pure arithmetic
    // against the (broadcast) global min/max, so unlike an ntile over a
    // global ordering it needs no single-partition sort and survives any
    // scale. (The real writer, writeSorted below, range-partitions instead;
    // both yield files covering narrow, nearly disjoint key slices.)
    val global = lineitem.agg(
      min(col("l_shipdate")).as("gmin"), max(col("l_shipdate")).as("gmax"))
    val sorted = lineitem.join(broadcast(global))
      .withColumn("file_id", least(
        floor((unix_date(to_date(col("l_shipdate"))) - unix_date(to_date(col("gmin")))) * nFiles /
          (unix_date(to_date(col("gmax"))) - unix_date(to_date(col("gmin"))) + 1)).cast("long"),
        lit(nFiles - 1L)))
      .select(lit("sorted").as("layout"), col("file_id"), col("l_shipdate"))

    unsorted.unionAll(sorted)
      .groupBy(col("layout"), col("file_id"))
      .agg(min(col("l_shipdate")).as("fmin"), max(col("l_shipdate")).as("fmax"))
      .join(broadcast(global))
      .withColumn("span_pct",
        (unix_date(to_date(col("fmax"))) - unix_date(to_date(col("fmin")))).cast("double") /
          (unix_date(to_date(col("gmax"))) - unix_date(to_date(col("gmin")))).cast("double") * 100.0)
      .withColumn("skipped", col("fmax") < lit(lo).cast("timestamp") || col("fmin") > lit(hi).cast("timestamp"))
      .groupBy(col("layout"))
      .agg(
        count(lit(1)).as("files_total"),
        sum(when(col("skipped"), 1L).otherwise(0L)).as("files_skipped"),
        round(sum(when(col("skipped"), 1L).otherwise(0L)) * 100.0 / count(lit(1)), 4).as("skip_rate_pct"),
        round(avg(col("span_pct")), 4).as("avg_span_pct"))
      .orderBy("layout")
  }

  /** The real sorted writer: range-repartition by the clustering key then
    * sort within partitions → each output parquet file holds a tight,
    * non-overlapping key range (used by LayoutSpec against a tmp dir). */
  def writeSorted(df: DataFrame, sortCol: String, outDir: String, numFiles: Int = 8): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode(SaveMode.Overwrite).parquet(outDir)
}
