package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-phase prefix sum — the scale path for cumulative sums
  * that a single-partition `Window.orderBy` cannot survive.
  *
  * Phase 1 buckets rows by equal-width slices of the (integer) ordering key
  * and computes per-bucket running sums with a *partitioned* window; phase 2
  * turns the per-bucket totals into exclusive bucket offsets (cumulative
  * window over the ≤ `nBuckets`-row totals table — bounded by construction)
  * and broadcasts them back. The result equals the global running sum
  * because bucket ranges are disjoint and ordered: every row's prefix is
  * (its in-bucket prefix) + (total of all earlier buckets).
  *
  * Deterministic with no reliance on physical partitioning (`bucket` is a
  * pure function of the key, unlike `spark_partition_id()`), so the same
  * plan is reproducible on any cluster shape. Keys are assumed unique per
  * row (commit ids, file ids) — the usual shape of metadata logs.
  */
object PrefixSum {

  /** Adds column `out` = running sum of `valCol` ordered by integer `keyCol`
    * (inclusive of the current row when `inclusive`, else the strict-prefix
    * sum, 0 for the first row). With `partitionCols` the running sum restarts
    * per group and the sort work spreads over |groups| × nBuckets partitions
    * instead of |groups| single-threaded ones. */
  def prefixSum(df: DataFrame, keyCol: String, valCol: String, out: String,
                inclusive: Boolean = true, nBuckets: Int = 32,
                partitionCols: Seq[String] = Nil): DataFrame = {
    val pCols = partitionCols.map(col)
    val rng =
      if (partitionCols.isEmpty)
        df.groupBy().agg(min(col(keyCol)).as("kmin__ps"), max(col(keyCol)).as("kmax__ps"))
      else
        df.groupBy(pCols: _*).agg(min(col(keyCol)).as("kmin__ps"), max(col(keyCol)).as("kmax__ps"))
    val bucketed =
      (if (partitionCols.isEmpty) df.crossJoin(broadcast(rng))
       else df.join(broadcast(rng), partitionCols))
        .withColumn("bucket__ps", least(
          floor((col(keyCol) - col("kmin__ps")) * nBuckets /
            (col("kmax__ps") - col("kmin__ps") + 1)),
          lit(nBuckets - 1L)))
        .drop("kmin__ps", "kmax__ps")
    val endRow = if (inclusive) Window.currentRow else -1L
    val wIn = Window.partitionBy(pCols :+ col("bucket__ps"): _*).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, endRow)
    val wOff = Window.partitionBy(pCols: _*).orderBy(col("bucket__ps"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(pCols :+ col("bucket__ps"): _*)
      .agg(sum(col(valCol)).as("btot__ps"))
      .withColumn("offset__ps", coalesce(sum(col("btot__ps")).over(wOff), lit(0L)))
      .select(pCols :+ col("bucket__ps") :+ col("offset__ps"): _*)
    bucketed
      .withColumn("partial__ps", coalesce(sum(col(valCol)).over(wIn), lit(0L)))
      .join(broadcast(offsets), partitionCols :+ "bucket__ps")
      .withColumn(out, col("partial__ps") + col("offset__ps"))
      .drop("bucket__ps", "partial__ps", "offset__ps")
  }
}
