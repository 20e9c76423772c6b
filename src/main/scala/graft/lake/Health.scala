package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unified lake-health report — the graft counterpart of the reference's
  * run-everything summary (`poc/results/all_benchmarks_results.json`:
  * a `benchmarks` object with one completed entry per study). One long-format
  * row per (benchmark, metric) with a constant `status = completed` column
  * mirroring the reference's per-benchmark status field, so a single query
  * answers "how is this table doing across every dimension the reference
  * measures":
  *
  *  - `delete_storm` (`results/delete_storm_results.json` semantics via
  *    `DeleteVectors.deleteStorm`): files hit by the 5-wave storm, total DV
  *    fragments outstanding, worst per-file byte amplification;
  *  - `gc_cliff` (`results/gc_cliff_results.json` via `Manifest.inlineBudget`
  *    semantics): how many of the 4 policy thresholds the cumulative inline
  *    blob has crossed, and how many files still fit the 4 KB inline budget;
  *  - `density_adaptive_policy` (`results/density_adaptive_policy_results
  *    .json` via `DeleteVectors.densityPolicy`): MDV census — total, inlined
  *    vs spilled (the reference's `inlined_count`/`spilled_count` fields),
  *    total MDV bytes;
  *  - `dv_resolution` (`results/dv_resolution_strategies_results.json` via
  *    `DeleteVectors.equalityDeletes` byte model): total equality vs
  *    positional delete bytes and the equality-side memory reduction (the
  *    reference's `memory_reduction_pct` headline).
  *
  * Scale: two columnar scans of the fact table (one windowed per-file for
  * storm positions, one plain aggregation for the delete censuses), then
  * all arithmetic on nFiles-bounded (≤ 40-row) summaries. The one window
  * (`cum_bytes` for gc_cliff) orders the per-file blob table — bounded by
  * the `nFiles` parameter, not by data volume, so it never grows past 40
  * rows at any corpus size. Value column is DOUBLE throughout (counts are
  * exactly representable; divisions are round()ed) so the long format stays
  * one schema. */
object Health {

  def healthReport(lineitem: DataFrame, nFiles: Int = 40): DataFrame = {
    // -- delete_storm: fragment census over the 5-wave storm model.
    val frags = FileModel.withPos(FileModel.withFileId(lineitem, nFiles))
      .withColumn("wave", col("pos") % 97)
      .filter(col("wave") < 5)
      .groupBy(col("file_id"), col("wave"))
      .agg(count(lit(1)).as("n_deletes"))
    val storm = frags
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_fragments"),
        sum(col("n_deletes")).as("total_deletes"),
        sum(col("n_deletes") * 4 + 100).as("fragmented_bytes"))
      .withColumn("amplification",
        round(col("fragmented_bytes") / (col("total_deletes") * 4 + 100), 6))
      .agg(count(lit(1)).cast("double").as("files_hit"),
        sum(col("n_fragments")).cast("double").as("total_fragments"),
        max(col("amplification")).as("max_amplification"))

    // -- shared per-file delete census (positional + equality predicates).
    val perFile = FileModel.withFileId(lineitem, nFiles)
      .withColumn("pos_hit",
        ((col("l_orderkey") * 31 + col("l_linenumber")) % 10 === 3).cast("long"))
      .withColumn("eq_hit", (col("l_partkey") % 50 === 7).cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("rows"),
        sum(col("pos_hit")).as("pos_del"),
        sum(col("eq_hit")).as("eq_del"))

    // -- gc_cliff: cumulative inline-blob bytes vs the 4 policy thresholds.
    //    (Window over the nFiles-bounded blob table: <= 40 rows by construction.)
    val blobs = perFile.filter(col("pos_del") > 0)
      .select(col("file_id"), (col("pos_del") * 4 + 100).as("blob_bytes"))
    val cum = blobs.withColumn("cum_bytes",
      sum(col("blob_bytes")).over(
        Window.orderBy(col("file_id")).rowsBetween(Window.unboundedPreceding, 0)))
    val thresholds = Seq(4096L, 65536L, 1048576L, 10485760L)
    val gc = cum.agg(
      thresholds.map(t => max(when(col("cum_bytes") > t, 1L).otherwise(0L)))
        .reduce(_ + _).cast("double").as("thresholds_crossed"),
      sum(when(col("cum_bytes") <= 4096L, 1L).otherwise(0L)).cast("double")
        .as("files_within_4kb"))

    // -- density_adaptive_policy: encoding + inline/spill census.
    val dens = perFile
      .withColumn("dv_bytes",
        least(col("pos_del") * 4, ceil(col("rows") / 8.0).cast("long")))
      .agg(count(lit(1)).cast("double").as("total_mdvs"),
        sum(when(col("dv_bytes") <= 4096L, 1L).otherwise(0L)).cast("double")
          .as("inlined_count"),
        sum(when(col("dv_bytes") > 4096L, 1L).otherwise(0L)).cast("double")
          .as("spilled_count"),
        sum(col("dv_bytes")).cast("double").as("total_mdv_bytes"))

    // -- dv_resolution: equality vs positional byte trade.
    val dvres = perFile.agg(
      (count(lit(1)) * 16L).cast("double").as("eq_bytes"),
      (sum(col("pos_del")) * 4L).cast("double").as("pos_bytes"))
      .withColumn("memory_reduction_pct",
        round((col("pos_bytes") - col("eq_bytes")) * 100.0 / col("pos_bytes"), 4))

    def rows(bench: String, df: DataFrame, metrics: Seq[String]): DataFrame =
      df.select(explode(array(metrics.map(m =>
          struct(lit(m).as("metric"), col(m).cast("double").as("value"))): _*)).as("s"))
        .select(lit(bench).as("benchmark"), lit("completed").as("status"),
          col("s.metric").as("metric"), col("s.value").as("value"))

    rows("delete_storm", storm,
        Seq("files_hit", "total_fragments", "max_amplification"))
      .unionByName(rows("gc_cliff", gc,
        Seq("thresholds_crossed", "files_within_4kb")))
      .unionByName(rows("density_adaptive_policy", dens,
        Seq("total_mdvs", "inlined_count", "spilled_count", "total_mdv_bytes")))
      .unionByName(rows("dv_resolution", dvres,
        Seq("eq_bytes", "pos_bytes", "memory_reduction_pct")))
      .orderBy("benchmark", "metric")
  }
}
