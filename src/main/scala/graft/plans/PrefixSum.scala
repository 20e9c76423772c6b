package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-phase prefix sum — the scale path for cumulative sums
  * that a single-partition `Window.orderBy` cannot survive.
  *
  * Phase 1 buckets rows by key and computes per-bucket running sums with a
  * *partitioned* window; phase 2 turns the per-bucket totals into exclusive
  * bucket offsets (cumulative window over the ≤ `nBuckets`-row totals table —
  * bounded by construction) and broadcasts them back. The result equals the
  * global running sum because bucket ranges are disjoint and ordered: every
  * row's prefix is (its in-bucket prefix) + (total of all earlier buckets).
  *
  * Bucket edges are EQUI-HEIGHT, not equal-width: a fine `64·nBuckets`-slice
  * histogram of the key (one map-side-combinable aggregation; rows = occupied
  * fine slices, not data rows) is folded into coarse buckets by cumulative
  * count — coarse bucket = ⌊cumBefore·nBuckets/total⌋ — so a power-law key
  * distribution (most rows in a narrow key band, e.g. `ev_power_users`'
  * `-n_events·span+uid` key) still spreads over ~nBuckets equal-row buckets
  * instead of collapsing into the one equal-width slice that covers the band.
  * The residual imbalance is one fine slice's worth of rows: only rows whose
  * keys collide within a single fine slice (1/(64·nBuckets) of the key range)
  * are inseparable, because the bucket must remain a pure monotone function
  * of the key for the phase-2 offsets to be correct.
  *
  * Any monotone-in-key bucket assignment yields the SAME prefix sums, so the
  * equi-height edges change plan balance only, never results. Fine slicing
  * uses integer division (`(key − kmin) div w`), not multiplication, so the
  * only headroom requirement is the key span itself fitting in a long —
  * there is no `span × nBuckets` product to overflow.
  *
  * Deterministic with no reliance on physical partitioning (the bucket is a
  * pure function of the key and the key's distribution, unlike
  * `spark_partition_id()`), so the same plan is reproducible on any cluster
  * shape. Keys are assumed unique per row (commit ids, file ids) — the usual
  * shape of metadata logs.
  */
object PrefixSum {

  /** Adds column `out` = running sum of `valCol` ordered by integer `keyCol`
    * (inclusive of the current row when `inclusive`, else the strict-prefix
    * sum, 0 for the first row). With `partitionCols` the running sum restarts
    * per group and the sort work spreads over |groups| × nBuckets partitions
    * instead of |groups| single-threaded ones. */
  def prefixSum(df: DataFrame, keyCol: String, valCol: String, out: String,
                inclusive: Boolean = true, nBuckets: Int = 32,
                partitionCols: Seq[String] = Nil): DataFrame =
    prefixSums(df, keyCol, Seq(valCol -> out), inclusive, nBuckets, partitionCols)

  /** Multi-value [[prefixSum]]: running sums of SEVERAL value columns over the
    * same key order from ONE bucketed pass — one fine-histogram build, one
    * per-bucket window operator (all partials share a window spec), one
    * ≤ nBuckets-row offsets table. Nesting single-column calls instead would
    * re-evaluate the whole input lineage per call (the bucketed subtree
    * appears in both the offsets and main branches), which for a
    * corpus-derived input means repeated corpus scans. */
  def prefixSums(df: DataFrame, keyCol: String, valOuts: Seq[(String, String)],
                 inclusive: Boolean = true, nBuckets: Int = 32,
                 partitionCols: Seq[String] = Nil): DataFrame = {
    require(valOuts.nonEmpty)
    val pCols = partitionCols.map(col)
    val bucketed = equiHeightBuckets(df, keyCol, nBuckets, partitionCols)
    val endRow = if (inclusive) Window.currentRow else -1L
    val wIn = Window.partitionBy(pCols :+ col("bucket__ps"): _*).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, endRow)
    val wOff = Window.partitionBy(pCols: _*).orderBy(col("bucket__ps"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totAggs = valOuts.map { case (v, o) => sum(col(v)).as(s"btot__$o") }
    val offsets0 = bucketed.groupBy(pCols :+ col("bucket__ps"): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val offsets = valOuts.foldLeft(offsets0) { case (acc, (_, o)) =>
        acc.withColumn(s"offset__$o",
          coalesce(sum(col(s"btot__$o")).over(wOff), lit(0L)))
      }
      .select(pCols ++ (col("bucket__ps") +: valOuts.map { case (_, o) => col(s"offset__$o") }): _*)
    val withPartials = valOuts.foldLeft(bucketed) { case (acc, (v, o)) =>
      acc.withColumn(s"partial__$o", coalesce(sum(col(v)).over(wIn), lit(0L)))
    }
    valOuts.foldLeft(
        withPartials.join(broadcast(offsets), partitionCols :+ "bucket__ps")) {
        case (acc, (_, o)) => acc.withColumn(o, col(s"partial__$o") + col(s"offset__$o"))
      }
      .drop("bucket__ps" +: valOuts.flatMap { case (_, o) =>
        Seq(s"partial__$o", s"offset__$o") }: _*)
  }

  /** Adds column `out` = `valCol` of the previous row in `keyCol` order
    * (null for the first row) — the distributed form of
    * `lag(valCol, 1) over (order by keyCol)`, built on [[equiHeightBuckets]]:
    * in-bucket lags run under a *partitioned* window, and each bucket's first
    * row takes the previous non-empty bucket's last value from a
    * ≤ nBuckets-row carry table (`max_by(valCol, keyCol)` per bucket, lagged
    * over bucket order — bounded by construction).
    *
    * REQUIRES unique `keyCol` per row (the carry's max_by winner must be
    * well-defined) and non-null `valCol` (a genuine null previous value is
    * indistinguishable from "first row of bucket" in the coalesce). */
  def lagOver(df: DataFrame, keyCol: String, valCol: String, out: String,
              nBuckets: Int = 32, partitionCols: Seq[String] = Nil): DataFrame = {
    val pCols = partitionCols.map(col)
    val bucketed = equiHeightBuckets(df, keyCol, nBuckets, partitionCols)
    val wIn = Window.partitionBy(pCols :+ col("bucket__ps"): _*).orderBy(col(keyCol))
    val wB = Window.partitionBy(pCols: _*).orderBy(col("bucket__ps"))
    val carry = bucketed.groupBy(pCols :+ col("bucket__ps"): _*)
      .agg(expr(s"max_by(`$valCol`, `$keyCol`)").as("blast__ps"))
      .withColumn("bprev__ps", lag(col("blast__ps"), 1).over(wB))
      .select(pCols :+ col("bucket__ps") :+ col("bprev__ps"): _*)
    bucketed
      .withColumn("lag__ps", lag(col(valCol), 1).over(wIn))
      .join(broadcast(carry), partitionCols :+ "bucket__ps")
      .withColumn(out, coalesce(col("lag__ps"), col("bprev__ps")))
      .drop("bucket__ps", "lag__ps", "bprev__ps")
  }

  /** Adds column `out` = running max of `valCol` ordered by `keyCol`
    * (inclusive; null until the first non-null value) — the distributed form
    * of `max(valCol) over (order by keyCol rows unbounded preceding)`.
    * `valCol` MAY be null (the usual conditional-max shape
    * `when(cond, v)`): in-bucket running maxes and the exclusive cumulative
    * bucket maxes combine with `greatest`, which skips nulls. Same bounded
    * plan as [[prefixSum]] — per-bucket window + ≤ nBuckets-row offset table. */
  def prefixMax(df: DataFrame, keyCol: String, valCol: String, out: String,
                nBuckets: Int = 32, partitionCols: Seq[String] = Nil): DataFrame = {
    val pCols = partitionCols.map(col)
    val bucketed = equiHeightBuckets(df, keyCol, nBuckets, partitionCols)
    val wIn = Window.partitionBy(pCols :+ col("bucket__ps"): _*).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy(pCols: _*).orderBy(col("bucket__ps"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(pCols :+ col("bucket__ps"): _*)
      .agg(max(col(valCol)).as("bmax__ps"))
      .withColumn("offmax__ps", max(col("bmax__ps")).over(wOff))
      .select(pCols :+ col("bucket__ps") :+ col("offmax__ps"): _*)
    bucketed
      .withColumn("pmax__ps", max(col(valCol)).over(wIn))
      .join(broadcast(offsets), partitionCols :+ "bucket__ps")
      .withColumn(out, greatest(col("pmax__ps"), col("offmax__ps")))
      .drop("bucket__ps", "pmax__ps", "offmax__ps")
  }

  /** Adds `bucket__ps` ∈ [0, nBuckets): an equi-height, monotone-in-`keyCol`
    * bucket id per group. Exposed so balance is testable on its own; the
    * guarantee is max bucket size ≤ ⌈rows/nBuckets⌉ + (largest fine-slice
    * count) — skew narrower than 1/(64·nBuckets) of the key range (or a
    * single repeated key value) is inseparable by any pure key function. */
  def equiHeightBuckets(df: DataFrame, keyCol: String, nBuckets: Int,
                        partitionCols: Seq[String] = Nil): DataFrame = {
    import Checkpoints.StableCheckpoint
    // Lineage cut at the seam (idempotent — pre-checkpointed callers pass
    // through): the bucketed result references its input from FOUR plan
    // branches (range agg, fine-slice histogram, the sliced main branch,
    // and every prefixSum/lagOver/prefixMax consumer adds an offsets/carry
    // branch on top), so without the cut the input's whole lineage — for
    // most callers a fact-table aggregation — re-executed per branch:
    // ev_power_users' executed plan carried 64 parquet scans of events
    // (plans/r18/ev_power_users_before.txt), lake_snapshot_lineage 128
    // scans of orders. Inputs here are aggregate/metadata-grain by this
    // module's documented contract (unique keys: commit ids, user ids,
    // part keys), so the materialization is bounded and the corpus-grain
    // work above it runs exactly once.
    val in = df.stableCheckpointOnce().toDF()
    val pCols = partitionCols.map(col)
    val nFine = nBuckets.toLong * 64L
    val rng =
      if (partitionCols.isEmpty)
        in.groupBy().agg(min(col(keyCol)).as("kmin__ps"), max(col(keyCol)).as("kmax__ps"))
      else
        in.groupBy(pCols: _*).agg(min(col(keyCol)).as("kmin__ps"), max(col(keyCol)).as("kmax__ps"))
    // Fine slice: division-first (no span×n product), monotone in the key.
    // w = ceil(span / nFine) ≥ 1, so slice indices stay within [0, nFine).
    // Integral `div` throughout — `/` would route through double and lose
    // exactness (and monotonicity) for keys beyond 2^53.
    val sliceExpr = least(
      expr(s"(`$keyCol` - kmin__ps) div ((kmax__ps - kmin__ps + ${nFine}L) div ${nFine}L)"),
      lit(nFine - 1L))
    val sliced =
      (if (partitionCols.isEmpty) in.crossJoin(broadcast(rng))
       else in.join(broadcast(rng), partitionCols))
        .withColumn("fine__ps", sliceExpr)
        .drop("kmin__ps", "kmax__ps")
    // Equi-height coarse edges: cumulative fine-slice counts → bucket ids.
    // All windows here run over the ≤ |groups|×nFine-row histogram.
    val wFineCum = Window.partitionBy(pCols: _*).orderBy(col("fine__ps"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wFineAll = Window.partitionBy(pCols: _*)
    val sliceMap = sliced.groupBy(pCols :+ col("fine__ps"): _*)
      .agg(count(lit(1)).as("fcnt__ps"))
      .withColumn("fbefore__ps", coalesce(sum(col("fcnt__ps")).over(wFineCum), lit(0L)))
      .withColumn("ftot__ps", sum(col("fcnt__ps")).over(wFineAll))
      .withColumn("bucket__ps",
        expr(s"(fbefore__ps * ${nBuckets}L) div ftot__ps"))
      .select(pCols :+ col("fine__ps") :+ col("bucket__ps"): _*)
    sliced
      .join(broadcast(sliceMap), partitionCols :+ "fine__ps")
      .drop("fine__ps")
  }
}
