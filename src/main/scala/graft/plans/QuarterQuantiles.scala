package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quarter-quantiles (p ∈ {¼, ½, ¾}) of an integer-valued
  * column per group with BOUNDED executor state — the grouped generalisation
  * of the two-pass bucketed selection in `Relational.kthMedian2`, replacing
  * `median()`/`percentile()` aggregates whose ObjectHashAggregate state
  * buffers every group value (the memory cliff at 10⁹-row groups).
  *
  * Exactness: at quarter quantiles the SQL-standard interpolation
  * `v_lo + frac·(v_hi − v_lo)` has frac ∈ {0, ¼, ½, ¾}, so
  * 4·quantile = (4−j)·v_lo + j·v_hi is INTEGER arithmetic end-to-end
  * (j = 4·frac). The caller divides the returned `q{p}_x4` by 4·unit once,
  * giving the bit-identical double the engine's native quantile would have
  * produced (… /4 is an exact binary scale; one IEEE rounding per engine).
  *
  * Plan shape (no value buffering anywhere):
  *  1. a `bucketWidth`-wide histogram per group — one map-side-combinable
  *     aggregation, rows = groups × occupied buckets, NOT data rows;
  *  2. cumulative bucket counts (window over the histogram itself) locate,
  *     for each requested quantile, the bucket holding ranks k_lo/k_hi and
  *     their integer weights — ≤ 2 target rows per group × quantile;
  *  3. one rescan joins ONLY the straddling buckets' rows (broadcast hash
  *     join against the bounded target table), aggregates them per distinct
  *     value (≤ bucketWidth rows per bucket) and picks the exact ranks with
  *     an in-bucket cumulative window.
  *
  * The reference computes these summaries in single-node pyarrow
  * (`poc/quick_test.py` timing percentiles); this is the shape that survives
  * a 1000-executor corpus. */
object QuarterQuantiles {

  /** Returns one row per group: `groupCols ++ quarters.map(p => q{p}_x4)`,
    * where `q{p}_x4` = 4 × the exact interpolated (p/4)-quantile of `vcol`
    * (a non-negative integral column), as a long. */
  def quarterQuantiles(base: DataFrame, groupCols: Seq[String], vcol: String,
                       quarters: Seq[Int], bucketWidth: Long = 1000L): DataFrame = {
    require(quarters.nonEmpty && quarters.forall(p => p >= 1 && p <= 3))
    val g = groupCols.map(col)
    val hist = base
      .groupBy(g :+ expr(s"$vcol div $bucketWidth").as("bkt__qq"): _*)
      .agg(count(lit(1)).as("cnt__qq"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("bkt__qq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(g: _*)
    // 4·(1-based interpolation position) of quantile p/4 over n rows is
    // p·n + 4 − p; its div/mod 4 give the straddled rank pair and weights.
    val qStructs = quarters.flatMap { p =>
      val num = s"(${p}L * tot__qq + ${4 - p}L)"
      Seq(
        s"struct(${p}L AS qid, ($num div 4) AS k, (4L - $num % 4) AS w)",
        s"struct(${p}L AS qid, ($num div 4) + 1L AS k, ($num % 4) AS w)")
    }.mkString(", ")
    val targets = hist
      .withColumn("before__qq", coalesce(sum(col("cnt__qq")).over(wCum), lit(0L)))
      .withColumn("tot__qq", sum(col("cnt__qq")).over(wAll))
      .select(g ++ Seq(col("bkt__qq"), col("before__qq"), col("cnt__qq"),
        explode(expr(s"array($qStructs)")).as("t__qq")): _*)
      .filter(col("t__qq.w") > 0 &&
        col("before__qq") < col("t__qq.k") &&
        col("before__qq") + col("cnt__qq") >= col("t__qq.k"))
      .select(groupCols.map(c => col(c).as(s"${c}__t")) ++ Seq(
        col("bkt__qq").as("bkt__t"), col("before__qq"),
        col("t__qq.qid").as("qid__qq"), col("t__qq.k").as("k__qq"),
        col("t__qq.w").as("w__qq")): _*)
    val joinCond = groupCols.map(c => col(c) === col(s"${c}__t")).reduce(_ && _) &&
      expr(s"$vcol div $bucketWidth") === col("bkt__t")
    val wIn = Window.partitionBy(g ++ Seq(col("qid__qq"), col("k__qq")): _*)
      .orderBy(col(vcol)).rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(targets), joinCond)
      .groupBy(g ++ Seq(col("qid__qq"), col("k__qq"), col("w__qq"),
        col("before__qq"), col(vcol)): _*)
      .agg(count(lit(1)).as("c__qq"))
      .withColumn("cumin__qq", sum(col("c__qq")).over(wIn))
      .groupBy(g ++ Seq(col("qid__qq"), col("k__qq"), col("w__qq")): _*)
      .agg(min(when(col("before__qq") + col("cumin__qq") >= col("k__qq"),
        col(vcol))).as("vk__qq"))
      .groupBy(g: _*)
      .agg(qAggs(quarters).head, qAggs(quarters).tail: _*)
  }

  private def qAggs(quarters: Seq[Int]) = quarters.map(p =>
    sum(when(col("qid__qq") === p, col("w__qq") * col("vk__qq"))).as(s"q${p}_x4"))

  /** Discrete (type-1 / `percentile_disc`-style) quarter-quantiles: for each
    * p ∈ `quarters` returns `q{p}_disc` = the exact value of `vcol` at rank
    * `ceil(p·n/4)` (1-based, = the smallest v whose cumulative count reaches
    * p·n/4) — the threshold-selection semantics of `min(when(cum >= tot·p, v))`
    * over a cumulative frequency table, but with the same bounded-state
    * two-pass histogram plan as [[quarterQuantiles]]: no window ever runs over
    * a table whose row count scales with the data (the histogram is bounded by
    * value-range / bucketWidth, the rescan by one bucket's distinct values).
    * Output column keeps `vcol`'s integral type semantics (returned as long,
    * no ×4 scaling — discrete selection needs no interpolation). */
  def discreteQuartiles(base: DataFrame, groupCols: Seq[String], vcol: String,
                        quarters: Seq[Int], bucketWidth: Long = 1000L): DataFrame = {
    require(quarters.nonEmpty && quarters.forall(p => p >= 1 && p <= 3))
    val g = groupCols.map(col)
    val hist = base
      .groupBy(g :+ expr(s"$vcol div $bucketWidth").as("bkt__qq"): _*)
      .agg(count(lit(1)).as("cnt__qq"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("bkt__qq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(g: _*)
    // rank of the p/4 discrete quantile over n rows: ceil(p·n/4) = (p·n+3) div 4.
    val qStructs = quarters.map { p =>
      s"struct(${p}L AS qid, ((${p}L * tot__qq + 3L) div 4) AS k)"
    }.mkString(", ")
    val targets = hist
      .withColumn("before__qq", coalesce(sum(col("cnt__qq")).over(wCum), lit(0L)))
      .withColumn("tot__qq", sum(col("cnt__qq")).over(wAll))
      .select(g ++ Seq(col("bkt__qq"), col("before__qq"), col("cnt__qq"),
        explode(expr(s"array($qStructs)")).as("t__qq")): _*)
      .filter(col("before__qq") < col("t__qq.k") &&
        col("before__qq") + col("cnt__qq") >= col("t__qq.k"))
      .select(groupCols.map(c => col(c).as(s"${c}__t")) ++ Seq(
        col("bkt__qq").as("bkt__t"), col("before__qq"),
        col("t__qq.qid").as("qid__qq"), col("t__qq.k").as("k__qq")): _*)
    val joinCond = (groupCols.map(c => col(c) === col(s"${c}__t")) :+
      (expr(s"$vcol div $bucketWidth") === col("bkt__t"))).reduce(_ && _)
    val wIn = Window.partitionBy(g ++ Seq(col("qid__qq"), col("k__qq")): _*)
      .orderBy(col(vcol)).rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(targets), joinCond)
      .groupBy(g ++ Seq(col("qid__qq"), col("k__qq"), col("before__qq"), col(vcol)): _*)
      .agg(count(lit(1)).as("c__qq"))
      .withColumn("cumin__qq", sum(col("c__qq")).over(wIn))
      .groupBy(g ++ Seq(col("qid__qq"), col("k__qq")): _*)
      .agg(min(when(col("before__qq") + col("cumin__qq") >= col("k__qq"),
        col(vcol))).as("vk__qq"))
      .groupBy(g: _*)
      .agg(
        quarters.map(p =>
          min(when(col("qid__qq") === p, col("vk__qq"))).as(s"q${p}_disc")).head,
        quarters.map(p =>
          min(when(col("qid__qq") === p, col("vk__qq"))).as(s"q${p}_disc")).tail: _*)
  }
}
