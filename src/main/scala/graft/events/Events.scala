package graft.events

import graft.plans.Checkpoints._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / event-stream operators over the `events` table (SURVEY.md §2.6).
  *
  * All operators partition by `user_id` (high cardinality) — one shuffle,
  * per-key windows, no global state. `graft.streaming.StreamOps` mirrors
  * sessionize/tumbling with Structured Streaming (watermark + window /
  * flatMapGroupsWithState); the batch forms here are the oracle-checkable
  * definitions of the same semantics.
  */
object Events {

  /** Gap-based sessionization (classic lag + cumulative-flag): events of a
    * user belong to one session while gaps stay under `gapMinutes`. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"),
        round(sum(col("value")), 4).as("session_value"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
      .orderBy("user_id", "session_seq")
  }

  /** Tumbling-window (hourly) aggregates per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value")), 4).as("sum_value"),
           countDistinct(col("user_id")).as("users"))
      .orderBy("hour", "event_type")

  /** Signup→purchase funnel: users whose first purchase follows their first
    * signup, with conversion rate and mean hours-to-convert. */
  def funnel(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val conv = events.filter(col("event_type") === "purchase")
      .join(signups, Seq("user_id"))
      .filter(col("ts") >= col("signup_ts"))
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(col("ts")).as("first_purchase"))
    val nSignups = signups.agg(count(lit(1)).as("signup_users"))
    conv.agg(
        count(lit(1)).as("converted_users"),
        round(avg((unix_millis(col("first_purchase")) - unix_millis(col("signup_ts"))) / lit(3600000.0)), 6)
          .as("avg_hours_to_convert"))
      .join(broadcast(nSignups))
      .select(col("signup_users"), col("converted_users"),
        round(col("converted_users") * 100.0 / col("signup_users"), 4).as("conversion_pct"),
        col("avg_hours_to_convert"))
  }

  /** Day-over-day retention: of the users active on day d, how many return
    * on day d+1. */
  def retention(events: DataFrame): DataFrame = {
    val daily = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val next = daily.select(col("day").as("nday"), col("user_id").as("nuser"))
    daily
      .join(next, col("nuser") === col("user_id") && col("nday") === date_add(col("day"), 1), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_users"),
           sum(when(col("nuser").isNotNull, 1L).otherwise(0L)).as("retained_next_day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("active_users"),
        col("retained_next_day"),
        round(col("retained_next_day") * 100.0 / col("active_users"), 4).as("retention_pct"))
      .orderBy("day")
  }

  /** Value anomalies: events more than `sigmas` sample standard deviations
    * above their event type's mean. Per-type stats broadcast back. */
  def anomalies(events: DataFrame, sigmas: Double = 2.0): DataFrame = {
    val stats = events.groupBy(col("event_type").as("et"))
      .agg(avg(col("value")).as("mean_v"), stddev_samp(col("value")).as("sd_v"))
    events.join(broadcast(stats), col("event_type") === col("et"))
      .filter(col("value") > col("mean_v") + lit(sigmas) * col("sd_v"))
      .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"),
        round((col("value") - col("mean_v")) / col("sd_v"), 4).as("z"))
      .orderBy("event_id")
  }

  /** Top-N sessions by accumulated value (composition over sessionize). */
  def topSessions(events: DataFrame, n: Int = 10, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .orderBy(col("session_value").desc, col("user_id"), col("session_seq"))
      .limit(n)

  /** Hopping (sliding) windows via Spark's native window generator: 1-hour
    * windows every 30 minutes, so each event lands in two windows. The
    * expansion happens inside the generator (no self-join). */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  /** Cohort LTV matrix: users grouped by ISO signup week, purchase value
    * accumulated per whole week since signup. One shuffle on user_id to pin
    * the cohort, then a broadcast-size aggregation. */
  def cohortLtv(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    events.filter(col("event_type") === "purchase")
      .join(signups, Seq("user_id"))
      .filter(col("ts") >= col("signup_ts"))
      .groupBy(
        date_format(date_trunc("week", col("signup_ts")), "yyyy-MM-dd").as("cohort_week"),
        floor(datediff(to_date(col("ts")), to_date(col("signup_ts"))) / 7).as("week_n"))
      .agg(countDistinct(col("user_id")).as("buyers"),
           round(sum(col("value")), 4).as("ltv"))
      .orderBy("cohort_week", "week_n")
  }

  /** Event-type transition matrix (user paths): for each user's
    * time-ordered stream, count consecutive (prev → next) event-type pairs
    * corpus-wide — the Markov-transition view of behavioural flows. One
    * per-user window, then a tiny global aggregation. */
  def transitionMatrix(events: DataFrame, topN: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prev_type"), col("next_type"))
      .limit(topN)
  }

  /** Path trigrams: the most common three-step event sequences across user
    * streams (two lags per user window, then a tiny global count) — the
    * order-3 extension of `transitionMatrix` for funnel mining. */
  def pathTrigrams(events: DataFrame, topN: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("e1", lag(col("event_type"), 2).over(w))
      .withColumn("e2", lag(col("event_type"), 1).over(w))
      .filter(col("e1").isNotNull)
      .groupBy(col("e1"), col("e2"), col("event_type").as("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(topN)
  }

  /** Sketch-based distinct users per day — [[graft.plans.CrossSketch]]'s
    * cross-engine deterministic HLL: the 100 TB path for cardinality
    * (register state at (day, bucket) grain — 1024 rows per day, never
    * O(distinct users) — merged map-side), with an estimate ANY engine
    * recomputes bit-for-bit, so the DuckDB oracle checks the estimate
    * itself, not just an error envelope. The shipped shape (`verify =
    * false`, the default) is sketch-only; `verify = true` joins the exact
    * `countDistinct` anchor and asserts the 5·rsd envelope
    * (rsd = 1.04/√1024; RelationalSpec proves it all-true at two SFs).
    * Bench and Audit run the default so measured time and audited plan
    * shape describe the query a production pipeline ships. */
  def approxDailyUsers(events: DataFrame, verify: Boolean = false): DataFrame = {
    import graft.plans.CrossSketch._
    val day = date_format(col("ts"), "yyyy-MM-dd").as("day")
    // one scan: the register pass carries the event count alongside each
    // bucket's max rank, so n_events is a rollup of sketch-grain state
    val regs = events
      .select(day, hash31(col("user_id")).as("h"))
      .groupBy(col("day"), hllBucket(col("h")).as("bucket"))
      .agg(max(hllRank(col("h"))).as("r"), count(lit(1)).as("c"))
    val est = regs.groupBy(col("day"))
      .agg(hllSumCol.as("s"), hllZerosCol.as("v"), sum(col("c")).as("n_events"))
      .select(col("day"), hllEstimate(col("s"), col("v")).as("approx_users"),
        col("n_events"))
    if (!verify)
      est.orderBy("day")
    else
      est.join(events.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(countDistinct(col("user_id")).as("exact_users")), "day")
        .withColumn("rel_err",
          round(abs(col("approx_users") - col("exact_users")) * 1.0 / col("exact_users"), 6))
        .withColumn("within_bound", col("rel_err") <= lit(HllErrBound))
        .orderBy("day")
  }

  /** RFM segmentation: per purchasing user, recency (days since last
    * purchase vs corpus max day), frequency (purchase count) and monetary
    * (total cents) are binned into quartiles against *discrete-percentile
    * thresholds* (smallest value whose cumulative frequency reaches p)
    * broadcast back over the users. All three thresholds come from
    * `plans.QuarterQuantiles.discreteQuartiles` — two-pass bucketed histogram
    * selection with BOUNDED state: the only unpartitioned windows run over
    * per-metric histograms whose row count is value-range / bucketWidth, NOT
    * data cardinality. (The previous shape windowed over each metric's
    * distinct-value frequency table; for `monetary_c` — integer cents summed
    * per user — NDV ≈ the user population, a single-task sort of every user
    * at scale.) No global ntile sort anywhere; the binning itself is a
    * broadcast-join CASE. Ties at a threshold share a bucket (standard
    * threshold-RFM), and monetary is quantized to integer cents before
    * thresholding so the bucket edges are exact on any engine. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
    val maxDay = purchases.agg(max(to_date(col("ts"))).as("corpus_max_day"))
    val per = purchases
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(col("value")).as("monetary"),
        sum(round(col("value") * 100, 0).cast("long")).as("monetary_c"))
      .join(broadcast(maxDay))
      .withColumn("recency_days", datediff(col("corpus_max_day"), col("last_day")).cast("long"))
      .stableCheckpoint()
    // Discrete p25/p50/p75 of one metric, reduced to a single broadcastable
    // row. `min v with cum(v) >= tot·p` == the value at rank ceil(p·tot),
    // which is exactly discreteQuartiles' selection semantics.
    def discQuartiles(c: String, p: String, bucketWidth: Long): DataFrame =
      graft.plans.QuarterQuantiles.discreteQuartiles(per, Seq.empty, c, Seq(1, 2, 3), bucketWidth)
        .select(col("q1_disc").as(s"${p}25"), col("q2_disc").as(s"${p}50"),
          col("q3_disc").as(s"${p}75"))
    val scored = per
      .crossJoin(broadcast(discQuartiles("recency_days", "r", 16L)))
      .crossJoin(broadcast(discQuartiles("freq", "f", 16L)))
      .crossJoin(broadcast(discQuartiles("monetary_c", "m", 1000L)))
      // recency: smaller is better → bucket 1 below p25; freq/monetary: larger is
      // better → bucket 1 at-or-above p75.
      .withColumn("r_q", (lit(1) + (col("recency_days") > col("r25")).cast("int")
        + (col("recency_days") > col("r50")).cast("int")
        + (col("recency_days") > col("r75")).cast("int")).cast("long"))
      .withColumn("f_q", (lit(1) + (col("freq") < col("f75")).cast("int")
        + (col("freq") < col("f50")).cast("int")
        + (col("freq") < col("f25")).cast("int")).cast("long"))
      .withColumn("m_q", (lit(1) + (col("monetary_c") < col("m75")).cast("int")
        + (col("monetary_c") < col("m50")).cast("int")
        + (col("monetary_c") < col("m25")).cast("int")).cast("long"))
    scored
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("users"),
        round(avg(col("monetary")), 6).as("avg_monetary"),
        round(avg(col("recency_days")), 6).as("avg_recency_days"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Last-touch attribution: each purchase is credited to the most recent
    * preceding non-purchase event of the same user (IGNORE NULLS last_value
    * over a trailing frame — one per-user window, no self-join), then
    * rolled up per touch type. */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("purchases"),
        round(sum(col("value")), 4).as("attributed_value"))
      .orderBy("touch_type")
  }

  /** Inter-event dwell-time: the gap from each event back to the user's
    * previous event (any type), aggregated per the current event's type.
    * The median comes from `plans.QuarterQuantiles` — two-pass bucketed
    * selection over ms-integer gaps (1-minute-wide histogram buckets), so no
    * aggregate buffers a group's values: at 10⁹ gaps per event type the old
    * `median()` held ~N/|types| doubles in ObjectHashAggregate state, this
    * holds a bounded histogram. The mean is the exact integer Σ gap_ms
    * divided once (kills double-summation-order dependence); 4·median is
    * exact integer, scaled by one IEEE division per engine. */
  def dwellTimes(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = events
      .withColumn("gap_ms", unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)))
      .filter(col("gap_ms").isNotNull)
      .select(col("event_type"), col("gap_ms"))
    val stats = gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_ms")).as("sum_gap"),
        max(col("gap_ms")).as("max_gap"))
    val med = graft.plans.QuarterQuantiles.quarterQuantiles(
      gaps, Seq("event_type"), "gap_ms", Seq(2), bucketWidth = 60000L)
    stats.join(med, "event_type")
      .select(col("event_type"), col("n_gaps"),
        round(col("sum_gap") / (col("n_gaps") * 60000.0), 6).as("avg_gap_min"),
        round(col("q2_x4") / 240000.0, 6).as("median_gap_min"),
        round(col("max_gap") / 60000.0, 6).as("max_gap_min"))
      .orderBy("event_type")
  }

  /** JSON property extraction (`props` is a JSON string column). */
  def propStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(avg(col("k")), 6).as("avg_k"),
           max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Exponentially time-decayed engagement score per user: each event
    * contributes value·e^(−λ·days-before-corpus-end). The anchor (global max
    * ts) is a one-row broadcast; the score itself is one algebraic
    * aggregation — the standard "recency-weighted activity" feature of a
    * ranking pipeline, computed without any per-user ordering. */
  def decayScore(events: DataFrame, lambda: Double = 0.1): DataFrame = {
    val anchor = events.agg(max(unix_millis(col("ts"))).as("t_end"))
    events
      .crossJoin(broadcast(anchor))
      .withColumn("days_ago", (col("t_end") - unix_millis(col("ts"))) / 86400000.0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("raw_value"),
        round(sum(col("value") * exp(lit(-lambda) * col("days_ago"))), 4).as("decayed_score"))
      .orderBy("user_id")
  }

  /** Hour-of-day × day-of-week activity profile (the seasonality heatmap).
    * One shuffle on the 168-cell grid; share-of-total via a window over the
    * grid itself. */
  def seasonality(events: DataFrame): DataFrame =
    events
      .groupBy(weekday(col("ts")).cast("long").as("dow"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_events"), round(avg(col("value")), 6).as("avg_value"))
      .withColumn("share_pct",
        round(col("n_events") * 100.0 / sum(col("n_events")).over(Window.partitionBy()), 4))
      .orderBy("dow", "hod")

  /** Signup→first-purchase conversion latency, summarised per signup day:
    * exact interpolated quartiles of hours-to-convert. Two user-keyed
    * aggregations + one join; the quartiles come from
    * `plans.QuarterQuantiles` over integer latency-ms (1-hour-wide histogram
    * buckets) instead of `percentile()` — the old aggregate buffered every
    * converted user's latency per signup-day group; this holds a bounded
    * histogram per group. 4·quartile is exact integer; one IEEE division
    * per engine converts to hours. */
  def conversionTime(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
    val firstPurchase = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    // lat feeds the per-day count and the quantile pass (which itself
    // branches) — cut it so the two fact scans+aggs run once
    // (converted-user grain).
    val lat = signups.join(firstPurchase, "user_id")
      .filter(col("t_purchase") > col("t_signup"))
      .select(date_format(col("t_signup"), "yyyy-MM-dd").as("signup_day"),
        (unix_millis(col("t_purchase")) - unix_millis(col("t_signup"))).as("lat_ms"))
      .stableCheckpoint()
    val n = lat.groupBy(col("signup_day")).agg(count(lit(1)).as("n_converted"))
    val qs = graft.plans.QuarterQuantiles.quarterQuantiles(
      lat, Seq("signup_day"), "lat_ms", Seq(1, 2, 3), bucketWidth = 3600000L)
    n.join(qs, "signup_day")
      .select(col("signup_day"), col("n_converted"),
        round(col("q1_x4") / 14400000.0, 6).as("p25_hours"),
        round(col("q2_x4") / 14400000.0, 6).as("p50_hours"),
        round(col("q3_x4") / 14400000.0, 6).as("p75_hours"))
      .orderBy("signup_day")
  }

  /** Activity concentration: users deciled by event count; per decile the
    * user/event share — the "do 10% of users generate 90% of traffic"
    * report. The user population is exactly what grows at scale, so deciles
    * come from the two-phase prefix-sum rank (`plans.PrefixSum`, as
    * `q66_decile_lift`), not a single-partition `ntile` window: the total
    * order (n_events desc, user_id asc) is encoded as one integer key
    * `-n_events·(max_uid+1) + user_id`. Headroom: the encoding needs
    * max(n_events)·(max_uid+1) < 2^62 — the factor-2 slack covers
    * PrefixSum's internal `span + 2048` ceil-division term; there is no
    * span×nBuckets product since PrefixSum buckets by integer division.
    * REQUIRES user_id ≥ 0: a negative uid would flip the within-count
    * ordering (uid is added, not subtracted) and silently desynchronize the
    * encoded order from (n_events desc, user_id asc). Ranks are
    * count-of-ones prefix sums over that key, and NTILE(10) bucket bounds
    * are reproduced exactly by integer arithmetic on the rank: the first
    * n mod 10 deciles take ⌈n/10⌉ users, the rest ⌊n/10⌋ — bit-identical to
    * the window ntile at any population. */
  def powerUsers(events: DataFrame): DataFrame = {
    // perUser is the query's one fact-table aggregation and feeds two
    // branches (the span scalar and the keyed main path) — cut it so the
    // events scan+groupBy runs once (user-grain, bounded). ranked feeds
    // two more (the count scalar and the decile agg); cutting it stops
    // the bucketed-window subtree re-running per branch.
    val perUser = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("user_value"))
      .stableCheckpoint()
    val span = perUser.agg((max(col("user_id")) + 1L).as("u_span"))
    val keyed = perUser.crossJoin(broadcast(span))
      .withColumn("ord_key", -col("n_events") * col("u_span") + col("user_id"))
      .withColumn("one", lit(1L))
    val ranked = graft.plans.PrefixSum.prefixSum(keyed, "ord_key", "one", "rk")
      .stableCheckpoint()
    val tot = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr(
        """CASE WHEN rk <= (n % 10) * (n div 10 + 1)
          | THEN (rk + n div 10) div (n div 10 + 1)
          | ELSE (n % 10) + (rk - (n % 10) * (n div 10 + 1) + n div 10 - 1) div (n div 10)
          | END""".stripMargin).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        round(sum(col("user_value")), 4).as("total_value"))
      .withColumn("event_share_pct",
        round(col("n_events") * 100.0 / sum(col("n_events")).over(Window.partitionBy()), 4))
      .orderBy("decile")
  }

  /** Daily new-vs-returning split: each active user counts as "new" only on
    * their first-ever day (one user-keyed min, broadcast back onto the
    * bounded (day, user) table) — the growth-accounting complement to
    * rolling WAU. */
  def newVsReturning(events: DataFrame): DataFrame = {
    val dayUser = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val firstDay = dayUser.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    dayUser.join(firstDay, "user_id")
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"))
      .withColumn("returning_users", col("active_users") - col("new_users"))
      .withColumn("new_pct", round(col("new_users") * 100.0 / col("active_users"), 4))
      .orderBy("day")
  }

  /** Markov path predictability: the conditional entropy H(next | current)
    * of each event type's outgoing transition distribution — low entropy
    * means the next step is predictable (funnel-like), high means
    * exploratory. Transition counts are the same lag-pair aggregation as
    * the transition matrix; entropy uses the algebraic ln N − Σc·ln c / N
    * identity over exact integer counts. */
  def pathEntropy(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type")).agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n_transitions"),
        count(lit(1)).as("n_successors"),
        round(log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")), 6)
          .as("next_entropy"))
      .orderBy("event_type")
  }

  /** Seasonal-naive forecast backtest: predict each day of the final week
    * from the same-weekday mean of the preceding weeks, and report per-dow
    * MAE/MAPE — the baseline every real forecaster must beat, and the same
    * train/score split shape at any scale (two passes over the per-day
    * counts table, which is date-bounded). */
  def forecastBacktest(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", weekday(col("day")).cast("long"))
    val split = daily.agg(date_sub(max(col("day")), 7).as("cutoff"))
    val withSplit = daily.crossJoin(broadcast(split))
    val model = withSplit.filter(col("day") <= col("cutoff"))
      .groupBy(col("dow")).agg(avg(col("n")).as("predicted"))
    withSplit.filter(col("day") > col("cutoff"))
      .join(broadcast(model), "dow")
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"),
        round(avg(col("predicted")), 6).as("predicted"),
        round(avg(col("n")), 6).as("actual"),
        round(avg(abs(col("n") - col("predicted"))), 6).as("mae"),
        round(avg(abs(col("n") - col("predicted")) / col("n") * 100.0), 6).as("mape_pct"))
      .orderBy("dow")
  }

  /** A/B-test readout: users deterministically split by `user_id % 2`,
    * compared on a conversion metric (≥ `minPurchases` purchases — every
    * user here purchases at least once, so plain did-purchase would be
    * degenerate) with the pooled two-proportion z statistic. One user-level
    * aggregation, then a 2-row variant rollup and a single-row report —
    * the experiment-analysis shape, all algebraic. z is NULL when the
    * pooled rate is 0 or 1 (zero variance), mirrored in the oracle. */
  def abTest(events: DataFrame, minPurchases: Long = 14L): DataFrame = {
    val perUser = events.groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= minPurchases)
        .cast("long").as("converted"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val variants = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    variants.agg(
        max(when(col("variant") === 0, col("n"))).as("n_a"),
        max(when(col("variant") === 0, col("conv"))).as("conv_a"),
        max(when(col("variant") === 1, col("n"))).as("n_b"),
        max(when(col("variant") === 1, col("conv"))).as("conv_b"))
      .withColumn("rate_a", col("conv_a") * 1.0 / col("n_a"))
      .withColumn("rate_b", col("conv_b") * 1.0 / col("n_b"))
      .withColumn("pooled", (col("conv_a") + col("conv_b")) * 1.0 / (col("n_a") + col("n_b")))
      .withColumn("z_stat",
        when(col("pooled") > 0.0 && col("pooled") < 1.0, round(
          (col("rate_a") - col("rate_b")) /
            sqrt(col("pooled") * (lit(1.0) - col("pooled")) * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(col("rate_a"), 6).as("rate_a"), round(col("rate_b"), 6).as("rate_b"),
        col("z_stat"), (abs(col("z_stat")) > 1.96).as("significant_95"))
  }

  /** Rolling 7-day active users (WAU) per day — exact, not sketched: each
    * distinct (day, user) row explodes into the `windowDays` anchor days it
    * contributes to (`sequence(day, day+w−1)` — a NARROW fixed-w× expansion,
    * linear in the fact table), anchors are restricted to OBSERVED days by a
    * broadcast semi-join against the bounded day spine, then one distinct
    * count per anchor day. The r12 driver artifact flagged the previous
    * shape (a broadcast non-equi range join: a BroadcastNestedLoopJoin
    * evaluating rows × |spine| predicates, cpu exponent 1.67) — the explode
    * produces the identical (day, user, anchor) tuple set with zero
    * per-spine-row predicate work. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val dayUser = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val spine = dayUser.select(col("day").as("anchor")).distinct()
    dayUser
      .select(col("day"), col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${windowDays - 1}))")).as("anchor"))
      .join(broadcast(spine), Seq("anchor"), "semi")
      .groupBy(col("anchor"))
      .agg(countDistinct(col("user_id")).as("wau"),
        countDistinct(when(col("day") === col("anchor"), col("user_id"))).as("dau"))
      .withColumn("anchor", date_format(col("anchor"), "yyyy-MM-dd"))
      .withColumn("stickiness", round(col("dau") * 1.0 / col("wau"), 6))
      .orderBy("anchor")
  }

  /** User-lifecycle classification: lifespan (first→last event), active-day
    * count, and a one-shot / casual / regular label rolled up to a census.
    * Everything derives from one per-user aggregation. */
  def lifecycle(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("active_days"),
        datediff(max(to_date(col("ts"))), min(to_date(col("ts")))).cast("long").as("lifespan_days"))
      .withColumn("status",
        when(col("active_days") < 26L, "1_light")
          .when(col("active_days") < 29L, "2_regular")
          .otherwise("3_power"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        round(avg(col("active_days")), 6).as("avg_active_days"),
        round(avg(col("lifespan_days")), 6).as("avg_lifespan_days"))
      .orderBy("status")

  /** Goh–Barabási burstiness per user: B = (σ−μ)/(σ+μ) over inter-event
    * gaps — B→−1 for clockwork traffic, →+1 for bursty traffic; the signal
    * that separates bots from humans. Gaps are exact integer seconds from a
    * *partitioned* lag; mean and σ are then derived from the integer sums
    * (Σg, Σg²) with the textbook sample-variance identity, so both engines
    * evaluate the identical double expression over identical integers —
    * no dependence on Welford-vs-naive variance accumulation order. One
    * user-key shuffle; per-user state is two longs. */
  def burstiness(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = events
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .filter(col("prev_ms").isNotNull)
      .withColumn("gap_s", expr("(unix_millis(ts) - prev_ms) div 1000"))
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sg"), sum(col("gap_s") * col("gap_s")).as("sg2"))
      .filter(col("n_gaps") >= 2L && col("sg") > 0L)
      .withColumn("mean_gap_s", col("sg") * 1.0 / col("n_gaps"))
      .withColumn("std_gap_s", sqrt(greatest(
        (col("sg2") - col("sg") * col("sg") / col("n_gaps").cast("double")) / (col("n_gaps") - 1.0),
        lit(0.0))))
      .withColumn("burstiness",
        round((col("std_gap_s") - col("mean_gap_s")) / (col("std_gap_s") + col("mean_gap_s")), 6))
      .select(col("user_id"), col("n_gaps"),
        round(col("mean_gap_s"), 4).as("mean_gap_s"),
        round(col("std_gap_s"), 4).as("std_gap_s"), col("burstiness"))
      .orderBy("user_id")
  }

  /** Audience overlap: pairwise Jaccard between event-type user sets. The
    * inverted-index shape — distinct (user, type) pairs self-joined on
    * user — costs Σ_user |types|², bounded by the (tiny, enumerable) type
    * alphabet, never by user count; set sizes broadcast onto the pair
    * counts. The standard "do clickers also purchase" audience matrix. */
  def audienceOverlap(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val inter = ut.as("a")
      .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(broadcast(sizes.withColumnRenamed("event_type", "type_a").withColumnRenamed("n", "n_a")), "type_a")
      .join(broadcast(sizes.withColumnRenamed("event_type", "type_b").withColumnRenamed("n", "n_b")), "type_b")
      .withColumn("jaccard", round(col("n_both") * 1.0 / (col("n_a") + col("n_b") - col("n_both")), 6))
      .select("type_a", "type_b", "n_a", "n_b", "n_both", "jaccard")
      .orderBy("type_a", "type_b")
  }

  /** Discrete churn hazard by tenure week: of the users who survived to
    * week w, what fraction went silent that week (their last event falls in
    * it). Per-user tenure is one user-key aggregation; the at-risk counts
    * are a descending cumulative over the tenure-week *histogram*, whose
    * cardinality is bounded by the calendar span of the table (weeks, not
    * users), so the unpartitioned window runs over a provably tiny input. */
  def churnHazard(events: DataFrame): DataFrame = {
    val tenure = events.groupBy(col("user_id"))
      .agg((datediff(max(to_date(col("ts"))), min(to_date(col("ts")))).cast("long") / 7L)
        .cast("long").as("tenure_wk"))
    val hist = tenure.groupBy(col("tenure_wk")).agg(count(lit(1)).as("n_churned"))
    // at-risk(w) = Σ_{v >= w} churned(v): cumulative over the weeks histogram
    // (bounded by table calendar span — ~hundreds of rows at any data scale).
    val wDesc = Window.orderBy(col("tenure_wk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n_at_risk", sum(col("n_churned")).over(wDesc))
      .withColumn("hazard", round(col("n_churned") * 1.0 / col("n_at_risk"), 6))
      .select("tenure_wk", "n_churned", "n_at_risk", "hazard")
      .orderBy("tenure_wk")
  }

  /** Kaplan–Meier time-to-event curve (Kaplan & Meier 1958) for the
    * signup→purchase conversion funnel with right-censoring — the
    * censoring-aware version of [[conversionTime]]'s summary: naive
    * "average time to convert" is biased because users who have not
    * converted YET contribute no observation; KM counts them at risk until
    * the horizon. Per user: t = hours from first `fromType` event to first
    * strictly-later `toType` event (converted) or to the table horizon
    * (censored). S(t) = Π_{event times t_i ≤ t} (1 − d_i/n_i) — the
    * probability of still being unconverted after t hours — computed as exp
    * of a cumulative sum of per-step log terms (rounded at 12 dp before the
    * sum so both engines fold identical doubles), with an explicit
    * zero-survival latch for the everyone-at-risk-converts rung (ln 0 never
    * evaluates). Hour bucketing is exact integer division of the
    * microsecond epoch difference.
    *
    * Scale shape: two user-key aggregates collapse the stream to an
    * HOUR-GRAIN duration histogram whose cardinality is bounded by the
    * table's calendar span in hours — the two cumulative windows
    * (descending at-risk, ascending product) run over that bounded
    * histogram, the same sanction as [[churnHazard]]. */
  def survivalCurve(events: DataFrame, fromType: String = "signup",
                    toType: String = "purchase"): DataFrame = {
    val horizon = events.agg(max(col("ts")).as("max_ts"))
    val starts = events.filter(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val conv = starts
      .join(events.filter(col("event_type") === toType)
        .select(col("user_id"), col("ts").as("c_ts")), Seq("user_id"))
      .filter(col("c_ts") > col("s_ts"))
      .groupBy(col("user_id")).agg(min(col("c_ts")).as("c_ts"))
    val users = starts.join(conv, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .withColumn("converted", col("c_ts").isNotNull)
      .withColumn("end_ts", coalesce(col("c_ts"), col("max_ts")))
      .withColumn("t_hours",
        expr("(unix_micros(end_ts) - unix_micros(s_ts)) div 3600000000"))
    val hist = users.groupBy(col("t_hours"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_events"))
    val wDesc = Window.orderBy(col("t_hours").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t_hours"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n_at_risk", sum(col("n_total")).over(wDesc))
      .withColumn("term", when(col("n_events") > 0 && col("n_events") < col("n_at_risk"),
          round(log((col("n_at_risk") - col("n_events")) * 1.0 / col("n_at_risk")), 12))
        .otherwise(lit(0.0)))
      .withColumn("dead",
        max(when(col("n_events") === col("n_at_risk"), 1).otherwise(0)).over(wAsc))
      .withColumn("survival", when(col("dead") === 1, lit(0.0))
        .otherwise(round(exp(sum(col("term")).over(wAsc)), 6)))
      .select(col("t_hours"), col("n_at_risk"), col("n_events"),
        (col("n_total") - col("n_events")).as("n_censored"), col("survival"))
      .orderBy("t_hours")
  }

  /** The default event-type alphabet of the synthetic stream (markovSteady
    * pivots the transition matrix over it; shared with the oracle). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Weekly cohort-retention triangle: users grouped by signup week
    * (first-ever event), tracked by activity week — the classic
    * `cohort × weeks-since-signup` matrix every growth team reads. Both
    * axes are Monday-truncated weeks, so week_n is an exact integer
    * (day diff is always a multiple of 7); cohort sizes broadcast onto the
    * cells. Two user-key aggregates + one join — no window at all. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firstWeek = events.groupBy(col("user_id"))
      .agg(min(date_trunc("week", col("ts"))).as("cohort_wk"))
    val activeWeeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("activity_wk"))
      .distinct()
    val sizes = firstWeek.groupBy(col("cohort_wk")).agg(count(lit(1)).as("cohort_size"))
    activeWeeks.join(firstWeek, Seq("user_id"))
      .withColumn("week_n",
        (datediff(to_date(col("activity_wk")), to_date(col("cohort_wk"))) / 7).cast("long"))
      .groupBy(col("cohort_wk"), col("week_n"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_wk"))
      .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_wk"),
        col("week_n"), col("cohort_size"), col("n_active"),
        round(col("n_active") * 100.0 / col("cohort_size"), 4).as("retention_pct"))
      .orderBy("cohort_wk", "week_n")
  }

  /** Behavioral nearest neighbours: each probe user's top-k most similar
    * users by cosine over their event-type count vector — lookalike
    * audiences from behavior alone. The "embedding" is the enumerable-
    * alphabet count vector (one conditional aggregate per type, exact
    * integers), so the cosine is a fixed-order expression over integers —
    * bit-identical across engines. Probes are a bounded set broadcast
    * against the per-user profile table (the knn_brute shape: candidates
    * scale linearly, never pairwise). */
  def behaviorKnn(events: DataFrame, types: Seq[String] = EventTypes,
                  nProbes: Int = 10, k: Int = 3): DataFrame = {
    val aggs = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"c_$t"))
    val profiles = events.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    def dotExprOf(a: String, b: String) =
      expr(types.map(t => s"${a}_$t * ${b}_$t").mkString(" + "))
    val probes = profiles.filter(col("user_id") < nProbes)
      .select(col("user_id").as("q_user") +: types.map(t => col(s"c_$t").as(s"q_$t")): _*)
    profiles.crossJoin(broadcast(probes))
      .filter(col("user_id") =!= col("q_user"))
      .withColumn("cos", round(
        dotExprOf("c", "q") / (sqrt(dotExprOf("c", "c")) * sqrt(dotExprOf("q", "q"))), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_user")).orderBy(col("cos").desc, col("user_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_user"), col("user_id").as("neighbor_user"), col("rk"), col("cos"))
      .orderBy("q_user", "rk")
  }

  /** Seasonal anomaly detection: hourly event counts tested against the
    * (event_type, weekday, hour-of-day) baseline — the residual screen that
    * catches "Tuesday 3pm clicks doubled" where a global z-score
    * (`anomalies`) sees nothing unusual. Baselines keep exact integer
    * Σn/Σn² so mean and σ are the same double expression on both engines
    * (the burstiness convention); the σ>0 guard is an exact integer
    * compare. Two aggregates + one broadcast join of the bounded
    * (type × 7 × 24) baseline table.
    *
    * Precondition: epoch-positive timestamps under a UTC session timezone —
    * the integer-division hour index below truncates toward zero, so a
    * pre-1970 `ts` would bucket one hour off versus `date_trunc("hour")`,
    * and a non-UTC session would shift every slot label. Both hold for
    * every caller in this engine (GraftSession.tune forces UTC; event data
    * is epoch-positive). */
  def seasonalAnomaly(events: DataFrame, sigmas: Double = 2.0): DataFrame = {
    // Group on the integer hour index (µs div 3600e6 — identical to a UTC
    // date_trunc("hour") for these epoch-positive timestamps) and rebuild
    // the timestamp AFTER the aggregation: the per-row work in the fact
    // pass drops to one integer division, and the calendar functions
    // (timestamp rebuild, dayofweek, hour) run over the bounded slot table
    // instead of every event. Same rows, same slot values — only where the
    // datetime arithmetic happens moves.
    // The explicit isnotnull(ts) prefilter + non-nullable slot index kill a
    // residual the r18 plan dump showed: the baseline join's inferred
    // isnotnull(dow/hod) constraints were pushed below the aggregation as
    // per-event-row `isnotnull(dayofweek(timestamp_micros(...)))` filters —
    // always true, pure calendar work per row. With ts filtered non-null
    // (same rows: a null-ts group could never equi-join the baseline) and
    // the slot index wrapped non-nullable, dow/hod are statically non-null
    // and those constraints fold away; the scan keeps only the trivial
    // pushable isnotnull(ts).
    val hourly = events
      .filter(col("ts").isNotNull)
      .groupBy(
        coalesce(expr("unix_micros(ts) div 3600000000"), lit(0L)).as("slot_h"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("slot", timestamp_micros(col("slot_h") * lit(3600000000L)))
      .drop("slot_h")
      .withColumn("dow", dayofweek(col("slot")).cast("long"))
      .withColumn("hod", hour(col("slot")).cast("long"))
    val baseline = hourly.groupBy(col("event_type").as("et"), col("dow").as("bdow"), col("hod").as("bhod"))
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("sn"), sum(col("n") * col("n")).as("sn2"))
      .filter(col("cnt") >= 3L && col("cnt") * col("sn2") > col("sn") * col("sn"))
    hourly.join(broadcast(baseline),
        col("event_type") === col("et") && col("dow") === col("bdow") && col("hod") === col("bhod"))
      .withColumn("mean_n", col("sn") * 1.0 / col("cnt"))
      .withColumn("sd_n", sqrt(
        (col("sn2") - col("sn") * col("sn") / col("cnt").cast("double")) / (col("cnt") - 1.0)))
      .withColumn("z", (col("n") - col("mean_n")) / col("sd_n"))
      .filter(abs(col("z")) > sigmas)
      .select(date_format(col("slot"), "yyyy-MM-dd HH:mm").as("slot"),
        col("event_type"), col("n"),
        round(col("mean_n"), 4).as("baseline_mean"),
        round(col("z"), 4).as("z"))
      .orderBy("slot", "event_type")
  }

  /** Stationary distribution of the event-type Markov chain — the traffic
    * mix user journeys converge to, by `iters` unrolled power iterations.
    * The transition matrix is an enumerable-alphabet aggregate pivoted into
    * ONE row of exact integer counts; every iteration is then a scalar
    * `select` whose weighted sums are written in one fixed textual order,
    * so both engines evaluate the identical double expression — no
    * parallel-reduction order can touch the result. A type with zero
    * outgoing transitions is treated as a self-loop (its mass stays on
    * itself), keeping Σ steady_pct = 100 on degenerate alphabets. Cost at
    * any scale: one fact scan + a 1-row driver of 25 columns; the
    * iterations are free. */
  def markovSteady(events: DataFrame, types: Seq[String] = EventTypes,
                   iters: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull &&
        col("event_type").isin(types: _*) && col("nxt").isin(types: _*))
    val cellAggs = for { i <- types; j <- types } yield
      sum(when(col("event_type") === i && col("nxt") === j, 1L).otherwise(0L)).as(s"n_${i}_$j")
    val rowAggs = types.map(i =>
      sum(when(col("event_type") === i, 1L).otherwise(0L)).as(s"n_$i"))
    var m = pairs.agg((cellAggs ++ rowAggs).head, (cellAggs ++ rowAggs).tail: _*)
      .select(col("*") +: types.map(t => lit(1.0 / types.size).as(s"p_$t")): _*)
    for (_ <- 1 to iters) {
      val stepped = m.select(
        m.columns.filterNot(_.startsWith("p_")).toSeq.map(col) ++
          types.map { j =>
            // Fixed left-to-right sum over the source types — shared with the
            // oracle. A type with zero outgoing transitions would make n_i = 0
            // NULL-poison every steady_pct via Divide; the guard treats that
            // (sink) type as a self-loop (its mass stays put), so the steady
            // vector remains a probability distribution — Σ steady_pct = 100
            // even on degenerate alphabets.
            expr(types.map(i =>
              s"(CASE WHEN n_$i > 0 THEN p_$i * n_${i}_$j / n_$i ELSE ${if (i == j) s"p_$i" else "0.0"} END)")
              .mkString(" + ")).as(s"np_$j")
          }: _*)
      m = stepped.select(
        stepped.columns.filterNot(_.startsWith("np_")).toSeq.map(col) ++
          types.map(j => col(s"np_$j").as(s"p_$j")): _*)
    }
    m.select(explode(array(types.map(t =>
        struct(lit(t).as("event_type"), col(s"n_$t").as("n_out"), col(s"p_$t").as("p"))): _*)).as("s"))
      .select(col("s.event_type").as("event_type"), col("s.n_out").as("n_out"),
        round(col("s.p") * 100, 6).as("steady_pct"))
      .orderBy("event_type")
  }

  /** Lag-feature generation — the feature-engineering pass that turns an
    * event log into per-row training examples: for each purchase, the
    * previous two purchase values, the rolling mean of the prior 3, the
    * seconds since the previous purchase, and the purchase ordinal. Output
    * is row-grain (the shape a trainer consumes, like q60). All five
    * features come from ONE user-partitioned window over the pre-filtered
    * purchase stream — a single user-key shuffle; rows with no history keep
    * NULL features (the trainer's "cold start" marker) rather than fake
    * zeros. Gaps are exact integer seconds (µs div), the rolling mean is
    * an exact ratio of a double sum over an integer count, rounded 4dp. */
  def featureLags(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wPrev3 = w.rowsBetween(-3, -1)
    purchases
      .withColumn("purchase_idx", row_number().over(w).cast("long"))
      .withColumn("lag1_value", round(lag(col("value"), 1).over(w), 4))
      .withColumn("lag2_value", round(lag(col("value"), 2).over(w), 4))
      .withColumn("prev3_mean",
        round(sum(col("value")).over(wPrev3) / count(lit(1)).over(wPrev3), 4))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("gap_s", expr("(unix_micros(ts) - prev_us) div 1000000"))
      .select(col("event_id"), col("user_id"), col("purchase_idx"),
        round(col("value"), 4).as("value"),
        col("lag1_value"), col("lag2_value"), col("prev3_mean"), col("gap_s"))
      .orderBy("user_id", "purchase_idx")
  }

  /** HLL-sketch audience overlap — the set algebra that replaces
    * [[audienceOverlap]]'s exact pairwise distinct counts when the user
    * population no longer fits an exact-count budget: one
    * [[graft.plans.CrossSketch]] deterministic HLL register table per
    * event type (mergeable, the Puffin/lakehouse-native statistic),
    * pairwise union by per-bucket register MAX, intersection by
    * inclusion–exclusion (|A∩B| = |A|+|B|−|A∪B|, floored at 0) and
    * estimated Jaccard. The register table is alphabet-bounded
    * (|types| × 1024 rows), so the pairwise stage is |types|² small
    * aggregations — never a user-grain join — and, because the sketch is
    * cross-engine deterministic, the DuckDB oracle recomputes every
    * ESTIMATE bit-for-bit. Default ships sketch-only; `verify=true` joins
    * the exact pair counts and asserts the conservative
    * inclusion–exclusion envelope |est−exact| ≤ 5·rsd·(|A|+|B|+|A∪B|)
    * with rsd = 1.04/√1024 (each of the three estimates contributes its
    * own 5·rsd·true bound; RelationalSpec proves it all-true at two
    * SFs). */
  def approxAudienceOverlap(events: DataFrame, verify: Boolean = false): DataFrame = {
    import graft.plans.CrossSketch._
    val regs = events
      .select(col("event_type"), hash31(col("user_id")).as("h"))
      .groupBy(col("event_type"), hllBucket(col("h")).as("bucket"))
      .agg(max(hllRank(col("h"))).as("r"))
    val perType = regs.groupBy(col("event_type"))
      .agg(hllSumCol.as("s"), hllZerosCol.as("v"))
      .select(col("event_type"), hllEstimate(col("s"), col("v")).as("est"))
    val typePairs = perType.select(col("event_type").as("type_a")).as("a")
      .join(perType.select(col("event_type").as("type_b")).as("b"),
        col("type_a") < col("type_b"))
    val unionRegs = typePairs.join(regs, col("event_type") === col("type_a"))
      .select(col("type_a"), col("type_b"), col("bucket"), col("r"))
      .unionAll(typePairs.join(regs, col("event_type") === col("type_b"))
        .select(col("type_a"), col("type_b"), col("bucket"), col("r")))
      .groupBy(col("type_a"), col("type_b"), col("bucket"))
      .agg(max(col("r")).as("r"))
    val unionEst = unionRegs.groupBy(col("type_a"), col("type_b"))
      .agg(hllSumCol.as("s"), hllZerosCol.as("v"))
      .select(col("type_a"), col("type_b"),
        hllEstimate(col("s"), col("v")).as("est_union"))
    val pairs = unionEst
      .join(perType.select(col("event_type").as("type_a"), col("est").as("est_a")), "type_a")
      .join(perType.select(col("event_type").as("type_b"), col("est").as("est_b")), "type_b")
      .withColumn("est_inter", greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .withColumn("jaccard_est", round(col("est_inter") * 1.0 / col("est_union"), 6))
    if (!verify)
      pairs.select("type_a", "type_b", "est_a", "est_b", "est_union", "est_inter", "jaccard_est")
        .orderBy("type_a", "type_b")
    else {
      val ut = events.select(col("user_id"), col("event_type")).distinct()
      val exact = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
      val inter = ut.as("x")
        .join(ut.as("y"), col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("exact_inter"))
      pairs
        .join(exact.select(col("event_type").as("type_a"), col("n_exact").as("exact_a")), "type_a")
        .join(exact.select(col("event_type").as("type_b"), col("n_exact").as("exact_b")), "type_b")
        .join(inter, Seq("type_a", "type_b"), "left")
        .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
        .withColumn("exact_union", col("exact_a") + col("exact_b") - col("exact_inter"))
        .withColumn("abs_err", abs(col("est_inter") - col("exact_inter")))
        .withColumn("within_bound",
          col("abs_err") <= lit(HllErrBound) *
            (col("exact_a") + col("exact_b") + col("exact_union")))
        .select("type_a", "type_b", "est_a", "est_b", "est_union", "est_inter",
          "jaccard_est", "exact_a", "exact_b", "exact_inter", "exact_union",
          "abs_err", "within_bound")
        .orderBy("type_a", "type_b")
    }
  }

  /** Next-event prediction eval — model evaluation as a query, with a real
    * train/eval split so the accuracy is out-of-sample: the transition
    * model (argmax next-type per prev-type, ties to the lexicographically
    * smallest) trains on even user ids and is scored on odd users'
    * transitions. One user-partitioned window makes the pairs; the model
    * and its totals are alphabet-bounded broadcasts; accuracy is an exact
    * integer ratio rounded 6dp. The pattern generalizes to any
    * train-on-split, score-on-split evaluation a pipeline runs before
    * shipping a heuristic. */
  def nextEventEval(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("user_id"), col("event_type").as("prev_type"), col("next_type"))
    val train = pairs.filter(col("user_id") % 2 === 0)
      .groupBy(col("prev_type"), col("next_type")).agg(count(lit(1)).as("n"))
    val model = train
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("prev_type")).orderBy(col("n").desc, col("next_type"))))
      .filter(col("rk") === 1)
      .select(col("prev_type"), col("next_type").as("predicted_next"), col("n").as("n_top"))
    val trainTotals = train.groupBy(col("prev_type")).agg(sum(col("n")).as("n_train"))
    pairs.filter(col("user_id") % 2 === 1)
      .join(broadcast(model), Seq("prev_type"))
      .groupBy(col("prev_type"), col("predicted_next"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("next_type") === col("predicted_next"), 1L).otherwise(0L)).as("n_correct"))
      .join(broadcast(trainTotals), Seq("prev_type"))
      .withColumn("accuracy", round(col("n_correct") * 1.0 / col("n_eval"), 6))
      .select(col("prev_type"), col("predicted_next"), col("n_train"),
        col("n_eval"), col("n_correct"), col("accuracy"))
      .orderBy("prev_type")
  }
}
