package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("streaming tumbling counts match the batch aggregation on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")

    val q = StreamOps.tumblingCounts(df)
      .writeStream.format("memory").queryName("tumbling_test").outputMode("complete").start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(3), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test").collect()
      val clicks = rows.find(_.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n") == 2 && clicks.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming hopping windows count each event in two overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")

    val q = StreamOps.hoppingCounts(df)
      .writeStream.format("memory").queryName("hopping_test").outputMode("complete").start()
    try {
      input.addData((ts(10), "click", 1.0), (ts(40), "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("hopping_test").collect()
      // event@00:10 → windows 23:30 & 00:00; event@00:40 → 00:00 & 00:30
      assert(rows.map(_.getAs[Long]("n")).sum == 4, s"got ${rows.mkString("; ")}")
      val w0 = rows.find(_.getAs[String]("win_start") == "2024-01-01 00:00").get
      assert(w0.getAs[Long]("n") == 2 && w0.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming session window closes after the idle gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")

    val q = StreamOps.sessionize(df)
      .writeStream.format("memory").queryName("session_test").outputMode("complete").start()
    try {
      // user 1: two events 5 min apart (one session), then one 40 min later (new session)
      input.addData((1L, ts(0), 1.0), (1L, ts(5), 1.0), (1L, ts(45), 1.0))
      q.processAllAvailable()
      val sessions = spark.table("session_test").filter(col("user_id") === 1).collect()
      assert(sessions.length == 2, s"expected 2 sessions, got ${sessions.mkString("; ")}")
      assert(sessions.map(_.getAs[Long]("n_events")).sorted.sameElements(Array(1L, 2L)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to a prior signup within 24h") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val signups = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.purchaseAttribution(
        purchases.toDF().toDF("user_id", "ts", "value"),
        signups.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("attr_test").outputMode("append").start()
    try {
      signups.addData((1L, ts(0)), (2L, ts(30)))
      // user 1 buys 10 min after signup (joins); user 2 buys before signup (no join)
      purchases.addData((1L, ts(10), 5.0), (2L, ts(20), 9.0))
      q.processAllAvailable()
      val rows = spark.table("attr_test").collect()
      assert(rows.length == 1, s"only the post-signup purchase joins: ${rows.mkString("; ")}")
      assert(rows.head.getAs[Long]("user_id") == 1L && rows.head.getAs[Double]("value") == 5.0)
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.runningUserTotals(spark, input.toDS())
      .writeStream.format("memory").queryName("totals_test").outputMode("update").start()
    try {
      input.addData(StreamOps.UserEvent(7L, 1000L, 2.5), StreamOps.UserEvent(7L, 2000L, 1.5))
      q.processAllAvailable()
      input.addData(StreamOps.UserEvent(7L, 3000L, 6.0))
      q.processAllAvailable()
      val last = spark.table("totals_test").filter(col("user_id") === 7)
        .orderBy(col("n_events").desc).collect().head
      assert(last.getAs[Long]("n_events") == 3)
      assert(math.abs(last.getAs[Double]("total_value") - 10.0) < 1e-9)
      assert(last.getAs[Long]("last_ts_ms") == 3000L)
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dimension into windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val cohorts = Seq((1L, "early"), (2L, "late")).toDF("user_id", "cohort")

    val q = StreamOps.cohortWindowCounts(df, cohorts)
      .writeStream.format("memory").queryName("cohort_test").outputMode("complete").start()
    try {
      input.addData((1L, ts(1), 1.0), (1L, ts(2), 2.0), (2L, ts(3), 5.0), (9L, ts(4), 7.0))
      q.processAllAvailable()
      val rows = spark.table("cohort_test").collect()
      val byCohort = rows.map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n")).toMap
      assert(byCohort == Map("early" -> 2L, "late" -> 1L),
        s"unknown users drop out of the inner join: ${rows.mkString("; ")}")
      assert(rows.find(_.getAs[String]("cohort") == "early").get.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming filter cascade reports per-window pass rates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")

    val q = StreamOps.filterCascadeStream(df)
      .writeStream.format("memory").queryName("cascade_test").outputMode("complete").start()
    try {
      input.addData(
        (ts(1), "a clean document with enough ordinary tokens to pass easily"),
        (ts(2), "ok"),                                       // too few tokens → fail
        (ts(3), "word word word word word word word word"))  // repetitive but within bound → pass
      q.processAllAvailable()
      val row = spark.table("cascade_test").collect().head
      assert(row.getAs[Long]("n_docs") == 3)
      assert(row.getAs[Long]("n_pass") == 2, s"got $row")
      assert(math.abs(row.getAs[Double]("pass_pct") - 66.6667) < 0.01)
    } finally q.stop()
  }

  test("streaming payload gate classifies each rule statelessly per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")

    val q = StreamOps.payloadGateStream(df)
      .writeStream.format("memory").queryName("payload_gate_test").outputMode("complete").start()
    try {
      input.addData(
        (ts(1), ""),                                                       // 1_empty
        (ts(2), "short"),                                                  // 2_too_small
        (ts(3), "x" * 500),                                                // 3_too_large (and would be low-entropy)
        (ts(4), "ab" * 80),                                                // 4_entropy_band (1.0 bits, sized ok)
        (ts(5), "mixed tokens with grep marks and punct level bytes curve along paths " * 3)) // 6_kept (4.1876 bits, 207 B)
      q.processAllAvailable()
      val rows = spark.table("payload_gate_test").collect()
      val byRule = rows.map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_docs")).toMap
      assert(byRule == Map("1_empty" -> 1L, "2_too_small" -> 1L, "3_too_large" -> 1L,
        "4_entropy_band" -> 1L, "6_kept" -> 1L), s"got $byRule")
      assert(rows.map(_.getAs[Long]("n_bytes")).sum == 0 + 5 + 500 + 160 + 207)
    } finally q.stop()
  }

  test("streaming near-dup screen: exact copies and <=3-bit neighbors flagged, state decays past horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over a lazy dog while seventeen " +
      "green turtles carry heavy crates along narrow river paths under bright " +
      "winter skies and nobody watches the distant harbor lights fade slowly"
    val nearDup = base.replace("bright", "dim")
    val unrelated = "completely different subject matter entirely numeric " +
      "spreadsheet columns accounting ledger quarterly totals audit trail"
    // expected hashes via the SAME shared column (batch-side recompute)
    val hashes = Seq(base, nearDup, unrelated).toDF("text")
      .select(StreamOps.simhash32(col("text"))).collect().map(_.getLong(0))
    val hBase = java.lang.Long.bitCount(hashes(0) ^ hashes(1))
    assert(hBase > 0 && hBase <= 3, s"fixture must be a <=3-bit near-dup (got $hBase)")
    assert(java.lang.Long.bitCount(hashes(0) ^ hashes(2)) > 3, "unrelated fixture too close")

    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.nearDupStream(spark, df)
      .writeStream.format("memory").queryName("neardup_test").outputMode("append").start()
    try {
      input.addData((ts(1), 1L, base), (ts(2), 2L, base), (ts(3), 3L, nearDup), (ts(4), 4L, unrelated))
      q.processAllAvailable()
      val pairs = spark.table("neardup_test").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"), r.getAs[Long]("hamming")))
        .distinct.sorted
      // exact copy: flagged in EVERY band at hamming 0; near-dup: >=1 clean
      // band (pigeonhole), true hamming reported; unrelated: absent
      assert(pairs.contains((2L, 1L, 0L)), s"exact copy not flagged: ${pairs.mkString(",")}")
      assert(pairs.exists(p => p._1 == 3L && p._3 == hBase.toLong), "near-dup not flagged with true hamming")
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc must not be flagged")
      // decay: advance the watermark two days, then replay the base text —
      // the horizon-old originals are pruned, so no hit may be emitted
      val before = spark.table("neardup_test").count()
      input.addData((Timestamp.valueOf("2024-01-03 00:00:00"), 5L, unrelated))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-03 00:10:00"), 6L, base))
      q.processAllAvailable()
      val after = spark.table("neardup_test").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))
      assert(!after.exists(_._1 == 6L), "horizon-expired originals must not produce hits")
      assert(spark.table("neardup_test").count() == before, "no spurious rows after decay")
    } finally q.stop()
  }

  test("streaming funnel: strict-order advances with deltas, abandonment on watermark passage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "user_id", "event_type")
    val q = StreamOps.funnelStream(spark, df, horizonSec = 3600L)
      .writeStream.format("memory").queryName("funnel_test").outputMode("append").start()
    try {
      input.addData(
        (ts(1), 1L, "signup"), (ts(3), 1L, "click"), (ts(10), 1L, "purchase"), // full conversion
        (ts(2), 2L, "signup"), (ts(5), 2L, "click"),                           // stalls at stage 2
        (ts(1), 3L, "click"), (ts(4), 3L, "signup"),                           // pre-signup click ignored
        (ts(6), 4L, "signup"), (ts(6), 4L, "click"))                           // same-ts click: NOT strict
      q.processAllAvailable()
      def rows() = spark.table("funnel_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage"),
          r.getAs[String]("kind"), r.getAs[Long]("ms_from_prev")))
      val adv = rows().filter(_._3 == "advance").sorted
      assert(adv.toSeq == Seq((1L, 1, "advance", 0L), (1L, 2, "advance", 120000L),
        (1L, 3, "advance", 420000L), (2L, 1, "advance", 0L), (2L, 2, "advance", 180000L),
        (3L, 1, "advance", 0L), (4L, 1, "advance", 0L)), s"got ${adv.mkString(",")}")
      // watermark passage (horizon 1h): users 2, 3, 4 abandon at their
      // stalled stage; user 1 converted (state already removed — no row)
      input.addData((Timestamp.valueOf("2024-01-02 12:00:00"), 9L, "noise"))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-02 12:00:01"), 9L, "noise"))
      q.processAllAvailable()
      val ab = rows().filter(_._3 == "abandon").map(r => (r._1, r._2)).sorted
      assert(ab.toSeq == Seq((2L, 2), (3L, 1), (4L, 1)), s"got ${ab.mkString(",")}")
      assert(!rows().exists(r => r._1 == 1L && r._3 == "abandon"))
    } finally q.stop()
  }

  test("streaming dedup drops watermark-window duplicates, keeps first arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val df = input.toDF().toDF("ts", "content_key", "doc_id")

    val q = StreamOps.dedupStream(df)
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      input.addData((ts(1), "aaa", 1L), (ts(2), "aaa", 2L), (ts(3), "bbb", 3L))
      q.processAllAvailable()
      input.addData((ts(4), "aaa", 4L), (ts(5), "ccc", 5L))
      q.processAllAvailable()
      val rows = spark.table("dedup_test").collect()
      val byKey = rows.groupBy(_.getAs[String]("content_key"))
      assert(byKey.keySet == Set("aaa", "bbb", "ccc"))
      assert(byKey("aaa").length == 1, "duplicates within the watermark must be dropped")
      assert(byKey("aaa").head.getAs[Long]("doc_id") == 1L, "first arrival wins")
    } finally q.stop()
  }

  test("streaming baseline anomaly flags only windows that clear the static z threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    // Static baseline for the 2024-01-01 00:00 slot (Monday, hour 0):
    // clicks expect 1 ± 0.5 (5 observed → z = 8, flagged);
    // views expect 5 ± 2 (4 observed → z = -0.5, quiet).
    val dow = spark.sql("SELECT dayofweek(TIMESTAMP '2024-01-01 00:00:00')").collect()(0).getInt(0).toLong
    val baseline = Seq(
      ("click", dow, 0L, 1.0, 0.5),
      ("view", dow, 0L, 5.0, 2.0)
    ).toDF("et", "bdow", "bhod", "mean_n", "sd_n")
    val q = StreamOps.baselineAnomalyStream(events, baseline)
      .writeStream.format("memory").queryName("baseline_anom").outputMode("complete").start()
    try {
      input.addData(
        (ts(1), "click"), (ts(2), "click"), (ts(3), "click"), (ts(4), "click"), (ts(5), "click"),
        (ts(1), "view"), (ts(2), "view"), (ts(3), "view"), (ts(4), "view"))
      q.processAllAvailable()
      val rows = spark.table("baseline_anom").collect()
      assert(rows.map(_.getAs[String]("event_type")).toSet == Set("click"),
        s"only the click window clears |z| > 2: ${rows.mkString("; ")}")
      val r = rows.head
      assert(r.getAs[Long]("n") == 5L)
      assert(r.getAs[Double]("z") == 8.0)
    } finally q.stop()
  }

  test("streaming approx distinct users stays within the HLL++ error bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val df = input.toDF().toDF("user_id", "ts")

    val q = StreamOps.approxUsersStream(df)
      .writeStream.format("memory").queryName("approx_users_test").outputMode("complete").start()
    try {
      // 200 distinct users, each seen twice, all inside the 00:00 hour.
      input.addData((0 until 400).map(i => ((i % 200).toLong, ts(i % 60))))
      q.processAllAvailable()
      val rows = spark.table("approx_users_test").collect()
      assert(rows.length == 1 && rows.head.getAs[String]("hour") == "2024-01-01 00:00")
      val est = rows.head.getAs[Long]("approx_users")
      // HLL++ rsd 0.05: 4 sigma around the true 200 distinct.
      assert(math.abs(est - 200L) <= (4 * 0.05 * 200).toLong,
        s"estimate $est outside the rsd bound around 200")
      assert(rows.head.getAs[Long]("n_events") == 400L)
      // The O(windows), not O(users), state claim as a measured number:
      // one open hourly window => one state-store row holding the sketch,
      // no matter how many distinct users passed through it.
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= 2L,
        s"expected ~1 state row (one window sketch), got $stateRows for 200 users")
    } finally q.stop()
  }

  test("append-mode watermark actually evicts closed HLL window state") {
    // The production claim in approxUsersStream's scaladoc: in append mode
    // the watermark EXPIRES window state (complete mode, used above for
    // observability, retains it). Proven by advancing event time far past a
    // window's close and checking (a) the closed window emits, (b) the
    // state store holds only the still-open window afterwards.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val df = input.toDF().toDF("user_id", "ts")
    val q = StreamOps.approxUsersStream(df)
      .writeStream.format("memory").queryName("approx_users_append").outputMode("append").start()
    try {
      def at(hour: Int, minute: Int) = Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")
      // window A: 150 distinct users inside hour 0
      input.addData((0 until 150).map(i => (i.toLong, at(0, i % 60))))
      q.processAllAvailable()
      // advance event time to hour 6: watermark = 06:00 − 2h = 04:00, far
      // past window A's 01:00 close → A must emit and its state must go
      input.addData((0 until 50).map(i => (i.toLong, at(6, i % 60))))
      q.processAllAvailable()
      val rows = spark.table("approx_users_append").collect()
      val hourA = rows.filter(_.getAs[String]("hour") == "2024-01-01 00:00")
      assert(hourA.length == 1, s"closed window must emit exactly once in append mode: ${rows.toSeq}")
      assert(math.abs(hourA.head.getAs[Long]("approx_users") - 150L) <= (4 * 0.05 * 150).toLong)
      // only the open hour-6 window may remain in the store
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= 1L,
        s"watermark did not evict the closed window's sketch: $stateRows state rows")
    } finally q.stop()
  }

  test("SpaceSaving heavy hitters: guaranteed recall, bounded error, O(k) state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val input = MemoryStream[StreamOps.BucketItem]
    val q = StreamOps.heavyHittersStream(spark, input.toDS(), k = k)
      .writeStream.format("memory").queryName("hh_test").outputMode("update").start()
    try {
      // skewed feed in one bucket: item i appears 2^(9-i) times (i=0..9) —
      // 512, 256, ..., 1; plus 60 singleton items to force evictions
      val skew = (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(StreamOps.BucketItem(0L, i.toLong)))
      val noise = (100L until 160L).map(StreamOps.BucketItem(0L, _))
      // two batches with deterministic interleave so state crosses batches
      val all = (skew ++ noise).zipWithIndex.sortBy { case (_, ix) => (ix * 2654435761L) % 1000003L }
        .map(_._1)
      val (b1, b2) = all.splitAt(all.size / 2)
      input.addData(b1); q.processAllAvailable()
      // every batch re-emits a touched bucket's FULL summary, so the final
      // state is exactly the last batch's rows — earlier rows are stale
      // snapshots (evicted items keep old rows in the memory sink; their
      // brackets held at snapshot time but not against final truth)
      val c1 = spark.table("hh_test").count().toInt
      input.addData(b2); q.processAllAvailable()
      val last = spark.table("hh_test").collect().drop(c1)
      val n = all.size.toLong
      assert(last.length <= k, s"state exceeded k: ${last.length} candidates")
      val byItem = last.map(r => r.getAs[Long]("item") ->
        (r.getAs[Long]("est_count"), r.getAs[Long]("max_overcount"))).toMap
      val trueCounts = all.groupBy(_.item).view.mapValues(_.size.toLong).toMap
      // SpaceSaving guarantee: any item with true count > n/k is present
      for ((item, t) <- trueCounts if t > n / k)
        assert(byItem.contains(item), s"item $item (true $t > n/k=${n / k}) missing")
      // and every candidate's bracket holds: est - err <= true <= est
      for ((item, (est, err)) <- byItem) {
        val t = trueCounts(item)
        assert(est - err <= t && t <= est, s"item $item: true $t outside [${est - err}, $est]")
      }
      // bounded state in the store itself: one state row per bucket
      assert(q.lastProgress.stateOperators(0).numRowsTotal <= 1L)
    } finally q.stop()
  }

  // ---- append/update-mode state EXPIRY: the watermark bound is not just
  // documented, it is demonstrated — state-store row counts must DROP after
  // the watermark passes closed windows. (complete mode, which the
  // result-correctness tests above use for observability, retains all
  // windows by design; production runs append/update where these hold.)

  private def tsh(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
    val counts = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq)).map(_.numRowsTotal)
    (counts.max, q.lastProgress.stateOperators(0).numRowsTotal)
  }

  test("append-mode approx-users state decays after watermark passage (O(open windows) proved)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = StreamOps.approxUsersStream(df)
      .writeStream.format("memory").queryName("approx_expiry").outputMode("append").start()
    try {
      // two windows open (hours 0 and 1), three distinct users in hour 0
      input.addData((tsh(0, 1), 1L), (tsh(0, 2), 2L), (tsh(0, 3), 3L), (tsh(1, 1), 4L))
      q.processAllAvailable()
      // hour-6 event → watermark 4:00 → hours 0–1 close, emit, and expire;
      // a second batch lets the eviction commit land in lastProgress
      input.addData((tsh(6, 1), 5L))
      q.processAllAvailable()
      input.addData((tsh(6, 2), 5L))
      q.processAllAvailable()
      val (peak, fin) = stateRows(q)
      assert(peak >= 2L, s"expected >=2 open-window state rows at peak, saw $peak")
      assert(fin == 1L, s"expected only the hour-6 window in state after expiry, saw $fin")
      // and the closed window was emitted with the exact distinct count
      val hour0 = spark.table("approx_expiry")
        .filter(col("hour") === "2024-01-01 00:00").collect()
      assert(hour0.length == 1 && hour0(0).getAs[Long]("approx_users") == 3L)
    } finally q.stop()
  }

  test("update-mode tumbling state decays after watermark passage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.tumblingCounts(df)
      .writeStream.format("memory").queryName("tumbling_expiry").outputMode("update").start()
    try {
      input.addData((tsh(0, 1), "click", 1.0), (tsh(0, 2), "view", 2.0), (tsh(1, 1), "click", 3.0))
      q.processAllAvailable()
      input.addData((tsh(6, 1), "click", 1.0))
      q.processAllAvailable()
      input.addData((tsh(6, 2), "click", 1.0))
      q.processAllAvailable()
      val (peak, fin) = stateRows(q)
      assert(peak >= 3L, s"expected >=3 (window,type) state rows at peak, saw $peak")
      assert(fin == 1L, s"expected only the hour-6 (window,type) row in state, saw $fin")
    } finally q.stop()
  }

  test("append-mode session state decays after watermark passage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = StreamOps.sessionize(df)
      .writeStream.format("memory").queryName("session_expiry").outputMode("append").start()
    try {
      // user 1: two sessions (gap > 30 min); user 2: one session
      input.addData((1L, tsh(0, 0), 1.0), (1L, tsh(0, 5), 1.0), (1L, tsh(0, 45), 1.0),
        (2L, tsh(0, 10), 1.0))
      q.processAllAvailable()
      input.addData((3L, tsh(6, 0), 1.0))
      q.processAllAvailable()
      input.addData((3L, tsh(6, 1), 1.0))
      q.processAllAvailable()
      val (peak, fin) = stateRows(q)
      assert(peak >= 3L, s"expected >=3 session state rows at peak, saw $peak")
      assert(fin <= 1L, s"expected only user 3's open session in state, saw $fin")
      // the closed sessions were emitted exactly once each
      val emitted = spark.table("session_expiry").filter(col("user_id") === 1L).collect()
      assert(emitted.length == 2, s"user 1 should have 2 closed sessions, got ${emitted.length}")
    } finally q.stop()
  }

  test("streaming feature lags: bit-exact parity with the batch feature generator across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.tables.Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("ts_us"), col("value"))
      .as[StreamOps.PurchaseEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val input = MemoryStream[StreamOps.PurchaseEvent]
    val q = StreamOps.featureLagsStream(spark, input.toDS())
      .writeStream.format("memory").queryName("featlags_test").outputMode("append").start()
    try {
      // two batches split mid-stream: per-user state must carry across commits
      val (b1, b2) = purchases.splitAt(purchases.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("featlags_test").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"), r.getAs[Long]("purchase_idx"),
          r.getAs[Double]("value"), Option(r.get(r.fieldIndex("lag1_value"))),
          Option(r.get(r.fieldIndex("lag2_value"))), Option(r.get(r.fieldIndex("prev3_mean"))),
          Option(r.get(r.fieldIndex("gap_s"))))).sortBy(t => (t._2, t._3))
      val want = graft.events.Events.featureLags(ev).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"), r.getAs[Long]("purchase_idx"),
          r.getAs[Double]("value"), Option(r.get(r.fieldIndex("lag1_value"))),
          Option(r.get(r.fieldIndex("lag2_value"))), Option(r.get(r.fieldIndex("prev3_mean"))),
          Option(r.get(r.fieldIndex("gap_s"))))).sortBy(t => (t._2, t._3))
      assert(got.length == want.length, s"row counts: ${got.length} vs ${want.length}")
      got.zip(want).foreach { case (g, w) => assert(g == w, s"stream/batch feature row diverges: $g vs $w") }
    } finally q.stop()
  }
}
