package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.streaming.DataStreamWriter

/** MemoryStream micro-benchmark for the streaming mirrors (Bench's
  * `streaming` block): each mirror is fed `nRows` deterministic synthetic
  * rows through a MemoryStream, the noop sink executes the full micro-batch
  * plan, and `processAllAvailable` fences completion — throughput =
  * rows / wall-clock of (addData + drain). Numbers are single-JVM
  * micro-batch throughput (state-store + shuffle + codegen, no source IO),
  * the streaming analogue of the noop-write batch bench. Correctness of the
  * mirrors is pinned by StreamingSpec; this only measures them. */
object StreamBench {

  private val baseMs = 1704067200000L // 2024-01-01T00:00:00Z, fixed epoch

  private def ts(i: Int): Timestamp = new Timestamp(baseMs + i.toLong * 1000L)
  private val types = Array("click", "view", "purchase", "signup")

  /** Returns (mirror, rows, seconds) per streaming mirror. */
  def run(spark: SparkSession, nRows: Int): Seq[(String, Int, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double)]

    def ckpt(name: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_sb_$name").toString

    // Optional mirror filter for local iteration (mirrors Bench's
    // SPARK_GRAFT_QUERIES); the driver never sets it and gets all mirrors.
    val only = sys.env.get("SPARK_GRAFT_STREAM_QUERIES").map(_.split(",").toSet)

    def drain[T](name: String, rows: Int, w: DataStreamWriter[T])(feed: () => Unit): Unit =
      if (only.forall(_.contains(name))) {
        val dir = ckpt(name)
        // start() inside the try: a start-time failure must still delete the
        // checkpoint dir (same pattern as Bench's write-bench temp dir).
        var q: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
        try {
          q = Some(w.option("checkpointLocation", dir).format("noop").start())
          val t0 = System.nanoTime()
          feed()
          q.get.processAllAvailable()
          out += ((name, rows, (System.nanoTime() - t0) / 1e9))
        } finally {
          q.foreach(_.stop())
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        }
      }

    def eventRows(n: Int): Seq[(Timestamp, String, Double)] =
      (0 until n).map(i => (ts(i), types(i % 4), (i % 100) / 10.0))
    def userRows(n: Int): Seq[(Long, Timestamp, Double)] =
      (0 until n).map(i => ((i % 997).toLong, ts(i), (i % 100) / 10.0))

    // windowed aggregations (tumbling / hopping / session)
    locally {
      val in = MemoryStream[(Timestamp, String, Double)]
      drain("tumbling", nRows,
        StreamOps.tumblingCounts(in.toDF().toDF("ts", "event_type", "value"))
          .writeStream.outputMode("complete"))(() => in.addData(eventRows(nRows)))
    }
    locally {
      val in = MemoryStream[(Timestamp, String, Double)]
      drain("hopping", nRows,
        StreamOps.hoppingCounts(in.toDF().toDF("ts", "event_type", "value"))
          .writeStream.outputMode("complete"))(() => in.addData(eventRows(nRows)))
    }
    locally {
      val in = MemoryStream[(Long, Timestamp, Double)]
      drain("session", nRows,
        StreamOps.sessionize(in.toDF().toDF("user_id", "ts", "value"))
          .writeStream.outputMode("complete"))(() => in.addData(userRows(nRows)))
    }
    // stream-stream interval join. Feed shape matters more than the join
    // here: the r7 harness fed signups at the purchase rate, so with a 24 h
    // interval and ~997 s per-user event spacing every purchase matched
    // ~87 signups — the measured "7.1k rows/s" was an 87× OUTPUT fan-out
    // (~310k emitted rows/s), not a state-store deficiency. The production
    // attribution shape is rare signups (one per user) probed by a purchase
    // firehose: ≤1 match per purchase, so rows/s now measures the join
    // machinery (two watermarked state stores + interval probe) rather than
    // result materialization.
    locally {
      val p = MemoryStream[(Long, Timestamp, Double)]
      val s = MemoryStream[(Long, Timestamp, Double)]
      drain("ss_join", nRows,
        StreamOps.purchaseAttribution(
            p.toDF().toDF("user_id", "ts", "value"),
            s.toDF().toDF("user_id", "ts", "value"))
          .writeStream.outputMode("append")) { () =>
        s.addData((0 until 997).map(u => (u.toLong, ts(u), 0.0)))
        p.addData(userRows(nRows - 997))
      }
    }
    // Stream-stream join state-store provider A/B at 10× volume (default
    // ON; SPARK_GRAFT_STREAM_AB=0 disables, SPARK_GRAFT_STREAM_AB_ROWS
    // sizes): the round-8 "provider choice is not the lever" claim carried
    // numbers only from the 200k single-batch mirror, which never commits a
    // watermark mid-run (state grows, nothing evicts). These arms rerun the
    // identical join over 2M purchases in CHUNKED batches at 10 events per
    // event-time second against a 10× signup store (9973 keys): every batch
    // commit advances the watermark and performs real eviction scans over
    // ~250k in-flight + ~36k sustained buffered rows — the steady-state
    // regime a production attribution join lives in, and the one where
    // provider write/eviction costs actually differ. (A single 2M batch
    // instead OOMs the HDFS provider's versioned in-memory maps — the A/B
    // must run multi-batch to be comparable at this volume at all.)
    // Measured on this shape (idle box, r9): HDFS ~37k rows/s, RocksDB
    // ~23k — the in-memory provider wins on raw micro-batch throughput;
    // RocksDB's case is state ≫ heap, not speed. providerClass is read at
    // query start, so it is set per-arm and restored after.
    if (!sys.env.get("SPARK_GRAFT_STREAM_AB").contains("0")) {
      val abRows = sys.env.get("SPARK_GRAFT_STREAM_AB_ROWS").map(_.toInt).getOrElse(2000000)
      val chunk = 250000
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(provKey)
      for ((label, cls) <- Seq(
          "ss_join_ab_hdfs" ->
            "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
          "ss_join_ab_rocksdb" ->
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) {
        if (only.forall(_.contains(label))) {
          spark.conf.set(provKey, cls)
          val dir = ckpt(label)
          var q: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
          try {
            val p = MemoryStream[(Long, Timestamp, Double)]
            val s = MemoryStream[(Long, Timestamp, Double)]
            q = Some(StreamOps.purchaseAttribution(
                p.toDF().toDF("user_id", "ts", "value"),
                s.toDF().toDF("user_id", "ts", "value"))
              .writeStream.outputMode("append")
              .option("checkpointLocation", dir).format("noop").start())
            val t0 = System.nanoTime()
            s.addData((0 until 9973).map(u => (u.toLong, ts(u), 0.0)))
            var fed = 9973
            while (fed < abRows) {
              val n = math.min(chunk, abRows - fed)
              // 10 purchases per event-time second: the 1 h watermark keeps
              // ~36000 event-seconds = ~360k rows buffered at steady state
              p.addData((fed - 9973 until fed - 9973 + n).map(i =>
                ((i % 9973).toLong, new Timestamp(baseMs + i.toLong * 100L), (i % 100) / 10.0)))
              q.get.processAllAvailable()
              fed += n
            }
            out += ((label, abRows, (System.nanoTime() - t0) / 1e9))
          } finally {
            q.foreach(_.stop())
            prev match {
              case Some(v) => spark.conf.set(provKey, v)
              case None => spark.conf.unset(provKey)
            }
            org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
          }
        }
      }
    }
    // watermarked dedup (50% duplicate keys)
    locally {
      val in = MemoryStream[(Long, Timestamp)]
      drain("dedup", nRows,
        StreamOps.dedupStream(in.toDF().toDF("content_key", "ts"))
          .writeStream.outputMode("append"))(() =>
        in.addData((0 until nRows).map(i => ((i / 2).toLong, ts(i)))))
    }
    // stream-static enrichment
    locally {
      val in = MemoryStream[(Long, Timestamp, Double)]
      val cohorts: DataFrame = (0 until 997)
        .map(u => (u.toLong, s"c${u % 8}")).toDF("user_id", "cohort")
      drain("cohort_enrich", nRows,
        StreamOps.cohortWindowCounts(in.toDF().toDF("user_id", "ts", "value"), cohorts)
          .writeStream.outputMode("complete"))(() => in.addData(userRows(nRows)))
    }
    // stateless filter cascade over text (heavier per-row payload)
    locally {
      val n = math.max(nRows / 4, 1)
      val in = MemoryStream[(Timestamp, String)]
      val words = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
      drain("filter_cascade", n,
        StreamOps.filterCascadeStream(in.toDF().toDF("ts", "text"))
          .writeStream.outputMode("complete"))(() =>
        in.addData((0 until n).map { i =>
          (ts(i), (0 until (5 + i % 40)).map(j => words((i + j) % words.length)).mkString(" "))
        }))
    }
    // stateless multimodal payload gate (per-row HOF byte-entropy)
    locally {
      val n = math.max(nRows / 4, 1)
      val in = MemoryStream[(Timestamp, String)]
      val words = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
      drain("payload_gate", n,
        StreamOps.payloadGateStream(in.toDF().toDF("ts", "text"))
          .writeStream.outputMode("complete"))(() =>
        in.addData((0 until n).map { i =>
          (ts(i), (0 until (20 + i % 40)).map(j => words((i + j) % words.length)).mkString(" "))
        }))
    }
    // streaming near-dup screen (32 HOF simhash votes per row + 4-band
    // fmgws probe; 25% of the feed are exact replays of an earlier doc, so
    // buckets stay populated and every replay pays a real Hamming probe)
    locally {
      val n = math.max(nRows / 4, 1)
      val in = MemoryStream[(Timestamp, Long, String)]
      val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
        "golf", "hotel", "india", "juliet", "kilo", "lima")
      def doc(k: Int): String =
        (0 until 30).map(j => words((k * 7 + j * 3) % words.length) + (k % 50)).mkString(" ")
      drain("near_dup", n,
        StreamOps.nearDupStream(spark, in.toDF().toDF("ts", "doc_id", "text"))
          .writeStream.outputMode("append"))(() =>
        in.addData((0 until n).map { i =>
          val k = if (i % 4 == 3) i - 3 else i // every 4th doc replays one
          (ts(i), i.toLong, doc(k))
        }))
    }
    // streaming strict funnel (per-user 16-byte fmgws state, abandonment
    // timeouts; feed cycles signup/click/purchase per user so journeys
    // open, advance and close continuously)
    locally {
      val in = MemoryStream[(Timestamp, Long, String)]
      val funnelTypes = Array("signup", "click", "purchase")
      drain("funnel", nRows,
        StreamOps.funnelStream(spark, in.toDF().toDF("ts", "user_id", "event_type"))
          .writeStream.outputMode("append"))(() =>
        in.addData((0 until nRows).map(i =>
          (ts(i), (i % 997).toLong, funnelTypes((i / 997) % 3)))))
    }
    // lambda anomaly scoring against a static baseline
    locally {
      val in = MemoryStream[(Timestamp, String, Double)]
      val baseline: DataFrame = (for (t <- types; d <- 1 to 7; h <- 0 until 24)
        yield (t, d.toLong, h.toLong, 50.0, 10.0))
        .toSeq.toDF("et", "bdow", "bhod", "mean_n", "sd_n")
      drain("anomaly", nRows,
        StreamOps.baselineAnomalyStream(in.toDF().toDF("ts", "event_type", "value"), baseline)
          .writeStream.outputMode("complete"))(() => in.addData(eventRows(nRows)))
    }
    // HLL-sketch distinct users per window (bounded state)
    locally {
      val in = MemoryStream[(Long, Timestamp)]
      drain("approx_users", nRows,
        StreamOps.approxUsersStream(in.toDF().toDF("user_id", "ts"))
          .writeStream.outputMode("complete"))(() =>
        in.addData((0 until nRows).map(i => ((i % 4999).toLong, ts(i)))))
    }
    // custom keyed state (flatMapGroupsWithState)
    locally {
      val in = MemoryStream[StreamOps.UserEvent]
      drain("fmgws_totals", nRows,
        StreamOps.runningUserTotals(spark, in.toDS())
          .writeStream.outputMode("update"))(() =>
        in.addData((0 until nRows).map(i =>
          StreamOps.UserEvent((i % 997).toLong, baseMs + i.toLong * 1000L, (i % 100) / 10.0))))
    }
    // bounded-state heavy hitters (SpaceSaving in flatMapGroupsWithState):
    // 32 buckets × 16 slots regardless of the 9973 distinct items fed
    locally {
      val in = MemoryStream[StreamOps.BucketItem]
      drain("heavy_hitters", nRows,
        StreamOps.heavyHittersStream(spark, in.toDS())
          .writeStream.outputMode("update"))(() =>
        in.addData((0 until nRows).map { i =>
          val item = (i % 9973).toLong
          StreamOps.BucketItem(item % 32, item)
        }))
    }
    // online lag-feature serving (append-mode fmgws, state 3 doubles/user)
    locally {
      val in = MemoryStream[StreamOps.PurchaseEvent]
      drain("feature_lags", nRows,
        StreamOps.featureLagsStream(spark, in.toDS())
          .writeStream.outputMode("append"))(() =>
        in.addData((0 until nRows).map(i =>
          StreamOps.PurchaseEvent(i.toLong, (i % 997).toLong,
            (baseMs + i.toLong * 1000L) * 1000L, (i % 100) / 10.0))))
    }
    // streaming ingest into the REAL Iceberg layer: foreachBatch commits one
    // snapshot per micro-batch, so the measured rate includes the parquet
    // write AND the manifest/metadata commit — the end-to-end ingest cost a
    // streaming lakehouse pays per batch (the noop-sink mirrors above
    // deliberately exclude sink IO; this arm deliberately includes it).
    locally {
      val name = "iceberg_ingest"
      if (only.forall(_.contains(name))) {
        val in = MemoryStream[(Long, Timestamp, Double)]
        val loc = ckpt("iceberg_tbl")
        val dir = ckpt(name)
        var q: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
        try {
          q = Some(in.toDF().toDF("l_orderkey", "l_shipdate", "l_quantity")
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              if (!batch.isEmpty) {
                graft.lake.iceberg.IcebergTable.append(spark, batch, loc); ()
              }
            }
            .option("checkpointLocation", dir)
            .start())
          val t0 = System.nanoTime()
          in.addData((0 until nRows).map(i => (i.toLong, ts(i % 86400), (i % 100) / 10.0)))
          q.get.processAllAvailable()
          out += ((name, nRows, (System.nanoTime() - t0) / 1e9))
        } finally {
          q.foreach(_.stop())
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(loc))
        }
      }
    }
    // the CONSUMPTION twin of iceberg_ingest: a snapshot TAILER draining a
    // REAL Iceberg table through tailDelta (planIncremental-backed) — each
    // lap appends a wave and drains exactly the new rows, so the measured
    // rate includes the commit, the metadata walk AND the incremental
    // parquet read; exactly-once across laps is asserted, not assumed.
    locally {
      val name = "iceberg_tail"
      if (only.forall(_.contains(name))) {
        val loc = ckpt("iceberg_tail_tbl")
        try {
          val waves = 4
          val per = math.max(nRows / waves, 1)
          var watermark = 0L
          var consumed = 0L
          val t0 = System.nanoTime()
          (0 until waves).foreach { w =>
            val wave = spark.range(w.toLong * per, w.toLong * per + per)
              .select(col("id").as("l_orderkey"),
                expr(s"timestamp_seconds(${baseMs / 1000} + id % 86400)").as("l_shipdate"),
                (col("id") % 100 / 10.0).as("l_quantity"))
            graft.lake.iceberg.IcebergTable.append(spark, wave, loc)
            val (nw, delta) = graft.lake.iceberg.IcebergTable.tailDelta(spark, loc, watermark)
            consumed += delta.map(_.count()).getOrElse(0L)
            watermark = nw
          }
          require(consumed == waves.toLong * per,
            s"tailer lost/duplicated rows: $consumed of ${waves.toLong * per}")
          out += ((name, waves * per, (System.nanoTime() - t0) / 1e9))
        } finally {
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(loc))
        }
      }
    }
    out.toSeq
  }
}
