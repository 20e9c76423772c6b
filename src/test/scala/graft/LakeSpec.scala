package graft

import graft.tables.Tables
import graft.lake._
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {

  private def lineitem = Tables.lineitem(spark, sf0001)

  test("sorted layout skips files; unsorted does not") {
    val report = Layout.skipRateReport(lineitem, "1997-01-01", "1997-03-31")
      .collect().map(r => r.getAs[String]("layout") -> r.getAs[Double]("skip_rate_pct")).toMap
    assert(report("sorted") > 80.0, s"sorted layout should skip most files: $report")
    assert(report("unsorted") < 10.0, s"hash layout should skip almost nothing: $report")
  }

  test("two-phase prefix sum equals the single-partition running sum") {
    import org.apache.spark.sql.expressions.Window
    val files = lineitem.groupBy((col("l_orderkey") % 37).as("k"))
      .agg(count(lit(1)).as("v"))
    val wInc = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
    val wExc = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)
    val naive = files
      .withColumn("inc", sum(col("v")).over(wInc))
      .withColumn("exc", coalesce(sum(col("v")).over(wExc), lit(0L)))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("inc"), r.getAs[Long]("exc"))).toMap
    val inc = graft.plans.PrefixSum.prefixSum(files, "k", "v", "ps", nBuckets = 5)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("ps")).toMap
    val exc = graft.plans.PrefixSum.prefixSum(files, "k", "v", "ps",
        inclusive = false, nBuckets = 5)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("ps")).toMap
    naive.foreach { case (k, (i, e)) =>
      assert(inc(k) == i, s"inclusive prefix mismatch at k=$k")
      assert(exc(k) == e, s"exclusive prefix mismatch at k=$k")
    }
    // Grouped variant: running sum restarts per group, equals the per-group window.
    val grouped = lineitem.groupBy(col("l_returnflag").as("g"), (col("l_orderkey") % 17).as("k"))
      .agg(count(lit(1)).as("v"))
    val wg = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val gNaive = grouped.withColumn("inc", sum(col("v")).over(wg))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("k")) -> r.getAs[Long]("inc")).toMap
    val gPs = graft.plans.PrefixSum.prefixSum(grouped, "k", "v", "ps",
        nBuckets = 4, partitionCols = Seq("g"))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("k")) -> r.getAs[Long]("ps")).toMap
    gNaive.foreach { case (gk, i) =>
      assert(gPs(gk) == i, s"grouped prefix mismatch at $gk")
    }
  }

  test("row-group pruning gains over file pruning only in the sorted layout") {
    val rows = Layout.rowGroupPrune(lineitem)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val sorted = rows("sorted"); val unsorted = rows("unsorted")
    assert(sorted.getAs[Double]("rg_skip_pct") >= sorted.getAs[Double]("file_skip_pct"),
      "row-group stats can only skip MORE than file stats")
    assert(sorted.getAs[Long]("rg_extra_skipped") >= 0L)
    assert(unsorted.getAs[Double]("rg_skip_pct") <= 5.0,
      "hash layout has full-span row groups — nothing to skip")
  }

  test("writeSorted produces files with tight non-overlapping shipdate ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted_").toString
    try {
      Layout.writeSorted(lineitem, "l_shipdate", dir, numFiles = 4)
      val fmt = "yyyy-MM-dd HH:mm:ss"
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(date_format(col("l_shipdate"), fmt)).as("mn"),
             max(date_format(col("l_shipdate"), fmt)).as("mx"))
        .collect().map(r => (r.getAs[String]("mn"), r.getAs[String]("mx")))
        .sortBy(_._1)
      assert(perFile.length == 4)
      perFile.sliding(2).foreach {
        case Array((_, aMax), (bMin, _)) =>
          assert(aMax <= bMin, s"file ranges overlap: $aMax > $bMin")
        case _ =>
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("delete vectors: survivors + deletes == total rows") {
    val total = lineitem.count()
    val deleted = DeleteVectors.syntheticDeletes(lineitem).count()
    val live = DeleteVectors.applyDeletes(lineitem)
      .agg(sum("live_rows")).collect()(0).getLong(0)
    assert(live + deleted == total)
  }

  test("folded manifests resolve every coordinate exactly once") {
    val folded = DeleteVectors.foldManifests(lineitem)
    val nDeletes = folded.agg(sum("n_deletes")).collect()(0).getLong(0)
    val distinctCoords = {
      val base = FileModel.withPos(FileModel.withFileId(lineitem, 40))
      val m1 = base.filter(col("pos") % 7 === 1).select("file_id", "pos")
      val m2 = base.filter(col("pos") % 5 === 2 && col("file_id") % 4 === 0).select("file_id", "pos")
      m1.union(m2).distinct().count()
    }
    assert(nDeletes == distinctCoords)
  }

  test("density policy: every file classified, inline under 4KB") {
    val rows = DeleteVectors.densityPolicy(lineitem).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val bytes = r.getAs[Long]("dv_bytes")
      val storage = r.getAs[String]("storage")
      if (bytes <= 4096) assert(storage == "inline")
    }
  }

  test("roaring DV model: dense deletes pick one run container, scattered pick array") {
    import spark.implicits._
    // File 1: 5000 rows (l_orderkey=1, l_linenumber=2 → (31+2)%10=3) — every
    // row deleted, positions 0..4999 contiguous → ONE run container, 6 B of
    // container data (2 B header + 4 B × 1 run): the reference's
    // partition-drop scenario (run containers stay inline no matter how many
    // rows they cover). File 2: 1000 rows with every 10th deleted
    // ((62+l)%10=3 ⇔ l≡1 mod 10) → 100 isolated positions → array container
    // (200 B beats 402 B run / 8192 B bitmap): the fragmented-CDC scenario.
    val dense = (0 until 5000).map(_ => (1L, 2))
    val sparse = (0 until 1000).map(l => (2L, l))
    val synthetic = (dense ++ sparse).toDF("l_orderkey", "l_linenumber")
    val rows = DeleteVectors.roaringDvModel(synthetic, nFiles = 40)
      .collect().map(r => r.getAs[Long]("file_id") -> r).toMap
    val f1 = rows(1L)
    assert(f1.getAs[Long]("deleted") == 5000L)
    assert(f1.getAs[Long]("n_run") == 1L && f1.getAs[Long]("n_containers") == 1L)
    assert(f1.getAs[Long]("roaring_bytes") == 8L + 1L + 4L + 6L)
    assert(f1.getAs[String]("storage") == "inline")
    val f2 = rows(2L)
    assert(f2.getAs[Long]("deleted") == 100L)
    assert(f2.getAs[Long]("n_array") == 1L && f2.getAs[Long]("n_containers") == 1L)
    assert(f2.getAs[Long]("roaring_bytes") == 8L + 1L + 4L + 200L)
    // the dense file's run encoding crushes the naive estimate (min of
    // 4 B-list / bitset = 625 B vs 19 B roaring); on the tiny sparse file
    // the naive bitset (ceil(1000/8) = 125 B) legitimately beats roaring's
    // framed array (213 B) — the model must report that honestly rather
    // than assume roaring always wins
    assert(f1.getAs[Double]("compression_x") > 30.0)
    assert(f2.getAs[Long]("naive_bytes") == 125L)
    assert(f2.getAs[Double]("compression_x") == math.round(125.0 / 213.0 * 10000) / 10000.0)
  }

  test("compaction plan groups are contiguous and bounded") {
    val rows = Snapshots.compactionPlan(lineitem).collect()
    val groups = rows.map(_.getAs[Long]("group_id"))
    assert(groups.sorted.sameElements(groups), "groups must be non-decreasing in file order")
  }

  test("orphan files are exactly the unreferenced storage ids") {
    val orphans = Snapshots.orphanFiles(spark, lineitem).collect().map(_.getAs[Long]("file_id"))
    assert(orphans.forall(_ >= 40) && orphans.length == 10)
  }

  private def orders = Tables.orders(spark, sf0001)

  test("time travel: later snapshots only grow the visible row count") {
    def total(asOf: Long) = Snapshots.timeTravel(orders, asOf)
      .agg(sum(col("n_rows"))).collect()(0).getLong(0)
    val t5 = total(5); val t10 = total(10); val tAll = total(Long.MaxValue)
    assert(t5 <= t10 && t10 <= tAll)
    assert(tAll == orders.count())
  }

  test("expiry plan never touches the retained trailing commit window") {
    val maxCommit = orders.agg(max((col("o_orderkey") / 100).cast("long"))).collect()(0).getLong(0)
    val rows = Snapshots.expiryPlan(orders, retain = 3).collect()
    assert(rows.forall(_.getAs[Long]("commit_id") <= maxCommit - 3))
  }

  test("z-order layout bounds both dimensions; linear leaves partkey unbounded") {
    val m = Layout.zorderReport(lineitem).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Double]("avg_span_x_pct"), r.getAs[Double]("avg_span_y_pct"),
         r.getAs[Double]("skip_rate_pct"))).toMap
    assert(m("linear")._2 > 60.0, s"linear layout should span most of partkey: $m")
    assert(m("zorder")._2 < m("linear")._2 / 2, s"zorder should bound partkey span: $m")
    assert(m("zorder")._3 >= m("linear")._3, s"two-dim predicate should skip at least as much under zorder: $m")
  }

  test("equality vs positional deletes: overlap never exceeds either side") {
    DeleteVectors.equalityDeletes(lineitem).collect().foreach { r =>
      val eq = r.getAs[Long]("eq_deleted"); val pos = r.getAs[Long]("pos_deleted")
      val both = r.getAs[Long]("both_deleted")
      assert(both <= eq && both <= pos)
      assert(eq <= r.getAs[Long]("record_count"))
    }
  }

  test("merge upsert actions partition the key space") {
    val customer = Tables.customer(spark, sf0001)
    val m = Snapshots.mergeUpsert(customer, orders).collect()
      .map(r => r.getAs[String]("action") -> r.getAs[Long]("n_keys")).toMap
    val targetKeys = customer.filter(col("c_custkey") < 500).count()
    assert(m.getOrElse("update", 0L) + m.getOrElse("keep", 0L) == targetKeys,
      s"every target key is either updated or kept: $m vs $targetKeys")
  }

  test("wide pruning keeps a file iff every conjunct overlaps") {
    Manifest.widePrune(lineitem).collect().foreach { r =>
      val expected = r.getAs[Boolean]("ship_overlap") &&
        r.getAs[Boolean]("price_overlap") && r.getAs[Boolean]("qty_overlap")
      assert(r.getAs[Boolean]("keep") == expected)
    }
  }

  test("bloom pruning never skips a file that actually contains the key") {
    val rows = Manifest.bloomPruning(lineitem).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      if (r.getAs[Boolean]("contains_key"))
        assert(r.getAs[Boolean]("bloom_pass"), "bloom filters have no false negatives")
      if (r.getAs[String]("class") == "skipped")
        assert(!r.getAs[Boolean]("contains_key"))
    }
  }

  test("snapshot lineage: parents chain consecutively, depth resets at rewrites") {
    val rows = Snapshots.snapshotLineage(orders).collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("parent_id") == a.getAs[Long]("commit_id"))
      case _ =>
    }
    rows.filter(_.getAs[Boolean]("is_rewrite"))
      .foreach(r => assert(r.getAs[Long]("lineage_depth") == 0L, "rewrite commits reset lineage"))
  }

  test("clustering depth: sorted layout is ~disjoint, unsorted overlaps everywhere") {
    val byLayout = Layout.clusteringDepth(lineitem).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(byLayout("sorted").getAs[Double]("avg_depth") <= 2.0,
      "clustered files should barely overlap")
    assert(byLayout("unsorted").getAs[Long]("max_depth") > byLayout("sorted").getAs[Long]("max_depth"),
      "hash-arrival layout must overlap more than the clustered one")
  }

  test("compaction execute: merged groups conserve rows and bytes") {
    val plan = Snapshots.compactionPlan(lineitem).collect()
    val exec = Snapshots.compactionExecute(lineitem).collect()
    assert(exec.map(_.getAs[Long]("n_files")).sum == plan.length, "every planned file lands in a group")
    assert(exec.map(_.getAs[Long]("group_bytes")).sum == plan.map(_.getAs[Long]("file_bytes")).sum)
    assert(exec.map(_.getAs[Long]("group_rows")).sum == lineitem.count())
  }

  test("rollback plan covers exactly the commits after the pin") {
    val rows = Snapshots.rollbackPlan(orders, asOf = 5L).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("commit_id") > 5L))
    rows.foreach(r => assert(r.getAs[Long]("rows_to_remove") >= r.getAs[Long]("files_touched")))
  }

  test("stats truncation only widens bounds: keep_full implies keep_trunc") {
    val rows = Manifest.statsTruncation(Tables.part(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("keep_full") || r.getAs[Boolean]("keep_trunc"),
        "truncated bounds must be a superset of full bounds")
      assert(r.getAs[String]("trunc_min") <= r.getAs[String]("min_name"))
      assert(r.getAs[String]("trunc_max") >= r.getAs[String]("max_name"))
    }
  }

  test("scan cost strictly decreases from full to column-pruned to file-pruned") {
    val v = Manifest.scanCostModel(lineitem).collect()
      .map(r => r.getAs[String]("variant") -> r.getAs[Long]("bytes_read")).toMap
    assert(v("0_full_scan") > v("1_column_pruned"))
    assert(v("1_column_pruned") >= v("2_column_file_pruned"))
  }

  test("branch refs see monotonically more data toward the head; WAP decisions are total") {
    val refs = Snapshots.branchTags(orders).collect()
      .map(r => r.getAs[String]("ref_name") -> r.getAs[Long]("rows_visible")).toMap
    assert(refs("v1.0") <= refs("staging") && refs("staging") <= refs("main"))
    val wap = Snapshots.wapAudit(orders).collect()
    assert(wap.nonEmpty)
    assert(wap.forall(r => Set("publish", "reject")(r.getAs[String]("decision"))))
  }

  test("small-files report: a partition's small count never exceeds its file count") {
    val rows = Manifest.smallFilesReport(lineitem).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_small") <= r.getAs[Long]("n_files")))
  }

  test("cdc changelog: insert and update key counts add up to active keys per month") {
    val rows = Snapshots.cdcChangelog(orders, "1998-01-01", "1999-01-01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("insert_keys") + r.getAs[Long]("update_keys") > 0)
      assert(r.getAs[Long]("changed_rows") >= r.getAs[Long]("insert_keys") + r.getAs[Long]("update_keys"))
    }
  }

  test("partition stats roll up file stats without losing rows; ndv bounded by rows") {
    val li = lineitem
    val parts = Manifest.partitionStats(li).collect()
    assert(parts.map(_.getAs[Long]("n_rows")).sum == li.count())
    parts.foreach(r => assert(r.getAs[String]("min_ship") <= r.getAs[String]("max_ship")))
    val ndv = Manifest.columnNdv(li).collect()
    ndv.foreach { r =>
      assert(r.getAs[Long]("ndv_partkey") <= r.getAs[Long]("rows"))
      assert(r.getAs[Long]("ndv_suppkey") <= r.getAs[Long]("rows"))
    }
  }

  test("retention ladder covers every commit; recent commits are always kept") {
    val rows = Snapshots.retentionLadder(orders).collect()
    val nCommits = orders.selectExpr("o_orderkey div 100").distinct().count()
    assert(rows.length == nCommits)
    val headId = rows.map(_.getAs[Long]("commit_id")).max
    rows.filter(_.getAs[Long]("commit_id") > headId - 20).foreach(r =>
      assert(r.getAs[String]("decision") == "1_keep_recent"))
  }

  test("mor cost model: cow reads least but writes most; contention is symmetric-free") {
    val costs = DeleteVectors.morCostModel(lineitem).collect()
      .map(r => r.getAs[String]("strategy") -> (r.getAs[Long]("read_bytes"), r.getAs[Long]("write_bytes"))).toMap
    assert(costs("1_copy_on_write")._1 <= costs("2_mor_positional")._1)
    assert(costs("2_mor_positional")._1 <= costs("3_mor_equality")._1)
    assert(costs("1_copy_on_write")._2 >= costs("3_mor_equality")._2)
    val cont = Snapshots.writerContention(lineitem).collect()
    assert(cont.nonEmpty)
    cont.foreach { r =>
      assert(r.getAs[Long]("writer_a") < r.getAs[Long]("writer_b"))
      assert(r.getAs[Long]("shared_files") <= r.getAs[Long]("files_a"))
    }
  }

  test("sort-key advisor: clustering on the predicate column wins; spans are proper") {
    val rows = Layout.sortKeyChoice(Tables.lineitem(spark, sf0001)).collect()
      .map(r => r.getAs[String]("sort_key") ->
        (r.getAs[Double]("skip_rate_pct"), r.getAs[Double]("avg_span_pct"))).toMap
    assert(rows.keySet == Set("1_shipdate", "2_orderkey", "3_partkey"))
    assert(rows("1_shipdate")._1 >= rows("3_partkey")._1,
      "date clustering must beat an uncorrelated key for a date predicate")
    assert(rows("1_shipdate")._2 <= rows("3_partkey")._2, "and produce tighter spans")
    rows.values.foreach { case (skip, span) =>
      assert(skip >= 0.0 && skip <= 100.0 && span >= 0.0 && span <= 100.0)
    }
  }

  test("bucket pruning: bucketed scan dominates unbucketed on every probe") {
    val li = Tables.lineitem(spark, sf0001)
    val rows = Layout.bucketPruning(li).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("match_rows") <= r.getAs[Long]("bucketed_rows_scanned"),
        "the probe key's rows all live in its bucket")
      assert(r.getAs[Long]("bucketed_rows_scanned") <= r.getAs[Long]("unbucketed_rows_scanned"))
      assert(r.getAs[Long]("probe_key") % 16 == r.getAs[Long]("bucket_id"))
      assert(r.getAs[Double]("bucketed_amplification") <= r.getAs[Double]("unbucketed_amplification"))
    }
  }

  test("partition skew: shares sum to 100% and flags agree with exact ratios") {
    val rows = Layout.partitionSkew(Tables.lineitem(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("pct_of_total")).sum - 100.0) < 0.01)
    val n = rows.length.toLong
    val tot = rows.map(_.getAs[Long]("part_bytes")).sum
    rows.foreach { r =>
      val hot = r.getAs[Boolean]("is_hot")
      assert(hot == (r.getAs[Long]("part_bytes") * n > tot * 2L))
    }
  }

  test("column-update cost: 4-scenario ladder with monotone update costs") {
    val li = Tables.lineitem(spark, sf0001)
    val rows = DeleteVectors.columnUpdateCost(li).collect()
      .map(r => r.getAs[String]("scenario") -> r).toMap
    assert(rows.keySet == Set("A_small_update_1pct", "B_partial_update_10pct",
      "C_full_table_100pct", "D_medium_table_5pct"))
    val total = li.count()
    val a = rows("A_small_update_1pct"); val b = rows("B_partial_update_10pct")
    val c = rows("C_full_table_100pct")
    // The full-table scenario updates every row; the ladder is monotone.
    assert(c.getAs[Long]("updated_rows") == total)
    assert(a.getAs[Long]("updated_rows") <= b.getAs[Long]("updated_rows"))
    assert(b.getAs[Long]("updated_rows") <= c.getAs[Long]("updated_rows"))
    // Full rewrite bytes are scenario-invariant at a tier and dominate the
    // column update everywhere except possibly the 100% rung.
    assert(a.getAs[Long]("full_rewrite_bytes") == c.getAs[Long]("full_rewrite_bytes"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("column_update_bytes") ==
        r.getAs[Long]("updated_rows") * 8L + 200L)
      assert(r.getAs[Long]("full_rewrite_io_ops") == 2L)
      assert(r.getAs[Long]("column_update_io_ops") == 3L)
      assert(r.getAs[Double]("io_reduction_pct") == -50.0)
      assert(r.getAs[Double]("bytes_saved_pct") <= 100.0)
      assert(r.getAs[Double]("speedup_model") > 0.0)
      assert(r.getAs[Long]("files_touched") <= r.getAs[Long]("num_files"))
    }
    // Small updates save more bytes than large ones.
    assert(a.getAs[Double]("bytes_saved_pct") >= c.getAs[Double]("bytes_saved_pct"))
    assert(a.getAs[Double]("speedup_model") >= c.getAs[Double]("speedup_model"))
  }

  test("fetch latency ladder: monotone in threads, consistent with the TTFB model") {
    val rows = Manifest.fetchLatency(Tables.lineitem(spark, sf0001)).collect()
    assert(rows.map(_.getAs[Long]("threads")).toSeq == Seq(1L, 10L, 25L, 50L, 100L))
    val n = rows.head.getAs[Long]("n_objects")
    assert(n > 0, "the storm always fragments at least one file")
    rows.foreach { r =>
      val t = r.getAs[Long]("threads"); val rounds = r.getAs[Long]("fetch_rounds")
      assert(rounds == (n + t - 1) / t, s"rounds must be ceil(n/threads) at t=$t")
      assert(r.getAs[Long]("fetch_ms") == rounds * 55L)
      assert(r.getAs[Double]("speedup_vs_inline_x") == rounds.toDouble)
    }
    // Sequential rung fetches every object; more threads never fetch slower.
    assert(rows.head.getAs[Long]("fetch_rounds") == n)
    assert(rows.head.getAs[Double]("reduction_vs_sequential_pct") == 0.0)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("fetch_ms") >= hi.getAs[Long]("fetch_ms"))
      assert(lo.getAs[Double]("reduction_vs_sequential_pct")
        <= hi.getAs[Double]("reduction_vs_sequential_pct"))
    }
  }

  test("measured parallel-fetch ladder agrees with the analytic TTFB model") {
    // smaller ladder in-test (local[4] slots, sleep-bound: ~2.5 s total)
    val rungs = graft.lake.FetchSim.ladder(spark, nObjects = 32, ttfbMs = 40L,
      rungs = Seq(1, 4))
    assert(rungs.map(_._1) == Seq(1, 4))
    rungs.foreach { case (p, measured, modeled) =>
      // sleep-based fetches are stable: generous bound still proves the
      // model is a measurement, not an assumption
      assert(measured >= modeled * 0.9,
        f"p=$p measured $measured%.3f impossibly below model $modeled%.3f")
      assert(measured <= modeled * 1.5 + 0.3,
        f"p=$p measured $measured%.3f too far above model $modeled%.3f")
    }
    // and the parallel rung actually parallelizes
    val meas = rungs.map { case (p, me, _) => p -> me }.toMap
    assert(meas(4) < meas(1) / 2.0, s"4-way rung should at least halve wall: $meas")
  }

  test("inline budget: wider thresholds admit more files; crossings are proper") {
    val li = Tables.lineitem(spark, sf0001)
    val rows = Manifest.inlineBudget(li).collect()
    assert(rows.map(_.getAs[String]("threshold_label")).toSeq ==
      Seq("1_inline_4kb", "2_page_64kb", "3_region_half_1mb", "4_external_10mb"))
    val nFilesWithDeletes = li
      .filter((col("l_orderkey") * 31 + col("l_linenumber")) % 10 === 3)
      .select((col("l_orderkey") % 40).as("f")).distinct().count()
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("files_within_budget") <= hi.getAs[Long]("files_within_budget"))
    }
    rows.foreach { r =>
      val crossed = r.getAs[Boolean]("crossed")
      val within = r.getAs[Long]("files_within_budget")
      if (crossed) {
        assert(r.getAs[Long]("cum_bytes_at_crossing") > r.getAs[Long]("threshold_bytes"))
        assert(r.getAs[Long]("crossing_file_id") >= 0)
        assert(within < nFilesWithDeletes)
      } else {
        assert(within == nFilesWithDeletes, "uncrossed budget admits every file")
        assert(r.getAs[Long]("crossing_file_id") == -1L)
        assert(r.getAs[Long]("cum_bytes_at_crossing") == 0L)
      }
    }
    // The 4KB inline cliff is always crossed by the sf0.001+ delete set.
    assert(rows.head.getAs[Boolean]("crossed"))
  }

  test("health report: every family present, internally consistent with its source") {
    val li = Tables.lineitem(spark, sf0001)
    val rows = Health.healthReport(li).collect()
      .map(r => (r.getAs[String]("benchmark"), r.getAs[String]("metric")) -> r).toMap
    assert(rows.keys.map(_._1).toSet ==
      Set("delete_storm", "gc_cliff", "density_adaptive_policy", "dv_resolution"))
    rows.values.foreach(r => assert(r.getAs[String]("status") == "completed"))
    def v(b: String, m: String): Double = rows((b, m)).getAs[Double]("value")
    // delete_storm agrees with the per-file storm model it summarizes.
    val storm = DeleteVectors.deleteStorm(li).collect()
    assert(v("delete_storm", "files_hit") == storm.length.toDouble)
    assert(v("delete_storm", "total_fragments") ==
      storm.map(_.getAs[Long]("n_fragments")).sum.toDouble)
    assert(v("delete_storm", "max_amplification") ==
      storm.map(_.getAs[Double]("amplification")).max)
    // gc_cliff agrees with the inline-budget ladder.
    val budget = Manifest.inlineBudget(li).collect()
    assert(v("gc_cliff", "thresholds_crossed") ==
      budget.count(_.getAs[Boolean]("crossed")).toDouble)
    assert(v("gc_cliff", "files_within_4kb") ==
      budget.find(_.getAs[String]("threshold_label") == "1_inline_4kb")
        .get.getAs[Long]("files_within_budget").toDouble)
    // density census partitions the MDV set.
    assert(v("density_adaptive_policy", "inlined_count") +
      v("density_adaptive_policy", "spilled_count") ==
      v("density_adaptive_policy", "total_mdvs"))
    // dv_resolution reduction matches its byte inputs.
    val eq = v("dv_resolution", "eq_bytes"); val pos = v("dv_resolution", "pos_bytes")
    assert(math.abs(v("dv_resolution", "memory_reduction_pct") -
      math.rint((pos - eq) * 100.0 / pos * 10000) / 10000) < 1e-9)
  }

  test("eq-delete write path: equality commits blind, CoW amplifies, positional is tiny") {
    val li = Tables.lineitem(spark, sf0001)
    val rows = DeleteVectors.eqWriteCost(li).collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    assert(rows.keySet == Set("1_copy_on_write", "2_mor_positional", "3_mor_equality"))
    val cow = rows("1_copy_on_write"); val pos = rows("2_mor_positional")
    val eq = rows("3_mor_equality")
    // Equality deletes read nothing at commit time; the others scan touched files.
    assert(eq.getAs[Long]("bytes_read") == 0L && eq.getAs[Long]("files_read") == 0L)
    assert(cow.getAs[Long]("bytes_read") == pos.getAs[Long]("bytes_read"))
    assert(cow.getAs[Long]("bytes_read") > 0L)
    // Write ladder: CoW >> positional DV > equality tuple file.
    assert(cow.getAs[Long]("bytes_written") > pos.getAs[Long]("bytes_written"))
    assert(pos.getAs[Long]("bytes_written") > eq.getAs[Long]("bytes_written"))
    assert(eq.getAs[Long]("io_ops") == 1L && eq.getAs[Long]("files_written") == 1L)
    // write_amp: CoW rewrites survivors (amp >> 1), positional writes 8/100 B.
    assert(cow.getAs[Double]("write_amp") > 1.0)
    assert(math.abs(pos.getAs[Double]("write_amp") - 0.08) < 1e-9)
  }

  test("dv strategy ladder: 30% dv ratio, ~86.7% memory reduction, proper padding") {
    val li = Tables.lineitem(spark, sf0001)
    val rows = DeleteVectors.dvStrategies(li).collect()
    assert(rows.map(_.getAs[Long]("num_files")).toSeq == Seq(40L, 100L, 200L, 400L))
    rows.foreach { r =>
      val present = r.getAs[Long]("files_present")
      val dv = r.getAs[Long]("dv_files")
      assert(present <= r.getAs[Long]("num_files"))
      // file_id % 10 < 3 is exactly 30% of a full 0..num_files-1 id range.
      assert(dv * 10 >= present * 3 - 10 && dv * 10 <= present * 3 + 10)
      assert(r.getAs[Long]("hash_mem_bytes") == dv * 200L)
      assert(r.getAs[Long]("pos_mem_bytes") == present * 8L)
      // 200 B/matched-entry hash vs 8 B/file array at 30% match: ~86.7%.
      // Non-null asserted explicitly: the guarded ratios emit NULL when a
      // rung has no DV files, and getAs[Double] would silently read a NULL
      // as 0.0 — a degenerate corpus must fail here, not pass quietly.
      assert(!r.isNullAt(r.fieldIndex("memory_reduction_pct")) &&
        !r.isNullAt(r.fieldIndex("write_overhead_pct")),
        s"guarded ratio NULL at rung ${r.getAs[Long]("num_files")} — no DV files present")
      assert(r.getAs[Double]("memory_reduction_pct") > 80.0)
      assert(r.getAs[Long]("null_entries") == present - dv)
      assert(r.getAs[Long]("ordered_entries") == present)
      assert(r.getAs[Long]("unordered_entries") == dv)
      assert(r.getAs[Long]("separate_requests") == 2L &&
        r.getAs[Long]("folded_requests") == 1L)
      assert(r.getAs[Double]("io_reduction_pct") == 50.0)
    }
  }

  test("puffin ndv: per-file sketch union lands within the HLL bound at two SFs") {
    for (sf <- Seq(sf0001, sf001)) {
      val rows = graft.lake.Manifest.puffinNdv(Tables.lineitem(spark, sf), verify = true).collect()
      assert(rows.map(_.getAs[String]("column")).toSet == Set("l_suppkey", "l_orderkey"))
      for (r <- rows) {
        assert(r.getAs[Boolean]("within_bound"),
          s"$sf ${r.getAs[String]("column")}: rel_err ${r.getAs[Double]("rel_err")} beyond 5*rsd")
        assert(r.getAs[Long]("sketch_bytes") > 0 && r.getAs[Long]("n_files") == 40)
        // the whole point of the sketch: far smaller than the data it
        // summarizes (dense CrossSketch HLL: 1024 bytes per file)
        assert(r.getAs[Long]("sketch_bytes") < r.getAs[Long]("table_rows") * 8,
          "sketch must be far smaller than a raw column copy")
      }
      // shipped variant carries no exact anchor columns
      val shipped = graft.lake.Manifest.puffinNdv(Tables.lineitem(spark, sf)).columns.toSet
      assert(!shipped.contains("exact_ndv") && !shipped.contains("within_bound"))
    }
  }

  test("row lineage: rows conserved, live count monotone, ages consistent") {
    val out = graft.lake.Snapshots.rowLineage(orders).collect()
    val nKeys = orders.select("o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("rows_added")).sum == nKeys,
      "every key's lineage must begin at exactly one sequence number")
    assert(out.last.getAs[Long]("live_rows") == nKeys,
      "cumulative live rows must end at the full key count")
    assert(out.sliding(2).forall(p => p.head.getAs[Long]("live_rows") <= p.last.getAs[Long]("live_rows")))
    for (r <- out) {
      val (u, a) = (r.getAs[Long]("rows_last_updated"), r.getAs[Long]("age_sum"))
      // a row counted as updated aged >= 1 commit; never an age without a row
      assert((u == 0 && a == 0) || (u > 0 && a >= u),
        s"seq ${r.getAs[Long]("seq")}: age_sum $a inconsistent with updated $u")
    }
    // no update can precede the first add
    assert(out.takeWhile(_.getAs[Long]("rows_added") == 0)
      .forall(_.getAs[Long]("rows_last_updated") == 0))
  }

  test("incremental agg: merge equals recompute at any cutoff; counts telescope") {
    val ord = Tables.orders(spark, sf0001)
    for (cutoff <- Seq("1996-01-01", "1997-01-01", "1998-06-01")) {
      val rows = graft.lake.Snapshots.incrementalAgg(ord, cutoff).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Boolean]("consistent"),
          s"cutoff $cutoff ${r.getAs[String]("o_orderpriority")}: merged state != full recompute")
        assert(r.getAs[Long]("snap_n") + r.getAs[Long]("delta_n") == r.getAs[Long]("merged_n"))
      }
    }
    // degenerate cutoffs: empty snapshot / empty delta still merge correctly
    val allDelta = graft.lake.Snapshots.incrementalAgg(ord, "1900-01-01").collect()
    assert(allDelta.forall(r => r.getAs[Long]("snap_n") == 0L && r.getAs[Boolean]("consistent")))
    val allSnap = graft.lake.Snapshots.incrementalAgg(ord, "2100-01-01").collect()
    assert(allSnap.forall(r => r.getAs[Long]("delta_n") == 0L && r.getAs[Boolean]("consistent")))
  }
}
