package graft

import java.io.File
import java.nio.file.Files

import graft.lake.iceberg.IcebergTable
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Protocol-level invariants of the from-scratch Iceberg layer: the
  * HadoopTables version-hint commit protocol, manifest reuse across
  * snapshots, two-level pruning, time travel, and full roundtrip
  * fidelity. */
class IcebergSpec extends SparkSpec {

  private def lineitem = Tables.lineitem(spark, sf0001)

  private lazy val loc: String = {
    val l = Files.createTempDirectory("graft_iceberg_spec_").toString
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")), l)
    l
  }

  test("HadoopTables layout: versioned metadata JSON + version hint advance per commit") {
    assert(new File(s"$loc/metadata/v1.metadata.json").exists())
    assert(new File(s"$loc/metadata/v2.metadata.json").exists())
    val hint = new String(Files.readAllBytes(
      new File(s"$loc/metadata/version-hint.text").toPath)).trim
    assert(hint == "2")
    val meta = IcebergTable.readMetadata(loc)
    assert(meta.formatVersion == 2)
    assert(meta.currentSnapshotId == 2L)
    assert(meta.snapshots.map(_.id) == Seq(1L, 2L))
  }

  test("snapshot 2's manifest list REUSES snapshot 1's manifest (append = new list, old manifests untouched)") {
    val meta = IcebergTable.readMetadata(loc)
    val list2 = IcebergTable.readManifestList(
      meta.snapshots.find(_.id == 2).get.manifestList)
    assert(list2.size == 2)
    assert(list2.map(_.addedSnapshotId).sorted == Seq(1L, 2L))
    val list1 = IcebergTable.readManifestList(
      meta.snapshots.find(_.id == 1).get.manifestList)
    assert(list1.size == 1 && list1.head.addedSnapshotId == 1L)
    // the shared manifest is literally the same file
    assert(list2.find(_.addedSnapshotId == 1L).get.path == list1.head.path)
  }

  test("roundtrip fidelity: full read returns exactly the source rows") {
    val src = lineitem.agg(count(lit(1)), round(sum(col("l_quantity")), 4)).head()
    val got = IcebergTable.read(spark, loc)
      .agg(count(lit(1)), round(sum(col("l_quantity")), 4)).head()
    assert(got.getLong(0) == src.getLong(0))
    assert(got.getDouble(1) == src.getDouble(1))
  }

  test("two-level pruning: the pre-cut manifest is skipped without being opened") {
    val plan = IcebergTable.planFiles(loc, None, Some("1997-01"), Some("1997-03"))
    assert(plan.manifestsTotal == 2)
    assert(plan.manifestsRead == 1, "snapshot-1 summary ends before 1997-01 — prune by list alone")
    assert(plan.filesSelected == 3, "one file per month, three months selected")
    assert(plan.files.forall(f => f.partition >= "1997-01" && f.partition <= "1997-03"))
    // file-level stats carry real date bounds inside the partition
    plan.files.foreach { f =>
      assert(f.loShip.startsWith(f.partition) && f.hiShip.startsWith(f.partition))
      assert(f.recordCount > 0 && f.fileSizeBytes > 0)
    }
  }

  test("equality-delete MOR: anti-join applies the delete file, data plan unchanged") {
    val l = Files.createTempDirectory("graft_iceberg_mor_spec_").toString
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.appendEqualityDeletes(spark,
      lineitem.filter(col("l_orderkey") % 10 === 3L).select(col("l_orderkey")).distinct(), l)
    val meta = IcebergTable.readMetadata(l)
    assert(meta.snapshots.map(_.operation) == Seq("append", "append", "delete"))
    val (live, plan, deletes) = IcebergTable.readMor(spark, l)
    assert(deletes.size == 1 && deletes.head.content == 2)
    // the delete snapshot adds no DATA files: content=2 entries are
    // excluded from the data plan (planFiles filters on content)
    assert(plan.files.forall(_.content == 0))
    val expectedLive = lineitem.filter(col("l_orderkey") % 10 =!= 3L).count()
    assert(live.count() == expectedLive)
    // deleting is monotone: live rows < total, and exactly the keyed rows go
    assert(expectedLive < lineitem.count())
  }

  test("compaction rewrite: replace snapshot carries merged truth, old snapshots stay time-travelable") {
    val l = Files.createTempDirectory("graft_iceberg_compact_spec_").toString
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.appendEqualityDeletes(spark,
      lineitem.filter(col("l_orderkey") % 10 === 3L).select(col("l_orderkey")).distinct(), l)
    IcebergTable.rewriteCompact(spark, l)
    val meta = IcebergTable.readMetadata(l)
    assert(meta.snapshots.map(_.operation) == Seq("append", "append", "delete", "replace"))
    // the replace head has ONE manifest and no delete files
    val headList = IcebergTable.readManifestList(
      meta.snapshots.find(_.id == meta.currentSnapshotId).get.manifestList)
    assert(headList.size == 1)
    val headEntries = headList.flatMap(m => IcebergTable.readManifest(m.path))
    assert(headEntries.forall(_.content == 0))
    // manifest stats alone count the merged truth...
    val expectedLive = lineitem.filter(col("l_orderkey") % 10 =!= 3L).count()
    assert(IcebergTable.planFiles(l).files.map(_.recordCount).sum == expectedLive)
    // ...and the rewritten files read back clean with zero merge cost
    val (live, _, deletes) = IcebergTable.readMor(spark, l)
    assert(deletes.isEmpty)
    assert(live.count() == expectedLive)
    // time travel still sees the pre-compaction world
    assert(IcebergTable.read(spark, l, Some(2L)).count() == lineitem.count())
  }

  test("expiry: orphans physically deleted, head intact, dropped time travel gone") {
    val l = Files.createTempDirectory("graft_iceberg_expire_spec_").toString
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.appendEqualityDeletes(spark,
      lineitem.filter(col("l_orderkey") % 10 === 3L).select(col("l_orderkey")).distinct(), l)
    IcebergTable.rewriteCompact(spark, l)
    val headFiles = IcebergTable.planFiles(l).files.map(_.path)
    val rep = IcebergTable.expireSnapshots(l, keepLast = 1)
    assert(rep.snapshotsRemoved == 3 && rep.manifestsDeleted == 3)
    assert(rep.deleteFilesDeleted == 1)
    // head data files still on disk; table still plans and reads
    headFiles.foreach(p => assert(new File(p).exists(), s"head file deleted: $p"))
    val meta = IcebergTable.readMetadata(l)
    assert(meta.snapshots.map(_.operation) == Seq("replace"))
    val expectedLive = lineitem.filter(col("l_orderkey") % 10 =!= 3L).count()
    assert(IcebergTable.read(spark, l).count() == expectedLive)
    // dropped snapshots are unreachable by id
    intercept[IllegalArgumentException] { IcebergTable.planFiles(l, Some(1L)) }
  }

  test("streaming ingest: foreachBatch commits one real snapshot per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val l = Files.createTempDirectory("graft_iceberg_stream_").toString
    val ckpt = Files.createTempDirectory("graft_iceberg_stream_ckpt_").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("l_orderkey", "l_shipdate", "l_quantity")
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) { IcebergTable.append(spark, batch, l); () }
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData((1L, ts("1997-01-05 00:00:00"), 1.0), (2L, ts("1997-02-10 00:00:00"), 2.0))
      q.processAllAvailable()
      input.addData((3L, ts("1997-02-20 00:00:00"), 3.0))
      q.processAllAvailable()
      val meta = IcebergTable.readMetadata(l)
      assert(meta.snapshots.size == 2, "one snapshot per non-empty micro-batch")
      assert(meta.snapshots.forall(_.operation == "append"))
      assert(IcebergTable.read(spark, l).count() == 3)
      // month files accumulate per batch without rewriting earlier ones:
      // batch 1 wrote 1997-01 + 1997-02, batch 2 wrote its own 1997-02 file
      val files = IcebergTable.planFiles(l).files
      assert(files.map(_.partition).sorted == Seq("1997-01", "1997-02", "1997-02"))
      // partition pruning across streamed commits
      val feb = IcebergTable.planFiles(l, None, Some("1997-02"), Some("1997-02"))
      assert(feb.filesSelected == 2 && feb.files.map(_.recordCount).sum == 2)
    } finally q.stop()
  }

  test("partition evolution: weekly-spec files are week-grain, planning prunes across both specs") {
    val l = Files.createTempDirectory("graft_iceberg_evo_spec_").toString
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")), l, weekly = true)
    val meta = IcebergTable.readMetadata(l)
    val manifests = IcebergTable.readManifestList(
      meta.snapshots.find(_.id == meta.currentSnapshotId).get.manifestList)
    assert(manifests.map(_.specId).sorted == Seq(0, 1))
    // weekly partition values are ISO week-start dates, monthly are months
    val bySpec = manifests.map(m => m.specId -> IcebergTable.readManifest(m.path)).toMap
    assert(bySpec(0).forall(_.partition.length == 7))
    assert(bySpec(1).forall(_.partition.length == 10))
    assert(bySpec(1).size > bySpec(0).size / 2, "week grain is finer than month grain")
    // cross-spec date-bounds planning: an 11-day window in the weekly era
    // opens at most 3 week files, never a whole month's worth of rows
    val plan = IcebergTable.planFiles(l, None, None, None, Some("1997-02-05"), Some("1997-02-15"))
    assert(plan.files.nonEmpty && plan.files.forall(_.partition.length == 10))
    assert(plan.filesSelected <= 3)
    // full read across both specs still returns every row
    assert(IcebergTable.read(spark, l).count() == lineitem.count())
  }

  test("refs: main tracks the head, a tag pins its snapshot against expiry") {
    val l = Files.createTempDirectory("graft_iceberg_refs_spec_").toString
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")), l)
    IcebergTable.append(spark, lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")), l)
    assert(IcebergTable.snapshotForRef(l, "main") == 2L, "main follows every commit")
    IcebergTable.setRef(l, "v1", 1L, "tag")
    assert(IcebergTable.snapshotForRef(l, "v1") == 1L)
    intercept[IllegalArgumentException] { IcebergTable.setRef(l, "bad", 99L) }
    // expiry must NOT remove the tagged snapshot even though keepLast=1
    val rep = IcebergTable.expireSnapshots(l, keepLast = 1)
    assert(rep.snapshotsRemoved == 0, "tag pins snapshot 1 against expiry")
    val preCut = lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")).count()
    assert(IcebergTable.read(spark, l,
      Some(IcebergTable.snapshotForRef(l, "v1"))).count() == preCut)
  }

  test("write-audit-publish: staged snapshot invisible to default reads until published") {
    val l = Files.createTempDirectory("graft_iceberg_wap_spec_").toString
    val preCut = lineitem.filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    IcebergTable.append(spark, preCut, l)
    val staged = IcebergTable.appendStaged(spark, lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")), l)
    // default reads still see the old head; main has not moved
    assert(IcebergTable.read(spark, l).count() == preCut.count())
    assert(IcebergTable.snapshotForRef(l, "main") == 1L)
    assert(IcebergTable.snapshotForRef(l, "staging") == staged)
    // audit reads the staged snapshot by id
    assert(IcebergTable.read(spark, l, Some(staged)).count() == lineitem.count())
    // publish: metadata-only fast-forward — now everyone sees it
    IcebergTable.publishStaged(l, staged)
    assert(IcebergTable.snapshotForRef(l, "main") == staged)
    assert(IcebergTable.read(spark, l).count() == lineitem.count())
    assert(!IcebergTable.readMetadata(l).refs.contains("staging"))
  }

  test("time travel: reading snapshot 1 sees only pre-cut rows") {
    val expected = lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")).count()
    val planned = IcebergTable.planFiles(loc, Some(1L))
    assert(planned.files.map(_.recordCount).sum == expected,
      "manifest stats count the snapshot without reading data")
    assert(IcebergTable.read(spark, loc, Some(1L)).count() == expected)
  }
}
