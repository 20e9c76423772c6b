package graft.lake.iceberg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures (`CALL <cat>.system.<proc>(…)`) — the maintenance
  * surface every Iceberg deployment drives its table upkeep through
  * (Iceberg's Spark runtime ships the same names under the same `system`
  * namespace), implemented on Spark 4's connector procedure API
  * (`ProcedureCatalog` → `UnboundProcedure` → `BoundProcedure`) over the
  * library's committers:
  *
  *  - `expire_snapshots(table, retain_last)` → [[IcebergTable.expireSnapshots]]
  *  - `rollback_to_snapshot(table, snapshot_id)` → [[IcebergTable.rollback]]
  *  - `rewrite_manifests(table, group_months)` → [[IcebergTable.rewriteManifests]]
  *  - `rewrite_position_deletes(table)` → [[IcebergTable.rewritePositionDeletes]]
  *  - `cherrypick_snapshot(table, snapshot_id)` → [[IcebergTable.cherryPick]]
  *  - `publish_staged(table, snapshot_id)` → [[IcebergTable.publishStaged]]
  *  - `remove_orphan_files(table)` → [[IcebergTable.removeOrphanFiles]]
  *  - `set_current_snapshot(table, snapshot_id)` → [[IcebergTable.rollback]]
  *    (any-direction head re-point, Iceberg's procedure semantics)
  *  - `rollback_to_timestamp(table, timestamp_ms)` →
  *    [[IcebergTable.rollbackToTimestamp]]
  *  - `rewrite_data_files(table)` → [[IcebergTable.rewriteCompact]]
  *  - `compute_table_stats(table)` → [[IcebergTable.computeTableStats]]
  *
  * Each call returns a one-row report as a driver-local scan
  * ([[LocalScan]] — procedure reports are metadata-grain). The `table`
  * argument is the `<ns>.<table>` path inside the calling catalog's
  * warehouse (multi-level namespaces supported via the same
  * [[IcebergCatalog.nsPath]] layout the catalog resolves). Procedures are
  * driver-side metadata operations except `rewrite_position_deletes`,
  * whose consolidation scans run distributed like any library call. */
private[iceberg] object GraftProcedures {

  val Names: Seq[String] = Seq("expire_snapshots", "rollback_to_snapshot",
    "rewrite_manifests", "rewrite_position_deletes", "cherrypick_snapshot",
    "publish_staged", "remove_orphan_files", "set_current_snapshot",
    "rollback_to_timestamp", "rewrite_data_files", "compute_table_stats",
    "fast_forward", "ancestors_of")

  def load(warehouse: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"procedures live under <cat>.system, got ${ident.namespace().mkString(".")}")
    require(Names.contains(ident.name()), s"no procedure ${ident.name()}")
    new GraftUnboundProcedure(warehouse, ident.name())
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system") || namespace.isEmpty)
      Names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  private[iceberg] def tableLocation(warehouse: String, table: String): String = {
    val parts = table.split("\\.").toSeq
    require(parts.size >= 2, s"table must be <ns>.<table>, got $table")
    IcebergCatalog.tableLocation(warehouse,
      IcebergCatalog.nsPath(parts.init), parts.last)
  }
}

private[iceberg] class GraftUnboundProcedure(warehouse: String, proc: String)
    extends UnboundProcedure with BoundProcedure {

  override def name(): String = proc
  override def description(): String = s"graft system procedure $proc"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // commits mutate the table

  private def p(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()

  override def parameters(): Array[ProcedureParameter] = proc match {
    case "expire_snapshots" =>
      Array(p("table", StringType),
        ProcedureParameter.in("retain_last", IntegerType).defaultValue("1").build())
    case "rollback_to_snapshot" | "cherrypick_snapshot" | "publish_staged" |
         "set_current_snapshot" =>
      Array(p("table", StringType), p("snapshot_id", LongType))
    case "rollback_to_timestamp" =>
      Array(p("table", StringType), p("timestamp_ms", LongType))
    case "fast_forward" =>
      Array(p("table", StringType), p("branch", StringType), p("to", StringType))
    case "rewrite_manifests" =>
      Array(p("table", StringType),
        ProcedureParameter.in("group_months", IntegerType).defaultValue("12").build())
    case "rewrite_position_deletes" | "remove_orphan_files" |
         "rewrite_data_files" | "compute_table_stats" | "ancestors_of" =>
      Array(p("table", StringType))
  }

  private def schemaOf: StructType = proc match {
    case "expire_snapshots" => StructType(Seq(
      StructField("snapshots_removed", LongType),
      StructField("manifest_lists_deleted", LongType),
      StructField("manifests_deleted", LongType),
      StructField("data_files_deleted", LongType),
      StructField("delete_files_deleted", LongType)))
    case "rollback_to_snapshot" => StructType(Seq(
      StructField("previous_snapshot_id", LongType),
      StructField("current_snapshot_id", LongType)))
    case "rewrite_manifests" => StructType(Seq(
      StructField("new_snapshot_id", LongType),
      StructField("manifests_before", LongType),
      StructField("manifests_after", LongType)))
    case "rewrite_position_deletes" => StructType(Seq(
      StructField("new_snapshot_id", LongType)))
    case "cherrypick_snapshot" | "publish_staged" => StructType(Seq(
      StructField("current_snapshot_id", LongType)))
    case "remove_orphan_files" => StructType(Seq(
      StructField("data_files_deleted", LongType),
      StructField("metadata_files_deleted", LongType)))
    case "set_current_snapshot" | "rollback_to_timestamp" => StructType(Seq(
      StructField("previous_snapshot_id", LongType),
      StructField("current_snapshot_id", LongType)))
    case "rewrite_data_files" => StructType(Seq(
      StructField("new_snapshot_id", LongType),
      StructField("files_before", LongType),
      StructField("files_after", LongType)))
    case "compute_table_stats" => StructType(Seq(
      StructField("statistics_file", StringType),
      StructField("file_size_bytes", LongType),
      StructField("n_blobs", LongType)))
    case "fast_forward" => StructType(Seq(
      StructField("branch_updated", StringType),
      StructField("previous_ref", LongType),
      StructField("updated_ref", LongType)))
    case "ancestors_of" => StructType(Seq(
      StructField("snapshot_id", LongType),
      StructField("timestamp_ms", LongType),
      StructField("parent_id", LongType)))
  }

  private def headManifestCount(location: String): Long = {
    val meta = IcebergTable.readMetadata(location)
    IcebergTable.readManifestList(IcebergTable.currentSnapshot(meta).manifestList)
      .size.toLong
  }

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val location = GraftProcedures.tableLocation(warehouse,
      input.getUTF8String(0).toString)
    // the one MULTI-ROW report: walk the parent-snapshot-id chain from
    // the current head (spec §Snapshots lineage — exactly what Iceberg's
    // ancestors_of returns), newest first
    if (proc == "ancestors_of") {
      val meta = IcebergTable.readMetadata(location)
      val byId = meta.snapshots.map(s => s.id -> s).toMap
      val chain = Iterator.iterate(byId.get(meta.currentSnapshotId))(
          o => o.flatMap(s => byId.get(s.parentId)))
        .takeWhile(_.isDefined).flatten.toArray
      val schema = schemaOf
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = chain.map(s =>
          new GenericInternalRow(Array[Any](s.id, s.timestampMs, s.parentId)))
        override def readSchema(): StructType = schema
      }
      return java.util.Collections.singletonList(scan).iterator()
    }
    val row: Array[Any] = proc match {
      case "expire_snapshots" =>
        val r = IcebergTable.expireSnapshots(location, keepLast = input.getInt(1))
        Array(r.snapshotsRemoved.toLong, r.manifestListsDeleted.toLong,
          r.manifestsDeleted.toLong, r.dataFilesDeleted.toLong,
          r.deleteFilesDeleted.toLong)
      case "rollback_to_snapshot" =>
        val prev = IcebergTable.readMetadata(location).currentSnapshotId
        IcebergTable.rollback(location, input.getLong(1))
        Array(prev, input.getLong(1))
      case "rewrite_manifests" =>
        val before = headManifestCount(location)
        val id = IcebergTable.rewriteManifests(location, input.getInt(1))
        Array(id, before, headManifestCount(location))
      case "rewrite_position_deletes" =>
        Array(IcebergTable.rewritePositionDeletes(
          org.apache.spark.sql.SparkSession.active, location))
      case "cherrypick_snapshot" =>
        Array(IcebergTable.cherryPick(location, input.getLong(1)))
      case "publish_staged" =>
        IcebergTable.publishStaged(location, input.getLong(1))
        Array(IcebergTable.readMetadata(location).currentSnapshotId)
      case "remove_orphan_files" =>
        val (data, md) = IcebergTable.removeOrphanFiles(location)
        Array(data, md)
      case "set_current_snapshot" =>
        // same head re-point as rollback, but the name matches Iceberg's
        // any-direction procedure (forward to a newer snapshot included)
        val prev = IcebergTable.readMetadata(location).currentSnapshotId
        IcebergTable.rollback(location, input.getLong(1))
        Array(prev, input.getLong(1))
      case "rollback_to_timestamp" =>
        val prev = IcebergTable.readMetadata(location).currentSnapshotId
        Array(prev, IcebergTable.rollbackToTimestamp(location, input.getLong(1)))
      case "rewrite_data_files" =>
        val spark = org.apache.spark.sql.SparkSession.active
        def liveFiles: Long = IcebergTable.planFiles(location).files.size.toLong
        val before = liveFiles
        val id = IcebergTable.rewriteCompact(spark, location)
        Array(id, before, liveFiles)
      case "compute_table_stats" =>
        val spark = org.apache.spark.sql.SparkSession.active
        val (path, size, nBlobs) = IcebergTable.computeTableStats(spark, location,
          IcebergOps.PuffinColumns, IcebergOps.PuffinK)
        Array(UTF8String.fromString(path), size, nBlobs.toLong)
      case "fast_forward" =>
        // publish a branch: move `branch` forward to `to`'s snapshot (the
        // WAP publish half; linear snapshot ids stand in for the
        // ancestor check — a backward move is refused)
        val branch = input.getUTF8String(1).toString
        val to = input.getUTF8String(2).toString
        val meta = IcebergTable.readMetadata(location)
        val prev = meta.refs.getOrElse(branch, throw new IllegalArgumentException(
          s"no branch '$branch'")).snapshotId
        val toId = meta.refs.getOrElse(to, throw new IllegalArgumentException(
          s"no ref '$to'")).snapshotId
        require(toId >= prev, s"cannot fast-forward '$branch' backward ($prev -> $toId)")
        // main IS the table head: fast-forwarding it re-points
        // currentSnapshotId too (rollback maintains both together);
        // any other branch is just its ref
        if (branch == "main") IcebergTable.rollback(location, toId)
        else IcebergTable.setRef(location, branch, toId, "branch")
        Array(UTF8String.fromString(branch), prev, toId)
    }
    val schema = schemaOf
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(new GenericInternalRow(row))
      override def readSchema(): StructType = schema
    }
    java.util.Collections.singletonList(scan).iterator()
  }
}
