package graft.lake.iceberg

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 SQL front door over the real [[IcebergTable]] metadata
  * layer — the BASELINE "Spark DataFrame read/write + Iceberg Catalog
  * APIs" north star as actual SQL: register once
  * (`spark.sql.catalog.<name> = graft.lake.iceberg.GraftCatalog`,
  * `spark.sql.catalog.<name>.warehouse = <dir>`) and every committed
  * [[IcebergCatalog]] table answers `SELECT … FROM <name>.<ns>.<table>`
  * — including `VERSION AS OF <snapshot-id>` time travel — through
  * Spark's own DSv2 planner. No Iceberg jars: planning IS
  * [[IcebergTable.planFiles]] (manifest-list pruning + file-level stats
  * skip on the pushed l_shipdate bounds), and the readers resolve the
  * snapshot's delete files per the spec — v3 deletion vectors skipped
  * positionally WHILE reading (the real reader shape: the DV rides to the
  * task as KB-grain compressed Roaring bytes and positions never
  * materialize off the executor) and equality-delete keys filtered
  * row-by-row scoped to strictly-older data files. Column pruning is
  * real: the pushed required schema becomes the parquet projection each
  * task reads ([[GraftSqlScanCensus]] records cols_read beside the
  * file-prune census so a query can PROVE both reached the scan).
  *
  * Scale shape: one InputPartition per planned data file (a 1000-executor
  * cluster fans the files out like any FileScan); per-task state is one
  * file's DV positions (bounded by rows-per-file) plus the broadcast-size
  * equality key set, both shipped once in the serialized factory/
  * partition. Writes: `INSERT INTO` routes through the committing
  * [[IcebergTable.append]] (V1Write bridge on [[GraftSqlTable]]);
  * row-level mutations stay library API calls
  * (updateMorDv/appendDvPuffin/…), like the real library's procedures.
  *
  * Simplifications, stated: positional-parquet (v2) delete files are
  * refused with a pointer at `rewrite_position_deletes` (the v3 migration
  * this library executes); schema merges one data-file footer per
  * sequence era (deterministic; internal lineage columns stripped), with
  * timestamps in whatever physical form the file carries — int96, millis
  * or micros — via Spark's own vectorized conversion. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  /** V2 transform functions ([[GraftMonthsFunction]]) — what lets a write's
    * required CLUSTERED distribution reference `months(<part col>)` and be
    * resolved by Spark's DistributionAndOrderingUtils (the same mechanism
    * Iceberg's own FunctionCatalog serves its transforms through). */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(namespace, GraftMonthsFunction.name()))
    else Array.empty
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.isEmpty && ident.name == GraftMonthsFunction.name()) GraftMonthsFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"spark.sql.catalog.$name.warehouse must point at an IcebergCatalog warehouse dir")
  }

  override def name(): String = catalogName

  /** `CALL <cat>.system.<proc>(…)` — the Iceberg maintenance procedures
    * (expire/rollback/rewrite/cherry-pick/publish) over the library's
    * committers; see [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(warehouse, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  /** Namespaces are MULTI-LEVEL: `a.b.c` maps to nested directories
    * `warehouse/a/b/c` (the HadoopCatalog layout); a directory with a
    * `metadata/` subdir is a table, anything else is a child namespace. */
  private def ns1(namespace: Array[String]): String =
    IcebergCatalog.nsPath(namespace.toIndexedSeq)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // committed tables (version-hint present) plus CREATE'd-but-not-yet-
    // committed ones (pending schema): SQL must see a table between its
    // CREATE and its first INSERT even though the library-level catalog
    // keeps the strict HadoopCatalog existence rule
    val nsDir = new File(new File(warehouse), ns1(namespace))
    Option(nsDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        (new File(d, "metadata/version-hint.text").exists() ||
         new File(d, "metadata/schema.pending.json").exists()))
      .map(d => Identifier.of(namespace, d.getName)).sortBy(_.name())
  }

  private def location(ident: Identifier): String =
    IcebergCatalog.tableLocation(warehouse, ns1(ident.namespace()), ident.name())

  private def load(ident: Identifier, snapshotId: Option[Long]): Table = {
    val loc = location(ident)
    if (!new File(loc, "metadata/version-hint.text").exists() &&
        !new File(loc, "metadata/schema.pending.json").exists())
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ns1(ident.namespace()), ident.name()))
    new GraftSqlTable(s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      loc, snapshotId)
  }

  override def loadTable(ident: Identifier): Table = {
    // `<cat>.<ns>.<t>.files` — the extra segment after a real table name
    // resolves to a metadata table (files/manifests/snapshots/…). A REAL
    // table named e.g. `files` wins: metadata-table resolution only fires
    // when the identifier itself is not a table.
    def asMetaTable: Option[Table] = {
      val ns = ident.namespace()
      if (ns.isEmpty || !GraftMetaTables.kinds.contains(ident.name())) None
      else {
        val parent = Identifier.of(ns.dropRight(1), ns.last)
        val loc = location(parent)
        if (new File(loc, "metadata/version-hint.text").exists())
          Some(new GraftMetaSqlTable(
            s"$catalogName.${ns.mkString(".")}.${ident.name()}", loc, ident.name()))
        else None
      }
    }
    // `<cat>.<ns>.<t>.branch_<name>` — Iceberg's branch addressing: reads
    // pin to the branch head, INSERTs append to the branch (moving only
    // its ref — the WAP write half). Resolution fires only when the
    // identifier itself is not a table, like the metadata tables.
    def asBranchTable: Option[Table] = {
      val ns = ident.namespace()
      if (ns.isEmpty || !ident.name().startsWith("branch_")) None
      else {
        val branch = ident.name().stripPrefix("branch_")
        val parent = Identifier.of(ns.dropRight(1), ns.last)
        val loc = location(parent)
        if (!new File(loc, "metadata/version-hint.text").exists()) None
        else IcebergTable.readMetadata(loc).refs.get(branch)
          .filter(_.refType == "branch").map { ref =>
            new GraftBranchSqlTable(s"$catalogName.${ns.mkString(".")}.${ident.name()}",
              loc, branch, ref.snapshotId)
          }
      }
    }
    try load(ident, None)
    catch {
      case e: org.apache.spark.sql.catalyst.analysis.NoSuchTableException =>
        asMetaTable.orElse(asBranchTable).getOrElse(throw e)
    }
  }

  /** `DROP TABLE … PURGE`: drop the registration AND physically delete
    * the table tree (data + metadata) — the irreversible form. */
  override def purgeTable(ident: Identifier): Boolean = {
    val loc = location(ident)
    val dropped = dropTable(ident)
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
      f.delete()
    }
    rm(new File(loc))
    dropped
  }

  /** `VERSION AS OF <snapshot-id | 'ref'>` — DSv2 time travel, resolved
    * to a snapshot-pinned scan exactly like the library's `planFiles(id)`.
    * A non-numeric version is a REF NAME (branch or tag, spec §Refs):
    * `SELECT … FROM t VERSION AS OF 'audit'` reads the tagged snapshot —
    * the same resolution Iceberg's Spark runtime performs. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val numeric = version.nonEmpty && version.forall(_.isDigit)
    if (numeric) load(ident, Some(version.toLong))
    else {
      val meta = IcebergTable.readMetadata(location(ident))
      val ref = meta.refs.getOrElse(version, throw new IllegalArgumentException(
        s"no branch or tag '$version' on ${ident.name()} " +
          s"(refs: ${meta.refs.keys.toSeq.sorted.mkString(", ")})"))
      load(ident, Some(ref.snapshotId))
    }
  }

  /** `TIMESTAMP AS OF <instant>` — the latest snapshot committed at or
    * before the instant (the spec's snapshot-log resolution rule). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val meta = IcebergTable.readMetadata(location(ident))
    val tsMs = timestampMicros / 1000L
    val eligible = meta.snapshots.filter(_.timestampMs <= tsMs)
    require(eligible.nonEmpty,
      s"no snapshot of ${ident.name()} committed at or before $tsMs ms")
    load(ident, Some(eligible.maxBy(_.timestampMs).id))
  }

  /** `CREATE TABLE <cat>.<ns>.<t> …` (incl. CTAS): registers the location
    * and persists the DECLARED schema as `metadata/schema.pending.json` —
    * the table is SQL-visible immediately (empty scan) while the library-
    * level existence rule stays "committed metadata only"; the first
    * INSERT/CTAS write commits snapshot 1 through [[IcebergTable.append]]
    * and the table becomes a normal committed table. Partition transforms
    * are refused: graft tables partition by month(l_shipdate) implicitly
    * (the stated single-spec simplification). */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables partition by month(l_shipdate) implicitly; omit PARTITIONED BY")
    require(schema.fieldNames.contains("l_shipdate"),
      "graft tables require an l_shipdate column (the month partition key)")
    val loc = IcebergCatalog.createTable(warehouse, ns1(ident.namespace()), ident.name())
    val mdir = new File(loc, "metadata"); mdir.mkdirs()
    java.nio.file.Files.write(new File(mdir, "schema.pending.json").toPath,
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // CREATE TABLE … TBLPROPERTIES: user properties land in the pending
    // sidecar (folded into metadata.json by the first commit); Spark's
    // reserved bookkeeping keys are not table properties
    val reserved = Set("provider", "owner", "location", "comment", "external")
    import scala.jdk.CollectionConverters._
    val userProps = properties.asScala.toMap.filterNot { case (k, _) =>
      reserved.contains(k) || k.startsWith("option.") }
    if (userProps.nonEmpty) IcebergTable.writePendingProperties(loc, userProps)
    new GraftSqlTable(s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      loc, None)
  }

  /** `CREATE OR REPLACE TABLE … AS SELECT` / atomic CTAS
    * (StagingTableCatalog — what keeps Spark's RTAS from falling back to
    * the non-atomic drop+create, which would DESTROY the snapshot
    * history): stageCreate registers the table exactly like CREATE;
    * stageReplace rewrites the DECLARED schema to the clause's and hands
    * back a staged table whose write lands as ONE "replace" (truncate)
    * snapshot — table identity and snapshot history SURVIVE the replace
    * (Iceberg's REPLACE semantics: time travel to pre-replace snapshots
    * keeps working), while commitStagedChanges resets the
    * column-evolution bookkeeping and the property map to the clause's
    * (a replaced table starts a fresh configuration era). */
  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): StagedTable = {
    val t = createTable(ident, schema, partitions, properties)
    new GraftStagedTable(t.name(), location(ident), schema, replaceProps = None,
      dropOnAbort = true)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: java.util.Map[String, String]): StagedTable = {
    require(tableExists(ident), s"cannot replace missing table ${ident.name()}")
    stagedReplace(ident, schema, partitions, properties)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: java.util.Map[String, String]): StagedTable =
    if (tableExists(ident)) stagedReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  private def stagedReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: java.util.Map[String, String]): StagedTable = {
    require(partitions.isEmpty,
      "graft tables partition by month(l_shipdate) implicitly; omit PARTITIONED BY")
    require(schema.fieldNames.contains("l_shipdate"),
      "graft tables require an l_shipdate column (the month partition key)")
    val loc = location(ident)
    val mdir = new File(loc, "metadata"); mdir.mkdirs()
    java.nio.file.Files.write(new File(mdir, "schema.pending.json").toPath,
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val reserved = Set("provider", "owner", "location", "comment", "external")
    import scala.jdk.CollectionConverters._
    val userProps = properties.asScala.toMap.filterNot { case (k, _) =>
      reserved.contains(k) || k.startsWith("option.") }
    new GraftStagedTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      loc, schema, replaceProps = Some(userProps), dropOnAbort = false)
  }

  /** `ALTER TABLE <cat>.<ns>.<t> ADD COLUMN <c> <type>`: the SQL-visible
    * TYPE rides in the declared-schema file (metadata/schema.pending.json
    * — the same vehicle CREATE uses), and for a committed table the
    * column-set change lands as a METADATA-ONLY schemas-array commit
    * ([[IcebergTable.addSchemaColumn]], spec §Schema Evolution). Pre-alter
    * files null-fill on read; the next INSERT writes the column for real.
    * Other change kinds are refused. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val loc = location(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          s"nested columns are not supported: ${add.fieldNames().mkString(".")}")
        val name = add.fieldNames().head
        val cur = load(ident, None).asInstanceOf[GraftSqlTable].schema()
        require(!cur.fieldNames.contains(name), s"column $name already exists")
        val next = StructType(cur.fields :+
          StructField(name, add.dataType(), add.isNullable()))
        val mdir = new File(loc, "metadata"); mdir.mkdirs()
        java.nio.file.Files.write(new File(mdir, "schema.pending.json").toPath,
          next.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (IcebergTable.readMetadataOpt(loc).isDefined)
          IcebergTable.addSchemaColumn(loc, name)
      case del: TableChange.DeleteColumn =>
        // DROP COLUMN: a metadata-only tombstone commit — current reads
        // hide the column, time travel at pre-drop snapshots still serves
        // it, no data file is touched (IcebergTable.dropSchemaColumn)
        require(del.fieldNames().length == 1,
          s"nested columns are not supported: ${del.fieldNames().mkString(".")}")
        val name = del.fieldNames().head
        require(name != "l_shipdate", "cannot drop the month partition key l_shipdate")
        val cur = load(ident, None).asInstanceOf[GraftSqlTable].schema()
        require(cur.fieldNames.contains(name), s"no column $name")
        rewritePending(loc, fields => fields.filterNot(_.name == name))
        if (IcebergTable.readMetadataOpt(loc).isDefined)
          IcebergTable.dropSchemaColumn(loc, name)
      case ren: TableChange.RenameColumn =>
        // RENAME COLUMN: metadata-only; the rename CHAIN keeps every file
        // written under a prior name serving data (the name-based stand-in
        // for field-id constancy — IcebergTable.renameSchemaColumn)
        require(ren.fieldNames().length == 1,
          s"nested columns are not supported: ${ren.fieldNames().mkString(".")}")
        val from = ren.fieldNames().head
        val to = ren.newName()
        require(from != "l_shipdate", "cannot rename the month partition key l_shipdate")
        val cur = load(ident, None).asInstanceOf[GraftSqlTable].schema()
        require(cur.fieldNames.contains(from), s"no column $from")
        require(!cur.fieldNames.contains(to), s"column $to already exists")
        rewritePending(loc, fields => fields.map(f =>
          if (f.name == from) f.copy(name = to) else f))
        if (IcebergTable.readMetadataOpt(loc).isDefined)
          IcebergTable.renameSchemaColumn(loc, from, to)
      case upd: TableChange.UpdateColumnType =>
        // ALTER COLUMN … TYPE: metadata-only type PROMOTION (spec §Schema
        // Evolution: int→long, float→double, decimal precision widening at
        // fixed scale). Pre-promotion files keep their narrow physical
        // type; the reader upcasts per file (IcebergTable.widenSchemaColumn)
        require(upd.fieldNames().length == 1,
          s"nested columns are not supported: ${upd.fieldNames().mkString(".")}")
        val name = upd.fieldNames().head
        require(name != "l_shipdate", "cannot retype the month partition key l_shipdate")
        val cur = load(ident, None).asInstanceOf[GraftSqlTable].schema()
        val from = cur.fields.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(s"no column $name")).dataType
        val to = upd.newDataType()
        val legal = (from, to) match {
          case (f, t) if f == t => false // no-op promotion: refuse loudly
          case (IntegerType, LongType) => true
          case (FloatType, DoubleType) => true
          case (f: DecimalType, t: DecimalType) =>
            t.scale == f.scale && t.precision > f.precision
          case _ => false
        }
        require(legal, s"illegal type promotion for $name: " +
          s"${from.sql} -> ${to.sql} (spec allows int->bigint, float->double, " +
          "and decimal precision widening at fixed scale)")
        rewritePending(loc, fields => fields.map(f =>
          if (f.name == name) f.copy(dataType = to) else f))
        if (IcebergTable.readMetadataOpt(loc).isDefined)
          IcebergTable.widenSchemaColumn(loc, name, to.sql)
      case set: TableChange.SetProperty =>
        // SET TBLPROPERTIES: metadata-only on a committed table, sidecar
        // before the first commit (folded in by it)
        if (IcebergTable.readMetadataOpt(loc).isDefined)
          IcebergTable.setTableProperties(loc, Map(set.property() -> set.value()))
        else IcebergTable.writePendingProperties(loc,
          IcebergTable.readPendingProperties(loc) + (set.property() -> set.value()))
      case rm: TableChange.RemoveProperty =>
        if (IcebergTable.readMetadataOpt(loc).isDefined)
          IcebergTable.setTableProperties(loc, Map.empty, Set(rm.property()))
        else IcebergTable.writePendingProperties(loc,
          IcebergTable.readPendingProperties(loc) - rm.property())
      case other => throw new UnsupportedOperationException(
        "graft catalog supports ALTER TABLE ADD/DROP/RENAME COLUMN, " +
          "ALTER COLUMN … TYPE, and SET/UNSET TBLPROPERTIES only, " +
          s"got $other")
    }
    load(ident, None)
  }

  /** Apply a field transform to the declared-schema file when one exists
    * (CREATE'd tables carry their SQL types there; committed-only tables
    * have none and the change lives purely in the metadata commit). */
  private def rewritePending(loc: String, f: Array[StructField] => Array[StructField]): Unit = {
    val pending = new File(loc, "metadata/schema.pending.json")
    if (pending.exists()) {
      val cur = org.apache.spark.sql.types.DataType.fromJson(
        java.nio.file.Files.readString(pending.toPath)).asInstanceOf[StructType]
      java.nio.file.Files.write(pending.toPath,
        StructType(f(cur.fields)).json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  override def dropTable(ident: Identifier): Boolean =
    IcebergCatalog.dropTable(warehouse, ns1(ident.namespace()), ident.name())

  override def renameTable(from: Identifier, to: Identifier): Unit =
    IcebergCatalog.renameTable(warehouse, ns1(from.namespace()), from.name(), to.name())

  // ---- SupportsNamespaces: SHOW/CREATE/DROP NAMESPACE over the
  // warehouse's directory-grain namespace layout ([[IcebergCatalog]]).
  override def listNamespaces(): Array[Array[String]] =
    IcebergCatalog.listNamespaces(warehouse).map(n => Array(n)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace))
      IcebergCatalog.listChildNamespaces(warehouse, namespace.toIndexedSeq)
        .map(c => namespace :+ c).toArray
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.nonEmpty && {
      val d = new File(new File(warehouse), ns1(namespace))
      d.isDirectory && !IcebergCatalog.isTableDir(d)
    }

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        catalogName +: namespace.toSeq)
    java.util.Collections.singletonMap("location",
      new File(new File(warehouse), ns1(namespace)).getPath)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit =
    IcebergCatalog.createNamespace(warehouse, namespace.toIndexedSeq)

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = new File(new File(warehouse), ns1(namespace))
    if (!d.isDirectory) false
    else if (!cascade && Option(d.listFiles()).exists(_.nonEmpty))
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        (catalogName +: namespace.toSeq).toArray)
    else { org.apache.commons.io.FileUtils.deleteDirectory(d); true }
  }
}

/** Planning census of [[GraftScan]]s — how the SQL front door PROVES
  * pushdown reached `planFiles` (files_scanned ≪ files_total) and column
  * pruning reached the parquet projection (cols_read ≪ cols_total).
  * Driver-side, recorded at planInputPartitions time KEYED BY TABLE
  * LOCATION, so concurrent or AQE-re-planned scans of different tables
  * never clobber each other's census (re-plans of the same scan overwrite
  * with identical values — planning is deterministic). Consumers read
  * [[forLocation]] for the table they just queried. */
object GraftSqlScanCensus {
  final case class Census(filesTotal: Long, filesSelected: Long,
                          manifestsTotal: Long, manifestsRead: Long,
                          colsRead: Long, colsTotal: Long)
  private val byLocation =
    new java.util.concurrent.ConcurrentHashMap[String, Census]()
  def record(location: String, c: Census): Unit = byLocation.put(location, c)
  def forLocation(location: String): Census =
    Option(byLocation.get(location)).getOrElse(Census(-1, -1, -1, -1, -1, -1))
}

/** The staged table RTAS/atomic-CTAS writes through: the write itself
  * lands via the normal builders (truncate mode for a replace — ONE
  * "replace" snapshot at the write's end, which is the atomic point), so
  * commitStagedChanges only finalizes configuration: for a REPLACE it
  * resets column-evolution bookkeeping (stale rename chains or promotions
  * from the old schema must not relabel the new columns) and replaces the
  * property map with the clause's. Abort of a staged CREATE drops the
  * just-registered empty table; abort of a staged REPLACE leaves the
  * table at its pre-write snapshot (nothing was swapped). */
private[iceberg] class GraftStagedTable(ident: String, location: String,
                                        declared: StructType,
                                        replaceProps: Option[Map[String, String]],
                                        dropOnAbort: Boolean)
    extends StagedTable with SupportsWrite {

  override def name(): String = ident
  override def schema(): StructType = declared
  override def partitioning(): Array[Transform] =
    Array(GraftPartitioning.monthTransform)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val b = new GraftWriteBuilder(location, info.schema(), info.queryId(), partitioning())
    if (replaceProps.isDefined) b.truncate() // a replace supersedes ALL prior data
    b
  }

  override def commitStagedChanges(): Unit = replaceProps.foreach { np =>
    if (IcebergTable.readMetadataOpt(location).isDefined) {
      IcebergTable.resetColumnEvolution(location)
      val old = IcebergTable.readMetadata(location).properties
      IcebergTable.setTableProperties(location, np, old.keySet -- np.keySet)
    } else IcebergTable.writePendingProperties(location, np)
  }

  override def abortStagedChanges(): Unit =
    if (dropOnAbort) {
      // a staged CREATE that never committed: remove the registration
      def rm(f: File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
        f.delete()
      }
      rm(new File(location))
    }
}

/** A branch-addressed table (`<t>.branch_<name>`): reads pin to the
  * branch head snapshot; INSERT appends to the BRANCH
  * ([[IcebergTable.appendToBranch]] — only the branch ref moves, main and
  * the table head stay put until a `fast_forward` publishes). Row-level
  * mutations are refused by the snapshot pin ([[GraftSqlTable]]'s
  * time-travel guard). */
private[iceberg] class GraftBranchSqlTable(ident: String, location: String,
                                           branch: String, at: Long)
    extends GraftSqlTable(ident, location, Some(at)) {

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                                  overwrite: Boolean): Unit = {
                require(!overwrite, "branch writes are append-only; " +
                  "overwrite main and fast-forward instead")
                IcebergTable.appendToBranch(data.sparkSession, data, location, branch)
              }
            }
        }
    }
}

private[iceberg] class GraftSqlTable(ident: String, location: String,
                                     snapshotId: Option[Long])
    extends Table with SupportsRead
    with SupportsWrite with SupportsDelete
    with SupportsMetadataColumns
    with SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.TruncatableTable {

  /** SQL `TRUNCATE TABLE`: one empty "replace" snapshot — zero live
    * files, history preserved. */
  override def truncateTable(): Boolean = {
    require(snapshotId.isEmpty, s"cannot truncate a time-travel snapshot of $ident")
    IcebergTable.truncateTable(location)
    true
  }

  override def name(): String = ident

  /** `_file`/`_pos` — the row coordinates the reader synthesizes, usable
    * from plain SQL (`SELECT _file, _pos, * FROM t`) and the rowId the
    * delta row-level operations key their deletes on. */
  override def metadataColumns(): Array[MetadataColumn] = GraftMetaColumns.columns

  /** SQL `UPDATE` / `MERGE INTO` / row-level `DELETE` — see
    * [[GraftRowLevelOperation]]: a delta (MOR) operation committing one
    * DV + replacement-files snapshot through [[IcebergTable.commitDelta]]. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(snapshotId.isEmpty, s"cannot mutate a time-travel snapshot of $ident")
    new GraftRowLevelOperationBuilder(location, info)
  }

  /** Columns internal to the v3 row-lineage machinery: replacement files
    * written by MOR UPDATE materialize them, but they are not part of the
    * SQL-visible table schema (the spec reserves them as metadata). */
  private def internalCol(name: String): Boolean =
    name == "_row_id" || name == "_last_updated_sequence_number"

  private lazy val schema0: StructType = applyColumnEvolution(rawSchema0)

  /** Post-merge schema visibility (ALTER TABLE DROP/RENAME COLUMN):
    * dropped-column tombstones hide a column from reads PAST their drop
    * point — a time-travel read at snapshot ≤ droppedAt still serves it,
    * the spec's era semantics — and rename chains relabel the physical
    * field to its current name (reads at any snapshot see the current
    * name; the stated name-based simplification). Two eras carrying both
    * a chain's old and new physical names dedupe to the current one. */
  private def applyColumnEvolution(raw: StructType): StructType =
    IcebergTable.readMetadataOpt(location) match {
      case None => raw
      case Some(meta) if meta.droppedColumns.isEmpty && meta.renamedColumns.isEmpty &&
        meta.widenedColumns.isEmpty => raw
      case Some(meta) =>
        def hidden(n: String): Boolean =
          meta.droppedColumns.get(n).exists(at => snapshotId.forall(_ > at))
        val renamed = raw.fields.flatMap { f =>
          if (hidden(f.name)) None
          else meta.renamedColumns.collectFirst {
            case (nw, chain) if chain.contains(f.name) => f.copy(name = nw)
          }.orElse(Some(f))
        }
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        // type promotions relabel the column's SQL-visible type (reads at
        // any snapshot see the widened type — the same stated name-based
        // simplification renames carry)
        StructType(renamed.filter(f => seen.add(f.name)).map { f =>
          meta.widenedColumns.get(f.name) match {
            case Some(ddl) => f.copy(dataType =
              org.apache.spark.sql.types.DataType.fromDDL(ddl))
            case None => f
          }
        })
    }

  private lazy val rawSchema0: StructType = {
    val pending = new File(location, "metadata/schema.pending.json")
    def pendingSchema: Option[StructType] =
      if (pending.exists())
        Some(org.apache.spark.sql.types.DataType.fromJson(
          java.nio.file.Files.readString(pending.toPath)).asInstanceOf[StructType])
      else None
    if (IcebergTable.readMetadataOpt(location).isEmpty) {
      // CREATE'd but not yet committed: the declared schema
      pendingSchema.getOrElse(throw new IllegalStateException(
        s"$ident has neither committed metadata nor a pending schema"))
    } else {
      val plan = IcebergTable.planFiles(location, snapshotId)
      if (plan.files.isEmpty) {
        // a committed snapshot with zero live data files still has a
        // schema: the declared one if the table was CREATE'd via SQL,
        // else the committed metadata's column names (the stated
        // string-typed simplification of the schemas array)
        pendingSchema.getOrElse(StructType(
          IcebergTable.readMetadata(location).schemas.lastOption
            .getOrElse(Seq("l_shipdate"))
            .filterNot(internalCol).map(StructField(_, StringType))))
      } else {
        // DETERMINISTIC schema, not first-file order: merge one file's
        // footer per sequence era (newest era's max path first), so a
        // column added by schema evolution appears while pre-evolution
        // eras contribute theirs — and strip the internal lineage columns
        // replacement files materialize, so SELECT * never exposes them.
        // Declared-but-not-yet-written columns (ALTER TABLE ADD COLUMN
        // before the next INSERT) overlay from the declared-schema file:
        // no data file carries them, so every read null-fills.
        val perEra = plan.files.groupBy(_.sequence).toSeq.sortBy(-_._1)
          .map { case (_, fs) => fs.map(_.path).max }
        val widened = IcebergTable.readMetadataOpt(location)
          .map(_.widenedColumns).getOrElse(Map.empty)
        val merged =
          if (widened.isEmpty)
            org.apache.spark.sql.SparkSession.active.read
              .option("mergeSchema", "true").parquet(perEra: _*).schema
          else {
            // a type-promoted table's eras DISAGREE on the column's
            // physical type (int files before the ALTER, long files
            // after) — Spark's mergeSchema refuses that, so merge
            // manually newest-era-first with promotion tolerance: the
            // first (newest) type wins, a narrower legal-promotion type
            // in an older era folds into it
            def widerOf(a: DataType, b: DataType): Option[DataType] = (a, b) match {
              case _ if a == b => Some(a)
              case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
              case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
              case (x: DecimalType, y: DecimalType) if x.scale == y.scale =>
                Some(if (x.precision >= y.precision) x else y)
              case _ => None
            }
            val spark = org.apache.spark.sql.SparkSession.active
            val acc = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
            perEra.foreach { p =>
              spark.read.parquet(p).schema.fields.foreach { f =>
                acc.get(f.name) match {
                  case None => acc(f.name) = f
                  case Some(prev) =>
                    acc(f.name) = prev.copy(dataType =
                      widerOf(prev.dataType, f.dataType).getOrElse(throw
                        new IllegalStateException(s"column ${f.name}: era types " +
                          s"${prev.dataType.sql} vs ${f.dataType.sql} are not a " +
                          "legal promotion pair")))
                }
              }
            }
            StructType(acc.values.toArray)
          }
        val declaredExtra = pendingSchema.map(_.fields.filterNot(f =>
          merged.fieldNames.contains(f.name) || internalCol(f.name)))
          .getOrElse(Array.empty[StructField])
        StructType(merged.fields.filterNot(f => internalCol(f.name)) ++ declaredExtra)
      }
    }
  }

  override def schema(): StructType = schema0

  /** Table properties for `SHOW TBLPROPERTIES` / DESCRIBE EXTENDED: the
    * committed metadata's map (spec §Table Metadata `properties`), or the
    * CREATE sidecar before the first commit. */
  override def properties(): java.util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    IcebergTable.readMetadataOpt(location).map(_.properties)
      .getOrElse(IcebergTable.readPendingProperties(location)).asJava
  }

  /** The implicit month(l_shipdate) partitioning, DECLARED — what makes
    * Spark route `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic`
    * to [[org.apache.spark.sql.connector.write.SupportsDynamicOverwrite]]
    * (the partition-level replace) instead of a whole-table truncate. */
  override def partitioning(): Array[Transform] =
    Array(GraftPartitioning.monthTransform)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(location, snapshotId, schema0)

  /** `INSERT INTO <cat>.<ns>.<t> …` / `df.writeTo(…).append()` — the WRITE
    * half of the north star, routed through the library's COMMITTING
    * append (snapshot + manifests + row-id assignment + version-hint flip)
    * via the DSv2 V1Write bridge: the bridge hands the insert's planned
    * DataFrame to [[IcebergTable.append]], whose distributed
    * month-partitioned writer and manifest protocol are exactly what a
    * direct API caller gets — SQL inserts and library appends produce
    * indistinguishable table history. */
  /** `DELETE FROM <cat>.<ns>.<t> WHERE …` — a METADATA-SHAPED row-level
    * delete: the pushed condition (attribute-vs-literal compares, IN,
    * AND/OR/NOT — [[canDeleteWhere]] refuses anything it cannot translate
    * exactly) becomes the victim predicate of ONE committing
    * [[IcebergTable.appendDvPuffin]] call — a v3 deletion-vector snapshot,
    * exactly what the library's delete path writes, so SQL deletes and
    * library deletes produce the same table history. A DELETE matching
    * zero live rows is a no-op (no empty commit). Re-asserting positions
    * already covered by earlier DVs is union-semantics-safe. */
  private def filterToColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case And(l, r) => for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a && b
      case Or(l, r) => for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a || b
      case Not(c) => filterToColumn(c).map(!_)
      case AlwaysTrue() => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    snapshotId.isEmpty && filters.forall(f => filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(snapshotId.isEmpty, s"cannot delete from a time-travel snapshot of $ident")
    val spark = org.apache.spark.sql.SparkSession.active
    import org.apache.spark.sql.functions.lit
    val pred = filters.flatMap(filterToColumn).reduceOption(_ && _).getOrElse(lit(true))
    // the zero-match guard runs over the MOR-RESOLVED read (existing DVs
    // and equality deletes applied), so a DELETE matching only
    // already-deleted rows really is a no-op — no empty commit. The guard
    // is a second (limit-1 short-circuited) scan beside appendDvPuffin's
    // victim scan; the spec-shaped alternative (a committer that reports
    // zero victims) would save it, but re-asserting already-covered
    // positions keeps union semantics either way.
    if (IcebergTable.readMetadataOpt(location).isEmpty) return
    if (IcebergTable.planFiles(location).files.isEmpty) return
    val live = IcebergTable.readMorUnified(spark, location)._1
    if (live.filter(pred).limit(1).count() > 0)
      IcebergTable.appendDvPuffin(spark, location, pred)
  }

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(snapshotId.isEmpty, s"cannot write to a time-travel snapshot of $ident")
    new GraftWriteBuilder(location, info.schema(), info.queryId(), partitioning())
  }
}

/** Write modes of the SQL front door, all committing through the library:
  *  - append (`INSERT INTO`): [[IcebergTable.append]] via the V1 bridge —
  *    SQL inserts and library appends produce indistinguishable history;
  *  - truncate (static `INSERT OVERWRITE`, or a whole-table
  *    `df.writeTo(t).overwrite(lit(true))`): ONE "replace" snapshot whose
  *    manifest list carries only the new data ([[IcebergTable.overwriteTable]]);
  *  - dynamic partition overwrite (`INSERT OVERWRITE` under
  *    `partitionOverwriteMode=dynamic`): a V2 batch write — executors
  *    stream month-partitioned files ([[GraftDeltaWriter]] doubling as a
  *    plain DataWriter), and the commit replaces EXACTLY the months that
  *    received data ([[IcebergTable.commitOverwriteMonths]]). */
private[iceberg] class GraftWriteBuilder(location: String, writeSchema: StructType,
                                         queryId: String = "",
                                         partitioning: Array[Transform] =
                                           Array(GraftPartitioning.monthTransform))
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {

  /** Distribution/sort source column, derived from the table's partition
    * spec (never a hardcoded column name). */
  private val partCol: Option[String] =
    GraftPartitioning.sourceColumnOf(partitioning)

  private var mode: String = "append"

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    mode = "truncate"; this
  }

  override def overwrite(filters: Array[Filter])
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(filters.isEmpty || filters.forall(_ == AlwaysTrue()),
      "filter-scoped overwrite supports the full table only; use " +
        "spark.sql.sources.partitionOverwriteMode=dynamic for partition-level replace")
    mode = "truncate"; this
  }

  override def overwriteDynamicPartitions()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    mode = "dynamic"; this
  }

  override def build(): org.apache.spark.sql.connector.write.Write = mode match {
    case "dynamic" =>
      new org.apache.spark.sql.connector.write.Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        // Writer fan-out control, same rationale as GraftDeltaWrite's
        // required distribution: range-partition the insert stream by
        // l_shipdate so each month's rows land in contiguous tasks and
        // files out ≈ months touched (not tasks × months). AQE sizes the
        // partition count from the insert volume.
        private val sortKeys =
          partCol.filter(writeSchema.fieldNames.contains).toArray
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          if (sortKeys.isEmpty)
            org.apache.spark.sql.connector.distributions.Distributions.unspecified()
          else
            org.apache.spark.sql.connector.distributions.Distributions.ordered(
              sortKeys.map(c => org.apache.spark.sql.connector.expressions.Expressions
                .sort(org.apache.spark.sql.connector.expressions.Expressions.column(c),
                  org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)))
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          sortKeys.map(c => org.apache.spark.sql.connector.expressions.Expressions
            .sort(org.apache.spark.sql.connector.expressions.Expressions.column(c),
              org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
          // staging-dir naming hint only — the committed snapshot id is
          // re-derived inside commitOverwriteMonths' OCC retry loop
          val dirHint = IcebergTable.readMetadataOpt(location)
            .map(_.snapshots.map(_.id).max).getOrElse(0L) + 1L
          new GraftOverwriteBatchWrite(location, writeSchema, dirHint,
            partCol.getOrElse("l_shipdate"))
        }
      }
    case m =>
      new org.apache.spark.sql.connector.write.V1Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        // Iceberg's `write.distribution-mode=hash` as a TABLE PROPERTY:
        // when set, appends (batch AND streaming epochs — the streaming
        // sink cannot global-sort, so hash-clustering is its
        // distribution) are clustered by months(<part col>), resolved
        // through the catalog's FunctionCatalog — files out ≈ months
        // touched instead of tasks × months. Unset tables keep the
        // unspecified distribution (writeDataSnapshot lays batch appends
        // out itself), so plain INSERTs pay no extra exchange.
        private val wantsHashDistribution =
          (m != "truncate") && partCol.nonEmpty &&
            IcebergTable.readMetadataOpt(location).map(_.properties)
              .getOrElse(IcebergTable.readPendingProperties(location))
              .get("write.distribution-mode").contains("hash")
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          if (wantsHashDistribution)
            org.apache.spark.sql.connector.distributions.Distributions.clustered(
              Array(org.apache.spark.sql.connector.expressions.Expressions
                .months(partCol.get)))
          else
            org.apache.spark.sql.connector.distributions.Distributions.unspecified()
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                                overwrite: Boolean): Unit =
              if (m == "truncate")
                IcebergTable.overwriteTable(data.sparkSession, data, location)
              else
                // write.target-records-per-file (read LIVE at insert
                // time): a property-era change shows up in the very next
                // insert's file split
                IcebergTable.append(data.sparkSession, data, location,
                  targetRecordsPerFile = IcebergTable.targetRecordsProp(location))
          }
        /** `df.writeStream.toTable(…)` — the streaming-ingest sink: one
          * append snapshot per epoch, exactly-once on restart replay
          * ([[IcebergTable.commitStreamAppend]]'s summary-recorded
          * (query, epoch) dedup — the Iceberg streaming contract). */
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(m != "truncate",
            "streaming complete-mode (truncate) writes are not supported; use append")
          new GraftStreamingWrite(location, writeSchema, queryId,
            partCol.getOrElse("l_shipdate"))
        }
      }
  }
}

private[iceberg] class GraftScanBuilder(location: String, snapshotId: Option[Long],
                                        tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var dateLo: Option[String] = None
  private var dateHi: Option[String] = None

  // the catalyst-pushed value's calendar date, for the manifests' ISO
  // string bounds (file pruning is [lo,hi]-inclusive at DAY grain, so an
  // off-by-timezone day cannot lose rows — and every filter is ALSO
  // returned residual below, so pruning only ever affects IO, not results).
  // java.sql.Timestamp converts via its instant in UTC — the calendar the
  // manifest bounds were written in — NOT toLocalDateTime (JVM zone): on a
  // non-UTC JVM an LTZ lower bound rounded up a day would prune a boundary
  // file whose rows match.
  private def dayOf(v: Any): Option[String] = v match {
    case null => None
    case t: java.sql.Timestamp =>
      Some(t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
    case d: java.sql.Date => Some(d.toString)
    case i: java.time.Instant =>
      Some(java.time.LocalDate.ofInstant(i, java.time.ZoneOffset.UTC).toString)
    case d: java.time.LocalDate => Some(d.toString)
    case dt: java.time.LocalDateTime => Some(dt.toLocalDate.toString)
    case s: String => Some(s.take(10))
    case u: UTF8String => Some(u.toString.take(10))
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def lo(s: String): Unit = dateLo = Some(dateLo.fold(s)(o => if (s > o) s else o))
    def hi(s: String): Unit = dateHi = Some(dateHi.fold(s)(o => if (s < o) s else o))
    pushed = filters.filter {
      case GreaterThanOrEqual("l_shipdate", v) => dayOf(v).exists { s => lo(s); true }
      case GreaterThan("l_shipdate", v) => dayOf(v).exists { s => lo(s); true }
      case LessThanOrEqual("l_shipdate", v) => dayOf(v).exists { s => hi(s); true }
      case LessThan("l_shipdate", v) => dayOf(v).exists { s => hi(s); true }
      case EqualTo("l_shipdate", v) => dayOf(v).exists { s => lo(s); hi(s); true }
      case _ => false
    }
    // file-grain stats pruning is not row filtering: every filter still
    // re-evaluates on the scan's rows
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    new GraftScan(location, snapshotId, dateLo, dateHi, required, tableSchema.size)
}

/** One planned data file + the delete state its reader must apply: the
  * file's data sequence and the compressed DV blobs referencing it. */
private[iceberg] case class GraftInputPartition(path: String, sequence: Long,
                                                dvBlobs: Array[Array[Byte]])
    extends InputPartition

private[iceberg] class GraftScan(location: String, snapshotId: Option[Long],
                                 dateLo: Option[String], dateHi: Option[String],
                                 required: StructType, tableCols: Int)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-iceberg $location${snapshotId.map(id => s" @$id").getOrElse("")}" +
      s" shipdate=[${dateLo.getOrElse("-inf")},${dateHi.getOrElse("+inf")}]"

  /** `spark.readStream.table(<cat>.<ns>.<t>)` — the snapshot TAILER as a
    * Structured Streaming source (the consumption pattern behind Iceberg's
    * own streaming read, and the DSv2 twin of the library-level
    * [[IcebergTable.tailDelta]]): offsets are snapshot ids, each
    * micro-batch plans the `(start, end]` incremental APPEND scan
    * ([[IcebergTable.planIncremental]] — append snapshots only; replaces
    * contribute nothing, deletes add no data files, staged snapshots stay
    * invisible until published), so successive batches PARTITION the
    * table's append history exactly-once — the same contract the
    * checkpointed offset makes durable across restarts. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(location, required)

  private def norm(p: String): String =
    p.replaceFirst("^file:", "").replaceFirst("^/{2,}", "/")

  private var eqDeletes: Array[(Long, Array[Long])] = Array.empty
  // identity of the equality-delete wave set this scan resolved (file
  // paths + sequences) — the broadcast cache key component that changes
  // exactly when the keys a reader must apply change
  private var eqFingerprint: String = ""
  // set at planning: no partition carries delete state → the factory may
  // serve FULL-COLUMNAR reads (Spark requires the decision be uniform
  // across the scan's partitions)
  private var allPartitionsClean: Boolean = true

  override def planInputPartitions(): Array[InputPartition] = {
    // a CREATE'd table before its first commit scans empty: an empty
    // result, not an error. A committed snapshot with zero live data
    // files (fully compacted-away history) falls out of the ONE pruned
    // planning pass below — no extra unpruned planFiles just to guard
    // emptiness (that pass re-read every manifest on every scan).
    if (IcebergTable.readMetadataOpt(location).isEmpty) {
      GraftSqlScanCensus.record(location, GraftSqlScanCensus.Census(
        0L, 0L, 0L, 0L, required.size.toLong, tableCols.toLong))
      return Array.empty
    }
    val meta = IcebergTable.readMetadata(location)
    val snap = snapshotId.map(id => meta.snapshots.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $id"))).getOrElse(
      IcebergTable.currentSnapshot(meta))
    val manifests = IcebergTable.readManifestList(snap.manifestList)
    val entries = IcebergTable.readManifestsParallel(manifests.map(_.path)).flatten
    require(!entries.exists(e => e.content == 1 && e.referencedDataFile.isEmpty),
      "SQL scan resolves v3 DVs and equality deletes; this table carries v2 " +
        "positional-parquet delete files — run rewrite_position_deletes first")
    val dvs = entries.filter(e => e.content == 1 && e.referencedDataFile.isDefined)
    val eqs = entries.filter(_.content == 2)
    // equality keys load ONCE on the driver (KB–MB grain, like the real
    // library's delete loader) and ship in the serialized factory
    eqDeletes = eqs.map(e =>
      (e.sequence, GraftParquetRows.readLongColumn(e.path, "key"))).toArray
    eqFingerprint = eqs.map(e => s"${e.path}@${e.sequence}").sorted.mkString(";")
    // ONE planning pass: ScanPlan.filesTotal is computed from the full
    // manifest list regardless of pruning, so the pruned plan already
    // carries the census denominator (a second unpruned planFiles would
    // just re-read every manifest).
    val plan = IcebergTable.planFiles(location, snapshotId, None, None, dateLo, dateHi)
    GraftSqlScanCensus.record(location, GraftSqlScanCensus.Census(
      plan.filesTotal, plan.filesSelected.toLong, plan.manifestsTotal.toLong,
      plan.manifestsRead.toLong, required.size.toLong, tableCols.toLong))
    if (plan.files.isEmpty) { allPartitionsClean = eqDeletes.isEmpty; return Array.empty }
    val blobCache = scala.collection.mutable.Map.empty[String, Puffin.BlobMetadata => Array[Byte]]
    def blobBytes(e: IcebergTable.DataFileEntry): Array[Byte] = {
      val slice = blobCache.getOrElseUpdate(e.path, Puffin.read(new File(e.path))._2)
      slice(Puffin.BlobMetadata("deletion-vector-v1", Seq.empty, 0L, 0L,
        e.contentOffset, e.contentSize))
    }
    val parts = plan.files.map { f =>
      val mine = dvs.filter(e =>
        e.sequence >= f.sequence && norm(e.referencedDataFile.get) == norm(f.path))
      GraftInputPartition(f.path, f.sequence, mine.map(blobBytes).toArray)
    }.toArray
    allPartitionsClean = eqs.isEmpty && parts.forall(_.dvBlobs.isEmpty)
    parts.asInstanceOf[Array[InputPartition]]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fields.map(f => (f.name, f.dataType))
    // equality-delete keys ride as a BROADCAST variable, not factory-closure
    // payload: the factory serializes into every task, so a large equality
    // wave in the closure would ship per-task; a broadcast ships per-executor
    // once (torrent), which is the scale-correct vehicle. CACHED per
    // (session, table, equality-wave set): a fresh broadcast per scan
    // invocation accumulated driver+executor blocks for the life of the
    // session on repeatedly-read delete-carrying tables.
    val bc = GraftEqBroadcastCache.get(location, eqFingerprint, eqDeletes)
    val columnar = allPartitionsClean &&
      !required.fieldNames.exists(GraftVectorized.isMetaCol)
    // live rename chains and type promotions ride to the tasks so files
    // written under a prior column name/type keep serving data
    // (resolveFileSchema; KB-grain maps)
    val meta = IcebergTable.readMetadataOpt(location)
    val renames = meta.map(_.renamedColumns).getOrElse(Map.empty)
      .filter { case (nw, _) => required.fieldNames.contains(nw) }
    val widened = meta.map(_.widenedColumns).getOrElse(Map.empty)
      .keySet.filter(required.fieldNames.contains)
    new GraftReaderFactory(fields, bc, columnar, renames, widened)
  }
}

/** Session-scoped cache of equality-delete-key broadcasts, keyed by
  * (application, table location, equality-wave fingerprint). The wave set
  * is immutable content (delete files never change in place), so a cached
  * broadcast can never serve stale keys — a NEW delete commit produces a
  * new fingerprint and its own entry. Superseded entries (older wave sets
  * of the same table) are unpersisted on replacement, which bounds the
  * cache at one live broadcast per table plus whatever scans still hold
  * references; a new SparkContext invalidates everything. */
private[iceberg] object GraftEqBroadcastCache {
  private val cache = scala.collection.mutable.Map.empty[
    (String, String), (String, org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long])]])]

  def get(location: String, fingerprint: String, eq: => Array[(Long, Array[Long])])
      : org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long])]] = synchronized {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val key = (sc.applicationId, location)
    cache.get(key) match {
      case Some((fp, bc)) if fp == fingerprint => bc
      case old =>
        // best-effort release of the superseded wave set's blocks; a scan
        // mid-flight on the old broadcast still reads it (unpersist is
        // non-blocking and re-broadcastable on demand by Spark)
        old.foreach { case (_, bc) => try bc.unpersist() catch { case _: Exception => () } }
        val bc = sc.broadcast(eq)
        cache(key) = (fingerprint, bc)
        bc
    }
  }
}

private[iceberg] class GraftReaderFactory(fields: Array[(String, DataType)],
                                          eqBc: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long])]],
                                          columnar: Boolean = false,
                                          renames: Map[String, Seq[String]] = Map.empty,
                                          widened: Set[String] = Set.empty)
    extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    require(columnar, "columnar read requested on a scan with delete state")
    new GraftColumnarReader(partition.asInstanceOf[GraftInputPartition].path, fields,
      renames, widened)
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    val eqDeletes = eqBc.value
    // spec scoping: equality deletes apply to STRICTLY older data files
    val keys = eqDeletes.collect { case (seq, ks) if seq > p.sequence => ks }
    val merged =
      if (keys.isEmpty) Array.empty[Long]
      else { val a = keys.flatten; java.util.Arrays.sort(a); a }
    val deleted =
      if (p.dvBlobs.isEmpty) Array.empty[Long]
      else {
        val a = p.dvBlobs.flatMap(RoaringDv.deserializeDvBlob)
        java.util.Arrays.sort(a); a
      }
    new GraftPartitionReader(p.path, fields, deleted, merged, renames, widened)
  }
}

/** Shared executor-side opener for Spark's VECTORIZED parquet reader —
  * the same columnar decoder every built-in FileScan task runs (the
  * row-at-a-time `Group` example reader it replaces paid a ~5–20×
  * constant factor per task for no correctness gain). Handles int96/
  * int64-millis/micros timestamps natively via Spark's own conversion. */
object GraftVectorized {
  /** Metadata columns the reader synthesizes instead of reading. */
  def isMetaCol(name: String): Boolean = name == "_file" || name == "_pos"

  def cleanPath(path: String): String =
    path.stripPrefix("file:").replaceFirst("^/{2,}", "/")

  def fileSchemaOf(path: String): MessageType = {
    val conf = new Configuration()
    val hPath = new Path("file:" + cleanPath(path))
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  /** Open a vectorized reader for the CATALYST `required` schema over one
    * whole file — the same task-side initialization Spark's own
    * `ParquetFileFormat.buildReaderWithPartitionValues` performs (a
    * FileSplit + TaskAttemptContext whose conf carries the requested
    * schema and the converter flags at their SQLConf defaults under a UTC
    * session). The batch's columns come back in `required` order, and a
    * column the file lacks (older schema era, internal lineage column)
    * rides as an all-null vector — Spark's own missing-column handling. */
  /** Resolve RENAMED columns against one file's physical schema: a
    * required field the file lacks is re-requested under the newest
    * ancestor name the file carries (renameSchemaColumn's chain — the
    * name-based stand-in for field-id constancy). Costs one footer read
    * per file and ONLY runs on tables with live renames (`renames`
    * nonEmpty); the batch's vectors are positional, so callers keep
    * labeling columns with the CURRENT names. */
  def resolveRenames(path: String, required: StructType,
                     renames: Map[String, Seq[String]]): StructType =
    resolveFileSchema(path, required, renames, Set.empty)

  /** Resolve the required schema against ONE file's physical schema:
    * RENAMED columns re-request the newest ancestor name the file carries
    * (the rename chain), and WIDENED columns (`ALTER COLUMN … TYPE`)
    * re-request the file's NARROW physical type when the file predates the
    * promotion — the decoded values upcast after the vectorized read
    * (int→long, float→double, decimal precision). Costs AT MOST one footer
    * read per file and only runs on tables with live renames/promotions;
    * the batch's vectors stay positional, so callers keep labeling columns
    * with the CURRENT names and handle the (required, resolved) type pair
    * per column. */
  def resolveFileSchema(path: String, required: StructType,
                        renames: Map[String, Seq[String]],
                        widened: Set[String]): StructType = {
    val needRename = renames.nonEmpty && required.fieldNames.exists(renames.contains)
    val needWiden = widened.nonEmpty && required.fieldNames.exists(widened)
    if (!needRename && !needWiden) required
    else {
      import scala.jdk.CollectionConverters._
      val msg = fileSchemaOf(path)
      val phys = msg.getFields.asScala.map(_.getName).toSet
      StructType(required.fields.map { f0 =>
        val f =
          if (phys.contains(f0.name)) f0
          else renames.get(f0.name)
            .flatMap(_.find(phys.contains))
            .map(old => f0.copy(name = old))
            .getOrElse(f0) // absent everywhere: stays a null-filled vector
        if (!widened.contains(f0.name) || !phys.contains(f.name)) f
        else narrowTypeOf(msg, f.name, f.dataType)
          .map(t => f.copy(dataType = t)).getOrElse(f)
      })
    }
  }

  /** The NARROW Catalyst type to request from a pre-promotion file for a
    * widened column, or None when the file already carries the wide type
    * (or anything unexpected — then the required type reads as-is). Only
    * the spec's legal promotion pairs map. */
  private def narrowTypeOf(msg: MessageType, name: String,
                           required: DataType): Option[DataType] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val t = msg.getFields.asScala.find(_.getName == name) match {
      case Some(x) if x.isPrimitive => x.asPrimitiveType()
      case _ => return None
    }
    (t.getPrimitiveTypeName, required) match {
      case (INT32, LongType)
          if t.getLogicalTypeAnnotation == null ||
            t.getLogicalTypeAnnotation
              .isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] =>
        Some(IntegerType)
      case (FLOAT, DoubleType) => Some(FloatType)
      case (_, d: DecimalType) =>
        t.getLogicalTypeAnnotation match {
          case dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation
              if dec.getScale == d.scale && dec.getPrecision < d.precision =>
            Some(DecimalType(dec.getPrecision, dec.getScale))
          case _ => None
        }
      case _ => None
    }
  }

  def open(path: String, required: StructType)
      : org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader = {
    val clean = cleanPath(path)
    val conf = new Configuration()
    conf.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    conf.set("org.apache.spark.sql.parquet.row.requested_schema", required.json)
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    conf.setBoolean("spark.sql.caseSensitive", false)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    val reader = new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", /*useOffHeap=*/ false, /*capacity=*/ 4096)
    val split = new org.apache.hadoop.mapred.FileSplit(
      new Path("file:" + clean), 0, new File(clean).length(), Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    reader.initialize(split, ctx)
    reader.resultBatch() // allocates the batch vectors (required before nextBatch)
    reader
  }
}

/** Vectorized row reader over one data file: Spark's columnar parquet
  * decode, then per-row assembly that skips DV positions by row ordinal,
  * filters equality keys, synthesizes the `_file`/`_pos` metadata columns
  * (the row-level operations' rowId), and null-fills columns a
  * pre-evolution file lacks. Runs in the executor. */
private[iceberg] class GraftPartitionReader(path: String,
                                            fields: Array[(String, DataType)],
                                            deletedPos: Array[Long],
                                            eqKeys: Array[Long],
                                            renames: Map[String, Seq[String]] = Map.empty,
                                            widened: Set[String] = Set.empty)
    extends PartitionReader[InternalRow] {

  private val eqCol = "l_orderkey"
  // the physical read schema: required fields minus the synthesized
  // metadata columns, plus the equality-key column when keys must filter
  private val physFields: Array[(String, DataType)] =
    fields.filterNot(f => GraftVectorized.isMetaCol(f._1)) ++
      (if (eqKeys.nonEmpty && !fields.exists(_._1 == eqCol))
         Array((eqCol, LongType: DataType))
       else Array.empty[(String, DataType)])
  private val physIdx: Map[String, Int] = physFields.map(_._1).zipWithIndex.toMap
  // the per-FILE resolved schema: renamed columns under their in-file
  // ancestor name, widened columns at the file's narrow physical type
  // (the extractors upcast) — positionally aligned with physFields
  private val resolved: StructType = GraftVectorized.resolveFileSchema(path,
    StructType(physFields.map { case (n, t) => StructField(n, t) }), renames, widened)
  private val reader = GraftVectorized.open(path, resolved)
  private val filePathValue = UTF8String.fromString(path)

  private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _
  private var rowInBatch = 0
  private var ordinal = -1L
  private var dvIdx = 0

  // per-required-field extractor over the batch row index: values are
  // COPIED out (the vectors' buffers are reused across batches); a column
  // the file lacks is an all-null vector, so null-fill is just isNullAt
  private val extractors: Array[Int => Any] = fields.map { case (name, dt) =>
    name match {
      case "_file" => (_: Int) => filePathValue
      case "_pos" => (_: Int) => ordinal
      case _ =>
        val j = physIdx(name)
        // NOTE: `batch` is re-read on every call (it is null until the
        // first nextBatch) — the lambdas must not capture a column ref
        def ifSet(f: Int => Any): Int => Any =
          i => if (batch.column(j).isNullAt(i)) null else f(i)
        (dt, resolved.fields(j).dataType) match {
          // type-promotion upcasts: the file predates the ALTER COLUMN …
          // TYPE, so the vector decoded at the narrow type and the value
          // widens here (spec §Schema Evolution promotion on read)
          case (LongType, IntegerType) => ifSet(i => batch.column(j).getInt(i).toLong)
          case (DoubleType, FloatType) => ifSet(i => batch.column(j).getFloat(i).toDouble)
          case (d: DecimalType, n: DecimalType) if n != d =>
            ifSet(i => org.apache.spark.sql.types.Decimal(
              batch.column(j).getDecimal(i, n.precision, n.scale).toJavaBigDecimal,
              d.precision, d.scale))
          case _ => dt match {
          case LongType | TimestampType | TimestampNTZType =>
            ifSet(i => batch.column(j).getLong(i))
          case IntegerType | DateType => ifSet(i => batch.column(j).getInt(i))
          case DoubleType => ifSet(i => batch.column(j).getDouble(i))
          case FloatType => ifSet(i => batch.column(j).getFloat(i))
          case BooleanType => ifSet(i => batch.column(j).getBoolean(i))
          case StringType => ifSet(i => batch.column(j).getUTF8String(i).copy())
          case BinaryType => ifSet(i => batch.column(j).getBinary(i).clone())
          case d: DecimalType =>
            ifSet(i => batch.column(j).getDecimal(i, d.precision, d.scale))
          case other =>
            throw new UnsupportedOperationException(s"column $name: unsupported type $other")
          }
        }
    }
  }
  private val eqIdx: Int = if (eqKeys.nonEmpty) physIdx(eqCol) else -1

  override def next(): Boolean = {
    while (true) {
      if (batch == null || rowInBatch >= batch.numRows()) {
        if (!reader.nextBatch()) return false
        batch = reader.resultBatch()
        rowInBatch = 0
        if (batch.numRows() == 0) return false
      } else {
        ordinal += 1
        val i = rowInBatch
        rowInBatch += 1
        // DV skip: both the read and the vector walk in ordinal order
        while (dvIdx < deletedPos.length && deletedPos(dvIdx) < ordinal) dvIdx += 1
        val dvDead = dvIdx < deletedPos.length && deletedPos(dvIdx) == ordinal
        val eqDead = eqIdx >= 0 && !batch.column(eqIdx).isNullAt(i) &&
          java.util.Arrays.binarySearch(eqKeys, batch.column(eqIdx).getLong(i)) >= 0
        if (!dvDead && !eqDead) { rowInBatch -= 1; return true }
      }
    }
    false
  }

  override def get(): InternalRow = {
    val i = rowInBatch
    rowInBatch += 1
    new GenericInternalRow(extractors.map(_(i)): Array[Any])
  }

  override def close(): Unit = reader.close()
}

/** FULL-COLUMNAR reader for the clean case (no delete state, no metadata
  * columns): batches flow from Spark's vectorized decoder straight into
  * the scan exec with zero per-row materialization — the same shape as
  * the built-in vectorized FileScan. The batch's columns already follow
  * the required order (missing columns as null vectors), so the decoder's
  * batch is handed over as-is. */
private[iceberg] class GraftColumnarReader(path: String,
                                           fields: Array[(String, DataType)],
                                           renames: Map[String, Seq[String]] = Map.empty,
                                           widened: Set[String] = Set.empty)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  private val required = StructType(fields.map { case (n, t) => StructField(n, t) })
  private val resolved = GraftVectorized.resolveFileSchema(path, required, renames, widened)
  private val reader = GraftVectorized.open(path, resolved)
  // columns whose file type is narrower than the required type (the file
  // predates an ALTER COLUMN … TYPE promotion): wrapped once in an
  // upcasting vector so the batch stays FULL-COLUMNAR
  private val upcastIdx: Array[Int] = required.fields.indices
    .filter(i => required.fields(i).dataType != resolved.fields(i).dataType).toArray
  private var wrapped: org.apache.spark.sql.vectorized.ColumnarBatch = _

  override def next(): Boolean = reader.nextBatch()

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
    val b = reader.resultBatch()
    if (upcastIdx.isEmpty) b
    else {
      if (wrapped == null) {
        // the decoder reuses ONE batch object (and its vectors) across
        // nextBatch calls, so the wrappers bind once
        val vs = Array.tabulate[org.apache.spark.sql.vectorized.ColumnVector](
          b.numCols())(b.column)
        upcastIdx.foreach { i =>
          vs(i) = new GraftUpcastVector(vs(i),
            resolved.fields(i).dataType, required.fields(i).dataType)
        }
        wrapped = new org.apache.spark.sql.vectorized.ColumnarBatch(vs)
      }
      wrapped.setNumRows(b.numRows())
      wrapped
    }
  }

  override def close(): Unit = reader.close()
}

/** Columnar type-promotion shim (spec §Schema Evolution read-side upcast):
  * serves a batch column decoded at a pre-promotion file's NARROW type
  * under the table's widened type — getLong over an int vector, getDouble
  * over a float vector, getDecimal re-scoped to the widened precision.
  * Everything else delegates; the underlying buffers are untouched (no
  * copy, the scan stays whole-stage-columnar). */
private[iceberg] class GraftUpcastVector(child: org.apache.spark.sql.vectorized.ColumnVector,
                                         from: DataType, to: DataType)
    extends org.apache.spark.sql.vectorized.ColumnVector(to) {
  private val intToLong = from == IntegerType && to == LongType
  private val floatToDouble = from == FloatType && to == DoubleType
  private val fromDec: Option[DecimalType] = from match {
    case d: DecimalType => Some(d); case _ => None
  }
  override def close(): Unit = child.close()
  // ColumnarToRowExec calls closeIfFreeable() after EVERY consumed batch;
  // the decoder's WritableColumnVectors override it to a no-op because the
  // reader owns and REUSES them across batches — this view must delegate
  // that ownership signal, not inherit ColumnVector's close-by-default
  // (which freed the reader's vectors after the first batch and NPE'd the
  // second batch's decode on multi-batch files).
  override def closeIfFreeable(): Unit = child.closeIfFreeable()
  override def hasNull: Boolean = child.hasNull
  override def numNulls(): Int = child.numNulls()
  override def isNullAt(i: Int): Boolean = child.isNullAt(i)
  override def getBoolean(i: Int): Boolean = child.getBoolean(i)
  override def getByte(i: Int): Byte = child.getByte(i)
  override def getShort(i: Int): Short = child.getShort(i)
  override def getInt(i: Int): Int = child.getInt(i)
  override def getLong(i: Int): Long =
    if (intToLong) child.getInt(i).toLong else child.getLong(i)
  override def getFloat(i: Int): Float = child.getFloat(i)
  override def getDouble(i: Int): Double =
    if (floatToDouble) child.getFloat(i).toDouble else child.getDouble(i)
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal = fromDec match {
    case Some(n) if n.precision != precision || n.scale != scale =>
      org.apache.spark.sql.types.Decimal(
        child.getDecimal(i, n.precision, n.scale).toJavaBigDecimal, precision, scale)
    case _ => child.getDecimal(i, precision, scale)
  }
  override def getUTF8String(i: Int): UTF8String = child.getUTF8String(i)
  override def getBinary(i: Int): Array[Byte] = child.getBinary(i)
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    child.getArray(i)
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    child.getMap(i)
  override def getChild(i: Int): org.apache.spark.sql.vectorized.ColumnVector =
    child.getChild(i)
}

/** Streaming offset = the last snapshot id the consumer has processed
  * (the watermark [[IcebergTable.tailDelta]] advances); JSON form is the
  * bare id, so a checkpoint is human-readable. */
private[iceberg] case class GraftStreamOffset(snapshotId: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = snapshotId.toString
}

/** MicroBatchStream over the real snapshot log — see
  * [[GraftScan.toMicroBatchStream]]. Planning is metadata-only per batch;
  * partitions reuse the batch reader (no delete state: an incremental
  * APPEND scan's files carry no DVs by construction — deletes target
  * already-consumed history). */
private[iceberg] class GraftMicroBatchStream(location: String, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = GraftStreamOffset(0L)

  override def latestOffset(): Offset =
    GraftStreamOffset(IcebergTable.readMetadataOpt(location)
      .map(_.currentSnapshotId).getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftStreamOffset].snapshotId
    val to = end.asInstanceOf[GraftStreamOffset].snapshotId
    if (to <= from) return Array.empty
    IcebergTable.planIncremental(location, from, to).files
      .map(f => GraftInputPartition(f.path, f.sequence, Array.empty)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required.fields.map(f => (f.name, f.dataType)),
      org.apache.spark.sql.SparkSession.active.sparkContext
        .broadcast(Array.empty[(Long, Array[Long])]))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Driver-side helper: read one INT64 column of a (small) parquet file
  * through the same Group machinery — used to load equality-delete key
  * files at planning time without spinning a Spark job inside the
  * planner. */
private[iceberg] object GraftParquetRows {
  def readLongColumn(path: String, column: String): Array[Long] = {
    val conf = new Configuration()
    val hPath = new Path("file:" + path.replaceFirst("^/{2,}", "/"))
    val schema: MessageType = {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
      try r.getFooter.getFileMetaData.getSchema finally r.close()
    }
    require(schema.containsField(column), s"$path has no column $column")
    val projection = new MessageType(schema.getName,
      schema.getType(schema.getFieldIndex(column)))
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    val reader = ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf).build()
    val idx = projection.getFieldIndex(column)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      var g = reader.read()
      while (g != null) {
        if (g.getFieldRepetitionCount(idx) > 0) out += g.getLong(idx, 0)
        g = reader.read()
      }
    } finally reader.close()
    out.toArray
  }
}

/** SQL-addressable METADATA TABLES (`SELECT * FROM <cat>.<ns>.<t>.files`
  * — the inspection surface every Iceberg user leans on): the extra path
  * segment after a table name resolves to one of the spec's metadata
  * tables, computed from the table's metadata tree alone and served as a
  * [[LocalScan]] — metadata-grain rows (KB) belong on the driver, not in
  * a task fan-out. The `files`/`entries` kinds are bounded by the same
  * driver-side planning ceiling as [[IcebergTable.planFiles]] (one row per
  * live file — the count every query's planner already materializes); a
  * deployment whose file count outgrows that would distribute the
  * manifest reads, as the real library's metadata tables do. Wall-clock timestamps are excluded; snapshot
  * "timestamps" in this layer are the deterministic id-derived ms values
  * the committers write. */
private[iceberg] object GraftMetaTables {
  val kinds: Set[String] =
    Set("files", "manifests", "snapshots", "history", "entries", "refs", "partitions")

  def df(spark: org.apache.spark.sql.SparkSession, location: String,
         kind: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val meta = IcebergTable.readMetadata(location)
    kind match {
      case "files" =>
        IcebergTable.planFiles(location).files
          .map(f => (f.path, f.partition, f.recordCount, f.loShip, f.hiShip,
            f.entrySnapshotId, f.sequence))
          .sortBy(f => (f._2, f._1))
          .toDF("file_path", "p_month", "record_count", "lo_shipdate",
            "hi_shipdate", "added_snapshot_id", "sequence_number")
      case "partitions" =>
        IcebergTable.planFiles(location).files
          .groupBy(_.partition).toSeq
          .map { case (p, fs) => (p, fs.size.toLong, fs.map(_.recordCount).sum) }
          .sortBy(_._1)
          .toDF("p_month", "n_files", "n_rows")
      case "manifests" =>
        IcebergTable.readManifestList(IcebergTable.currentSnapshot(meta).manifestList)
          .map(m => (m.path, m.addedSnapshotId, m.addedFiles.toLong, m.addedRows,
            m.partLo, m.partHi))
          .sortBy(m => (m._2, m._1))
          .toDF("manifest_path", "added_snapshot_id", "n_added_files",
            "n_added_rows", "p_month_lo", "p_month_hi")
      case "snapshots" | "history" =>
        meta.snapshots.sortBy(_.id)
          .map(s => (s.id, s.sequenceNumber, s.timestampMs, s.parentId,
            s.operation, s.id == meta.currentSnapshotId))
          .toDF("snapshot_id", "sequence_number", "timestamp_ms", "parent_id",
            "operation", "is_current")
      case "refs" =>
        meta.refs.toSeq.sortBy(_._1)
          .map { case (n, r) => (n, r.refType, r.snapshotId) }
          .toDF("name", "type", "snapshot_id")
      case "entries" =>
        val ms = IcebergTable.readManifestList(
          IcebergTable.currentSnapshot(meta).manifestList)
        IcebergTable.readManifestsParallel(ms.map(_.path)).flatten
          .map { e =>
            val k = e.content match {
              case 0 => "data"
              case 1 => if (e.referencedDataFile.isDefined) "deletion_vector"
                        else "position_deletes"
              case _ => "equality_deletes"
            }
            (k, e.path, e.partition, e.recordCount, e.sequence, e.entrySnapshotId)
          }.sortBy(e => (e._1, e._3, e._5, e._2))
          .toDF("content_type", "file_path", "p_month", "record_count",
            "sequence_number", "added_snapshot_id")
      case other => throw new IllegalArgumentException(s"no metadata table $other")
    }
  }
}

private[iceberg] class GraftMetaSqlTable(ident: String, location: String, kind: String)
    extends Table with SupportsRead {
  private lazy val df0 =
    GraftMetaTables.df(org.apache.spark.sql.SparkSession.active, location, kind)
  override def name(): String = ident
  override def schema(): StructType = df0.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          df0.queryExecution.executedPlan.executeCollect()
        override def readSchema(): StructType = df0.schema
      }
    }
}
