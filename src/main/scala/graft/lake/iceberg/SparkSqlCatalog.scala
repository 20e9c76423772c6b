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
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
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
  * Simplifications, stated: timestamps assume the micros physical form
  * Spark itself writes with a UTC session (the only writer of these
  * tables); positional-parquet (v2) delete files are refused with a
  * pointer at `rewrite_position_deletes` (the v3 migration this library
  * executes); schema comes from the head snapshot's first data file. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"spark.sql.catalog.$name.warehouse must point at an IcebergCatalog warehouse dir")
  }

  override def name(): String = catalogName

  private def ns1(namespace: Array[String]): String = {
    require(namespace.length == 1,
      s"graft catalog namespaces are single-level, got ${namespace.mkString(".")}")
    namespace.head
  }

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

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <snapshot-id>` — DSv2 time travel, resolved to a
    * snapshot-pinned scan exactly like the library's `planFiles(id)`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

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
    new GraftSqlTable(s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      loc, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog tables are altered by commits")

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
    else if (namespaceExists(namespace)) Array.empty // single-level: no children
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && new File(new File(warehouse), namespace.head).isDirectory

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        catalogName +: namespace.toSeq)
    java.util.Collections.singletonMap("location",
      new File(new File(warehouse), ns1(namespace)).getPath)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit =
    IcebergCatalog.createNamespace(warehouse, ns1(namespace))

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

/** Planning census of the most recent [[GraftScan]] — how the SQL front
  * door PROVES pushdown reached `planFiles` (files_scanned ≪ files_total)
  * and column pruning reached the parquet projection (cols_read ≪
  * cols_total). Driver-side, set at planInputPartitions time. */
object GraftSqlScanCensus {
  @volatile var filesTotal: Long = -1L
  @volatile var filesSelected: Long = -1L
  @volatile var manifestsTotal: Long = -1L
  @volatile var manifestsRead: Long = -1L
  @volatile var colsRead: Long = -1L
  @volatile var colsTotal: Long = -1L
}

private[iceberg] class GraftSqlTable(ident: String, location: String,
                                     snapshotId: Option[Long])
    extends Table with SupportsRead
    with SupportsWrite with SupportsDelete {

  override def name(): String = ident

  private lazy val schema0: StructType = {
    if (IcebergTable.readMetadataOpt(location).isEmpty) {
      // CREATE'd but not yet committed: the declared schema
      val pending = new File(location, "metadata/schema.pending.json")
      require(pending.exists(), s"$ident has neither committed metadata nor a pending schema")
      org.apache.spark.sql.types.DataType.fromJson(
        java.nio.file.Files.readString(pending.toPath)).asInstanceOf[StructType]
    } else {
      val plan = IcebergTable.planFiles(location, snapshotId)
      require(plan.files.nonEmpty, s"$ident has no data files")
      org.apache.spark.sql.SparkSession.active.read.parquet(plan.files.head.path).schema
    }
  }

  override def schema(): StructType = schema0

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ)

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
    val plan = IcebergTable.planFiles(location)
    if (plan.files.nonEmpty &&
        spark.read.parquet(plan.files.map(_.path): _*).filter(pred).limit(1).count() > 0)
      IcebergTable.appendDvPuffin(spark, location, pred)
  }

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(snapshotId.isEmpty, s"cannot write to a time-travel snapshot of $ident")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                                  overwrite: Boolean): Unit = {
                require(!overwrite, "INSERT OVERWRITE is not supported; " +
                  "commit a replace through the library API")
                IcebergTable.append(data.sparkSession, data, location)
              }
            }
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
  // returned residual below, so pruning only ever affects IO, not results)
  private def dayOf(v: Any): Option[String] = v match {
    case null => None
    case t: java.sql.Timestamp => Some(t.toLocalDateTime.toLocalDate.toString)
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

  override def planInputPartitions(): Array[InputPartition] = {
    // a CREATE'd table before its first commit scans empty
    if (IcebergTable.readMetadataOpt(location).isEmpty) {
      GraftSqlScanCensus.filesTotal = 0L
      GraftSqlScanCensus.filesSelected = 0L
      GraftSqlScanCensus.manifestsTotal = 0L
      GraftSqlScanCensus.manifestsRead = 0L
      GraftSqlScanCensus.colsRead = required.size.toLong
      GraftSqlScanCensus.colsTotal = tableCols.toLong
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
    val plan = IcebergTable.planFiles(location, snapshotId, None, None, dateLo, dateHi)
    val full = IcebergTable.planFiles(location, snapshotId)
    GraftSqlScanCensus.filesTotal = full.filesTotal
    GraftSqlScanCensus.filesSelected = plan.filesSelected.toLong
    GraftSqlScanCensus.manifestsTotal = plan.manifestsTotal.toLong
    GraftSqlScanCensus.manifestsRead = plan.manifestsRead.toLong
    GraftSqlScanCensus.colsRead = required.size.toLong
    GraftSqlScanCensus.colsTotal = tableCols.toLong
    val blobCache = scala.collection.mutable.Map.empty[String, Puffin.BlobMetadata => Array[Byte]]
    def blobBytes(e: IcebergTable.DataFileEntry): Array[Byte] = {
      val slice = blobCache.getOrElseUpdate(e.path, Puffin.read(new File(e.path))._2)
      slice(Puffin.BlobMetadata("deletion-vector-v1", Seq.empty, 0L, 0L,
        e.contentOffset, e.contentSize))
    }
    plan.files.map { f =>
      val mine = dvs.filter(e =>
        e.sequence >= f.sequence && norm(e.referencedDataFile.get) == norm(f.path))
      GraftInputPartition(f.path, f.sequence, mine.map(blobBytes).toArray)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fields.map(f => (f.name, f.dataType))
    new GraftReaderFactory(fields, eqDeletes)
  }
}

private[iceberg] class GraftReaderFactory(fields: Array[(String, DataType)],
                                          eqDeletes: Array[(Long, Array[Long])])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
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
    new GraftPartitionReader(p.path, fields, deleted, merged)
  }
}

/** Sequential parquet reader over one data file: real column projection
  * (the requested subset becomes the parquet read schema), DV positions
  * skipped by row ordinal while reading, equality keys filtered per row.
  * Runs in the executor; built on parquet-hadoop's example Group API
  * (already on Spark's classpath). */
private[iceberg] class GraftPartitionReader(path: String,
                                            fields: Array[(String, DataType)],
                                            deletedPos: Array[Long],
                                            eqKeys: Array[Long])
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val hPath = new Path("file:" + path.replaceFirst("^/{2,}", "/"))
  private val fileSchema: MessageType = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }
  private val eqCol = "l_orderkey"
  private val wanted: Array[String] =
    (fields.map(_._1) ++ (if (eqKeys.nonEmpty) Array(eqCol) else Array.empty[String]))
      .distinct.filter(fileSchema.containsField)
  // parquet refuses an empty projection (SELECT count(*)): read the
  // narrowest physical column instead and emit none of it
  private val readCols: Array[String] =
    if (wanted.nonEmpty) wanted else Array(fileSchema.getFields.get(0).getName)
  private val projection =
    new MessageType(fileSchema.getName,
      readCols.map(c => fileSchema.getType(fileSchema.getFieldIndex(c))): _*)
  conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf).build()

  private def extractor(name: String, dt: DataType): Group => Any = {
    if (!fileSchema.containsField(name)) return _ => null
    val idx = projection.getFieldIndex(name)
    def ifSet(f: Group => Any): Group => Any =
      g => if (g.getFieldRepetitionCount(idx) == 0) null else f(g)
    dt match {
      case LongType => ifSet(_.getLong(idx, 0))
      case IntegerType => ifSet(_.getInteger(idx, 0))
      case DoubleType => ifSet(_.getDouble(idx, 0))
      case FloatType => ifSet(_.getFloat(idx, 0))
      case BooleanType => ifSet(_.getBoolean(idx, 0))
      case StringType => ifSet(g => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes))
      case BinaryType => ifSet(_.getBinary(idx, 0).getBytes)
      case DateType => ifSet(_.getInteger(idx, 0))
      case TimestampType | TimestampNTZType =>
        val ann = projection.getType(idx).getLogicalTypeAnnotation
        val factor = ann match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => 1L
              case LogicalTypeAnnotation.TimeUnit.NANOS => -1000L // divide
              case u => throw new UnsupportedOperationException(s"timestamp unit $u")
            }
          case _ => 1L
        }
        if (factor < 0) ifSet(g => g.getLong(idx, 0) / -factor)
        else ifSet(g => g.getLong(idx, 0) * factor)
      case other =>
        throw new UnsupportedOperationException(s"column $name: unsupported type $other")
    }
  }

  private val extractors: Array[Group => Any] = fields.map { case (n, t) => extractor(n, t) }
  private val eqExtract: Group => Any =
    if (eqKeys.nonEmpty && fileSchema.containsField(eqCol)) extractor(eqCol, LongType)
    else _ => null

  private var ordinal = -1L
  private var dvIdx = 0
  private var current: Group = _

  override def next(): Boolean = {
    while (true) {
      val g = reader.read()
      if (g == null) return false
      ordinal += 1
      // DV skip: both the read and the vector walk in ordinal order
      while (dvIdx < deletedPos.length && deletedPos(dvIdx) < ordinal) dvIdx += 1
      val dvDead = dvIdx < deletedPos.length && deletedPos(dvIdx) == ordinal
      val eqDead = eqKeys.nonEmpty && (eqExtract(g) match {
        case k: java.lang.Long => java.util.Arrays.binarySearch(eqKeys, k.longValue()) >= 0
        case _ => false
      })
      if (!dvDead && !eqDead) { current = g; return true }
    }
    false
  }

  override def get(): InternalRow =
    new GenericInternalRow(extractors.map(_(current)): Array[Any])

  override def close(): Unit = reader.close()
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
    new GraftReaderFactory(required.fields.map(f => (f.name, f.dataType)), Array.empty)

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
