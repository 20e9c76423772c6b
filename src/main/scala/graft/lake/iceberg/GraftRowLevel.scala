package graft.lake.iceberg

import java.io.File

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `UPDATE` / `MERGE INTO` / row-level `DELETE` for the graft catalog —
  * Spark's connector row-level-operation API (`SupportsRowLevelOperations`
  * → `SupportsDelta`) backed by the SAME committers the library exposes:
  * matched rows become one v3 deletion-vector wave on their old positions
  * plus month-partitioned replacement data files, committed as ONE
  * "overwrite" snapshot — exactly the history [[IcebergTable.updateMorDv]]
  * writes, so a SQL MERGE and a library update are indistinguishable to
  * any reader (the reference's update study,
  * `poc/results/column_file_dv_updates_results.json`, costs precisely this
  * DV+replacement shape).
  *
  * DELTA (merge-on-read), not group-based copy-on-write: the operation
  * declares `rowId = (_file, _pos)` — the metadata columns the vectorized
  * scan synthesizes per row — and Spark's WriteDelta plan feeds back only
  * the CHANGED rows (deletes as row coordinates, updates split into
  * delete+insert). Untouched rows in touched files are never rewritten,
  * the defining MOR property.
  *
  * Scale shape: executors write the replacement/insert rows DIRECTLY as
  * month-partitioned parquet (Spark's own `ParquetWriteSupport`, one open
  * writer per month per task — months-per-task is bounded by the writer's
  * input partitioning); delete coordinates are Roaring-SERIALIZED on the
  * executors (one blob per (task, file) — [[RoaringDv.serializeDvBlob]],
  * the same compression the library's `appendDvPuffin` path ships) so the
  * commit messages carry KB-grain compressed blobs, never raw position
  * arrays: an UPDATE touching 10⁹ rows must not ship ~8 GB of longs into
  * driver heap. The driver or-merges blobs per file (cheap union of
  * compressed bitmaps; single-task files pass through untouched) and the
  * commit is OPTIMISTIC — [[IcebergTable.commitDelta]] re-derives the
  * snapshot id and CASes the metadata version under appendOcc's retry
  * loop, so two concurrent SQL writers serialize instead of silently
  * last-writer-winning. Task retries are safe: only files named in COMMIT
  * messages enter the manifest, stray files from aborted attempts are
  * deleted at commit by directory listing (never opened — a truncated
  * kill-leftover cannot fail the commit). */
private[iceberg] class GraftRowLevelOperationBuilder(location: String,
                                                     info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(location, info.command)
}

private[iceberg] class GraftRowLevelOperation(location: String,
                                              cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graft-delta $cmd $location"

  private val table = new GraftSqlTable(s"graft-rowlevel $location", location, None)

  /** The operation's scan is the table's own scan (same pruning, same
    * delete-state resolution) — `_file`/`_pos` arrive via pruneColumns
    * like any metadata column. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    table.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDeltaWriteBuilder(location, info.schema(),
      GraftPartitioning.sourceColumnOf(table.partitioning()))

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))

  /** Updates arrive split as delete+insert — the natural encoding for a
    * DV + replacement-file commit. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true
}

private[iceberg] class GraftDeltaWriteBuilder(location: String, schema: StructType,
                                              partCol: Option[String])
    extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new GraftDeltaWrite(location, schema, partCol)
}

private[iceberg] class GraftDeltaWrite(location: String, schema: StructType,
                                       partCol: Option[String])
    extends DeltaWrite with RequiresDistributionAndOrdering {

  /** Writer fan-out control (the Iceberg `write.distribution-mode=range`
    * shape): without a required distribution the changed-row stream
    * arrives partitioned by the MERGE/UPDATE join key, so every write
    * task sees every month and opens its own tiny parquet writer per
    * month — tasks × months files per commit (measured at sf0.1: the
    * 4-arm MERGE fixture wrote 3,850 delta files in 23.5 s, ~117 ms of
    * task time per file open/close, and the commit's stats pass then
    * paid one scan task per file). Range-partitioning the (small) delta
    * stream by (_file, l_shipdate) clusters deletes per source file —
    * one Roaring blob per file, the driver's blob or-merge becomes a
    * pass-through — and inserts per month run, so data files out ≈
    * distinct months touched. AQE sizes the partition count from the
    * actual delta volume, so one task handles a small delta and a
    * 100 TB UPDATE's delta spreads over range-split tasks (sub-month
    * ranges), never one-task-per-month hash hotspots. Deletes carry a
    * NULL l_shipdate and inserts a NULL _file (ASC = NULLS FIRST), so
    * the two row kinds cluster cleanly without interleaving. The data
    * sort key is the table's PARTITION-SPEC source column
    * ([[GraftPartitioning.sourceColumnOf]] via the operation builder),
    * never a hardcoded name. */
  private def sortCols: Array[String] = partCol.filter(schema.fieldNames.contains) match {
    case Some(c) => Array("_file", c)
    case None => Array("_file", "_pos")
  }

  override def requiredDistribution(): Distribution =
    Distributions.ordered(sortCols.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)))

  override def requiredOrdering(): Array[SortOrder] =
    sortCols.map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))

  override def toBatch: DeltaBatchWrite = {
    // the data dir name is only a staging HINT fixed at write-build time
    // (manifests record full file paths, so the dir name never has to
    // match the committed snapshot id); the ACTUAL snapshot id is
    // re-derived inside commitDelta's OCC retry loop at commit time.
    val dirHint = IcebergTable.readMetadata(location)
      .snapshots.map(_.id).max + 1L
    new GraftDeltaBatchWrite(location, schema, dirHint,
      partCol.getOrElse("l_shipdate"))
  }
}

/** One task's outcome: per-file Roaring-serialized DV blobs with their
  * stats — (path, blob, cardinality, minPos, maxPos) — and the data files
  * it wrote. Compressed-blob grain is the scale contract: the driver heap
  * holds bitmap bytes, never 8·positions of raw longs. */
private[iceberg] case class GraftDeltaCommitMessage(
    deletes: Array[(String, Array[Byte], Long, Long, Long)],
    files: Array[String]) extends WriterCommitMessage

private[iceberg] class GraftDeltaBatchWrite(location: String, schema: StructType,
                                            dirHint: Long, partCol: String)
    extends DeltaBatchWrite {

  private val dataDir = s"$location/data/snap-$dirHint"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(dataDir, schema, partCol)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val msgs = messages.collect { case m: GraftDeltaCommitMessage => m }
    val dvRows = GraftDeltaBatchWrite.mergeBlobs(msgs.flatMap(_.deletes).toSeq)
    val files = msgs.flatMap(_.files).toSeq
    IcebergTable.commitDelta(spark, location, dvRows, dataDir, files)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case m: GraftDeltaCommitMessage => m }
      .flatMap(_.files).foreach(f => new File(f).delete())
  }
}

private[iceberg] object GraftDeltaBatchWrite {
  /** Or-merge per-(task, file) DV blobs into one blob per file. The
    * single-task case (the common one: row coordinates partition by file
    * under the scan's layout) passes the executor's blob through
    * untouched; only files split across tasks pay a decode–union–encode,
    * and that on compressed bitmaps, not raw arrays. */
  def mergeBlobs(chunks: Seq[(String, Array[Byte], Long, Long, Long)])
      : Seq[(String, Array[Byte], Long, Long, Long)] =
    chunks.groupBy(_._1).toSeq.map { case (f, cs) =>
      if (cs.lengthCompare(1) == 0) cs.head
      else {
        val ps = cs.toArray.flatMap(c => RoaringDv.deserializeDvBlob(c._2)).distinct.sorted
        (f, RoaringDv.serializeDvBlob(ps), ps.length.toLong, ps.head, ps.last)
      }
    }.sortBy(_._1)
}

private[iceberg] class GraftDeltaWriterFactory(dataDir: String, schema: StructType,
                                               partCol: String)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(dataDir, schema, partitionId, taskId, partCol)
}

/** V2 batch write behind DYNAMIC `INSERT OVERWRITE`: the delta writer
  * doubles as a plain DataWriter (its default `write` is `insert`), so
  * executors stream month-partitioned files and the commit replaces
  * exactly the months that received data
  * ([[IcebergTable.commitOverwriteMonths]]). */
private[iceberg] class GraftOverwriteBatchWrite(location: String, schema: StructType,
                                                dirHint: Long,
                                                partCol: String)
    extends BatchWrite {

  private val dataDir = s"$location/data/snap-$dirHint"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftDeltaWriterFactory(dataDir, schema, partCol)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case m: GraftDeltaCommitMessage => m }
      .flatMap(_.files).toSeq
    // snapshot id re-derived inside the committer's OCC retry loop —
    // dataDir is only the staging hint (see GraftDeltaWrite.toBatch)
    IcebergTable.commitOverwriteMonths(org.apache.spark.sql.SparkSession.active,
      location, dataDir, files)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case m: GraftDeltaCommitMessage => m }
      .flatMap(_.files).foreach(f => new File(f).delete())
  }
}

/** Streaming-ingest sink (`df.writeStream.toTable(<cat>.<ns>.<t>)`): one
  * APPEND snapshot per epoch through the same month-partitioned executor
  * writer every other graft write uses, committed by
  * [[IcebergTable.commitStreamAppend]] — whose snapshot summary records
  * (streaming-query, epoch-id), making a restart's replayed epoch commit a
  * NO-OP (exactly-once, the Iceberg streaming-ingest contract; the real
  * Spark sink stores its batch id in the same place). Each epoch stages
  * into its own `stream-<query>-ep<epoch>` dir, so a replay's re-written
  * files never collide with the committed ones and are dropped by the
  * dedup path. */
private[iceberg] class GraftStreamingWrite(location: String, schema: StructType,
                                           queryId: String,
                                           partCol: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private def dataDir(epochId: Long) = s"$location/data/stream-$queryId-ep$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(location, queryId, schema, partCol)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case m: GraftDeltaCommitMessage => m }
      .flatMap(_.files).toSeq
    IcebergTable.commitStreamAppend(org.apache.spark.sql.SparkSession.active,
      location, dataDir(epochId), files, queryId, epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftDeltaCommitMessage => m }
      .flatMap(_.files).foreach(f => new File(f).delete())
}

private[iceberg] class GraftStreamingWriterFactory(location: String, queryId: String,
                                                   schema: StructType,
                                                   partCol: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftDeltaWriter(s"$location/data/stream-$queryId-ep$epochId",
      schema, partitionId, taskId, partCol)
}

/** Executor-side delta writer: deletes/updates record (file, pos) row
  * coordinates; inserted rows stream into one open parquet writer per
  * month partition (hive-style `p_month=` dirs, so the committer's stats
  * collection sees the same layout every other graft writer produces). */
private[iceberg] class GraftDeltaWriter(dataDir: String, schema: StructType,
                                        partitionId: Int, taskId: Long,
                                        partCol: String)
    extends DeltaWriter[InternalRow] {

  private val deletes = mutable.Map.empty[String, mutable.ArrayBuffer[Long]]
  private val writers = mutable.Map.empty[String, (String, ParquetWriter[InternalRow])]
  // lazy: a delta DELETE's write schema carries no data columns and
  // never calls insert()
  private lazy val shipIdx = schema.fieldIndex(partCol)
  private lazy val shipDt = schema(shipIdx).dataType

  private def monthOf(row: InternalRow): String = shipDt match {
    case DateType =>
      java.time.LocalDate.ofEpochDay(row.getInt(shipIdx).toLong).toString.take(7)
    case _ => // TimestampType / TimestampNTZType: micros since epoch, UTC
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(row.getLong(shipIdx), 1000000L), 0,
        java.time.ZoneOffset.UTC).toLocalDate.toString.take(7)
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    deletes.getOrElseUpdate(id.getUTF8String(0).toString,
      mutable.ArrayBuffer.empty[Long]) += id.getLong(1)

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    // unused under representUpdateAsDeleteAndInsert, kept total
    delete(metadata, id); insert(row)
  }

  override def insert(row: InternalRow): Unit = {
    val month = monthOf(row)
    // the month rides in the directory (hive layout); l_shipdate itself
    // stays IN the file like every graft data file
    writers.getOrElseUpdate(month, {
      val dir = new File(s"$dataDir/p_month=$month"); dir.mkdirs()
      val path = new File(dir,
        f"delta-$partitionId%05d-$taskId-$month.parquet").getPath
      (path, GraftRowParquet.writer(path, schema))
    })._2.write(row)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._2.close())
    // Roaring-serialize HERE, on the executor: the commit message carries
    // one compressed blob per file this task deleted from, never the raw
    // position longs (driver-heap scale contract — see class scaladoc).
    GraftDeltaCommitMessage(
      deletes.map { case (f, ps0) =>
        val ps = ps0.toArray.sorted
        (f, RoaringDv.serializeDvBlob(ps), ps.length.toLong, ps.head, ps.last)
      }.toArray,
      writers.values.map(_._1).toArray)
  }

  override def abort(): Unit = {
    writers.values.foreach { case (p, w) =>
      try w.close() catch { case _: Exception => () }
      new File(p).delete()
    }
  }

  override def close(): Unit = ()
}

/** Executor-side parquet writing of InternalRows through Spark's own
  * `ParquetWriteSupport` — the identical record shredder every Spark
  * parquet write uses, configured the way `ParquetFileFormat.prepareWrite`
  * configures it (int64-micros timestamps — the Iceberg spec form — and
  * standard (non-legacy) logical types). */
private[iceberg] object GraftRowParquet {
  import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

  /** One fully-configured Configuration PER SCHEMA, built once per JVM and
    * shared by every writer (ParquetWriter and ParquetWriteSupport only
    * READ it): `new Configuration()` costs ~6 ms (XML resource merge) —
    * a third of a small file's entire open/write/close cost — and a
    * month-partitioned delta write opens one writer per (task, month),
    * so the per-writer conf dominated wide commits before the cache.
    *
    * INVARIANT (pinned to parquet-mr 1.x as shipped with Spark 4.1):
    * neither `ParquetWriter.Builder.build()` nor `ParquetWriteSupport.init`
    * ever calls `conf.set`/`setIfUnset` — they only read. A parquet-mr
    * upgrade that starts WRITING through the handed-in conf would turn
    * this shared instance into a cross-writer race; if that ever lands,
    * switch to `new Configuration(cached)` per writer (~1 ms copy-on-write
    * view vs 6 ms from scratch). */
  private val confCache =
    new java.util.concurrent.ConcurrentHashMap[StructType, Configuration]()

  private def confFor(schema: StructType): Configuration =
    confCache.computeIfAbsent(schema, s => {
      val conf = new Configuration()
      ParquetWriteSupport.setSchema(s, conf)
      // the keys prepareWrite sets before handing the support to a task —
      // `init` reads them with .toBoolean (no defaults), so all must be set
      conf.set("spark.sql.parquet.writeLegacyFormat", "false")
      conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
      conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
      conf
    })

  def writer(path: String, schema: StructType): ParquetWriter[InternalRow] = {
    val conf = confFor(schema)
    class B(p: Path) extends ParquetWriter.Builder[InternalRow, B](p) {
      override def self(): B = this
      override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
        new ParquetWriteSupport()
    }
    new B(new Path("file:" + path)).withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }
}

/** The `_file`/`_pos` metadata columns ([[SupportsMetadataColumns]]) —
  * the row coordinates the vectorized reader synthesizes, and the rowId
  * the delta operation keys its deletes on (Iceberg's own Spark
  * integration exposes the same pair). */
private[iceberg] object GraftMetaColumns {
  val columns: Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "data file path of the row"
    },
    new MetadataColumn {
      override def name(): String = "_pos"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row position in its data file"
    })
}

/** Single source of truth for the catalog's declared partition transform —
  * every write path derives its distribution/sort keys and its writer's
  * partition-value column FROM this spec instead of sniffing a hardcoded
  * column name (a table whose partition source were renamed, or an
  * unrelated column that happened to be called `l_shipdate`, would
  * otherwise silently get the wrong write shape). */
private[iceberg] object GraftPartitioning {
  import org.apache.spark.sql.connector.expressions.Transform

  /** The catalog's partition spec: month(l_shipdate), matching the
    * metadata files' p_month spec. */
  def monthTransform: Transform = Expressions.months("l_shipdate")

  /** The source column of the first partition transform, if any — the
    * column write distributions cluster/sort on and the delta writer
    * derives partition values from. */
  def sourceColumnOf(partitioning: Array[Transform]): Option[String] =
    partitioning.headOption.flatMap(_.references.headOption)
      .map(_.fieldNames.mkString("."))
}

/** The Iceberg `month` transform as a Spark V2 scalar function — what the
  * catalog's FunctionCatalog serves so that a write's required CLUSTERED
  * distribution can say `months(<part col>)` and Spark's
  * DistributionAndOrderingUtils can resolve and evaluate it when inserting
  * the pre-write shuffle (Iceberg's own Spark integration ships the same
  * function for the same reason). Value = months since 1970-01 of the UTC
  * calendar date: (year − 1970) · 12 + (month − 1). */
private[iceberg] object GraftMonthsFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}

  override def name(): String = "months"
  override def description(): String =
    "months(ts): months since 1970-01 (the Iceberg month partition transform)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1, s"months takes one argument, got $inputType")
    inputType.fields(0).dataType match {
      case dt @ (TimestampType | TimestampNTZType | DateType) => MonthsBound(dt)
      case t => throw new UnsupportedOperationException(s"months: unsupported input type $t")
    }
  }

  private case class MonthsBound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "months"
    override def canonicalName(): String = "graft.months"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0)) null
      else {
        val d = dt match {
          case DateType => java.time.LocalDate.ofEpochDay(input.getInt(0).toLong)
          case _ => // timestamp micros since epoch, UTC calendar
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(input.getLong(0), 1000000L), 0,
              java.time.ZoneOffset.UTC).toLocalDate
        }
        Integer.valueOf((d.getYear - 1970) * 12 + (d.getMonthValue - 1))
      }
  }
}
