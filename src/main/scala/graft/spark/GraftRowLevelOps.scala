package graft.spark

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, Metadata, MetadataBuilder, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables._
import graft.tables.TableWrite.SerializableHadoopConf

/** Row-level SQL DML (UPDATE / MERGE INTO / subquery DELETE) as a
  * delta-based DSv2 operation — the SQL face of the reference's
  * EqualityDeltaWriter semantics (icelake/src/io_v2/functional_writer/
  * equality_delta_writer.rs): matched rows are removed via position
  * deletes keyed by the `_file`/`_pos` row id, new/updated rows land in
  * fresh data files, and everything commits as ONE merge-on-read
  * snapshot. Spark plans the join/matching; we only write the delta. */
class GraftRowLevelOperation(
    table: GraftTable,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(table, None, None,
      SchemaConvert.toSparkSchema(table.metadata.currentSchema))

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))

  override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(table, cmd)
    }

  override def description(): String = s"GraftRowLevelOperation($cmd, ${table.location})"
}

class GraftDeltaWrite(table: GraftTable, cmd: RowLevelOperation.Command)
    extends DeltaWrite {

  override def toBatch: DeltaBatchWrite = new GraftDeltaBatchWrite(table, cmd)

  override def description(): String = s"GraftDeltaWrite($cmd, ${table.location})"
}

case class GraftDeltaCommitMessage(
    dataFiles: Seq[IceDataFile],
    deleteFiles: Seq[IceDataFile],
    referencedDataFiles: Seq[String]) extends WriterCommitMessage

class GraftDeltaBatchWrite(table: GraftTable, cmd: RowLevelOperation.Command)
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val spark = SparkSession.active
    val metadata = table.metadata
    val schema = metadata.currentSchema
    val spec = metadata.defaultSpec
    val sparkSchema = SchemaConvert.toSparkSchema(schema)
    val ordinalOf = sparkSchema.fieldNames.zipWithIndex.toMap
    val specFields = spec.fields.map { pf =>
      val src = schema.fieldById(pf.sourceId).getOrElse(sys.error(s"no field ${pf.sourceId}"))
      SpecFieldEval(pf.name, pf.transform, ordinalOf(src.name), src.fieldType.repr)
    }
    val compression = metadata.properties
      .getOrElse("write.parquet.compression-codec", "snappy")
    val knobs = GraftBatchWrite.parquetKnobs(metadata.properties)
    val writerConf = org.apache.spark.sql.GraftBridge.parquetWriterConf(
      spark, sparkSchema, compression, knobs)
    val posDeleteSchema = StructType(Seq(
      StructField("file_path", StringType, nullable = false,
        metadata = fieldIdMeta(2147483546L)),
      StructField("pos", LongType, nullable = false,
        metadata = fieldIdMeta(2147483545L))))
    val posDeleteConf = org.apache.spark.sql.GraftBridge.parquetWriterConf(
      spark, posDeleteSchema, compression)
    new GraftDeltaWriterFactory(
      graft.tables.Locations.specFor(
        metadata, table.location, java.util.UUID.randomUUID().toString),
      sparkSchema,
      schema.fields.map(f => GraftTable.FieldInfo(f.name, f.id, f.fieldType.repr)),
      specFields,
      TableWrite.maxRecordsPerFile(metadata).getOrElse(Long.MaxValue),
      new SerializableHadoopConf(writerConf),
      new SerializableHadoopConf(posDeleteConf))
  }

  private def fieldIdMeta(id: Long): Metadata =
    new MetadataBuilder().putLong(SchemaConvert.FieldIdKey, id).build()

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val msgs = messages.toList.collect { case m: GraftDeltaCommitMessage => m }
    val data = msgs.flatMap(_.dataFiles)
    var deletes = msgs.flatMap(_.deleteFiles)
    if (data.isEmpty && deletes.isEmpty) return
    // deletion-vector tables: the per-task parquet position deletes are
    // a staging shape (one task cannot own a whole data file's vector) —
    // fold them into per-file vectors in one pass and drop the staging
    // files before the commit ever sees them
    if (table.dvEnabled && deletes.nonEmpty) {
      val posDf = spark.read.parquet(deletes.map(_.filePath): _*)
        .select(org.apache.spark.sql.functions.col("file_path"),
          org.apache.spark.sql.functions.col("pos"))
      val vectors = table.writeDeletionVectors(spark, posDf)
      val conf = table.conf
      deletes.foreach { f =>
        try {
          val p = new org.apache.hadoop.fs.Path(f.filePath)
          p.getFileSystem(conf).delete(p, false)
        } catch { case _: Throwable => }
      }
      deletes = vectors
    }
    val op = if (cmd == RowLevelOperation.Command.DELETE) "delete" else "overwrite"
    // validated against concurrent rewrites of the files our position
    // deletes point into (otherwise old rows resurrect while new ones land)
    table.commitRowDelta(op, data, deletes, msgs.flatMap(_.referencedDataFiles).toSet)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = table.conf
    messages.collect { case m: GraftDeltaCommitMessage =>
      m.dataFiles ++ m.deleteFiles
    }.flatten.foreach { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f.filePath)
        p.getFileSystem(conf).delete(p, false)
      } catch { case _: Throwable => }
    }
  }
}

/** Copy-on-write row-level SQL DML (`write.delete.mode` /
  * `write.update.mode` / `write.merge.mode` = `copy-on-write`): Spark's
  * group-based rewrite instead of the delta path. The operation's scan
  * plans the pinned snapshot MoR-aware with NO static file pruning for
  * group MEMBERSHIP (a fully-matched file statically pruned by the
  * rewrite's `NOT cond` filter would silently survive the swap), Spark
  * narrows it to matched groups at runtime via an `In(_file, …)` filter,
  * and the write rewrites those groups' rows through the normal clustered
  * data writer and commits an atomic file swap — no delete files, reads
  * stay vectorized-clean afterwards. The read-optimized half of the
  * write-mode pair; the delta path above is the write-optimized half. */
class GraftCopyOnWriteOperation(
    table: GraftTable,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** scan→commit handshake shared by every scan/write this op builds:
    * the runtime-filtered group set is what the commit must swap out */
  private[spark] val state = new CowState(table)

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCowScanBuilder(table, state,
      SchemaConvert.toSparkSchema(table.metadata.currentSchema))

  /** `_file` rides through the rewrite plan so the runtime group filter
    * has something to resolve against (Spark strips it before the write) */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new GraftCowWrite(table, state)
    }

  override def description(): String =
    s"GraftCopyOnWriteOperation($cmd, ${table.location})"
}

/** Mutable handshake between the COW scan and its commit. The snapshot is
  * pinned at first plan; `replaced` starts as every data file of that
  * snapshot (no runtime filter ⇒ full-table rewrite, e.g. an
  * unconditional UPDATE) and narrows when Spark delivers the matched
  * group set. Build-time writes happen during planning and the runtime
  * narrowing strictly before execution's reads, so plain volatiles do. */
private[spark] class CowState(table: GraftTable) {
  val snapshot: Option[IceSnapshot] = table.metadata.currentSnapshot
  val scanSeq: Long = snapshot.map(_.sequenceNumber).getOrElse(0L)
  private val allData: List[PlannedFile] = snapshot.toList
    .flatMap(table.planFiles(_)).filter(_.file.content == DataContent.Data)
  @volatile var replaced: Set[String] =
    allData.map(p => GraftTable.normPathStr(p.file.filePath)).toSet
}

class GraftCowScanBuilder(
    table: GraftTable,
    state: CowState,
    fullSchema: StructType)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var requiredSchema: StructType = fullSchema

  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    // kept for read-side pruning only (safe: a file pruned by the
    // rewrite's residual filter contributes no surviving rows); group
    // membership ignores them. All reported unhandled so Spark re-applies.
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = StructType(required.fields.map { f =>
      fullSchema.fields.find(_.name == f.name).getOrElse(f)
    })

  override def build(): Scan =
    new GraftCowScan(table, state, fullSchema, requiredSchema, pushed)
}

/** The rewrite-side scan: delegates reading to the normal snapshot scan
  * restricted to the current group set (`onlyFiles`), and records the
  * runtime-narrowed set in [[CowState]] for the commit to swap. */
class GraftCowScan(
    table: GraftTable,
    state: CowState,
    fullSchema: StructType,
    requiredSchema: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with org.apache.spark.sql.connector.read.Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  @volatile private var groups: Set[String] = state.replaced
  @volatile private var cached: Option[(Set[String], Scan)] = None

  private def inner(files: Set[String]): Scan = cached match {
    case Some((fs, s)) if fs == files => s
    case _ =>
      val b = new GraftScanBuilder(
        table, state.snapshot.map(_.snapshotId), None, fullSchema,
        onlyFiles = Some(files))
      b.pushFilters(pushed)
      b.pruneColumns(requiredSchema)
      val s = b.build()
      cached = Some((files, s))
      s
  }

  override def readSchema(): StructType = requiredSchema

  override def filterAttributes(): Array[NamedReference] =
    if (requiredSchema.fieldNames.contains("_file"))
      Array(Expressions.column("_file"))
    else Array.empty

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val paths = org.apache.spark.sql.GraftBridge.predicatesToV1(predicates).toSeq.collect {
      case org.apache.spark.sql.sources.In("_file", vs) =>
        vs.toSeq.collect { case s: String => GraftTable.normPathStr(s) }
      case org.apache.spark.sql.sources.EqualTo("_file", s: String) =>
        Seq(GraftTable.normPathStr(s))
    }
    if (paths.nonEmpty) {
      groups = groups.intersect(paths.flatten.toSet)
      state.replaced = groups
    }
  }

  override def toBatch: org.apache.spark.sql.connector.read.Batch = this

  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] =
    inner(groups).toBatch.planInputPartitions()

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    inner(groups).toBatch.createReaderFactory()

  override def description(): String =
    s"GraftCowScan(${table.location}, groups=${groups.size})"
}

/** Same clustered fanout write as a plain INSERT — only the commit
  * differs: swap the scanned groups for the rewritten files. */
class GraftCowWrite(table: GraftTable, state: CowState)
    extends GraftWrite(table, overwriteAll = false, overwriteCond = None, dynamic = false) {

  override def toBatch: BatchWrite = new GraftCowBatchWrite(table, state)

  override def description(): String = s"GraftCowWrite(${table.location})"
}

class GraftCowBatchWrite(table: GraftTable, state: CowState)
    extends GraftBatchWrite(table, overwriteAll = false, overwriteCond = None, dynamic = false) {

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toList.collect { case GraftCommitMessage(fs) => fs }.flatten
    if (files.isEmpty && state.replaced.isEmpty) return
    table.commitCopyOnWrite(SparkSession.active, state.scanSeq, state.replaced, files)
    ()
  }
}

class GraftDeltaWriterFactory(
    loc: graft.tables.LocationSpec,
    sparkSchema: StructType,
    fieldInfos: Seq[GraftTable.FieldInfo],
    specFields: List[SpecFieldEval],
    maxRecords: Long,
    dataConf: SerializableHadoopConf,
    posDeleteConf: SerializableHadoopConf)
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(
      loc, sparkSchema, fieldInfos, specFields, maxRecords,
      dataConf, posDeleteConf, partitionId, taskId)
}

/** Per-task delta writer: inserts reuse the fanout data writer; deletes
  * buffer (file, pos) pairs and flush as one sorted position-delete file
  * at commit; update = delete + insert. */
class GraftDeltaWriter(
    loc: graft.tables.LocationSpec,
    sparkSchema: StructType,
    fieldInfos: Seq[GraftTable.FieldInfo],
    specFields: List[SpecFieldEval],
    maxRecords: Long,
    dataConf: SerializableHadoopConf,
    posDeleteConf: SerializableHadoopConf,
    partitionId: Int,
    taskId: Long)
    extends DeltaWriter[InternalRow] {

  private val dataWriter = new GraftDataWriter(
    loc, sparkSchema, fieldInfos, specFields, maxRecords, None,
    dataConf, partitionId, taskId)

  private val deletes = mutable.ArrayBuffer.empty[(String, Long)]
  private val referenced = mutable.HashSet.empty[String]

  override def insert(row: InternalRow): Unit = dataWriter.write(row)

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val f = id.getUTF8String(0).toString
    deletes += ((f, id.getLong(1)))
    referenced += GraftTable.normPathStr(f)
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val dataMsg = dataWriter.commit().asInstanceOf[GraftCommitMessage]
    val deleteFiles =
      if (deletes.isEmpty) Nil
      else {
        val path = loc.path(f"$partitionId%05d-$taskId-deletes.parquet")
        val w = org.apache.spark.sql.GraftBridge.openRowWriter(
          posDeleteConf.value, path, partitionId, taskId)
        // spec order: position deletes sort by (file_path, pos)
        deletes.sortInPlaceBy(identity)
        val out = new GenericInternalRow(2)
        deletes.foreach { case (f, p) =>
          out.update(0, org.apache.spark.unsafe.types.UTF8String.fromString(f))
          out.update(1, p)
          w.write(out)
        }
        w.close()
        val infos = Seq(
          GraftTable.FieldInfo("file_path", 2147483546, "string"),
          GraftTable.FieldInfo("pos", 2147483545, "long"))
        val st = TableWrite.statsOf(path, infos, posDeleteConf.value)
        List(IceDataFile(
          content = DataContent.PositionDeletes,
          filePath = GraftTable.normPathStr(path),
          fileFormat = "parquet",
          partition = Nil,
          recordCount = st.recordCount,
          fileSizeInBytes = st.fileSize,
          columnSizes = st.columnSizes,
          valueCounts = st.valueCounts,
          nullValueCounts = st.nullCounts,
          lowerBounds = st.lowerBounds,
          upperBounds = st.upperBounds,
          splitOffsets = st.splitOffsets))
      }
    GraftDeltaCommitMessage(dataMsg.files, deleteFiles, referenced.toSeq)
  }

  override def abort(): Unit = dataWriter.abort()

  override def close(): Unit = ()
}
