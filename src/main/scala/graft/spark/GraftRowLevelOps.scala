package graft.spark

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
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
      s"${table.location}/data/${java.util.UUID.randomUUID()}",
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
    val deletes = msgs.flatMap(_.deleteFiles)
    if (data.isEmpty && deletes.isEmpty) return
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

class GraftDeltaWriterFactory(
    outDir: String,
    sparkSchema: StructType,
    fieldInfos: Seq[GraftTable.FieldInfo],
    specFields: List[SpecFieldEval],
    maxRecords: Long,
    dataConf: SerializableHadoopConf,
    posDeleteConf: SerializableHadoopConf)
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(
      outDir, sparkSchema, fieldInfos, specFields, maxRecords,
      dataConf, posDeleteConf, partitionId, taskId)
}

/** Per-task delta writer: inserts reuse the fanout data writer; deletes
  * buffer (file, pos) pairs and flush as one sorted position-delete file
  * at commit; update = delete + insert. */
class GraftDeltaWriter(
    outDir: String,
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
    outDir, sparkSchema, fieldInfos, specFields, maxRecords, None,
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
        val path = f"$outDir/$partitionId%05d-$taskId-deletes.parquet"
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
