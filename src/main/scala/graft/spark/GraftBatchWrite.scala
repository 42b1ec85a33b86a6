package graft.spark

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => VSortOrder}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TransformUtil
import graft.tables._
import graft.tables.TableWrite.SerializableHadoopConf

/** Row-level partition-transform evaluation for the native write path —
  * the same semantics as the Catalyst expressions in
  * [[TableWrite.transformColumn]], applied to catalyst-typed values
  * (UTF8String / epoch-day Int / micros Long), producing the boxed tuple
  * values the manifests store (the reference's PartitionSplitter role,
  * icelake/src/types/partition_splitter.rs:89-243). */
object TransformEval {
  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  /** spark-side accessor type for an iceberg-typed column */
  def sparkTypeOf(t: IceType): DataType = SchemaConvert.toSparkType(t)

  def eval(transform: String, t: IceType, v: Any): Any = {
    if (v == null) return null
    transform match {
      case "identity" => box(t, v)
      case "void" => null
      case "year" | "month" | "day" | "hour" =>
        val micros: Long = t match {
          case IcePrim("date") => v.asInstanceOf[Int].toLong * 86400000000L
          // v3 ns timestamps carry nanos in their long: floorDiv to micros
          // (1000 divides every temporal unit width, so the floor is exact)
          case IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") =>
            Math.floorDiv(v.asInstanceOf[Long], 1000L)
          case _ => v.asInstanceOf[Long] // timestamp/timestamptz micros
        }
        val days = Math.floorDiv(micros, 86400000000L)
        transform match {
          case "day" => days.toInt
          case "hour" => Math.floorDiv(micros, 3600000000L).toInt
          case "year" =>
            java.time.LocalDate.ofEpochDay(days).getYear - 1970
          case "month" =>
            val d = java.time.LocalDate.ofEpochDay(days)
            (d.getYear - 1970) * 12 + d.getMonthValue - 1
        }
      case BucketRe(n) =>
        val nb = n.toInt
        t match {
          case IcePrim("int") | IcePrim("date") => TransformUtil.bucketInt(v.asInstanceOf[Int], nb)
          case IcePrim("long") | IcePrim("time") | IcePrim("timestamp") | IcePrim("timestamptz") |
          IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") =>
            TransformUtil.bucketLong(v.asInstanceOf[Long], nb)
          case IcePrim("uuid") => TransformUtil.bucketUuid(v.asInstanceOf[UTF8String], nb)
          case IcePrim("string") => TransformUtil.bucketString(v.asInstanceOf[UTF8String], nb)
          case IcePrim("binary") | IceFixed(_) =>
            TransformUtil.bucketBytes(v.asInstanceOf[Array[Byte]], nb)
          case _: IceDecimal =>
            TransformUtil.bucketDecimal(v.asInstanceOf[org.apache.spark.sql.types.Decimal], nb)
          case other => sys.error(s"bucket: unsupported type $other")
        }
      case TruncRe(w) =>
        val ww = w.toInt
        t match {
          case IcePrim("int") => TransformUtil.truncateInt(v.asInstanceOf[Int], ww)
          case IcePrim("long") => TransformUtil.truncateLong(v.asInstanceOf[Long], ww.toLong)
          case IcePrim("string") =>
            TransformUtil.truncateString(v.asInstanceOf[UTF8String], ww).toString
          case _: IceDecimal =>
            TransformUtil.truncateDecimal(
              v.asInstanceOf[org.apache.spark.sql.types.Decimal], ww).toJavaBigDecimal
          case other => sys.error(s"truncate: unsupported type $other")
        }
      case other => sys.error(s"unknown transform: $other")
    }
  }

  /** catalyst value -> the boxed form manifests store for identity tuples */
  private def box(t: IceType, v: Any): Any = v match {
    case u: UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case other => other
  }
}

/** serializable description of one partition-spec field for the writers */
case class SpecFieldEval(name: String, transform: String, srcOrdinal: Int, srcTypeRepr: String)

case class GraftCommitMessage(files: Seq[IceDataFile]) extends WriterCommitMessage

/** Native DSv2 write: clustered by the partition transforms (declared via
  * `RequiresDistributionAndOrdering`, so Catalyst plans the shuffle),
  * fanout InternalRow parquet writers per task with record-based rolling,
  * executor-side footer stats, and a driver-side snapshot commit — the
  * reference's writer-stack-plus-Transaction split
  * (icelake/src/transaction.rs:37-104) without the V1 bridge. */
class GraftWrite(
    table: GraftTable,
    overwriteAll: Boolean,
    overwriteCond: Option[Column],
    dynamic: Boolean,
    writeBranch: Option[String] = None)
    extends Write with RequiresDistributionAndOrdering {

  private val metadata = table.metadata
  private val schema = metadata.currentSchema
  private val spec = metadata.defaultSpec

  /** any temporal transform over a ns LongType carrier? Spark's V2
    * years/months/days/hours reject a long input, so these specs cannot
    * express their clustering as a transform expression */
  private def hasNsTemporal: Boolean = spec.fields.exists { pf =>
    Set("year", "month", "day", "hour").contains(pf.transform) &&
      schema.fieldById(pf.sourceId).exists(f =>
        f.fieldType == IcePrim("timestamp_ns") || f.fieldType == IcePrim("timestamptz_ns"))
  }

  private def transformExprs: Array[org.apache.spark.sql.connector.expressions.Expression] =
    spec.fields.map { pf =>
      val src = schema.fieldById(pf.sourceId).map(_.name).getOrElse(pf.name)
      val nsSource = schema.fieldById(pf.sourceId).exists(f =>
        f.fieldType == IcePrim("timestamp_ns") || f.fieldType == IcePrim("timestamptz_ns"))
      pf.transform match {
        // Spark's temporal V2 transforms reject the ns LongType carrier:
        // fall back to the raw value (requiredDistribution switches to a
        // RANGE distribution for these specs — hash-clustering on a
        // near-unique nanos value would scatter each day across every
        // task and fan out day-count x task-count small files)
        case "year" | "month" | "day" | "hour" if nsSource =>
          Expressions.identity(src)
        case "identity" => Expressions.identity(src)
        case "year" => Expressions.years(src)
        case "month" => Expressions.months(src)
        case "day" => Expressions.days(src)
        case "hour" => Expressions.hours(src)
        case t if t.startsWith("bucket") =>
          Expressions.bucket(t.stripPrefix("bucket[").stripSuffix("]").toInt, src)
        case _ => Expressions.identity(src)
      }
    }.toArray[org.apache.spark.sql.connector.expressions.Expression]

  /** `write.distribution-mode` on the DSv2 path: Spark plans the shuffle
    * the mode asks for — hash-clustered (default, fewest files), ordered
    * (range: clustered AND globally ordered; splits skewed partitions),
    * or unspecified (none: zero shuffle, locally-fanned-out files) */
  override def requiredDistribution(): Distribution =
    if (spec.isUnpartitioned) Distributions.unspecified()
    else TableWrite.distributionMode(metadata.properties) match {
      case "none" => Distributions.unspecified()
      case "range" => Distributions.ordered(
        transformExprs.map(org.apache.spark.sql.GraftBridge.sortOrderFor))
      // ns-temporal specs express their cluster key as the raw nanos
      // value: range-distribute so each day lands contiguous in one
      // task (plus boundaries) — hash on near-unique nanos would write
      // day-count x task-count files
      case _ if hasNsTemporal => Distributions.ordered(
        transformExprs.map(org.apache.spark.sql.GraftBridge.sortOrderFor))
      case _ => Distributions.clustered(transformExprs)
    }

  override def requiredNumPartitions(): Int = 0 // let Spark/AQE choose

  override def requiredOrdering(): Array[VSortOrder] = {
    val declared = metadata.sortOrders
      .find(o => o.orderId == metadata.defaultSortOrderId && o.fields.nonEmpty)
    declared.toSeq.flatMap(_.fields).flatMap { sf =>
      schema.fieldById(sf.sourceId).map { f =>
        org.apache.spark.sql.GraftBridge.sortOrder(
          f.name, descending = sf.direction == "desc",
          nullsLast = sf.nullOrder == "nulls-last")
      }
    }.toArray
  }

  override def toBatch: BatchWrite = new GraftBatchWrite(
    table, overwriteAll, overwriteCond, dynamic, writeBranch)

  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new RowsWrittenMetric)

  override def description(): String = s"GraftWrite(${table.location})"
}

object GraftBatchWrite {
  /** the reference's ParquetWriterConfig knobs (icelake/src/config.rs:59-71)
    * as hadoop conf entries — shared by batch and delta writes */
  def parquetKnobs(props: Map[String, String]): Map[String, String] =
    props.get("write.parquet.row-group-size-bytes").map("parquet.block.size" -> _).toMap ++
      props.get("write.parquet.page-size-bytes").map("parquet.page.size" -> _).toMap ++
      props.get("write.parquet.bloom-filter-enabled.columns").toSeq.flatMap(
        _.split(',').map(_.trim).filter(_.nonEmpty)
          .map(c => s"parquet.bloom.filter.enabled#$c" -> "true"))
}

class GraftBatchWrite(
    table: GraftTable,
    overwriteAll: Boolean,
    overwriteCond: Option[Column],
    dynamic: Boolean,
    writeBranch: Option[String] = None)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
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
    val props = metadata.properties
    val maxRecords = TableWrite.maxRecordsPerFile(metadata).getOrElse(Long.MaxValue)
    val fmt = TableWrite.dataFormat(metadata)
    val orcNative = fmt == "orc" && graft.tables.OrcDataIO.canWrite(schema.visibleFields)
    val writerConf = fmt match {
      case "orc" if orcNative =>
        // id-stamped orc-core writes only need the session conf
        org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)
      case "orc" =>
        // legacy Spark ORC writer (schemas OrcSerializer can't map):
        // OrcFileFormat.prepareWrite sets the schema/compression keys the
        // ORC OutputWriter reads back from the conf
        org.apache.spark.sql.GraftBridge.orcWriterFactory(
          spark, sparkSchema,
          props.get("write.orc.compression-codec").map("compression" -> _).toMap)._2
      case "avro" => org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)
      case _ =>
        val compression = props.getOrElse("write.parquet.compression-codec", "snappy")
        org.apache.spark.sql.GraftBridge.parquetWriterConf(
          spark, sparkSchema, compression, GraftBatchWrite.parquetKnobs(props))
    }
    val orcFactory = fmt match {
      case "orc" if !orcNative =>
        org.apache.spark.sql.GraftBridge.orcWriterFactory(
          spark, sparkSchema,
          props.get("write.orc.compression-codec").map("compression" -> _).toMap)._1
      case _ => null
    }
    val sortOrderId = metadata.sortOrders
      .find(o => o.orderId == metadata.defaultSortOrderId && o.fields.nonEmpty)
      .map(_.orderId)
    new GraftDataWriterFactory(
      graft.tables.Locations.specFor(
        metadata, table.location, java.util.UUID.randomUUID().toString),
      sparkSchema,
      schema.visibleFields.map(f => GraftTable.FieldInfo(f.name, f.id, f.fieldType.repr)),
      specFields,
      maxRecords,
      sortOrderId,
      new SerializableHadoopConf(writerConf),
      fmt,
      orcFactory,
      schema.visibleFields,
      props.getOrElse(
        if (fmt == "orc") "write.orc.compression-codec"
        else "write.avro.compression-codec", "snappy"),
      graft.tables.MetricsConfig.fromProperties(props, schema))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val files = messages.toList.collect {
      case GraftCommitMessage(fs) => fs
    }.flatten
    if (dynamic) {
      table.overwriteDynamicFiles(spark, files)
      ()
    } else overwriteCond match {
      case Some(cond) =>
        // filtered overwrite: position-delete the matching rows and add
        // the new files in the SAME snapshot (validated like all
        // position-delete commits)
        table.overwriteWhereFiles(spark, cond, files)
      case None =>
        // write-audit-publish staging: with the session property
        // `spark.wap.branch` set, plain SQL INSERTs commit to that branch
        // — main stays untouched until a fast_forward publishes it (the
        // Iceberg session-property convention). Row-level ops (MERGE /
        // DELETE / filtered overwrite) intentionally don't stage: their
        // delete files reference main's current files.
        val wap = writeBranch.orElse(
          spark.conf.getOption("spark.wap.branch").map(_.trim).filter(_.nonEmpty))
        if (overwriteAll)
          table.commit(spark, "overwrite", files, Nil, replace = true, branch = wap)
        else
          table.commit(spark, "append", files, Nil, replace = false, branch = wap)
    }
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = table.conf
    messages.collect { case GraftCommitMessage(fs) => fs }.flatten.foreach { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f.filePath)
        p.getFileSystem(conf).delete(p, false)
      } catch { case _: Throwable => }
    }
  }
}

class GraftDataWriterFactory(
    loc: graft.tables.LocationSpec,
    sparkSchema: StructType,
    fieldInfos: Seq[GraftTable.FieldInfo],
    specFields: List[SpecFieldEval],
    maxRecords: Long,
    sortOrderId: Option[Int],
    conf: SerializableHadoopConf,
    format: String = "parquet",
    orcFactory: org.apache.spark.sql.execution.datasources.OutputWriterFactory = null,
    iceFields: Seq[graft.tables.IceField] = Nil,
    avroCodec: String = "snappy",
    metrics: graft.tables.MetricsConfig = graft.tables.MetricsConfig.default)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(
      loc, sparkSchema, fieldInfos, specFields, maxRecords, sortOrderId,
      conf, partitionId, taskId, format, orcFactory, iceFields, avroCodec, metrics)
}

/** Fanout writer: one open data file per partition tuple (input is
  * clustered by the transforms, so open-file count per task stays small),
  * rolling at `maxRecords`. Close harvests footer stats in-place
  * (parquet/orc) or takes the inline-accumulated stats (avro). */
class GraftDataWriter(
    loc: graft.tables.LocationSpec,
    sparkSchema: StructType,
    fieldInfos: Seq[GraftTable.FieldInfo],
    specFields: List[SpecFieldEval],
    maxRecords: Long,
    sortOrderId: Option[Int],
    conf: SerializableHadoopConf,
    partitionId: Int,
    taskId: Long,
    format: String = "parquet",
    orcFactory: org.apache.spark.sql.execution.datasources.OutputWriterFactory = null,
    iceFields: Seq[graft.tables.IceField] = Nil,
    avroCodec: String = "snappy",
    metrics: graft.tables.MetricsConfig = graft.tables.MetricsConfig.default)
    extends DataWriter[InternalRow] {

  /** one open file of the configured format */
  private trait Sink {
    def path: String
    def write(row: InternalRow): Unit
    /** inline stats (avro); None -> harvest from the file tail on commit */
    def close(): Option[TableWrite.FileStats]
  }

  private class OutputWriterSink(
      w: org.apache.spark.sql.execution.datasources.OutputWriter,
      val path: String) extends Sink {
    def write(row: InternalRow): Unit = w.write(row)
    def close(): Option[TableWrite.FileStats] = { w.close(); None }
  }

  private class AvroSink(w: graft.tables.AvroDataIO.RowWriter) extends Sink {
    def path: String = w.path
    def write(row: InternalRow): Unit = w.write(row)
    def close(): Option[TableWrite.FileStats] = Some(w.close())
  }

  private class RowFileSink(w: TableWrite.RowFileWriter) extends Sink {
    def path: String = w.path
    def write(row: InternalRow): Unit = w.write(row)
    def close(): Option[TableWrite.FileStats] = Some(w.close())
  }

  private case class Open(
      writer: Sink, path: String, var records: Long,
      nanCounts: Array[Long])

  private val srcTypes: Array[IceType] =
    specFields.map(sf => MetadataJson.parseType(org.json4s.JString(sf.srcTypeRepr))).toArray
  private val srcDataTypes: Array[DataType] = srcTypes.map(TransformEval.sparkTypeOf)

  /** inline NaN counting for float/double columns: parquet/orc footers
    * don't expose NaN counts, but strict metadata deletes and
    * `readable_metrics` need them RECORDED (explicit zero included) —
    * one branch per float/double cell, no second read pass.
    * (ordinal, field id, isFloat) per tracked column. */
  private val nanTracked: Array[(Int, Int, Boolean)] =
    sparkSchema.fields.zipWithIndex.flatMap { case (f, ord) =>
      fieldInfos.find(_.name == f.name).collect {
        case fi if (f.dataType == FloatType || f.dataType == DoubleType) &&
            metrics.keepCounts(fi.id) =>
          (ord, fi.id, f.dataType == FloatType)
      }
    }.toArray

  private val open = mutable.HashMap.empty[Seq[Option[Any]], Open]
  private val done = mutable.ListBuffer
    .empty[(String, Seq[Option[Any]], Option[TableWrite.FileStats], Map[Int, Long])]

  private def nanMapOf(o: Open): Map[Int, Long] =
    nanTracked.iterator.zipWithIndex.map { case ((_, fid, _), i) =>
      fid -> o.nanCounts(i)
    }.toMap
  private var fileCount = 0
  private var rowsWritten = 0L

  private def partitionOf(row: InternalRow): Seq[Option[Any]] =
    specFields.zipWithIndex.map { case (sf, i) =>
      val raw =
        if (row.isNullAt(sf.srcOrdinal)) null
        else row.get(sf.srcOrdinal, srcDataTypes(i))
      Option(TransformEval.eval(sf.transform, srcTypes(i), raw))
    }

  private def newFile(partition: Seq[Option[Any]]): Open = {
    val path = loc.path(f"$partitionId%05d-$taskId-$fileCount%05d.$format")
    fileCount += 1
    val sink: Sink = format match {
      case "orc" if orcFactory == null =>
        // id-stamped orc-core writer (inline stats incl. NaN counts)
        new RowFileSink(new graft.tables.OrcDataIO.RowWriter(
          conf.value, path, iceFields, sparkSchema, avroCodec, metrics))
      case "orc" =>
        new OutputWriterSink(
          org.apache.spark.sql.GraftBridge.newFormatWriter(
            orcFactory, conf.value, path, sparkSchema, partitionId, taskId), path)
      case "avro" =>
        new AvroSink(new graft.tables.AvroDataIO.RowWriter(
          conf.value, path, iceFields,
          Array.tabulate(iceFields.size)(identity), avroCodec, metrics))
      case _ =>
        new OutputWriterSink(
          org.apache.spark.sql.GraftBridge.openRowWriter(
            conf.value, path, partitionId, taskId), path)
    }
    Open(sink, path, 0L, new Array[Long](nanTracked.length))
  }

  override def write(row: InternalRow): Unit = {
    val partition = partitionOf(row)
    var o = open.getOrElseUpdate(partition, newFile(partition))
    if (o.records >= maxRecords) {
      done += ((o.path, partition, o.writer.close(), nanMapOf(o)))
      o = newFile(partition)
      open(partition) = o
    }
    var i = 0
    while (i < nanTracked.length) {
      val (ord, _, isF) = nanTracked(i)
      if (!row.isNullAt(ord) &&
          (if (isF) java.lang.Float.isNaN(row.getFloat(ord))
           else java.lang.Double.isNaN(row.getDouble(ord))))
        o.nanCounts(i) += 1
      i += 1
    }
    o.writer.write(row)
    o.records += 1
    rowsWritten += 1
  }

  override def commit(): WriterCommitMessage = {
    open.foreach { case (partition, o) =>
      val inline = o.writer.close()
      if (o.records > 0) done += ((o.path, partition, inline, nanMapOf(o)))
      else try {
        val p = new org.apache.hadoop.fs.Path(o.path)
        p.getFileSystem(conf.value).delete(p, false)
      } catch { case _: Throwable => }
    }
    open.clear()
    val files = done.toList.map { case (path, partition, inline, nanMap) =>
      // avro/orc RowFileSinks already count NaNs inline; the footer-harvest
      // formats take the writer-side counts collected above
      val st0 = inline.getOrElse(format match {
        case "orc" => graft.tables.OrcDataIO.statsOf(path, fieldInfos, conf.value, metrics)
        case _ => TableWrite.statsOf(path, fieldInfos, conf.value, metrics)
      })
      val st = if (inline.isEmpty && nanMap.nonEmpty) st0.copy(nanCounts = nanMap) else st0
      IceDataFile(
        content = DataContent.Data,
        filePath = GraftTable.normPathStr(path),
        fileFormat = format,
        partition = partition,
        recordCount = st.recordCount,
        fileSizeInBytes = st.fileSize,
        columnSizes = st.columnSizes,
        valueCounts = st.valueCounts,
        nullValueCounts = st.nullCounts,
        nanValueCounts = st.nanCounts,
        lowerBounds = st.lowerBounds,
        upperBounds = st.upperBounds,
        splitOffsets = st.splitOffsets,
        sortOrderId = sortOrderId)
    }
    GraftCommitMessage(files)
  }

  override def abort(): Unit = {
    open.values.foreach(o => try { o.writer.close(); () } catch { case _: Throwable => })
    (open.values.map(_.path) ++ done.map(_._1)).foreach { path =>
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(conf.value).delete(p, false)
      } catch { case _: Throwable => }
    }
    open.clear()
  }

  override def close(): Unit = ()

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(GraftTaskMetric("graftRowsWritten", rowsWritten))
}
