package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables._

/** Inspection ("metadata") tables over a graft table, addressable in SQL as
  * an extra identifier segment — the Iceberg idiom surfaced relationally:
  *
  *   SELECT * FROM graft.db.t.snapshots;     -- commit log + summaries
  *   SELECT * FROM graft.db.t.history;       -- made_current_at lineage
  *   SELECT * FROM graft.db.t.refs;          -- branches / tags
  *   SELECT * FROM graft.db.t.manifests;     -- current-snapshot manifest list
  *   SELECT * FROM graft.db.t.files;         -- live data+delete files w/ stats
  *   SELECT * FROM graft.db.t.partitions;    -- per-partition rollup
  *
  * The reference keeps all of this in memory behind accessors
  * (icelake/src/types/in_memory.rs: `Table::current_data_files`, snapshot
  * and ref structs) with no query surface; here each view is a DSv2 table.
  *
  * Scale design: `snapshots`/`history`/`refs`/`manifests` are O(commits)
  * rows and come straight from table metadata on the driver (a
  * [[org.apache.spark.sql.connector.read.LocalScan]] — no files opened,
  * plans as LocalTableScan). `files` is O(data files) at 100 TB — millions
  * of rows — so it reads DISTRIBUTED: one input partition per manifest,
  * executors parse the Avro and emit file rows; aggregations over it
  * (`partitions` included) are ordinary Spark shuffles, never a
  * driver-side materialization. */
object GraftMetadataTables {

  val Kinds: Set[String] =
    Set("snapshots", "history", "refs", "manifests", "files", "partitions",
      "entries", "metadata_log_entries",
      // content-filtered slices of `files` (Iceberg's split views)
      "data_files", "delete_files", "all_data_files", "all_delete_files",
      // union across ALL valid snapshots (Iceberg's all_* views); like
      // Iceberg they may contain duplicates when snapshots share files
      "all_files", "all_entries", "all_manifests",
      // row-level view of the live position-delete set (parquet delete
      // files AND deletion-vector blobs), one task per delete file
      "position_deletes")

  // ---------- schemas ----------

  private val summaryType = MapType(StringType, StringType, valueContainsNull = false)
  private val longMapType = MapType(IntegerType, LongType, valueContainsNull = false)
  private val binMapType = MapType(IntegerType, BinaryType, valueContainsNull = false)

  val snapshotsSchema: StructType = StructType(Seq(
    StructField("committed_at", TimestampType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = true),
    StructField("sequence_number", LongType, nullable = false),
    StructField("operation", StringType, nullable = true),
    StructField("manifest_list", StringType, nullable = false),
    StructField("summary", summaryType, nullable = false)))

  val metadataLogSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("is_current", BooleanType, nullable = false)))

  val historySchema: StructType = StructType(Seq(
    StructField("made_current_at", TimestampType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = true),
    StructField("is_current_ancestor", BooleanType, nullable = false)))

  val refsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("max_reference_age_in_ms", LongType, nullable = true),
    StructField("min_snapshots_to_keep", IntegerType, nullable = true),
    StructField("max_snapshot_age_in_ms", LongType, nullable = true)))

  val manifestsSchema: StructType = StructType(Seq(
    StructField("content", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("partition_spec_id", IntegerType, nullable = false),
    StructField("added_snapshot_id", LongType, nullable = false),
    StructField("added_data_files_count", IntegerType, nullable = false),
    StructField("existing_data_files_count", IntegerType, nullable = false),
    StructField("deleted_data_files_count", IntegerType, nullable = false),
    StructField("added_rows_count", LongType, nullable = false),
    StructField("existing_rows_count", LongType, nullable = false),
    StructField("deleted_rows_count", LongType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("min_sequence_number", LongType, nullable = false)))

  /** partition tuple struct aligned to the DEFAULT spec; files written
    * under older specs null-fill fields the current spec added */
  def partitionStruct(meta: TableMetadata): StructType = StructType(
    meta.defaultSpec.fields.map { pf =>
      // same fallback chain as resultTypesOf: a partition source column
      // dropped from the current schema must still resolve to its REAL
      // type or the declared Spark type disagrees with produced values
      val src = meta.currentSchema.fieldById(pf.sourceId)
        .orElse(meta.schemas.flatMap(_.fieldById(pf.sourceId)).headOption)
        .map(_.fieldType).getOrElse(IcePrim("string"))
      StructField(pf.name,
        SchemaConvert.toSparkType(SchemaConvert.transformResultType(pf.transform, src)),
        nullable = true)
    })

  /** columns whose per-file stats surface in `readable_metrics`: the
    * top-level primitive fields of the CURRENT schema — the granularity
    * the stats harvest records (nested/variant/unknown carry no bounds) */
  def metricsFields(meta: TableMetadata): List[IceField] =
    meta.currentSchema.fields.filter(f => f.fieldType match {
      case IcePrim("variant") | IcePrim("unknown") => false
      case _: IcePrim | _: IceDecimal | _: IceFixed => true
      case _ => false
    })

  /** Iceberg's `files.readable_metrics`: per-column stats decoded from
    * their single-value binary into the column's own Spark type — the
    * human-readable face of lower/upper_bounds + the count maps. */
  def readableMetricsStruct(meta: TableMetadata): StructType = StructType(
    metricsFields(meta).map { f =>
      StructField(f.name, StructType(Seq(
        StructField("column_size", LongType, nullable = true),
        StructField("value_count", LongType, nullable = true),
        StructField("null_value_count", LongType, nullable = true),
        StructField("nan_value_count", LongType, nullable = true),
        StructField("lower_bound", SchemaConvert.toSparkType(f.fieldType), nullable = true),
        StructField("upper_bound", SchemaConvert.toSparkType(f.fieldType), nullable = true))),
        nullable = true)
    })

  def filesSchema(meta: TableMetadata): StructType = StructType(Seq(
    StructField("content", IntegerType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("file_format", StringType, nullable = false),
    StructField("spec_id", IntegerType, nullable = false),
    StructField("partition", partitionStruct(meta), nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_size_in_bytes", LongType, nullable = false),
    StructField("value_counts", longMapType, nullable = false),
    StructField("null_value_counts", longMapType, nullable = false),
    StructField("nan_value_counts", longMapType, nullable = false),
    StructField("lower_bounds", binMapType, nullable = false),
    StructField("upper_bounds", binMapType, nullable = false),
    StructField("split_offsets", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("equality_ids", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("sort_order_id", IntegerType, nullable = true),
    StructField("data_sequence_number", LongType, nullable = false),
    StructField("readable_metrics", readableMetricsStruct(meta), nullable = false)))

  /** `entries`: manifest-entry level — every entry INCLUDING deleted ones
    * (liveness debugging / snapshot forensics), with its bookkeeping */
  def entriesSchema(meta: TableMetadata): StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = true),
    StructField("data_sequence_number", LongType, nullable = false),
    StructField("file_sequence_number", LongType, nullable = true),
    StructField("content", IntegerType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("partition", partitionStruct(meta), nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_size_in_bytes", LongType, nullable = false)))

  def partitionsSchema(meta: TableMetadata): StructType = StructType(Seq(
    StructField("partition", partitionStruct(meta), nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_count", LongType, nullable = false),
    StructField("total_size_in_bytes", LongType, nullable = false)))

  /** Iceberg's `position_deletes` metadata table shape (minus the
    * optional deleted-`row` struct): which positions of which data files
    * are deleted, and by which delete file/vector. */
  val positionDeletesSchema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("delete_file_path", StringType, nullable = false),
    StructField("data_sequence_number", LongType, nullable = false),
    StructField("spec_id", IntegerType, nullable = false)))

  def schemaOf(kind: String, meta: TableMetadata): StructType = kind match {
    case "snapshots" => snapshotsSchema
    case "history" => historySchema
    case "refs" => refsSchema
    case "manifests" => manifestsSchema
    case "all_manifests" => allManifestsSchema
    case "files" | "all_files" | "data_files" | "delete_files" |
        "all_data_files" | "all_delete_files" =>
      filesSchema(meta)
    case "partitions" => partitionsSchema(meta)
    case "entries" | "all_entries" => entriesSchema(meta)
    case "metadata_log_entries" => metadataLogSchema
    case "position_deletes" => positionDeletesSchema
  }

  /** all_manifests = manifests of every valid snapshot, each row tagged
    * with the snapshot that references it */
  val allManifestsSchema: StructType = StructType(
    manifestsSchema.fields :+
      StructField("reference_snapshot_id", LongType, nullable = false))

  // ---------- row building (external Row values; converted per-schema) ----------

  private def ts(ms: Long): java.time.Instant = java.time.Instant.ofEpochMilli(ms)

  def snapshotRows(meta: TableMetadata): Seq[Seq[Any]] =
    meta.snapshots.sortBy(_.timestampMs).map { s =>
      Seq(ts(s.timestampMs), s.snapshotId, s.parentSnapshotId.orNull,
        s.sequenceNumber, s.summary.getOrElse("operation", null),
        s.manifestList, s.summary)
    }

  def historyRows(meta: TableMetadata): Seq[Seq[Any]] = {
    // ancestors of the current snapshot, by parent pointers
    val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
    val ancestors = Iterator.iterate(meta.currentSnapshot)(
        _.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSet
    meta.snapshotLog.map { e =>
      val id = e.ref.toLong
      Seq(ts(e.timestampMs), id, byId.get(id).flatMap(_.parentSnapshotId).orNull,
        ancestors.contains(id))
    }
  }

  /** past metadata files (the Iceberg metadata-log) + the current one */
  def metadataLogRows(table: GraftTable): Seq[Seq[Any]] = {
    val meta = table.metadata
    val past = meta.metadataLog.map(e =>
      Seq(ts(e.timestampMs), table.relocate(e.ref), false))
    past :+ Seq(ts(meta.lastUpdatedMs),
      s"${table.location}/metadata/" +
        graft.tables.StorageCatalog.metadataFileName(
          table.version, meta.properties), true)
  }

  def refRows(meta: TableMetadata): Seq[Seq[Any]] =
    meta.refs.toSeq.sortBy(_._1).map { case (name, r) =>
      Seq(name, r.refType.toUpperCase, r.snapshotId, r.maxRefAgeMs.orNull,
        r.minSnapshotsToKeep.orNull, r.maxSnapshotAgeMs.orNull)
    }

  def manifestRows(table: GraftTable, snap: IceSnapshot): Seq[Seq[Any]] =
    ManifestIO.readManifestList(table.conf, table.relocate(snap.manifestList)).map { m =>
      Seq(m.content, table.relocate(m.manifestPath), m.manifestLength,
        m.partitionSpecId, m.addedSnapshotId,
        m.addedFilesCount, m.existingFilesCount, m.deletedFilesCount,
        m.addedRowsCount, m.existingRowsCount, m.deletedRowsCount,
        m.sequenceNumber, m.minSequenceNumber)
    }

  /** avro-internal partition value -> Spark external value for the
    * transform result type (dates ride as epoch days, timestamps micros) */
  def partitionValue(raw: Any, resultType: IceType): Any = (resultType, raw) match {
    case (_, null) => null
    case (IcePrim("date"), i: Int) => java.time.LocalDate.ofEpochDay(i.toLong)
    case (IcePrim("timestamptz"), l: Long) =>
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L)
    // iceberg `timestamp` is zone-LESS -> Spark TIMESTAMP_NTZ wants a
    // LocalDateTime, not an Instant
    case (IcePrim("timestamp"), l: Long) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (IceDecimal(_, scale), b: Array[Byte]) =>
      BigDecimal(BigInt(b), scale)
    case (IceDecimal(_, _), s: String) => BigDecimal(s)
    case _ => raw
  }

  /** one `files` row per live entry of a manifest; the partition tuple is
    * re-keyed by field NAME onto the default spec's struct */
  def fileRows(
      entries: List[IceManifestEntry],
      listSeq: Long,
      specId: Int,
      spec: IcePartitionSpec,
      resultTypes: List[IceType],
      defaultFieldNames: List[String],
      metricsFields: List[(String, Int, IceType)],
      relocate: String => String): Seq[Seq[Any]] =
    entries.filter(_.status != ManifestStatus.Deleted).map { e =>
      val f = e.dataFile
      val byName: Map[String, Any] =
        spec.fields.zip(resultTypes).zip(f.partition).map { case ((pf, rt), v) =>
          pf.name -> partitionValue(v.orNull, rt)
        }.toMap
      // Row, not List: the Catalyst struct converter treats a List as a
      // Product (the :: case class) and corrupts multi-field tuples
      val tuple = org.apache.spark.sql.Row.fromSeq(
        defaultFieldNames.map(n => byName.getOrElse(n, null)))
      // bounds decode tolerates pre-widening byte widths (SingleValue),
      // then converts to the external Spark value (dates/timestamps)
      val readable = org.apache.spark.sql.Row.fromSeq(
        metricsFields.map { case (_, fid, t) =>
          def bound(m: Map[Int, Array[Byte]]): Any =
            m.get(fid).map(b => partitionValue(SingleValue.decode(t, b), t)).orNull
          org.apache.spark.sql.Row(
            f.columnSizes.get(fid).orNull, f.valueCounts.get(fid).orNull,
            f.nullValueCounts.get(fid).orNull, f.nanValueCounts.get(fid).orNull,
            bound(f.lowerBounds), bound(f.upperBounds))
        })
      Seq(f.content, relocate(f.filePath), f.fileFormat, specId, tuple,
        f.recordCount, f.fileSizeInBytes,
        f.valueCounts, f.nullValueCounts, f.nanValueCounts,
        f.lowerBounds, f.upperBounds,
        if (f.splitOffsets.isEmpty) null else f.splitOffsets,
        if (f.equalityIds.isEmpty) null else f.equalityIds,
        e.dataFile.sortOrderId.orNull,
        e.dataSequenceNumber.getOrElse(listSeq),
        readable)
    }

  /** one `entries` row per manifest entry, deleted entries INCLUDED */
  def entryRows(
      entries: List[IceManifestEntry],
      listSeq: Long,
      spec: IcePartitionSpec,
      resultTypes: List[IceType],
      defaultFieldNames: List[String],
      relocate: String => String): Seq[Seq[Any]] =
    entries.map { e =>
      val f = e.dataFile
      val byName: Map[String, Any] =
        spec.fields.zip(resultTypes).zip(f.partition).map { case ((pf, rt), v) =>
          pf.name -> partitionValue(v.orNull, rt)
        }.toMap
      val tuple = org.apache.spark.sql.Row.fromSeq(
        defaultFieldNames.map(n => byName.getOrElse(n, null)))
      Seq(e.status, e.snapshotId.orNull,
        e.dataSequenceNumber.getOrElse(listSeq),
        e.fileSequenceNumber.orNull,
        f.content, relocate(f.filePath), tuple,
        f.recordCount, f.fileSizeInBytes)
    }

  def resultTypesOf(meta: TableMetadata, spec: IcePartitionSpec): List[IceType] =
    spec.fields.map { pf =>
      val src = meta.currentSchema.fieldById(pf.sourceId)
        .orElse(meta.schemas.flatMap(_.fieldById(pf.sourceId)).headOption)
        .map(_.fieldType).getOrElse(IcePrim("string"))
      SchemaConvert.transformResultType(pf.transform, src)
    }

  def toInternal(schema: StructType, rows: Seq[Seq[Any]]): Array[InternalRow] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    rows.map(vals =>
      conv(org.apache.spark.sql.Row.fromSeq(vals)).asInstanceOf[InternalRow]).toArray
  }
}

/** DSv2 read-only table for one metadata view of a [[GraftTable]]. */
class GraftMetadataTable(val table: GraftTable, kind: String)
    extends Table with SupportsRead {

  private def meta: TableMetadata = table.metadata

  override def name(): String = s"${table.location}#$kind"

  override def schema(): StructType = GraftMetadataTables.schemaOf(kind, meta)

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => kind match {
      case "files" | "entries" | "all_files" | "all_entries" |
          "data_files" | "delete_files" | "all_data_files" | "all_delete_files" =>
        new GraftFilesScan(table, kind)
      case "position_deletes" => new GraftPositionDeletesScan(table)
      case _ => new GraftMetadataLocalScan(table, kind, schema())
    }
}

/** driver-side views: O(commits) rows straight from table metadata */
class GraftMetadataLocalScan(table: GraftTable, kind: String, schema: StructType)
    extends LocalScan {
  import GraftMetadataTables._

  /** manifest count above which the `partitions` rollup runs as a
    * distributed aggregate over the files scan instead of a driver fold
    * (same threshold shape as GraftTable.planFilesPruned; conf override
    * for tests and tuning) */
  private def DistributedRollupMin: Int =
    org.apache.spark.sql.SparkSession.active.conf
      .get("spark.graft.partitions-rollup-distributed-min", "64").toInt

  override def readSchema(): StructType = schema

  override def rows(): Array[InternalRow] = {
    val meta = table.metadata
    val external: Seq[Seq[Any]] = kind match {
      case "snapshots" => snapshotRows(meta)
      case "history" => historyRows(meta)
      case "refs" => refRows(meta)
      case "metadata_log_entries" => metadataLogRows(table)
      case "manifests" =>
        meta.currentSnapshot.map(manifestRows(table, _)).getOrElse(Nil)
      case "all_manifests" =>
        meta.snapshots.sortBy(_.sequenceNumber).flatMap(s =>
          manifestRows(table, s).map(_ :+ s.snapshotId))
      case "partitions" =>
        val snap = meta.currentSnapshot
        val manifestCount = snap.map(s =>
          ManifestIO.readManifestList(
            table.conf, table.relocate(s.manifestList)).size).getOrElse(0)
        if (manifestCount > DistributedRollupMin) {
          // big table: aggregate over the DISTRIBUTED data_files scan —
          // the driver sees only the final per-partition rows, never the
          // O(files) descriptor list (at 100 TB that list is millions of
          // entries; this rollup is one manifest-parallel job + a hash
          // aggregate)
          import org.apache.spark.sql.functions.{col, count, lit, sum}
          org.apache.spark.sql.GraftBridge.v2ScanDataFrame(
            org.apache.spark.sql.SparkSession.active,
            new GraftMetadataTable(table, "data_files"), Map.empty)
            .groupBy(col("partition"))
            .agg(sum(col("record_count")).as("rc"), count(lit(1)).as("fc"),
              sum(col("file_size_in_bytes")).as("sz"))
            .collect().toSeq
            .map(r => Seq(r.getStruct(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        } else {
          // small table: driver rollup over planFiles (a Spark job's fixed
          // scheduling cost dwarfs reading a handful of manifests)
          val files = snap.map(table.planFiles(_, None)).getOrElse(Nil)
          val defaults = meta.defaultSpec.fields.map(_.name)
          files
            .filter(_.file.content == DataContent.Data)
            .groupBy { pf =>
              val spec = meta.specById(pf.specId)
              val rts = resultTypesOf(meta, spec)
              val byName = spec.fields.zip(rts).zip(pf.file.partition).map {
                case ((f, rt), v) => f.name -> partitionValue(v.orNull, rt)
              }.toMap
              defaults.map(n => byName.getOrElse(n, null))
            }
            .toSeq.map { case (tuple, fs) =>
              Seq(org.apache.spark.sql.Row.fromSeq(tuple),
                fs.map(_.file.recordCount).sum, fs.size.toLong,
                fs.map(_.file.fileSizeInBytes).sum)
            }
        }
      case other => sys.error(s"unknown metadata table: $other")
    }
    toInternal(schema, external)
  }

  override def description(): String = s"GraftMetadataScan(${table.location}, $kind)"
}

/** `files` / `entries`: distributed — one input partition per manifest,
  * executors parse the Avro. O(total data files) rows never materialize on
  * the driver. `files` emits live entries with full stats; `entries` emits
  * EVERY entry (deleted included) with its status bookkeeping. */
class GraftFilesScan(table: GraftTable, kind: String = "files")
    extends Scan with Batch {
  import GraftMetadataTables._

  private val meta = table.metadata
  private val baseKind = kind.stripPrefix("all_")
  private val schema =
    if (baseKind == "entries") entriesSchema(meta) else filesSchema(meta)
  // data_files/delete_files prune at MANIFEST granularity: a manifest
  // holds only data (content=0) or only delete (content=1) entries, so
  // the filter costs zero row reads — unwanted manifests never open
  private val manifestContentWanted: Option[Int => Boolean] = baseKind match {
    case "data_files" => Some(_ == 0)
    case "delete_files" => Some(_ != 0)
    case _ => None
  }

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftFilesScan(${table.location})"

  override def planInputPartitions(): Array[InputPartition] = {
    // `files`/`entries` view the current snapshot; the all_* views union
    // every valid snapshot's manifests, deduped by path (a manifest
    // shared by N snapshots is read once — like Iceberg's all_* views
    // the FILE rows may still repeat when snapshots re-reference files
    // through different manifests)
    val snaps: Seq[IceSnapshot] =
      if (kind.startsWith("all_")) meta.snapshots
      else meta.currentSnapshot.toSeq
    snaps
      .flatMap(s =>
        ManifestIO.readManifestList(table.conf, table.relocate(s.manifestList)))
      .filter(m => manifestContentWanted.forall(_(m.content)))
      .groupBy(m => table.relocate(m.manifestPath)).values.map(_.head).toSeq
      .sortBy(_.sequenceNumber)
      .map { m =>
        val spec = meta.specById(m.partitionSpecId)
        GraftFilesPartition(
          table.relocate(m.manifestPath), m.sequenceNumber, m.partitionSpecId,
          spec, resultTypesOf(meta, spec),
          meta.defaultSpec.fields.map(_.name),
          metricsFields(meta).map(f => (f.name, f.id, f.fieldType)),
          table.location, meta.location,
          new TableWrite.SerializableHadoopConf(table.conf))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val s = schema
    val k = baseKind
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val fp = p.asInstanceOf[GraftFilesPartition]
        val entries = ManifestIO.readManifest(
          fp.conf.value, fp.manifestPath, fp.spec.fields.map(_.name))
        // files of pre-rename metadata need the same path relocation scans do
        val reloc: String => String = p =>
          if (p.startsWith(fp.tableLocation)) p
          else if (p.startsWith(fp.metadataLocation))
            fp.tableLocation + p.stripPrefix(fp.metadataLocation)
          else p
        val rows = toInternal(s,
          if (k == "entries")
            entryRows(entries, fp.listSeq, fp.spec, fp.resultTypes,
              fp.defaultFieldNames, reloc)
          else fileRows(
            entries, fp.listSeq, fp.specId, fp.spec, fp.resultTypes,
            fp.defaultFieldNames, fp.metricsFields, reloc))
        val it = rows.iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = { if (!it.hasNext) return false; cur = it.next(); true }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
  }
}

case class GraftFilesPartition(
    manifestPath: String,
    listSeq: Long,
    specId: Int,
    spec: IcePartitionSpec,
    resultTypes: List[IceType],
    defaultFieldNames: List[String],
    metricsFields: List[(String, Int, IceType)],
    tableLocation: String,
    metadataLocation: String,
    conf: TableWrite.SerializableHadoopConf) extends InputPartition

/** `position_deletes`: the live position-delete ROW set, distributed —
  * one task per delete artifact. Parquet delete files read their
  * (file_path, pos) columns with parquet-mr; deletion vectors fetch only
  * their own blob bytes and decode the bitmap. At 100 TB the delete set
  * is spread over many files, so inspection queries (`how many deletes
  * target file X?`) parallelize instead of funnelling the driver. */
class GraftPositionDeletesScan(table: GraftTable)
    extends Scan with Batch {
  import GraftMetadataTables._

  override def readSchema(): StructType = positionDeletesSchema
  override def toBatch: Batch = this
  override def description(): String = s"GraftPositionDeletesScan(${table.location})"

  override def planInputPartitions(): Array[InputPartition] = {
    val meta = table.metadata
    meta.currentSnapshot.toSeq
      .flatMap(table.planFiles(_))
      .filter(_.file.content == DataContent.PositionDeletes)
      .map { p =>
        GraftPosDeletePartition(
          table.relocate(p.file.filePath),
          p.file.isDeletionVector,
          p.file.referencedDataFile,
          p.file.contentOffset.getOrElse(0L),
          p.file.contentSizeInBytes.getOrElse(p.file.fileSizeInBytes),
          p.seq, p.specId,
          new TableWrite.SerializableHadoopConf(table.conf))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val dp = p.asInstanceOf[GraftPosDeletePartition]
        val rows: Seq[Seq[Any]] =
          if (dp.isVector)
            graft.tables.Puffin.dvPositions(graft.tables.Puffin.readBlob(
                dp.conf.value, dp.path, dp.blobOffset, dp.blobLength))
              .map(pos => Seq[Any](
                dp.referencedFile.getOrElse(""), pos, dp.path, dp.seq, dp.specId))
          else {
            val reader = org.apache.parquet.hadoop.ParquetReader
              .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
                new org.apache.hadoop.fs.Path(dp.path))
              .withConf(dp.conf.value)
              .build()
            val buf = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
            try {
              var g = reader.read()
              while (g != null) {
                buf += Seq[Any](
                  g.getString("file_path", 0), g.getLong("pos", 0),
                  dp.path, dp.seq, dp.specId)
                g = reader.read()
              }
            } finally reader.close()
            buf.toSeq
          }
        val it = GraftMetadataTables
          .toInternal(positionDeletesSchema, rows).iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

case class GraftPosDeletePartition(
    path: String,
    isVector: Boolean,
    referencedFile: Option[String],
    blobOffset: Long,
    blobLength: Long,
    seq: Long,
    specId: Int,
    conf: TableWrite.SerializableHadoopConf) extends InputPartition
