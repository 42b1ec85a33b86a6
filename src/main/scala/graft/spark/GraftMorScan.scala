package graft.spark

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StructType}

import graft.tables._

/** DSv2 custom metrics (the truthful per-query replacement for the
  * reference's prometheus decorator layers, icelake/src/metrics.rs):
  * surfaced in the Spark UI / listener bus per scan or write. Spark
  * re-instantiates CustomMetric classes reflectively, so each needs a
  * concrete no-arg class. */
abstract class GraftSumMetric(metricName: String, desc: String)
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = metricName
  override def description(): String = desc
}

class DataFilesMetric extends GraftSumMetric("graftDataFiles", "data files scanned")
class PosDeleteFilesMetric
    extends GraftSumMetric("graftPosDeleteFiles", "position delete files applied")
class EqDeleteFilesMetric
    extends GraftSumMetric("graftEqDeleteFiles", "equality delete files applied")
class RowsDeletedMetric
    extends GraftSumMetric("graftRowsDeleted", "rows removed by MoR deletes")
class RowsWrittenMetric extends GraftSumMetric("graftRowsWritten", "rows written")

case class GraftTaskMetric(metricName: String, v: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = v
}

/** Native DSv2 row-level scan — the path the reference documents but
  * never built (icelake/src/io/scan.rs applies no deletes).
  *
  * Serves everything a per-row wrapper can do natively: merge-on-read
  * delete application, the `_file`/`_pos` metadata columns
  * (partition-constant path + sequential row counter), and per-file
  * initial-defaults (fields a file predates come back as plan-time
  * literals). SQL MoR reads, row-level DML scans, and defaulted-table
  * reads all stay ONE scan node at any delete volume:
  *
  *  - SMALL delete sets (on-disk bytes <= `spark.graft.delete-broadcast-
  *    max-bytes`): delete state resolves at PLAN time into per-data-file
  *    position arrays plus equality-key hash maps shipped with the tasks
  *    — zero extra reads per task.
  *  - JUMBO delete sets: delete state loads EXECUTOR-side via
  *    [[DeleteState]] — per-task pushdown-filtered position-delete reads
  *    (each task reads only its own file's slice) and a per-executor
  *    cached equality map — so driver memory and task-binary size stay
  *    flat no matter how many deletes the table carries.
  *
  * Row positions are counted sequentially per file; partitions are always
  * whole single files, and filters push into the inner parquet reader
  * only for files without position deletes (row-group skipping would
  * break the position counter).
  */
class GraftMorScan(
    table: GraftTable,
    iceSchema: IceSchema,
    dataFiles: Seq[PlannedFile],
    posDeletes: Seq[PlannedFile],
    eqDeletes: Seq[PlannedFile],
    dataSchema: StructType,
    requiredSchema: StructType,
    pushedFilters: Array[Filter] = Array.empty)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = requiredSchema

  /** data-file stats scaled by projection (deletes make this an upper
    * bound — still vastly better than the infinite DSv2 default, and
    * safe: overestimating only forgoes a broadcast) */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    GraftScanStats.of(currentData, dataSchema, requiredSchema, iceSchema, table.ndvStats)

  override def toBatch: Batch = this

  // ---- runtime (join-driven) file pruning: drops DATA files before the
  // partitions are planned. Delete state is keyed per data file / kept a
  // superset, so a pruned data side stays exactly correct. ----

  @volatile private var currentData: Seq[PlannedFile] = dataFiles
  @volatile private var partitionsPlanned = false

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // only columns surviving column pruning: Spark's DPP rule resolves
    // these against the scan OUTPUT and throws on a pruned-out column
    table.metadata.defaultSpec.fields
      .flatMap(pf => iceSchema.fieldById(pf.sourceId).map(_.name)).distinct
      .filter(requiredSchema.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    // after planning, pruning would desync plannedPartitions — skip (Spark
    // calls filter() before planInputPartitions; this is pure defense)
    if (partitionsPlanned) return
    val v1 = org.apache.spark.sql.GraftBridge.predicatesToV1(predicates)
    FilterToColumn.convert(v1).foreach { c =>
      val before = currentData.size
      currentData = PruneEval.prunePlanned(currentData, Some(c), table.metadata, iceSchema)
      Metrics.inc(Metrics.FilesPruned, (before - currentData.size).toLong)
    }
  }

  // ---- deletion vectors: a position-delete entry in puffin format is a
  // per-data-file bitmap. The LATEST vector per file is that file's
  // complete position-delete set (merge-on-write); parquet position
  // deletes newer than the vector (mixed-mode tables) still stack on
  // top, older ones are subsumed by it and skipped. ----
  private val (dvDeletes, pqPosDeletes) =
    posDeletes.partition(_.file.isDeletionVector)
  private val dvByFile: Map[String, PlannedFile] = dvDeletes
    .groupBy(p => GraftTable.normPathStr(p.file.referencedDataFile.get))
    .map { case (f, xs) => f -> xs.maxBy(_.seq) }

  private val metaNames =
    Set("_file", "_pos", "_row_id", "_last_updated_sequence_number",
      "_spec_id", "_partition", "_deleted")

  /** the data columns the inner parquet read must produce */
  private val requiredDataFields =
    requiredSchema.fields.filterNot(f => metaNames.contains(f.name))

  /** equality-key columns that must ride the inner read beyond the
    * required columns (projected away after delete filtering) */
  private val eqKeyFields: Seq[IceField] = eqDeletes
    .flatMap(_.file.equalityIds).distinct
    .flatMap(id => iceSchema.fieldById(id))
    .filterNot(f => requiredDataFields.exists(_.name == f.name))

  /** lineage output reads the MATERIALIZED columns too (rewritten files
    * carry them under reserved field ids; files without them read null
    * and fall back to first_row_id + position / the file's sequence) */
  private val wantsLineage = requiredSchema.fieldNames.exists(n =>
    n == GraftTable.RowIdCol || n == GraftTable.LastUpdatedSeqCol)
  private def reservedLong(name: String, id: Int) =
    org.apache.spark.sql.types.StructField(
      name, org.apache.spark.sql.types.LongType, nullable = true,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(SchemaConvert.FieldIdKey, id.toLong).build())

  private val innerSchema: StructType =
    StructType(requiredDataFields ++ eqKeyFields.map(SchemaConvert.toSparkField) ++
      (if (!wantsLineage) Nil
      else Seq(
        reservedLong(GraftTable.RowIdCol, GraftTable.RowIdFieldId),
        reservedLong(GraftTable.LastUpdatedSeqCol, GraftTable.LastUpdatedSeqFieldId))))

  /** foreign-FORMAT delete files (ORC/Avro — spec-legal, written by
    * other engines; this engine writes parquet deletes): small sets
    * resolve at plan time like parquet ones; JUMBO sets load executor-
    * side through driver-built ORC/Avro row factories (whole-file reads —
    * no parquet-mr pushdown, but no driver stall either; the escape hatch
    * for heavy foreign churn remains `rewrite_position_delete_files`) */
  private def deleteFmt(p: PlannedFile): String = p.file.fileFormat.toLowerCase

  /** jumbo delete sets load executor-side; small ones resolve at plan
    * time (cheaper per task, bounded by the broadcast threshold) */
  private val executorSide: Boolean = {
    // vectors count their blob bytes, not the shared puffin file's
    val dvBytes = dvByFile.values
      .map(p => p.file.contentSizeInBytes.getOrElse(p.file.fileSizeInBytes)).sum
    val bytes = (pqPosDeletes ++ eqDeletes).map(_.file.fileSizeInBytes).sum + dvBytes
    bytes > 0 && bytes > GraftTable.deleteBroadcastMaxBytes(SparkSession.active)
  }

  /** file -> (position, delete sequence) pairs resolved at plan time: a
    * position delete applies to a data file when its sequence is >= the
    * file's */
  private lazy val posByFile: Map[String, Array[(Long, Long)]] = {
    if (pqPosDeletes.isEmpty || executorSide) Map.empty
    else {
      val spark = GraftTable.pinnedSession(SparkSession.active)
      val triples: Seq[(String, Long, Long)] =
        pqPosDeletes.groupBy(deleteFmt).toSeq.flatMap { case (fmt, files) =>
          val seqOf = files
            .map(p => (GraftTable.normPathStr(p.file.filePath), p.seq)).toMap
          fmt match {
            case "avro" =>
              // driver-side container read (no spark-avro source on the
              // classpath); plan-time sets are broadcast-bounded anyway.
              // Columns resolve by the spec's reserved field ids.
              val posSchema = StructType(Seq(
                SchemaConvert.toSparkField(
                  IceField(2147483546, "file_path", required = true, IcePrim("string"))),
                SchemaConvert.toSparkField(
                  IceField(2147483545, "pos", required = true, IcePrim("long")))))
              files.flatMap { p =>
                // length must be the REAL file size: Long.MaxValue
                // overflows DataFileReader.pastSync(end + SYNC) and reads
                // nothing
                val it = graft.tables.AvroDataIO.rows(
                  table.conf, p.file.filePath, posSchema, 0L, p.file.fileSizeInBytes)
                try it.map(r =>
                  (GraftTable.normPathStr(r.getUTF8String(0).toString),
                    r.getLong(1), p.seq)).toVector
                finally it.close()
              }
            case other => // "parquet" | "orc" — native Spark sources
              val df = spark.read.format(other).load(files.map(_.file.filePath): _*)
                .select(col("file_path"), col("pos"),
                  GraftTable.normPath(col("_metadata.file_path")).as("_src"))
              org.apache.spark.sql.GraftBridge.collectInternal(df).toSeq
                .map(r => (GraftTable.normPathStr(r.getUTF8String(0).toString),
                  r.getLong(1), seqOf.getOrElse(r.getUTF8String(2).toString, Long.MaxValue)))
          }
        }
      triples
        .groupBy(_._1)
        .map { case (f, xs) => f -> xs.map(x => (x._2, x._3)).toArray }
    }
  }

  /** Descriptor-level applicability of an eq-delete FILE: it loads only
    * if (1) some data file strictly predates it (`eseq > dseq` is the
    * row rule) and (2) for that data file, every equality column whose
    * bounds exist on BOTH sides overlaps — with the delete file proving
    * a zero null count for the column (a delete row with a null key
    * matches null-key data rows, which bounds don't cover). Everything
    * missing stays conservative. At scale this is what keeps a scan from
    * loading thousands of accumulated eq-delete files that only touch
    * other partitions' key ranges. */
  private def eqBoundsOverlap(data: IceDataFile, del: IceDataFile, id: Int): Boolean =
    iceSchema.fieldById(id).forall { f =>
      if (!del.nullValueCounts.get(id).contains(0L)) true // may hold null keys
      else {
        def v(b: Array[Byte]): Any = SingleValue.decode(f.fieldType, b)
        val disjointBelow = (data.upperBounds.get(id), del.lowerBounds.get(id)) match {
          case (Some(du), Some(dl)) => PruneEval.compareValues(v(du), v(dl)) < 0
          case _ => false
        }
        val disjointAbove = (del.upperBounds.get(id), data.lowerBounds.get(id)) match {
          case (Some(eu), Some(al)) => PruneEval.compareValues(v(eu), v(al)) < 0
          case _ => false
        }
        !disjointBelow && !disjointAbove
      }
    }

  /** evaluated lazily — AFTER runtime filter() may have shrunk
    * `currentData`, so runtime pruning also narrows delete applicability */
  private lazy val liveEqDeletes: Seq[PlannedFile] = {
    val live = eqDeletes.filter { d =>
      currentData.exists(p =>
        d.seq > p.seq &&
          d.file.equalityIds.forall(id => eqBoundsOverlap(p.file, d.file, id)))
    }
    Metrics.inc(Metrics.EqDeleteFilesSkipped, (eqDeletes.size - live.size).toLong)
    live
  }

  /** per equality-id group: key types and (key -> max delete sequence) */
  private lazy val eqGroups: Seq[(Seq[String], Array[DataType], JHashMap[UnsafeRow, java.lang.Long], Long)] =
    (if (executorSide) Nil
    else liveEqDeletes.groupBy(_.file.equalityIds).toSeq).flatMap { case (eqIds, files) =>
      val keyFields = eqIds.flatMap(id => iceSchema.fieldById(id))
      if (keyFields.isEmpty) None
      else {
        // resolve delete columns by FIELD ID (same contract as the facade
        // scan): a rename after the delete was written must still hit the
        // original parquet column — pinned on the clone session, never on
        // the user's own session
        val spark = GraftTable.pinnedSession(SparkSession.active)
        val keyNames = keyFields.map(_.name)
        val readSchema = StructType(keyFields.map(SchemaConvert.toSparkField))
        val seqOf = files.map(p => (GraftTable.normPathStr(p.file.filePath), p.seq)).toMap
        val types = keyFields.map(f => SchemaConvert.toSparkType(f.fieldType)).toArray
        val proj = UnsafeProjection.create(
          types.zipWithIndex.map { case (t, i) => BoundReference(i, t, nullable = true) })
        val map = new JHashMap[UnsafeRow, java.lang.Long]()
        // (key row, delete sequence) across the group's files, any format
        files.groupBy(deleteFmt).foreach { case (fmt, fs) =>
          fmt match {
            case "avro" => // driver-side container read, id-resolved
              fs.foreach { p =>
                val it = graft.tables.AvroDataIO.rows(
                  table.conf, p.file.filePath, readSchema, 0L, p.file.fileSizeInBytes)
                try it.foreach { r =>
                  val key = proj(r).copy()
                  val prev = map.get(key)
                  if (prev == null || prev < p.seq) map.put(key, p.seq)
                } finally it.close()
              }
            case other => // "parquet" | "orc" — native Spark sources
              val df = spark.read.schema(readSchema).format(other)
                .load(fs.map(_.file.filePath): _*)
                .select(keyNames.map(col) :+
                  GraftTable.normPath(col("_metadata.file_path")).as("_src"): _*)
              val rows = org.apache.spark.sql.GraftBridge.collectInternal(df)
              rows.foreach { r =>
                val eseq = seqOf.getOrElse(r.getUTF8String(types.length).toString, Long.MinValue)
                val key = proj(r).copy()
                val prev = map.get(key)
                if (prev == null || prev < eseq) map.put(key, eseq)
              }
          }
        }
        Some((keyNames, types, map, files.map(_.seq).max))
      }
    }

  /** plan-time decode of the latest vectors (small-delete tier):
    * data file -> (sorted deleted positions, vector sequence) */
  private lazy val dvPosByFile: Map[String, (Array[Long], Long)] =
    if (dvByFile.isEmpty || executorSide) Map.empty
    else {
      val conf =
        org.apache.spark.sql.GraftBridge.sessionHadoopConf(SparkSession.active)
      dvByFile.map { case (f, p) =>
        val blob = graft.tables.Puffin.readBlob(
          conf, table.relocate(p.file.filePath),
          p.file.contentOffset.getOrElse(0L),
          p.file.contentSizeInBytes.getOrElse(p.file.fileSizeInBytes))
        f -> ((graft.tables.Puffin.dvPositions(blob), p.seq))
      }
    }

  /** can this position-delete file contain entries for `dataPath`?
    * Pruned via the manifest bounds on the reserved file_path column
    * (2147483546). Bounds are truncated conservatively (lower = prefix,
    * upper = prefix bumped past the max), so plain string compares stay
    * safe; the stored path may be URI- or plain-form, so any form within
    * bounds keeps the candidate. */
  private def posFileMayContain(pd: PlannedFile, dataPathNorm: String): Boolean = {
    val lo = pd.file.lowerBounds.get(2147483546)
      .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
    val hi = pd.file.upperBounds.get(2147483546)
      .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
    if (lo.isEmpty && hi.isEmpty) true
    else Seq(dataPathNorm, s"file:$dataPathNorm", s"file://$dataPathNorm")
      .exists(f => lo.forall(_ <= f) && hi.forall(f <= _))
  }

  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  private[spark] val partitionMetaType: StructType =
    GraftMetadataTables.partitionStruct(table.metadata)

  /** the row's file partition tuple in default-spec shape (same unified
    * mapping as the `partitions` metadata view), as a catalyst struct */
  private def partTupleOf(p: PlannedFile): InternalRow = {
    val spec = table.metadata.specById(p.specId)
    val rts = GraftMetadataTables.resultTypesOf(table.metadata, spec)
    val byName = spec.fields.zip(rts).zip(p.file.partition).map {
      case ((f, rt), v) => f.name -> GraftMetadataTables.partitionValue(v.orNull, rt)
    }.toMap
    val ext = table.metadata.defaultSpec.fields.map(f => byName.getOrElse(f.name, null))
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(partitionMetaType)(
        org.apache.spark.sql.Row.fromSeq(ext)).asInstanceOf[InternalRow]
  }

  private lazy val plannedPartitions: Array[InputPartition] = {
    partitionsPlanned = true
    val pb = posByFile
    val maxBytes = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    val wantsPartMeta = requiredSchema.fieldNames.contains("_partition")
    val hasPosOut = requiredSchema.fieldNames.contains("_pos") ||
      requiredSchema.fieldNames.contains("_row_id")
    val planHadoopConf =
      org.apache.spark.sql.GraftBridge.sessionHadoopConf(SparkSession.active)
    // per-file initial-defaults: required-field index -> default value,
    // for fields the file predates (column-size stats lack the id)
    val defaultedFields = requiredDataFields.zipWithIndex.flatMap { case (f, _) =>
      iceSchema.findField(f.name)
        .filter(_.initialDefault.isDefined)
        .map(icef => (requiredSchema.fieldIndex(f.name), icef))
    }
    currentData.zipWithIndex.map { case (p, i) =>
      val norm = GraftTable.normPathStr(p.file.filePath)
      val dv = dvByFile.get(norm)
      val positions: Array[Long] = {
        // the vector subsumes parquet deletes at or below its sequence;
        // newer parquet deletes (mixed-mode) still stack on top
        val pqPos: Array[Long] = pb.get(norm) match {
          case Some(pairs) =>
            pairs.collect { case (pos, pseq)
              if p.seq <= pseq && dv.forall(d => pseq > d.seq) => pos }
          case None => Array.empty[Long]
        }
        val dvPos: Array[Long] = dvPosByFile.get(norm) match {
          case Some((ps, dseq)) if dseq >= p.seq => ps
          case _ => Array.empty[Long]
        }
        if (pqPos.isEmpty && dvPos.isEmpty) Array.empty[Long]
        else (pqPos ++ dvPos).distinct.sorted
      }
      // JSON carries defaults widened or stringly (Long/Double/String for
      // dates etc.): resolve to the CATALYST value at plan time with a
      // real Cast — the same coercion the facade's lit().cast() applied
      def catalystDefault(raw: Any, icef: IceField): Any = {
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
        val dt = SchemaConvert.toSparkType(icef.fieldType)
        val lit = Literal(
          org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(raw))
        Cast(lit, dt, Some("UTC")).eval(null)
      }
      val defaults: Array[(Int, Any)] = defaultedFields.collect {
        case (ord, icef)
            if p.file.columnSizes.nonEmpty && !p.file.columnSizes.contains(icef.id) =>
          ord -> catalystDefault(icef.initialDefault.get, icef)
      }.toArray
      // executor-side mode ships the CANDIDATE pos-delete files instead of
      // resolved positions — pruned per data file by seq + path bounds
      val posCandidates: Array[DeleteFileRef] =
        if (!executorSide) Array.empty
        else {
          val pq = pqPosDeletes
            .filter(pd => pd.seq >= p.seq && dv.forall(d => pd.seq > d.seq) &&
              posFileMayContain(pd, norm))
            .map(pd => DeleteFileRef(pd.file.filePath, pd.file.fileSizeInBytes,
              pd.seq, fmt = deleteFmt(pd)))
          val dvRef = dv.filter(_.seq >= p.seq).map(d => DeleteFileRef(
            table.relocate(d.file.filePath), d.file.fileSizeInBytes, d.seq,
            d.file.contentOffset.getOrElse(0L),
            d.file.contentSizeInBytes.getOrElse(d.file.fileSizeInBytes)))
          (dvRef.toSeq ++ pq).toArray
        }
      // a skewed jumbo file splits into byte ranges (row groups follow
      // their midpoints) instead of one straggler task. When positions
      // matter (deletes or `_pos` output), the DRIVER reads the footer
      // ONCE here and ships each range's row-count seed in the partition
      // — range tasks never re-open the footer; when they don't, the
      // seed is irrelevant and nobody reads it at all. Non-parquet files
      // stay whole (the range seed protocol is parquet-footer based).
      val fmt = p.file.fileFormat
      val ranges =
        if (fmt != "parquet") Seq((0L, p.file.fileSizeInBytes))
        else org.apache.spark.sql.GraftBridge
          .byteRanges(p.file.fileSizeInBytes, maxBytes)
      val seeds: Array[Long] =
        if (ranges.length > 1 &&
          (positions.nonEmpty || posCandidates.nonEmpty || hasPosOut))
          DeleteState.seedsForRanges(
            p.file.filePath, ranges.map(_._1).toArray, planHadoopConf)
        else null
      // files outside the table's data dir were registered via add_files:
      // they carry no Iceberg field ids and must resolve columns by NAME
      val external =
        !graft.tables.Locations.isInternal(table.metadata, table.location, norm)
      ranges.zipWithIndex.map { case ((start, len), ri) =>
        GraftMorInputPartition(
          org.apache.spark.sql.GraftBridge.rangeFilePartition(
            i, p.file.filePath, start, len, p.file.fileSizeInBytes),
          p.seq, positions, norm, defaults, posCandidates, start,
          if (seeds != null) seeds(ri) else -1L, external, fmt,
          p.file.firstRowId.getOrElse(-1L), p.specId,
          if (wantsPartMeta) partTupleOf(p) else null): InputPartition
      }
    }.flatten.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // two inner factories: filters may push into parquet (row-group/page
    // skipping) ONLY for files without position deletes — sequential
    // position counting is invalid once row groups can be skipped
    val innerNoPush = org.apache.spark.sql.GraftBridge.parquetReaderFactory(
      SparkSession.active, dataSchema, innerSchema, Array.empty[Filter])
    val innerPush =
      if (pushedFilters.isEmpty) innerNoPush
      else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
        SparkSession.active, dataSchema, innerSchema, pushedFilters)
    // add_files imports carry no field ids: an id-carrying read schema
    // would silently null their columns (fieldId resolution finds no
    // match), so external partitions read through factories that resolve
    // by name — under the table's name mapping when it has one (each
    // requested field id reads the NAME the imported files use for it, so
    // later renames stay metadata-only), else by current name.
    // Row layout is positional: rows come back under the scan's own
    // schema regardless of the resolution names. Parquet-level filter
    // pushdown may skip mapped-renamed columns (name no longer matches) —
    // an optimization loss only, every filter is re-applied row-level.
    val hasExternal = plannedPartitions.exists {
      _.asInstanceOf[GraftMorInputPartition].external
    }
    def stripIds(st: StructType): StructType = StructType(st.fields.map { f =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).remove(SchemaConvert.FieldIdKey).build()
      f.copy(metadata = md)
    })
    lazy val extResolve: StructType => StructType =
      graft.tables.NameMapping.of(table.metadata) match {
        case Some(m) => st => graft.tables.NameMapping.toFileNames(m, st)
        case None => stripIds
      }
    val extNoPush =
      if (!hasExternal) null
      else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
        SparkSession.active, extResolve(dataSchema), extResolve(innerSchema),
        Array.empty[Filter])
    val extPush =
      if (!hasExternal) null
      else if (pushedFilters.isEmpty) extNoPush
      else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
        SparkSession.active, extResolve(dataSchema), extResolve(innerSchema),
        pushedFilters)
    val nameToOrdinal = innerSchema.fieldNames.zipWithIndex.toMap
    val groups = eqGroups.map { case (keyNames, types, map, maxSeq) =>
      EqGroupState(
        keyNames.map(nameToOrdinal).toArray, types, new InMemoryEqLookup(map), maxSeq)
    }.toArray
    // executor-side mode: ship load SPECS (files + driver-built reader
    // factories), not maps — executors build and cache the delete state.
    // Foreign-format (ORC/Avro) delete files get their own factories over
    // the same key schema, so jumbo foreign sets stay executor-side too.
    val spark = SparkSession.active
    val specSerConf = new graft.tables.TableWrite.SerializableHadoopConf(
      org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))
    val eqSpecs: Array[EqLoadSpec] =
      if (!executorSide) Array.empty
      else liveEqDeletes.groupBy(_.file.equalityIds).toSeq.flatMap { case (eqIds, files) =>
        val keyFields = eqIds.flatMap(id => iceSchema.fieldById(id))
        if (keyFields.isEmpty) None
        else {
          val keySchema = StructType(keyFields.map(SchemaConvert.toSparkField))
          val types = keyFields.map(f => SchemaConvert.toSparkType(f.fieldType)).toArray
          Some(EqLoadSpec(
            keyFields.map(f => nameToOrdinal(f.name)).toArray,
            types,
            files.map(p => DeleteFileRef(
              p.file.filePath, p.file.fileSizeInBytes, p.seq,
              fmt = deleteFmt(p))).toArray,
            org.apache.spark.sql.GraftBridge.parquetReaderFactory(
              spark, keySchema, keySchema, Array.empty),
            orcFactory =
              if (!files.exists(deleteFmt(_) == "orc")) null
              else GraftOrcIdFactory(org.apache.spark.sql.GraftBridge
                .orcFactoryBuilder(spark, keySchema, keySchema), Array.empty),
            avroFactory =
              if (!files.exists(deleteFmt(_) == "avro")) null
              else GraftAvroReaderFactory(keySchema, specSerConf)))
        }
      }.toArray
    val eqExecMaxBytes = GraftTable.eqDeleteExecutorMaxBytes(spark)
    val eqCacheKey: String = {
      // signature includes the key SCHEMA (ids + types): a type promotion
      // between scans must never hit a stale map whose UnsafeRows carry
      // the old layout (probes would silently miss)
      val schemaSig = eqSpecs.map(s =>
        s.keyOrdinals.mkString("o", ".", "") + s.keyTypes.map(_.catalogString).mkString("t", ".", ""))
        .mkString(";")
      val sig = table.location + "#" +
        liveEqDeletes.map(p => s"${p.file.filePath}:${p.seq}").sorted.mkString(",") +
        "#" + schemaSig + "#" + eqExecMaxBytes
      java.security.MessageDigest.getInstance("MD5")
        .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }
    // shipped always: range-split readers need it for the footer-derived
    // position seed; executor-side mode for the pos-delete reads too.
    // Built from sessionState (not the raw SparkContext conf) so
    // session-scoped hadoop/FS options — per-session credentials set via
    // spark.conf — reach the executor-side delete reads too.
    val serConf = new graft.tables.TableWrite.SerializableHadoopConf(
      org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))
    // Columnar path, decided SCAN-GLOBALLY (Spark rejects mixed
    // row/columnar partitions): vectorized batches serve whenever the
    // output carries no metadata columns and no file needs per-file
    // default literals. Files WITH deletes stay vectorized too — deleted
    // ordinals are masked per batch through a row-id-mapping vector view
    // ([[MaskedColumnVector]]), never row-by-row materialized. The inner
    // columnar read covers innerSchema (required + eq-key columns); the
    // batch projects back down to requiredSchema.
    // non-parquet data files read through their own row factories; the
    // columnar (batch-masking) path stays parquet-only in the MoR scan
    val hasOrcPart = plannedPartitions.exists {
      _.asInstanceOf[GraftMorInputPartition].format == "orc"
    }
    val hasAvroPart = plannedPartitions.exists {
      _.asInstanceOf[GraftMorInputPartition].format == "avro"
    }
    // ORC: field-id resolution when the files carry iceberg.id
    // attributes, name fallback otherwise (see GraftOrcIdFactory)
    val orcNoPushF =
      if (!hasOrcPart) null
      else GraftOrcIdFactory(
        org.apache.spark.sql.GraftBridge.orcFactoryBuilder(
          spark, dataSchema, innerSchema), Array.empty[Filter])
    val orcPushF =
      if (!hasOrcPart) null
      else if (pushedFilters.isEmpty) orcNoPushF
      else GraftOrcIdFactory(
        org.apache.spark.sql.GraftBridge.orcFactoryBuilder(
          spark, dataSchema, innerSchema), pushedFilters)
    val avroF =
      if (!hasAvroPart) null
      else GraftAvroReaderFactory(innerSchema,
        new graft.tables.TableWrite.SerializableHadoopConf(
          org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)))
    val hasMetaOut = requiredSchema.fieldNames.exists(metaNames.contains)
    val colEligible = !hasMetaOut && !hasOrcPart && !hasAvroPart &&
      plannedPartitions.forall {
        _.asInstanceOf[GraftMorInputPartition].defaults.isEmpty
      }
    // position counting must see every row — partitions with position
    // deletes read through the push-free factory (no row-group skipping)
    val colPush =
      if (!colEligible) null
      else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
        spark, dataSchema, innerSchema, pushedFilters)
    val colNoPush =
      if (!colEligible) null
      else if (pushedFilters.isEmpty) colPush
      else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
        spark, dataSchema, innerSchema, Array.empty[Filter])
    val colPushExt =
      if (!colEligible || !hasExternal) null
      else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
        spark, stripIds(dataSchema), stripIds(innerSchema), pushedFilters)
    val colNoPushExt =
      if (!colEligible || !hasExternal) null
      else if (pushedFilters.isEmpty) colPushExt
      else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
        spark, stripIds(dataSchema), stripIds(innerSchema), Array.empty[Filter])
    // output field plan: data columns bind to inner ordinals; _file is a
    // per-partition constant; _pos reads the counter appended after the
    // inner columns; defaulted ordinals become per-partition literals
    val outFields: Array[OutField] = requiredSchema.fields.map { f =>
      if (f.name == "_file") OutField.FileConst
      else if (f.name == "_pos") OutField.PosCounter
      else if (f.name == "_row_id") OutField.RowId
      else if (f.name == "_last_updated_sequence_number") OutField.LastSeqConst
      else if (f.name == "_spec_id") OutField.SpecIdConst
      else if (f.name == "_partition") OutField.PartitionConst
      else if (f.name == "_deleted") OutField.DeletedFlag
      else OutField.Inner(nameToOrdinal(f.name), f.dataType)
    }
    // _pos/_row_id in the OUTPUT must see true file positions: row-group
    // skipping from pushed filters would shift the counter, so exact
    // positions force the no-push reader for every partition
    val needsExactPositions =
      outFields.contains(OutField.PosCounter) || outFields.contains(OutField.RowId) ||
        // flagged mode must SEE every row, so no row-group skipping
        outFields.contains(OutField.DeletedFlag)
    // executor-tier FOREIGN position-delete reads: driver-built row
    // factories over the spec's (file_path, pos) schema (reserved ids)
    val posDelSchema = StructType(Seq(
      SchemaConvert.toSparkField(
        IceField(2147483546, "file_path", required = true, IcePrim("string"))),
      SchemaConvert.toSparkField(
        IceField(2147483545, "pos", required = true, IcePrim("long")))))
    val posOrcF =
      if (!executorSide || !pqPosDeletes.exists(deleteFmt(_) == "orc")) null
      else GraftOrcIdFactory(org.apache.spark.sql.GraftBridge
        .orcFactoryBuilder(spark, posDelSchema, posDelSchema), Array.empty)
    val posAvroF =
      if (!executorSide || !pqPosDeletes.exists(deleteFmt(_) == "avro")) null
      else GraftAvroReaderFactory(posDelSchema, specSerConf)
    new GraftMorReaderFactory(
      if (needsExactPositions) innerNoPush else innerPush,
      innerNoPush, groups, outFields, innerSchema.length,
      serConf, eqSpecs, eqCacheKey, colPush, eqExecMaxBytes,
      colNoPush, requiredSchema.length,
      if (needsExactPositions) extNoPush else extPush,
      extNoPush, colPushExt, colNoPushExt,
      if (needsExactPositions) orcNoPushF else orcPushF,
      orcNoPushF, avroF,
      nameToOrdinal.getOrElse(GraftTable.RowIdCol, -1),
      nameToOrdinal.getOrElse(GraftTable.LastUpdatedSeqCol, -1),
      partitionMetaType,
      posOrcF, posAvroF)
  }

  override def description(): String =
    s"GraftMorScan(${table.location}, ${dataFiles.size} data files, " +
      s"${pqPosDeletes.size} pos-delete files, ${dvDeletes.size} deletion " +
      s"vectors, ${eqDeletes.size} eq-delete files)"

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(
      new DataFilesMetric, new PosDeleteFilesMetric,
      new EqDeleteFilesMetric, new RowsDeletedMetric)

  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      GraftTaskMetric("graftDataFiles", currentData.size.toLong),
      GraftTaskMetric("graftPosDeleteFiles", posDeletes.size.toLong),
      GraftTaskMetric("graftEqDeleteFiles", liveEqDeletes.size.toLong))
}

/** file (or byte-range split) partition + its data sequence, deleted
  * positions (plan-time mode) or candidate delete files (executor-side
  * mode), path (for the `_file` metadata column), per-file default
  * literals, and the range start (readers of a non-zero range seed the
  * position counter from the footer) */
case class GraftMorInputPartition(
    filePartition: InputPartition,
    dseq: Long,
    positions: Array[Long],
    path: String,
    defaults: Array[(Int, Any)],
    posCandidates: Array[DeleteFileRef] = Array.empty,
    rangeStart: Long = 0L,
    posSeedPre: Long = -1L,
    external: Boolean = false,
    format: String = "parquet",
    firstRowId: Long = -1L,
    specId: Int = 0,
    partTuple: InternalRow = null)
    extends InputPartition

case class EqGroupState(
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType],
    keys: EqLookup,
    maxSeq: Long = Long.MaxValue)

/** how each output field is produced */
sealed trait OutField extends Serializable
object OutField {
  case class Inner(ordinal: Int, dataType: DataType) extends OutField
  case object FileConst extends OutField
  case object PosCounter extends OutField
  /** v3 row lineage: file first_row_id + position (null without ids) */
  case object RowId extends OutField
  /** the data sequence that last wrote the row (its file's sequence) */
  case object LastSeqConst extends OutField
  /** partition spec id of the row's file (per-partition constant) */
  case object SpecIdConst extends OutField
  /** partition tuple of the row's file, default-spec shape */
  case object PartitionConst extends OutField
  /** MoR delete flag: selecting it serves EVERY row, deleted ones
    * flagged true instead of filtered out (Iceberg's `_deleted`) */
  case object DeletedFlag extends OutField
}

class GraftMorReaderFactory(
    innerPush: PartitionReaderFactory,
    innerNoPush: PartitionReaderFactory,
    planTimeEqGroups: Array[EqGroupState],
    outFields: Array[OutField],
    innerLen: Int,
    serConf: graft.tables.TableWrite.SerializableHadoopConf = null,
    eqSpecs: Array[EqLoadSpec] = Array.empty,
    eqCacheKey: String = "",
    colPush: PartitionReaderFactory = null,
    eqExecMaxBytes: Long = Long.MaxValue,
    colNoPush: PartitionReaderFactory = null,
    numOutputCols: Int = -1,
    // name-resolving (id-stripped) variants for add_files imports
    extPush: PartitionReaderFactory = null,
    extNoPush: PartitionReaderFactory = null,
    colPushExt: PartitionReaderFactory = null,
    colNoPushExt: PartitionReaderFactory = null,
    // non-parquet data-file formats (whole-file partitions, row readers)
    orcPush: PartitionReaderFactory = null,
    orcNoPush: PartitionReaderFactory = null,
    avroFactory: PartitionReaderFactory = null,
    // inner ordinals of the materialized row-lineage columns (-1 = absent)
    rowIdOrd: Int = -1,
    lastSeqOrd: Int = -1,
    // the `_partition` metadata column's struct type (default-spec shape)
    partitionType: StructType = new StructType(),
    // executor-tier FOREIGN (orc/avro) position-delete read factories
    posOrcFactory: PartitionReaderFactory = null,
    posAvroFactory: PartitionReaderFactory = null)
    extends PartitionReaderFactory {

  private def rowFactory(mor: GraftMorInputPartition, push: Boolean): PartitionReaderFactory =
    mor.format match {
      case "orc" => if (push) orcPush else orcNoPush
      case "avro" => avroFactory // filters re-applied above the scan
      case _ =>
        if (mor.external && extNoPush != null) { if (push) extPush else extNoPush }
        else { if (push) innerPush else innerNoPush }
    }

  private def colFactory(mor: GraftMorInputPartition, push: Boolean): PartitionReaderFactory =
    if (mor.external && colNoPushExt != null) { if (push) colPushExt else colNoPushExt }
    else { if (push) colPush else colNoPush }

  /** Columnar path: available whenever the scan's output needs no
    * per-row synthesis (metadata columns / default literals). Deletes no
    * longer force the row reader — they mask batch ordinals instead. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    colNoPush != null && (partition match {
      case mor: GraftMorInputPartition =>
        colNoPush.supportColumnarReads(mor.filePartition)
      case _ => false
    })

  /** this task's delete state: positions for ITS file, the position
    * counter seed for ITS byte range, and the equality lookups (plan-time
    * closure state or executor-side cached loads) */
  private def resolveDeletes(mor: GraftMorInputPartition): (Array[Long], Long, Array[EqGroupState]) = {
    // executor-side mode: pushdown position-delete reads for THIS file
    val positions: Array[Long] =
      if (mor.posCandidates.isEmpty) mor.positions
      else DeleteState.positionsFor(mor.path, mor.dseq, mor.posCandidates,
        serConf.value, posOrcFactory, posAvroFactory)
    // byte-range split: positions are absolute within the file, so the
    // counter seeds with the rows preceding this range. The driver ships
    // the seed when positions matter; -1 with no position consumers means
    // the counter value is irrelevant (footer read skipped entirely).
    val needsPositions =
      positions.nonEmpty || outFields.contains(OutField.PosCounter)
    val seed: Long =
      if (mor.rangeStart == 0L) 0L
      else if (mor.posSeedPre >= 0L) mor.posSeedPre
      else if (needsPositions) DeleteState.posSeed(mor.path, mor.rangeStart, serConf.value)
      else 0L
    // a group whose NEWEST delete is at/before the file's sequence can
    // never match (eseq > dseq required) — skip its per-row probes
    // entirely; compacted/fresh files over old CDC deletes pay nothing
    val eqGroups: Array[EqGroupState] =
      (if (eqSpecs.isEmpty) planTimeEqGroups
      else DeleteState.eqLookups(eqCacheKey, eqSpecs, eqExecMaxBytes).zip(eqSpecs).map {
        case (lookup, spec) =>
          EqGroupState(spec.keyOrdinals, spec.keyTypes, lookup, spec.files.map(_.seq).max)
      }).filter(_.maxSeq > mor.dseq)
    (positions, seed, eqGroups)
  }

  private def keyProjsOf(eqGroups: Array[EqGroupState]) = eqGroups.map { g =>
    UnsafeProjection.create(g.keyOrdinals.zip(g.keyTypes).map {
      case (ord, t) => BoundReference(ord, t, nullable = true) })
  }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val mor = partition.asInstanceOf[GraftMorInputPartition]
    val (positions, seed, eqGroups) = resolveDeletes(mor)
    // row-group skipping must stay off while positions are counted
    val inner = colFactory(mor, push = positions.isEmpty)
      .createColumnarReader(mor.filePartition)
    val passthrough =
      positions.isEmpty && eqGroups.isEmpty && innerLen == numOutputCols
    if (passthrough) inner
    else new PartitionReader[ColumnarBatch] {
      private val keyProjs = keyProjsOf(eqGroups)
      private var pos = seed - 1L
      private var mapBuf = Array.emptyIntArray
      private var current: ColumnarBatch = _
      private var rowsDeleted = 0L

      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(GraftTaskMetric("graftRowsDeleted", rowsDeleted))

      private def eqDeleted(row: InternalRow, dseq: Long): Boolean = {
        var i = 0
        while (i < eqGroups.length) {
          val eseq = eqGroups(i).keys.get(keyProjs(i)(row))
          if (eseq != null && eseq > dseq) return true
          i += 1
        }
        false
      }

      override def next(): Boolean = {
        if (!inner.next()) return false
        val batch = inner.get()
        val n = batch.numRows()
        if (positions.isEmpty && eqGroups.isEmpty) {
          current = GraftColumnarMask.project(batch, numOutputCols)
          return true
        }
        if (mapBuf.length < n) mapBuf = new Array[Int](n)
        var kept = 0
        var i = 0
        while (i < n) {
          pos += 1L
          val del =
            (positions.length > 0 &&
              java.util.Arrays.binarySearch(positions, pos) >= 0) ||
            (eqGroups.nonEmpty && eqDeleted(batch.getRow(i), mor.dseq))
          if (!del) { mapBuf(kept) = i; kept += 1 } else rowsDeleted += 1
          i += 1
        }
        current =
          if (kept == n && innerLen == numOutputCols) batch
          else if (kept == n) GraftColumnarMask.project(batch, numOutputCols)
          else GraftColumnarMask.mask(batch, numOutputCols, mapBuf, kept)
        true
      }

      override def get(): ColumnarBatch = current

      override def close(): Unit = inner.close()
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val mor = partition.asInstanceOf[GraftMorInputPartition]
    val (positions, seed, eqGroups) = resolveDeletes(mor)
    val reader =
      rowFactory(mor, push = positions.isEmpty)
        .createReader(mor.filePartition)
    new PartitionReader[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.{JoinedRow, Literal}
      private val defaultOf = mor.defaults.toMap
      // project from JoinedRow(innerRow, [pos]): data columns bind to
      // inner ordinals (or become per-file default literals), _file is a
      // partition-constant literal, _pos reads the appended counter slot
      private val outProj = UnsafeProjection.create(outFields.zipWithIndex.map {
        case (OutField.Inner(ord, t), outIdx) =>
          defaultOf.get(outIdx) match {
            case Some(v) => Literal(v, t) // already a catalyst value
            case None => BoundReference(ord, t, nullable = true)
          }
        case (OutField.FileConst, _) =>
          // same URI form as the facade's _metadata.file_path
          Literal.create(
            if (mor.path.startsWith("/")) s"file://${mor.path}" else mor.path,
            org.apache.spark.sql.types.StringType)
        case (OutField.PosCounter, _) =>
          BoundReference(innerLen, org.apache.spark.sql.types.LongType, nullable = false)
        case (OutField.RowId, _) =>
          // materialized _row_id (rewritten files) wins; fallback is
          // first_row_id + position, null when the file carries no ids
          val fallback =
            if (mor.firstRowId < 0L)
              Literal.create(null, org.apache.spark.sql.types.LongType)
            else org.apache.spark.sql.catalyst.expressions.Add(
              BoundReference(innerLen, org.apache.spark.sql.types.LongType, nullable = false),
              Literal(mor.firstRowId))
          org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
            BoundReference(rowIdOrd, org.apache.spark.sql.types.LongType, nullable = true),
            fallback))
        case (OutField.LastSeqConst, _) =>
          org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
            BoundReference(lastSeqOrd, org.apache.spark.sql.types.LongType, nullable = true),
            Literal(mor.dseq)))
        case (OutField.SpecIdConst, _) => Literal(mor.specId)
        case (OutField.PartitionConst, _) => Literal(mor.partTuple, partitionType)
        case (OutField.DeletedFlag, _) =>
          BoundReference(innerLen + 1,
            org.apache.spark.sql.types.BooleanType, nullable = false)
      })
      private val emitDeleted = outFields.contains(OutField.DeletedFlag)
      // [position, deleted-flag] appended after the inner columns
      private val posRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      private val joined = new JoinedRow
      private val keyProjs = keyProjsOf(eqGroups)
      private var pos = seed - 1L
      private var current: InternalRow = _
      private var rowsDeleted = 0L

      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(GraftTaskMetric("graftRowsDeleted", rowsDeleted))

      private def deleted(row: InternalRow): Boolean = {
        if (positions.length > 0 &&
          java.util.Arrays.binarySearch(positions, pos) >= 0) return true
        var i = 0
        while (i < eqGroups.length) {
          val eseq = eqGroups(i).keys.get(keyProjs(i)(row))
          if (eseq != null && eseq > mor.dseq) return true
          i += 1
        }
        false
      }

      override def next(): Boolean = {
        while (reader.next()) {
          pos += 1
          val row = reader.get()
          val del = deleted(row)
          if (del) rowsDeleted += 1
          // `_deleted` output serves EVERY row with the flag instead of
          // filtering (Iceberg's _deleted semantics)
          if (!del || emitDeleted) {
            posRow.update(0, pos)
            posRow.update(1, del)
            current = outProj(joined(row, posRow))
            return true
          }
        }
        false
      }

      override def get(): InternalRow = current

      override def close(): Unit = reader.close()
    }
  }
}
