package graft.tables

/** In-memory Iceberg table metadata model (spec-shaped; mirrors the
  * reference's TableMetadata surface, icelake/src/types/in_memory.rs:2454-2538,
  * re-expressed as plain Scala case classes). */

sealed trait IceType {
  /** spec string form for primitives; descriptive for nested */
  def repr: String
}
case class IcePrim(name: String) extends IceType { def repr: String = name }
case class IceDecimal(precision: Int, scale: Int) extends IceType {
  def repr = s"decimal($precision, $scale)"
}
case class IceFixed(length: Int) extends IceType { def repr = s"fixed[$length]" }
case class IceStruct(fields: List[IceField]) extends IceType { def repr = "struct" }
case class IceList(elementId: Int, element: IceType, elementRequired: Boolean)
    extends IceType { def repr = "list" }
case class IceMap(keyId: Int, key: IceType, valueId: Int, value: IceType,
    valueRequired: Boolean) extends IceType { def repr = "map" }

/** `initialDefault` is served for files written BEFORE the field existed;
  * `writeDefault` fills the column when a write omits it (the reference's
  * Field defaults, icelake/src/types/in_memory.rs:436-453) — together they
  * make adding a required column to a non-empty table legal. */
case class IceField(
    id: Int,
    name: String,
    required: Boolean,
    fieldType: IceType,
    doc: Option[String] = None,
    initialDefault: Option[Any] = None,
    writeDefault: Option[Any] = None)

case class IceSchema(
    schemaId: Int,
    fields: List[IceField],
    /** Iceberg `identifier-field-ids`: the schema-declared row-identity
      * key (spec: required, primitive, non-float top-level fields) —
      * upserts/CDC default their equality keys to it */
    identifierFieldIds: List[Int] = Nil) {
  def findField(name: String): Option[IceField] = fields.find(_.name == name)
  def identifierFieldNames: List[String] =
    identifierFieldIds.flatMap(id => fieldById(id).map(_.name))
  def fieldById(id: Int): Option[IceField] = fields.find(_.id == id)
  /** whether any field (nested included) is a v3-only type (`variant`,
    * `timestamp_ns`, `timestamptz_ns`, `unknown`) — callers gate these on
    * `format-version >= 3` (spec: v3 additions; older readers cannot
    * decode them) */
  def usesV3Types: Boolean = {
    def in(t: IceType): Boolean = t match {
      case IcePrim("variant") | IcePrim("timestamp_ns") |
          IcePrim("timestamptz_ns") | IcePrim("unknown") => true
      case IceStruct(fs) => fs.exists(f => in(f.fieldType))
      case IceList(_, e, _) => in(e)
      case IceMap(_, k, _, v, _) => in(k) || in(v)
      case _ => false
    }
    fields.exists(f => in(f.fieldType))
  }

  /** The fields the SPARK surface sees: v3 `unknown` columns are
    * declare-now-type-later placeholders — they hold no data (the spec
    * omits them from data files, every value is null) and Spark has no
    * type for an always-null stored column, so scans and writes simply
    * exclude them until a type promotion makes them real. The metadata
    * surface (schema JSON, metadata tables) keeps the full field list. */
  def visibleFields: List[IceField] =
    fields.filterNot(_.fieldType == IcePrim("unknown"))

  /** spec constraints on `unknown` columns: optional only (a required
    * always-null column is unsatisfiable) and top-level only here (a
    * nested unknown cannot be excluded from the Spark surface without
    * rewriting the containing struct). Returns an error, or None. */
  def invalidUnknown: Option[String] = {
    def nested(t: IceType): Boolean = t match {
      case IceStruct(fs) => fs.exists(f =>
        f.fieldType == IcePrim("unknown") || nested(f.fieldType))
      case IceList(_, e, _) => e == IcePrim("unknown") || nested(e)
      case IceMap(_, k, _, v, _) =>
        k == IcePrim("unknown") || v == IcePrim("unknown") || nested(k) || nested(v)
      case _ => false
    }
    fields.collectFirst {
      case f if f.fieldType == IcePrim("unknown") && f.required =>
        s"unknown column ${f.name} must be optional"
      case f if nested(f.fieldType) =>
        s"nested unknown type under ${f.name} is not supported"
    }
  }

  /** kept for callers that ask specifically about variant */
  def usesVariant: Boolean = {
    def in(t: IceType): Boolean = t match {
      case IcePrim("variant") => true
      case IceStruct(fs) => fs.exists(f => in(f.fieldType))
      case IceList(_, e, _) => in(e)
      case IceMap(_, k, _, v, _) => in(k) || in(v)
      case _ => false
    }
    fields.exists(f => in(f.fieldType))
  }

  def maxFieldId: Int = {
    def maxIn(t: IceType): Int = t match {
      case IceStruct(fs) => (0 :: fs.map(f => math.max(f.id, maxIn(f.fieldType)))).max
      case IceList(eid, e, _) => math.max(eid, maxIn(e))
      case IceMap(kid, k, vid, v, _) => List(kid, vid, maxIn(k), maxIn(v)).max
      case _ => 0
    }
    (0 :: fields.map(f => math.max(f.id, maxIn(f.fieldType)))).max
  }
}

/** Partition transforms in spec string form: identity, bucket[N],
  * truncate[W], year, month, day, hour, void. */
case class IcePartitionField(sourceId: Int, fieldId: Int, transform: String, name: String)

case class IcePartitionSpec(specId: Int, fields: List[IcePartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty
}

case class IceSortField(sourceId: Int, transform: String, direction: String, nullOrder: String)
case class IceSortOrder(orderId: Int, fields: List[IceSortField])

/** `firstRowId` is the format-v3 row-lineage base: the snapshot's added
  * data files partition the id range `[firstRowId, firstRowId + added
  * records)` in commit order. */
case class IceSnapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Option[Int],
    firstRowId: Option[Long] = None)

/** Branch/tag reference with retention knobs (the reference's
  * SnapshotReference, icelake/src/types/in_memory.rs:2360-2410). Retention
  * fields are advisory for branches; `expireSnapshots` never drops a
  * snapshot reachable from a live ref. */
case class IceSnapshotRef(
    snapshotId: Long,
    refType: String,
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None)

/** A live file of a snapshot as planned for a scan: its data sequence
  * number (manifest-inherited when absent) and the partition spec its
  * partition tuple is aligned to — metadata can hold several specs, so
  * pruning must interpret each tuple against its own spec. */
case class PlannedFile(file: IceDataFile, seq: Long, specId: Int)

case class IceLogEntry(timestampMs: Long, ref: String)

/** footer metadata of one statistics blob, registered in table metadata
  * so planners read NDV estimates without opening the puffin file */
case class IceBlobMetadata(
    blobType: String,
    snapshotId: Long,
    sequenceNumber: Long,
    fields: List[Int],
    properties: Map[String, String])

/** a `statistics` entry of table metadata (Iceberg table-statistics
  * shape): one puffin file of sketches computed at a snapshot */
case class IceStatisticsFile(
    snapshotId: Long,
    statisticsPath: String,
    fileSizeInBytes: Long,
    fileFooterSizeInBytes: Long,
    blobMetadata: List[IceBlobMetadata])

/** a `partition-statistics` entry (Iceberg partition-statistics shape):
  * one parquet file of per-partition rollups computed at a snapshot —
  * O(partitions) to read, vs a manifest walk per query */
case class IcePartitionStatisticsFile(
    snapshotId: Long,
    statisticsPath: String,
    fileSizeInBytes: Long)

case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    schemas: List[IceSchema],
    currentSchemaId: Int,
    partitionSpecs: List[IcePartitionSpec],
    defaultSpecId: Int,
    lastPartitionId: Int,
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: List[IceSnapshot],
    snapshotLog: List[IceLogEntry],
    metadataLog: List[IceLogEntry],
    sortOrders: List[IceSortOrder],
    defaultSortOrderId: Int,
    refs: Map[String, IceSnapshotRef],
    statistics: List[IceStatisticsFile] = Nil,
    partitionStatistics: List[IcePartitionStatisticsFile] = Nil,
    // format-v3 row lineage: next unassigned row id (`next-row-id`)
    nextRowId: Long = 0L) {

  def currentSchema: IceSchema =
    schemas.find(_.schemaId == currentSchemaId)
      .getOrElse(sys.error(s"schema $currentSchemaId not found"))

  def defaultSpec: IcePartitionSpec =
    partitionSpecs.find(_.specId == defaultSpecId)
      .getOrElse(IcePartitionSpec(0, Nil))

  def specById(id: Int): IcePartitionSpec =
    partitionSpecs.find(_.specId == id).getOrElse(defaultSpec)

  def currentSnapshot: Option[IceSnapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))

  def snapshotById(id: Long): Option[IceSnapshot] = snapshots.find(_.snapshotId == id)

  def schemaFor(s: IceSnapshot): IceSchema =
    s.schemaId.flatMap(id => schemas.find(_.schemaId == id)).getOrElse(currentSchema)

  /** snapshot visible as of a wall-clock timestamp */
  def snapshotAsOf(timestampMs: Long): Option[IceSnapshot] =
    snapshots.filter(_.timestampMs <= timestampMs).sortBy(_.timestampMs).lastOption
}

object DataContent {
  val Data = 0
  val PositionDeletes = 1
  val EqualityDeletes = 2
}

/** One data/delete file tracked in a manifest (the reference's DataFile,
  * icelake/src/types/in_memory.rs:1722-1848). Partition holds one value per
  * spec field, already transformed. Bounds use Iceberg single-value binary
  * serialization keyed by field id. */
case class IceDataFile(
    content: Int,
    filePath: String,
    fileFormat: String,
    partition: Seq[Option[Any]],
    recordCount: Long,
    fileSizeInBytes: Long,
    columnSizes: Map[Int, Long] = Map.empty,
    valueCounts: Map[Int, Long] = Map.empty,
    nullValueCounts: Map[Int, Long] = Map.empty,
    nanValueCounts: Map[Int, Long] = Map.empty,
    distinctCounts: Map[Int, Long] = Map.empty,
    lowerBounds: Map[Int, Array[Byte]] = Map.empty,
    upperBounds: Map[Int, Array[Byte]] = Map.empty,
    splitOffsets: Seq[Long] = Nil,
    equalityIds: Seq[Int] = Nil,
    sortOrderId: Option[Int] = None,
    // deletion-vector entries (format-v3 shape): the puffin blob's
    // referenced data file and its byte extent inside filePath
    referencedDataFile: Option[String] = None,
    contentOffset: Option[Long] = None,
    contentSizeInBytes: Option[Long] = None,
    // format-v3 row lineage: `_row_id` of row at position p is
    // firstRowId + p; None = ids unavailable for this file (spec-legal —
    // rewrites that do not materialize ids null this out)
    firstRowId: Option[Long] = None) {
  /** a position-delete entry stored as a puffin deletion vector */
  def isDeletionVector: Boolean =
    fileFormat == "puffin" && referencedDataFile.isDefined
}

object ManifestStatus {
  val Existing = 0
  val Added = 1
  val Deleted = 2
}

case class IceManifestEntry(
    status: Int,
    snapshotId: Option[Long],
    dataSequenceNumber: Option[Long],
    fileSequenceNumber: Option[Long],
    dataFile: IceDataFile)

case class IceManifestFile(
    entries: List[IceManifestEntry],
    schemaId: Int,
    specId: Int,
    content: Int) // 0=data, 1=deletes

/** per-partition-field summary over a manifest's entries (the reference's
  * FieldSummary, icelake/src/types/in_memory.rs:1354-1372 — parsed but
  * unused there; here it powers manifest-level pruning) */
case class IceFieldSummary(
    containsNull: Boolean,
    lowerBound: Option[Array[Byte]],
    upperBound: Option[Array[Byte]])

case class IceManifestListEntry(
    manifestPath: String,
    manifestLength: Long,
    partitionSpecId: Int,
    content: Int,
    sequenceNumber: Long,
    minSequenceNumber: Long,
    addedSnapshotId: Long,
    addedFilesCount: Int,
    existingFilesCount: Int,
    deletedFilesCount: Int,
    addedRowsCount: Long,
    existingRowsCount: Long,
    deletedRowsCount: Long,
    partitions: Seq[IceFieldSummary] = Nil)
