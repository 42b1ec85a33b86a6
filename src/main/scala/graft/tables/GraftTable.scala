package graft.tables

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.transforms

/** Iceberg-capable table: snapshot scans with MoR delete application,
  * copy-on-write appends, equality/position deletes, upserts, time travel.
  *
  * Spark-first design (vs the reference's single-process writer stack):
  * the write path is a normal Spark parquet write clustered by the
  * partition-transform columns (hidden partitioning), stats harvest runs as
  * a distributed job over the written footers, and only the
  * manifest/metadata commit is driver-side — the same split the reference
  * draws between its task writers and Transaction
  * (icelake/src/transaction.rs:37-104). Delete application on read is the
  * piece the reference never finished (icelake/src/io/scan.rs — raw data
  * files only): here position deletes anti-join on (_file, _pos) and
  * equality deletes anti-join on key columns with sequence-number
  * visibility, both broadcast when small. */
class GraftTable(
    val location: String,
    @volatile var metadata: TableMetadata,
    @volatile var version: Int,
    val conf: Configuration) {

  /** metadata commit hook: storage catalog by default; the REST catalog
    * overrides this with its HTTP CAS commit */
  protected[tables] var committer: (TableMetadata, Int) => Int =
    (m, v) => StorageCatalog.commitMetadata(conf, location, v, m)

  protected[tables] var reloader: () => GraftTable =
    () => StorageCatalog.loadTable(conf, location)

  import GraftTable._

  def refresh(): GraftTable = {
    val t = reloader()
    metadata = t.metadata
    version = t.version
    this
  }

  /** Paths inside fixture tables may carry their original absolute
    * location; remap onto where the table actually sits now. */
  def relocate(path: String): String =
    if (path.startsWith(location)) path
    else if (path.startsWith(metadata.location))
      location + path.stripPrefix(metadata.location)
    else path

  // ---------- planning ----------

  /** live files of a snapshot with their data sequence numbers
    * (manifest-list sequence inherited when the entry carries none).
    * With a filter, whole data manifests are skipped via the manifest
    * list's per-partition-field summaries before their Avro is read —
    * at 100 TB this bounds planning cost by surviving manifests, not
    * total manifests. */
  def planFiles(
      snapshot: IceSnapshot,
      filter: Option[Column] = None): List[(IceDataFile, Long)] = {
    val allEntries = ManifestIO.readManifestList(conf, relocate(snapshot.manifestList))
    val entries = filter match {
      case Some(c) =>
        val expr = org.apache.spark.sql.GraftBridge.catalystExpression(c)
        allEntries.filter { mf =>
          // deletes always load; data manifests prune by summary
          mf.content != 0 || PruneEval.manifestMayMatch(
            expr, mf.partitions, metadata.specById(mf.partitionSpecId),
            metadata.currentSchema)
        }
      case None => allEntries
    }
    entries.flatMap { mf =>
      val spec = metadata.specById(mf.partitionSpecId)
      ManifestIO.readManifest(conf, relocate(mf.manifestPath), spec.fields.map(_.name))
        .filter(_.status != ManifestStatus.Deleted)
        .map { e =>
          val seq = e.dataSequenceNumber.getOrElse(mf.sequenceNumber)
          (e.dataFile.copy(filePath = relocate(e.dataFile.filePath)), seq)
        }
    }
  }

  def resolveSnapshot(
      snapshotId: Option[Long],
      asOfTimestampMs: Option[Long]): Option[IceSnapshot] =
    snapshotId.flatMap(metadata.snapshotById)
      .orElse(asOfTimestampMs.flatMap(metadata.snapshotAsOf))
      .orElse(metadata.currentSnapshot)

  // ---------- read path ----------

  /** Snapshot scan as a DataFrame. `filter` is used for file-level pruning
    * (partition transforms + column bounds) AND re-applied row-level, so
    * results are correct regardless of pruning power. */
  def scan(
      spark: SparkSession,
      snapshotId: Option[Long] = None,
      asOfTimestampMs: Option[Long] = None,
      filter: Option[Column] = None,
      keepFilePos: Boolean = false): DataFrame = {
    // our data files carry iceberg field ids; resolve parquet columns by id
    // so renamed columns keep reading pre-rename files (id-based resolution,
    // the property the format is built around)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val snap = resolveSnapshot(snapshotId, asOfTimestampMs)
    // time travel pins the snapshot's schema; current reads use the
    // current schema (Iceberg read semantics)
    val timeTravel = snapshotId.isDefined || asOfTimestampMs.isDefined
    val schema =
      if (timeTravel) snap.map(metadata.schemaFor).getOrElse(metadata.currentSchema)
      else metadata.currentSchema
    val sparkSchema = SchemaConvert.toSparkSchema(schema)
    snap match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
      case Some(s) =>
        val all = planFiles(s, filter)
        val allData = all.filter(_._1.content == DataContent.Data)
        val dataFiles = PruneEval.prune(
          allData, filter, metadata.defaultSpec, schema)
        Metrics.inc(Metrics.ScansPlanned)
        Metrics.inc(Metrics.FilesScanned, dataFiles.size.toLong)
        Metrics.inc(Metrics.FilesPruned, (allData.size - dataFiles.size).toLong)
        val posDeletes = all.filter(_._1.content == DataContent.PositionDeletes)
        val eqDeletes = all.filter(_._1.content == DataContent.EqualityDeletes)
        val needPos = posDeletes.nonEmpty || keepFilePos

        if (dataFiles.isEmpty)
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)

        // one scan per data sequence number (visibility group)
        val bySeq = dataFiles.groupBy(_._2).toList.sortBy(_._1)
        val scans = bySeq.map { case (seq, files) =>
          var df = spark.read.schema(sparkSchema).parquet(files.map(_._1.filePath): _*)
          if (needPos)
            df = df
              .withColumn("_file", col("_metadata.file_path"))
              .withColumn("_pos", col("_metadata.row_index"))
          df.withColumn("_dseq", lit(seq))
        }
        var df = scans.reduce(_ unionByName _)

        // position deletes: anti join on (file, pos) where data seq <= delete seq
        if (posDeletes.nonEmpty) {
          val posDf = posDeletes.map { case (f, seq) =>
            spark.read.parquet(f.filePath)
              .select(col("file_path"), col("pos"), lit(seq).as("_pseq"))
          }.reduce(_ unionByName _)
          df = df.join(
            broadcast(posDf),
            col("_file") === col("file_path") && col("_pos") === col("pos") &&
              col("_dseq") <= col("_pseq"),
            "left_anti")
        }

        // equality deletes: per equality-id set, anti join on the key
        // columns where delete seq > data seq (strictly newer deletes win)
        eqDeletes.groupBy(_._1.equalityIds).foreach { case (eqIds, files) =>
          val keyNames = eqIds.flatMap(id => schema.fieldById(id).map(_.name))
          if (keyNames.nonEmpty) {
            val eqDf = files.map { case (f, seq) =>
              spark.read.parquet(f.filePath)
                .select(keyNames.map(n => col(n).as(s"_eq_$n")) :+ lit(seq).as("_eseq"): _*)
            }.reduce(_ unionByName _)
            val cond = keyNames.map(n => col(n) === col(s"_eq_$n"))
              .reduce(_ && _) && col("_eseq") > col("_dseq")
            df = df.join(broadcast(eqDf), cond, "left_anti")
          }
        }

        val dropCols = Seq("_dseq") ++ (if (needPos && !keepFilePos) Seq("_file", "_pos") else Nil)
        df = df.drop(dropCols: _*)
        filter.fold(df)(df.filter)
    }
  }

  /** Incremental read: rows added after `fromSnapshotId` (exclusive) up to
    * `toSnapshotId` (inclusive, default current) — the batch shape of the
    * reference's resumable scan offsets (icelake/src/io/scan.rs:25-28),
    * keyed by snapshot sequence instead of (file, row). Append-only
    * semantics: new data files in the range; deletes in the range apply to
    * the returned slice. */
  def scanIncremental(
      spark: SparkSession,
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None): DataFrame = {
    val from = metadata.snapshotById(fromSnapshotId)
      .getOrElse(sys.error(s"no snapshot $fromSnapshotId"))
    val to = toSnapshotId.flatMap(metadata.snapshotById)
      .orElse(metadata.currentSnapshot)
      .getOrElse(sys.error("no current snapshot"))
    val schema = metadata.currentSchema
    val sparkSchema = SchemaConvert.toSparkSchema(schema)
    val files = planFiles(to).filter { case (f, seq) =>
      seq > from.sequenceNumber && f.content == DataContent.Data
    }
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
    spark.read.schema(sparkSchema).parquet(files.map(_._1.filePath): _*)
  }

  /** files that a filtered scan would read — lets tests assert pruning */
  def filesForScan(filter: Option[Column]): Seq[String] =
    metadata.currentSnapshot.toSeq.flatMap { s =>
      PruneEval.prune(
        planFiles(s).filter(_._1.content == DataContent.Data),
        filter, metadata.defaultSpec, metadata.currentSchema)
        .map(_._1.filePath)
    }

  // ---------- write paths ----------

  def append(spark: SparkSession, df: DataFrame): GraftTable = {
    val files = TableWrite.writeDataFiles(this, spark, df)
    commit(spark, "append", addedData = files, addedDeletes = Nil, replace = false)
  }

  def overwrite(spark: SparkSession, df: DataFrame): GraftTable = {
    val files = TableWrite.writeDataFiles(this, spark, df)
    commit(spark, "overwrite", addedData = files, addedDeletes = Nil, replace = true)
  }

  /** Equality delete: rows matching any key tuple in `keysDf` (projected to
    * `fieldNames`) become invisible for older sequence numbers. */
  def equalityDelete(spark: SparkSession, keysDf: DataFrame, fieldNames: Seq[String]): GraftTable = {
    val schema = metadata.currentSchema
    val ids = fieldNames.map(n => schema.findField(n)
      .getOrElse(sys.error(s"no field $n")).id)
    val files = TableWrite.writeDeleteFiles(
      this, spark, keysDf.select(fieldNames.map(col): _*).distinct(),
      DataContent.EqualityDeletes, ids)
    commit(spark, "delete", addedData = Nil, addedDeletes = files, replace = false)
  }

  /** Position delete: `posDf` must have (file_path: string, pos: long) —
    * obtain them from `scan(keepFilePos = true)`'s _file/_pos columns. */
  def positionDelete(spark: SparkSession, posDf: DataFrame): GraftTable = {
    val normalized = posDf
      .select(col("file_path").cast(StringType), col("pos").cast(LongType))
      .sortWithinPartitions(col("file_path"), col("pos"))
    val files = TableWrite.writeDeleteFiles(
      this, spark, normalized, DataContent.PositionDeletes, Nil)
    commit(spark, "delete", addedData = Nil, addedDeletes = files, replace = false)
  }

  /** CDC upsert (the reference's EqualityDeltaWriter semantics,
    * icelake/src/io_v2/functional_writer/equality_delta_writer.rs:95-260,
    * re-expressed set-wise): one snapshot carrying new data files plus an
    * equality-delete file of the incoming keys. Equality deletes only hit
    * strictly-older sequence numbers, so the new rows survive their own
    * delete. Rows with op=DELETE contribute only the delete. */
  def upsert(
      spark: SparkSession,
      df: DataFrame,
      keyCols: Seq[String],
      opCol: Option[String] = None): GraftTable = {
    val schema = metadata.currentSchema
    val ids = keyCols.map(n => schema.findField(n).getOrElse(sys.error(s"no field $n")).id)
    val (inserts, allKeys) = opCol match {
      case Some(oc) =>
        (df.filter(col(oc) =!= lit(2)).drop(oc), df.select(keyCols.map(col): _*).distinct())
      case None => (df, df.select(keyCols.map(col): _*).distinct())
    }
    val deleteFiles = TableWrite.writeDeleteFiles(
      this, spark, allKeys, DataContent.EqualityDeletes, ids)
    val dataFiles = TableWrite.writeDataFiles(this, spark, inserts)
    commit(spark, "overwrite", addedData = dataFiles, addedDeletes = deleteFiles, replace = false)
  }

  // ---------- maintenance ----------

  /** Compaction (the reference's Spark `rewrite_data_files` integration,
    * icelake/tests/insert_compact_test.rs:198-219, done natively): read the
    * current snapshot (applying deletes), rewrite as fresh data files, and
    * commit a replace snapshot. Collapses small files and absorbs delete
    * files. */
  def rewriteDataFiles(spark: SparkSession): GraftTable = {
    val current = scan(spark)
    overwrite(spark, current)
  }

  /** Expire snapshots older than the timestamp (keeping the current one):
    * drops them from metadata and deletes orphaned manifest lists. Data
    * file deletion is left to a GC pass (kept conservative here). */
  def expireSnapshots(olderThanMs: Long): GraftTable = {
    val base = metadata
    val keepIds = base.currentSnapshotId.toSet ++
      base.snapshots.filter(_.timestampMs >= olderThanMs).map(_.snapshotId)
    val (kept, expired) = base.snapshots.partition(s => keepIds.contains(s.snapshotId))
    if (expired.isEmpty) return this
    val newMeta = base.copy(
      snapshots = kept,
      snapshotLog = base.snapshotLog.filter(e => keepIds.contains(e.ref.toLong)),
      lastUpdatedMs = System.currentTimeMillis())
    val newVersion = committer(newMeta, version)
    metadata = newMeta
    version = newVersion
    expired.foreach { s =>
      try {
        val p = new Path(relocate(s.manifestList))
        p.getFileSystem(conf).delete(p, false)
      } catch { case _: Throwable => }
    }
    this
  }

  // ---------- schema evolution ----------

  /** Add a column with a fresh field id (snapshot-pinned schemas mean old
    * snapshots keep reading their original schema; old data files surface
    * the new column as null). */
  def addColumn(name: String, fieldType: IceType, doc: Option[String] = None): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    require(schema.findField(name).isEmpty, s"column $name already exists")
    val newId = base.lastColumnId + 1
    val newSchema = IceSchema(
      schema.schemaId + 1,
      schema.fields :+ IceField(newId, name, required = false, fieldType, doc))
    commitSchema(newSchema, newId)
  }

  /** Rename keeps the field id; scans resolve parquet columns by field id
    * (`spark.sql.parquet.fieldId.read.enabled`), so pre-rename files keep
    * serving their values under the new name. */
  def renameColumn(from: String, to: String): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    val f = schema.findField(from).getOrElse(sys.error(s"no column $from"))
    val newSchema = IceSchema(
      schema.schemaId + 1,
      schema.fields.map(x => if (x.id == f.id) x.copy(name = to) else x))
    commitSchema(newSchema, base.lastColumnId)
  }

  def dropColumn(name: String): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    require(schema.findField(name).isDefined, s"no column $name")
    val newSchema = IceSchema(
      schema.schemaId + 1, schema.fields.filterNot(_.name == name))
    commitSchema(newSchema, base.lastColumnId)
  }

  private def commitSchema(newSchema: IceSchema, lastColumnId: Int): GraftTable = {
    val base = metadata
    val newMeta = base.copy(
      schemas = base.schemas :+ newSchema,
      currentSchemaId = newSchema.schemaId,
      lastColumnId = lastColumnId,
      lastUpdatedMs = System.currentTimeMillis())
    val newVersion = committer(newMeta, version)
    metadata = newMeta
    version = newVersion
    this
  }

  /** set/replace table properties (metadata-only commit) */
  def setProperties(props: Map[String, String]): GraftTable = {
    val base = metadata
    val newMeta = base.copy(
      properties = base.properties ++ props,
      lastUpdatedMs = System.currentTimeMillis())
    val newVersion = committer(newMeta, version)
    metadata = newMeta
    version = newVersion
    this
  }

  // ---------- branches / tags ----------

  def createTag(name: String, snapshotId: Long): GraftTable =
    commitRef(name, IceSnapshotRef(snapshotId, "tag"))

  def createBranch(name: String, snapshotId: Long): GraftTable =
    commitRef(name, IceSnapshotRef(snapshotId, "branch"))

  private def commitRef(name: String, ref: IceSnapshotRef): GraftTable = {
    val base = metadata
    val newMeta = base.copy(
      refs = base.refs + (name -> ref),
      lastUpdatedMs = System.currentTimeMillis())
    val newVersion = committer(newMeta, version)
    metadata = newMeta
    version = newVersion
    this
  }

  /** scan a named branch or tag */
  def scanRef(spark: SparkSession, refName: String): DataFrame = {
    val ref = metadata.refs.getOrElse(refName, sys.error(s"no ref $refName"))
    scan(spark, snapshotId = Some(ref.snapshotId))
  }

  // ---------- commit ----------

  /** Produce a snapshot from added files and commit metadata with an
    * optimistic check-and-retry loop (the loop the reference stubbed,
    * icelake/src/transaction.rs:29-31). */
  def commit(
      spark: SparkSession,
      operation: String,
      addedData: List[IceDataFile],
      addedDeletes: List[IceDataFile],
      replace: Boolean): GraftTable = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        commitOnce(operation, addedData, addedDeletes, replace)
        done = true
      } catch {
        case _: CommitConflictException if attempt < 5 =>
          Metrics.inc(Metrics.CommitConflicts)
          attempt += 1
          refresh()
      }
    }
    this
  }

  private def commitOnce(
      operation: String,
      addedData: List[IceDataFile],
      addedDeletes: List[IceDataFile],
      replace: Boolean): Unit = {
    val base = metadata
    val seq = base.lastSequenceNumber + 1
    val snapshotId = math.abs(UUID.randomUUID().getLeastSignificantBits)
    val now = System.currentTimeMillis()
    val schema = base.currentSchema
    val spec = base.defaultSpec
    val mdir = StorageCatalog.metadataDir(location)

    var listEntries = List.empty[IceManifestListEntry]
    if (addedData.nonEmpty) {
      val entries = addedData.map(f => IceManifestEntry(
        ManifestStatus.Added, Some(snapshotId), Some(seq), Some(seq), f))
      listEntries :+= ManifestIO.writeManifest(
        conf, s"$mdir/${UUID.randomUUID()}-m0.avro", entries, spec, schema, content = 0)
    }
    if (addedDeletes.nonEmpty) {
      val entries = addedDeletes.map(f => IceManifestEntry(
        ManifestStatus.Added, Some(snapshotId), Some(seq), Some(seq), f))
      listEntries :+= ManifestIO.writeManifest(
        conf, s"$mdir/${UUID.randomUUID()}-d0.avro", entries, spec, schema, content = 1)
    }
    val previous: List[IceManifestListEntry] =
      if (replace) Nil
      else base.currentSnapshot.toList.flatMap(s =>
        ManifestIO.readManifestList(conf, relocate(s.manifestList)))
    val allEntries = previous ++ listEntries

    val listPath = s"$mdir/snap-$snapshotId-$seq-${UUID.randomUUID()}.avro"
    ManifestIO.writeManifestList(
      conf, listPath, allEntries, snapshotId, base.currentSnapshotId, seq)

    val prevSummary = base.currentSnapshot.map(_.summary).getOrElse(Map.empty)
    def prevTotal(key: String): Long = prevSummary.get(key).map(_.toLong).getOrElse(0L)
    val addedRecords = addedData.map(_.recordCount).sum
    val addedSize = (addedData ++ addedDeletes).map(_.fileSizeInBytes).sum
    val summary = Map(
      "operation" -> operation,
      "added-data-files" -> addedData.size.toString,
      "added-delete-files" -> addedDeletes.size.toString,
      "added-records" -> addedRecords.toString,
      "added-files-size" -> addedSize.toString,
      "total-records" ->
        (if (replace) addedRecords else prevTotal("total-records") + addedRecords).toString,
      "total-data-files" ->
        (if (replace) addedData.size.toLong
         else prevTotal("total-data-files") + addedData.size).toString,
      "total-delete-files" ->
        (if (replace) addedDeletes.size.toLong
         else prevTotal("total-delete-files") + addedDeletes.size).toString)

    val snapshot = IceSnapshot(
      snapshotId = snapshotId,
      parentSnapshotId = base.currentSnapshotId,
      sequenceNumber = seq,
      timestampMs = now,
      manifestList = listPath,
      summary = summary,
      schemaId = Some(schema.schemaId))

    val newMeta = base.copy(
      lastSequenceNumber = seq,
      lastUpdatedMs = now,
      currentSnapshotId = Some(snapshotId),
      snapshots = base.snapshots :+ snapshot,
      snapshotLog = base.snapshotLog :+ IceLogEntry(now, snapshotId.toString),
      metadataLog = base.metadataLog :+
        IceLogEntry(base.lastUpdatedMs, s"$mdir/v$version.metadata.json"),
      refs = base.refs + ("main" -> IceSnapshotRef(snapshotId, "branch")))

    val newVersion = committer(newMeta, version)
    metadata = newMeta
    version = newVersion
    Metrics.inc(Metrics.CommitsTotal)
    Metrics.inc(Metrics.DataFilesWritten, addedData.size.toLong)
    Metrics.inc(Metrics.DeleteFilesWritten, addedDeletes.size.toLong)
    Metrics.inc(Metrics.RecordsWritten, addedData.map(_.recordCount).sum)
    Metrics.inc(Metrics.BytesWritten, (addedData ++ addedDeletes).map(_.fileSizeInBytes).sum)
  }
}

object GraftTable {

  /** serializable slice of schema info the executor-side stats harvest needs */
  case class FieldInfo(name: String, id: Int, typeRepr: String)
}
