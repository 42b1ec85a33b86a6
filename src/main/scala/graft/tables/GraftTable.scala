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
    // NEVER adopt a different table-uuid: the identifier now points at a
    // dropped-and-recreated table. Adopting it would make the next commit
    // retry regenerate its assert-table-uuid requirement from the
    // impostor's metadata and land a silent commit on it — exactly what
    // the uuid requirement exists to prevent. Terminal, not retryable.
    if (t.metadata.tableUuid != metadata.tableUuid)
      throw new IllegalStateException(
        s"table at $location was replaced (uuid ${metadata.tableUuid} -> " +
          s"${t.metadata.tableUuid}); refusing to continue this writer")
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
    * (manifest-list sequence inherited when the entry carries none) and
    * the partition spec id their partition tuples are aligned to.
    * With a filter, whole data manifests are skipped via the manifest
    * list's per-partition-field summaries before their Avro is read —
    * at 100 TB this bounds planning cost by surviving manifests, not
    * total manifests. Surviving manifests are read on a bounded thread
    * pool (manifest Avro reads are I/O-bound; serial driver reads would
    * dominate planning at 10^4+ manifests). */
  def planFiles(
      snapshot: IceSnapshot,
      filter: Option[Column] = None): List[PlannedFile] = {
    Metrics.inc(Metrics.PlanFilesCalls)
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
    def readOne(mf: IceManifestListEntry): List[PlannedFile] = {
      val spec = metadata.specById(mf.partitionSpecId)
      ManifestIO.readManifest(conf, relocate(mf.manifestPath), spec.fields.map(_.name))
        .filter(_.status != ManifestStatus.Deleted)
        .map { e =>
          val seq = e.dataSequenceNumber.getOrElse(mf.sequenceNumber)
          PlannedFile(
            e.dataFile.copy(filePath = relocate(e.dataFile.filePath)),
            seq, mf.partitionSpecId)
        }
    }
    if (entries.size <= 1) entries.flatMap(readOne)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(entries.size, GraftTable.ManifestReadParallelism))
      try {
        entries
          .map(mf => pool.submit(new java.util.concurrent.Callable[List[PlannedFile]] {
            override def call(): List[PlannedFile] = readOne(mf)
          }))
          .flatMap(_.get())
      } finally pool.shutdown()
    }
  }

  /** Scan planning with file-level pruning, DISTRIBUTED above a manifest
    * threshold. The driver path materializes every live DataFile before
    * pruning — fine to a few thousand manifests, but a 100 TB table can
    * carry 10^5 manifests / 10^7 live files, where driver-side planning
    * becomes the scan's serial bottleneck. Here surviving manifests
    * (after manifest-list summary pruning, driver-side and cheap) are
    * read in a Spark job that applies [[PruneEval.mayMatch]] executor-
    * side, so only SURVIVING descriptors are collected. Pruning is
    * idempotent — callers may re-apply `prunePlanned` with the same
    * filter and get the identical set — and conservative for delete
    * files exactly like the driver path (unknown ⇒ keep).
    *
    * `schema` must be the schema the caller resolves the filter against
    * (the snapshot's schema under time travel, not the current one). */
  def planFilesPruned(
      spark: SparkSession,
      snapshot: IceSnapshot,
      filter: Option[Column],
      schema: IceSchema,
      distributedThreshold: Int = GraftTable.DistributedPlanThreshold): List[PlannedFile] = {
    val exprOpt = filter.map(c => org.apache.spark.sql.GraftBridge.catalystExpression(c))
    def filePrune(planned: List[PlannedFile]): List[PlannedFile] = exprOpt match {
      case Some(expr) =>
        val kept = planned.filter(p =>
          PruneEval.mayMatch(expr, p.file, metadata.specById(p.specId), schema))
        Metrics.inc(Metrics.FilesPruned, (planned.size - kept.size).toLong)
        kept
      case None => planned
    }
    val allEntries = ManifestIO.readManifestList(conf, relocate(snapshot.manifestList))
    val entries = exprOpt match {
      case Some(expr) => allEntries.filter { mf =>
        mf.content != 0 || PruneEval.manifestMayMatch(
          expr, mf.partitions, metadata.specById(mf.partitionSpecId), schema)
      }
      case None => allEntries
    }
    if (entries.size < distributedThreshold) filePrune(planFiles(snapshot, filter))
    else {
      Metrics.inc(Metrics.PlanFilesCalls)
      Metrics.inc(Metrics.DistributedPlans)
      // locals only below this line: the task closure must not capture
      // `this` (the table holds a non-serializable Hadoop Configuration)
      val specsLocal: Map[Int, IcePartitionSpec] =
        entries.map(_.partitionSpecId).distinct
          .map(id => id -> metadata.specById(id)).toMap
      val loc = location
      val metaLoc = metadata.location
      val schemaLocal = schema
      val exprLocal = exprOpt
      val serConf = spark.sparkContext.broadcast(
        new TableWrite.SerializableHadoopConf(conf))
      val prunedAcc = spark.sparkContext.longAccumulator("graft.plan.files.pruned")
      val items = entries.map(mf =>
        (relocate(mf.manifestPath), mf.partitionSpecId, mf.sequenceNumber))
      val par = math.max(1, math.min(items.size, spark.sparkContext.defaultParallelism))
      val survivors = spark.sparkContext.parallelize(items, par)
        .flatMap { case (mpath, specId, mseq) =>
          val spec = specsLocal(specId)
          ManifestIO.readManifest(serConf.value.value, mpath, spec.fields.map(_.name))
            .iterator
            .filter(_.status != ManifestStatus.Deleted)
            .map { e =>
              val seq = e.dataSequenceNumber.getOrElse(mseq)
              val fp = e.dataFile.filePath
              val rel =
                if (fp.startsWith(loc)) fp
                else if (fp.startsWith(metaLoc)) loc + fp.stripPrefix(metaLoc)
                else fp
              PlannedFile(e.dataFile.copy(filePath = rel), seq, specId)
            }
            .filter { p =>
              val keep = exprLocal.forall(ex =>
                PruneEval.mayMatch(ex, p.file, specsLocal(p.specId), schemaLocal))
              if (!keep) prunedAcc.add(1L)
              keep
            }
        }
        .collect().toList
      Metrics.inc(Metrics.FilesPruned, prunedAcc.value)
      survivors
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
    * results are correct regardless of pruning power. `onlyFiles`
    * restricts the DATA side to a path subset (selective compaction reads
    * just the files being rewritten); deletes still apply in full.
    *
    * One scan path for DataFrame and SQL reads: the facade rides the
    * native DSv2 planning ([[graft.spark.GraftScanBuilder]] choosing the
    * vectorized batch scan or the MoR scan), which applies deletes,
    * metadata columns and initial-defaults in-reader — no driver-side
    * join fan, identical plans either way in. */
  def scan(
      spark: SparkSession,
      snapshotId: Option[Long] = None,
      asOfTimestampMs: Option[Long] = None,
      filter: Option[Column] = None,
      keepFilePos: Boolean = false,
      onlyFiles: Option[Set[String]] = None): DataFrame = {
    val v2 = new graft.spark.GraftV2Table(this, snapshotId, asOfTimestampMs)
    val opts = onlyFiles.map(fs =>
      graft.spark.GraftV2Table.OnlyFilesOption ->
        fs.map(GraftTable.normPathStr).mkString("\n")).toMap
    var df = org.apache.spark.sql.GraftBridge.v2ScanDataFrame(spark, v2, opts)
    if (keepFilePos)
      df = df
        .withColumn("_file", df.metadataColumn("_file"))
        .withColumn("_pos", df.metadataColumn("_pos"))
    filter.fold(df)(df.filter)
  }

  /** tiny local-relation DataFrame for broadcast maps (file -> seq) */
  private def kvDf(
      spark: SparkSession,
      pairs: Seq[(String, Long)],
      keyName: String,
      valName: String): DataFrame = {
    val rows: java.util.List[org.apache.spark.sql.Row] =
      pairs.map(p => org.apache.spark.sql.Row(p._1, p._2)).asJava
    spark.createDataFrame(rows, StructType(Seq(
      StructField(keyName, StringType, nullable = false),
      StructField(valName, LongType, nullable = false))))
  }

  /** Incremental read: rows added after `fromSnapshotId` (exclusive) up to
    * `toSnapshotId` (inclusive, default current) — the batch shape of the
    * reference's resumable scan offsets (icelake/src/io/scan.rs:25-28),
    * keyed by snapshot sequence instead of (file, row). Append-only
    * semantics: new data files in the range; deletes in the range apply to
    * the returned slice. */
  /** replace-style snapshots rewrite the live file set: compaction,
    * z-order, overwrite, TRUNCATE. The summary's explicit `graft.replace`
    * marker is authoritative (stamped on every commit): operation names
    * are ambiguous in BOTH directions — TRUNCATE commits 'delete' but
    * replaces everything, while UPDATE/MERGE row-deltas commit
    * 'overwrite' but replace nothing (their delete files carry the old
    * row versions a changelog must emit). Snapshots without the marker
    * (foreign/legacy tables) fall back to the name heuristic. */
  private[graft] def isReplaceStyle(s: IceSnapshot): Boolean =
    s.summary.get("graft.replace") match {
      case Some(v) => v == "true"
      case None =>
        !Set("append", "delete").contains(s.summary.getOrElse("operation", "append"))
    }

  /** content-preserving rewrite (compaction / z-order / manifest rewrite):
    * same logical rows in new files — contributes NOTHING to a changelog */
  private[graft] def isRewrite(s: IceSnapshot): Boolean =
    isReplaceStyle(s) && s.summary.getOrElse("operation", "") == "replace"

  private def snapshotsInRange(fromSeq: Long, toSeq: Long): List[IceSnapshot] =
    metadata.snapshots
      .filter(s => s.sequenceNumber > fromSeq && s.sequenceNumber <= toSeq)
      .sortBy(_.sequenceNumber).toList

  /** Data files ADDED by append/overwrite/delta commits in
    * `(fromSeq, to.seq]`. Replace-aware: a rewrite's files carry EXISTING
    * rows and contribute nothing, and files later absorbed by a rewrite
    * are still found through their own snapshot's manifests (old data
    * files stay on disk until snapshot expiry). Without a replace in the
    * range this collapses to one metadata read at `to`. */
  private[graft] def incrementalAddedFiles(
      fromSeq: Long, to: IceSnapshot): List[PlannedFile] = {
    val range = snapshotsInRange(fromSeq, to.sequenceNumber)
    if (!range.exists(isReplaceStyle))
      planFiles(to).filter(p => p.seq > fromSeq && p.file.content == DataContent.Data)
    else
      // summary-guarded: snapshots that added no data files (pure deletes)
      // are skipped without a manifest read
      range.filterNot(isRewrite)
        .filter(s => s.summary.get("added-data-files").forall(_.toInt > 0))
        .flatMap(s =>
          planFiles(s).filter(p =>
            p.seq == s.sequenceNumber && p.file.content == DataContent.Data))
  }

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
    val files = incrementalAddedFiles(from.sequenceNumber, to)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
    readDataFiles(spark, files, sparkSchema)
  }

  /** Format-routing raw read over planned data files: an all-parquet set
    * uses the vectorized V1 relation (`_metadata` row positions), any
    * orc/avro presence rides [[graft.spark.GraftRawFilesTable]] — the MoR
    * readers count row positions for every format. */
  private[graft] def readDataFiles(
      spark: SparkSession,
      planned: Seq[PlannedFile],
      sparkSchema: StructType,
      withMeta: Boolean = false): DataFrame =
    if (planned.forall(_.file.fileFormat == "parquet"))
      readDataParquet(spark, planned.map(_.file.filePath), sparkSchema, withMeta)
    else {
      val df = org.apache.spark.sql.GraftBridge.v2ScanDataFrame(
        spark, new graft.spark.GraftRawFilesTable(this, planned, withMeta), Map.empty)
      if (!withMeta) df
      else df
        .withColumn("_cf", GraftTable.normPath(col("_file")))
        .withColumn("_cp", col("_pos"))
        .drop("_file", "_pos")
    }

  /** Raw parquet read of table data files with correct column
    * resolution: graft-written files (under `location/data`) resolve by
    * field id, add_files imports resolve by NAME (they carry no ids — an
    * id-carrying schema would silently null their columns). One relation
    * per resolution mode, unioned. */
  private def readDataParquet(
      spark: SparkSession,
      paths: Seq[String],
      sparkSchema: StructType,
      withMeta: Boolean = false): DataFrame = {
    val pinned = GraftTable.pinnedSession(spark)
    val (internal, external) =
      paths.partition(p => Locations.isInternal(metadata, location, p))
    // external resolution schema: the table's name mapping when set (field
    // ids read under the names the imported files use — rename-safe), else
    // the current names with ids stripped
    val extSchema = NameMapping.of(metadata)
      .map(m => NameMapping.toFileNames(m, sparkSchema))
      .getOrElse(StructType(sparkSchema.fields.map { f =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .remove(SchemaConvert.FieldIdKey).build())
      }))
    val parts = Seq(internal -> sparkSchema, external -> extSchema)
      .collect { case (ps, sch) if ps.nonEmpty =>
        var df = pinned.read.schema(sch).parquet(ps: _*)
        // _metadata is per-relation: project it BEFORE the union
        if (withMeta)
          df = df.withColumn("_cf", GraftTable.normPath(col("_metadata.file_path")))
            .withColumn("_cp", col("_metadata.row_index"))
        // restore current column names/types positionally (mapping may
        // have renamed both top-level fields and struct children)
        if (sch ne sparkSchema) {
          val restored = sparkSchema.fields.zip(sch.fields).map {
            case (cur, ext) => col(ext.name).cast(cur.dataType).as(cur.name)
          }
          val meta = if (withMeta) Seq(col("_cf"), col("_cp")) else Nil
          df = df.select(restored.toSeq ++ meta: _*)
        }
        df
      }
    parts.reduce(_.unionByName(_))
  }

  /** Batch changelog between two snapshots: every row appended in the
    * range with `_change_type = 'insert'`, plus the CONTENT of rows
    * deleted in the range with `_change_type = 'delete'` — position
    * deletes resolve through Spark's `_metadata.row_index` against the
    * referenced data files, equality deletes semi-join raw rows of
    * data files with a lower data sequence, and each is resolved against
    * the file set of ITS OWN snapshot, so the range may span rewrites.
    * Replace-aware per commit kind:
    *
    *  - rewrite (compaction / z-order): content-preserving — emits
    *    nothing; deletes landing after it resolve against the rewritten
    *    files, deletes before it against the originals.
    *  - overwrite / TRUNCATE: data files live in the parent but absent
    *    after it emit their rows as deletes; its added files are inserts.
    *  - append / delete / row-delta commits: as before.
    *
    * Like Iceberg's changelog: by default no net-change collapsing — a
    * row inserted AND deleted inside the range emits both, and a row
    * already masked by an earlier delete re-emits if an overwrite later
    * drops its file. With `net = true` intermediate changes cancel
    * ([[netChanges]]), and `netKeys` upgrades delete+insert on one key to
    * an update pair.
    * Distributed end to end — file reads and joins are ordinary Spark
    * jobs, nothing row-sized touches the driver. */
  def changes(
      spark: SparkSession,
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None,
      net: Boolean = false,
      netKeys: Seq[String] = Nil): DataFrame = {
    val raw = changesRaw(spark, fromSnapshotId, toSnapshotId)
    if (!net) raw else netChanges(raw, netKeys)
  }

  /** Net-change collapse (Iceberg's `net_changes` changelog mode): a row
    * inserted AND deleted inside the range cancels out, multiplicity
    * preserved (net = inserts - deletes per distinct row content, emitted
    * |net| times). With `netKeys`, a key whose net delta is exactly one
    * delete plus one insert of different content becomes an
    * update_preimage/update_postimage pair — the shape CDC consumers
    * want. Both steps are single shuffles (one hash aggregate over row
    * content, one window over the keys); nothing touches the driver. */
  private def netChanges(raw: DataFrame, netKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dataCols = raw.columns.filterNot(_ == "_change_type").toSeq
    val collapsed = raw
      .groupBy(dataCols.map(col): _*)
      .agg((count(when(col("_change_type") === "insert", 1)) -
        count(when(col("_change_type") === "delete", 1))).as("_net"))
      .filter(col("_net") =!= 0)
      .withColumn("_change_type",
        when(col("_net") > 0, lit("insert")).otherwise(lit("delete")))
      // multiset semantics: |net| copies of the surviving change
      .withColumn("_dup",
        explode(array_repeat(lit(1), abs(col("_net")).cast(IntegerType))))
      .drop("_net", "_dup")
    if (netKeys.isEmpty) collapsed
    else {
      val w = Window.partitionBy(netKeys.map(col): _*)
      collapsed
        .withColumn("_ki",
          sum(when(col("_change_type") === "insert", 1).otherwise(0)).over(w))
        .withColumn("_kd",
          sum(when(col("_change_type") === "delete", 1).otherwise(0)).over(w))
        .withColumn("_change_type",
          when(col("_ki") === 1 && col("_kd") === 1,
            when(col("_change_type") === "delete", lit("update_preimage"))
              .otherwise(lit("update_postimage")))
            .otherwise(col("_change_type")))
        .drop("_ki", "_kd")
    }
  }

  private def changesRaw(
      spark: SparkSession,
      fromSnapshotId: Long,
      toSnapshotId: Option[Long]): DataFrame = {
    val from = metadata.snapshotById(fromSnapshotId)
      .getOrElse(sys.error(s"no snapshot $fromSnapshotId"))
    val to = toSnapshotId.flatMap(metadata.snapshotById)
      .orElse(metadata.currentSnapshot)
      .getOrElse(sys.error("no current snapshot"))
    changesRawBySeq(spark, from.sequenceNumber, to)
  }

  /** Seq-addressed changelog core — the streaming CDC source hands out
    * sequence-number offsets, not snapshot ids, and `fromSeq = 0` means
    * "from before the first snapshot" (everything emits as inserts). */
  private[graft] def changesRawBySeq(
      spark: SparkSession,
      fromSeq: Long,
      to: IceSnapshot): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val schema = metadata.currentSchema
    val sparkSchema = SchemaConvert.toSparkSchema(schema)
    val range = snapshotsInRange(fromSeq, to.sequenceNumber)
    val pinned = GraftTable.pinnedSession(spark)
    val byId = metadata.snapshots.map(s => s.snapshotId -> s).toMap

    // per-snapshot plans: one manifest read per DISTINCT snapshot touched;
    // ranges without a replace never plan more than `to` + parents of
    // overwrites (i.e. the fast path stays one planning read)
    val planCache = scala.collection.mutable.Map[Long, List[PlannedFile]]()
    def planAt(s: IceSnapshot): List[PlannedFile] =
      planCache.getOrElseUpdate(s.snapshotId, planFiles(s))
    // with no replace in range, every in-range file is still live at `to`
    // — resolve all per-snapshot questions against ONE plan
    val fastPlan: Option[List[PlannedFile]] =
      if (range.exists(isReplaceStyle)) None else Some(planAt(to))
    def addedAt(s: IceSnapshot, content: Int): List[PlannedFile] =
      fastPlan.getOrElse(planAt(s))
        .filter(p => p.seq == s.sequenceNumber && p.file.content == content)

    def rawWithPos(files: Seq[PlannedFile]): DataFrame =
      readDataFiles(spark,
        files.groupBy(p => GraftTable.normPathStr(p.file.filePath))
          .values.map(_.head).toSeq,
        sparkSchema, withMeta = true)

    val inserts = {
      val files = incrementalAddedFiles(fromSeq, to)
      val df =
        if (files.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
        else readDataFiles(spark, files, sparkSchema)
      df.withColumn("_change_type", lit("insert"))
    }

    // overwrite/TRUNCATE commits -> rows of the data files they dropped
    val overwritten: Seq[DataFrame] =
      range.filter(s => isReplaceStyle(s) && !isRewrite(s)).flatMap { s =>
        val parent = s.parentSnapshotId.map(id => byId.getOrElse(id,
          sys.error(s"changelog range needs expired parent snapshot $id of " +
            s"overwrite ${s.snapshotId}; expire-aware history is gone")))
        val beforePf = parent.toList.flatMap(planAt(_))
          .filter(_.file.content == DataContent.Data)
        val after = planAt(s).filter(_.file.content == DataContent.Data)
          .map(p => GraftTable.normPathStr(p.file.filePath)).toSet
        val removed = beforePf
          .filterNot(p => after.contains(GraftTable.normPathStr(p.file.filePath)))
        if (removed.isEmpty) None
        else Some(rawWithPos(removed).drop("_cf", "_cp")
          .withColumn("_change_type", lit("delete")))
      }

    // position deletes committed in range -> the exact rows they removed,
    // with data-file candidates taken from each delete's OWN snapshot (a
    // later compaction may have absorbed the delete files and rewritten
    // the data, but both remain reachable through the older snapshot).
    // Only content-preserving rewrites are excluded: a markerless foreign
    // 'overwrite' (e.g. an Iceberg MoR MERGE row-delta) may carry delete
    // files, and those deletes must surface even though the snapshot is
    // replace-CLASSIFIED for the removed-data-file walk above
    val posSnaps = range.filterNot(isRewrite)
      .filter(s => s.summary.get("added-delete-files").forall(_.toInt > 0))
      .map(s => s -> addedAt(s, DataContent.PositionDeletes))
      .filter(_._2.nonEmpty)
    val posDeleted: Option[DataFrame] =
      if (posSnaps.isEmpty) None
      else {
        val pqAdded = posSnaps.flatMap(_._2).filterNot(_.file.isDeletionVector)
        val pqRows: Seq[DataFrame] =
          if (pqAdded.isEmpty) Nil
          else Seq(pinned.read
            .parquet(pqAdded.map(_.file.filePath): _*)
            .select(GraftTable.normPath(col("file_path")).as("_df"), col("pos").as("_dp")))
        // A deletion-vector commit's changelog delta is its NEW bitmap
        // minus the file's PRIOR delete state — merge-on-write folds all
        // history into each vector, so the raw blob over-reports. The
        // subtraction is the previous vector (bitmap andNot, executor-
        // side) plus any older parquet delete rows (anti-join).
        val dvRows: Seq[DataFrame] = posSnaps.flatMap { case (s, ents) =>
          val dvEnts = ents.filter(_.file.isDeletionVector)
          if (dvEnts.isEmpty) None
          else {
            val plan = fastPlan.getOrElse(planAt(s))
            val priorPos = plan.filter(p =>
              p.file.content == DataContent.PositionDeletes &&
                p.seq < s.sequenceNumber)
            val refs = dvEnts
              .map(e => GraftTable.normPathStr(e.file.referencedDataFile.get)).toSet
            val prevDv: Map[String, PlannedFile] = priorPos
              .filter(_.file.isDeletionVector)
              .filter(p => refs.contains(GraftTable.normPathStr(p.file.referencedDataFile.get)))
              .groupBy(p => GraftTable.normPathStr(p.file.referencedDataFile.get))
              .map { case (f, xs) => f -> xs.maxBy(_.seq) }
            val serConf = new TableWrite.SerializableHadoopConf(conf)
            val specs: Seq[(String, String, Long, Long, String, Long, Long)] =
              dvEnts.map { e =>
                val f = GraftTable.normPathStr(e.file.referencedDataFile.get)
                val prev = prevDv.get(f)
                (f, relocate(e.file.filePath), e.file.contentOffset.getOrElse(0L),
                  e.file.contentSizeInBytes.getOrElse(e.file.fileSizeInBytes),
                  prev.map(p => relocate(p.file.filePath)).getOrElse(""),
                  prev.flatMap(_.file.contentOffset).getOrElse(0L),
                  prev.map(p =>
                    p.file.contentSizeInBytes.getOrElse(p.file.fileSizeInBytes)).getOrElse(0L))
              }
            val encIn = org.apache.spark.sql.Encoders
              .product[(String, String, Long, Long, String, Long, Long)]
            val encOut = org.apache.spark.sql.Encoders.product[(String, Long)]
            val delta = spark.createDataset(specs)(encIn)
              .flatMap { in =>
                val (f, np, no, nl, pp, po, pl) = in
                val bm = Puffin.dvDecode(Puffin.readBlob(serConf.value, np, no, nl))
                if (pp.nonEmpty)
                  bm.andNot(Puffin.dvDecode(Puffin.readBlob(serConf.value, pp, po, pl)))
                val it = bm.getLongIterator
                new Iterator[(String, Long)] {
                  def hasNext: Boolean = it.hasNext
                  def next(): (String, Long) = (f, it.next())
                }
              }(encOut).toDF("_df", "_dp")
            val priorPq = priorPos.filterNot(_.file.isDeletionVector)
            Some(
              if (priorPq.isEmpty) delta
              else delta.join(
                pinned.read.parquet(priorPq.map(p => relocate(p.file.filePath)): _*)
                  .select(GraftTable.normPath(col("file_path")).as("_df"),
                    col("pos").as("_dp")),
                Seq("_df", "_dp"), "left_anti"))
          }
        }
        val posRows = (pqRows ++ dvRows).reduce(_.unionByName(_))
        // only open data files the deletes actually reference (the
        // distinct-path set is file-count sized — planning-scale, not
        // row-scale)
        val referenced = posRows.select("_df").distinct()
          .collect().map(_.getString(0)).toSet
        val candidates = posSnaps.flatMap { case (s, _) =>
          fastPlan.getOrElse(planAt(s)).filter(p =>
            p.file.content == DataContent.Data &&
              referenced.contains(GraftTable.normPathStr(p.file.filePath)))
        }
        if (candidates.isEmpty) None
        else Some(rawWithPos(candidates)
          .join(posRows, col("_cf") === col("_df") && col("_cp") === col("_dp"), "leftsemi")
          .drop("_cf", "_cp")
          .withColumn("_change_type", lit("delete")))
      }

    // equality deletes committed in range -> raw rows of LOWER-seq data
    // files matching the keys. SINGLE PASS over the data side per
    // replace-free SEGMENT: within a segment file visibility only grows,
    // so all of the segment's delete keys union into ONE frame tagged
    // with their delete sequence, the segment's data files are read once
    // with a broadcast-joined per-file sequence, and the semi join keeps
    // rows where some delete with `data_seq < delete_seq` matches — a
    // CDC-heavy range with K equality-delete commits reads the data once,
    // not K times. A rewrite/overwrite starts a new segment (the file set
    // changed); segments are as rare as compactions. Within a segment,
    // grouped by equality-id set.
    val segments: List[List[IceSnapshot]] = {
      val out = scala.collection.mutable.ListBuffer[List[IceSnapshot]]()
      var cur = scala.collection.mutable.ListBuffer[IceSnapshot]()
      range.foreach { s =>
        if (isReplaceStyle(s)) {
          if (cur.nonEmpty) { out += cur.toList; cur.clear() }
          // a non-rewrite replace commit changed the file set (new
          // segment), but its OWN added delete files still apply — a
          // foreign row-delta 'overwrite' carries them; harvest it as the
          // new segment's first member (its eq keys only match data files
          // with strictly lower sequence, so its added data is immune)
          if (!isRewrite(s)) cur += s
        } else cur += s
      }
      if (cur.nonEmpty) out += cur.toList
      out.toList
    }
    val eqDeleted: Seq[DataFrame] = segments.flatMap { seg =>
      val eqBySnap = seg
        .filter(s => s.summary.get("added-delete-files").forall(_.toInt > 0))
        .map(s => s -> addedAt(s, DataContent.EqualityDeletes))
        .filter(_._2.nonEmpty)
      if (eqBySnap.isEmpty) Nil
      else {
        val lastEqSnap = eqBySnap.last._1
        val segData = fastPlan.getOrElse(planAt(lastEqSnap))
          .filter(_.file.content == DataContent.Data)
        val eqD = eqBySnap.flatMap(_._2)
        eqD.groupBy(_.file.equalityIds.sorted).toSeq.flatMap { case (ids, group) =>
          val keyNames = ids.flatMap(id => schema.fieldById(id).map(_.name))
          val maxDseq = group.map(_.seq).max
          val older = segData.filter(_.seq < maxDseq)
          if (older.isEmpty || keyNames.isEmpty) None
          else {
            val keys = group.groupBy(_.seq).toSeq.map { case (dseq, g) =>
              pinned.read.parquet(g.map(_.file.filePath): _*)
                .select(keyNames.map(col): _*).distinct()
                .withColumn("_dseq", lit(dseq))
            }.reduce(_.unionByName(_))
            Metrics.inc(Metrics.ChangelogDataFilesRead, older.size.toLong)
            val seqMap = kvDf(spark,
              older.map(p => (GraftTable.normPathStr(p.file.filePath), p.seq)),
              "_sf", "_sseq")
            val data = rawWithPos(older)
              .join(org.apache.spark.sql.functions.broadcast(seqMap),
                col("_cf") === col("_sf"))
            Some(data.join(keys,
                keyNames.map(n => data(n) === keys(n)).reduce(_ && _) &&
                  data("_sseq") < keys("_dseq"),
                "leftsemi")
              .drop("_cf", "_cp", "_sf", "_sseq")
              .withColumn("_change_type", lit("delete")))
          }
        }
      }
    }

    (Seq(inserts) ++ overwritten ++ posDeleted.toSeq ++ eqDeleted)
      .reduce(_.unionByName(_))
  }

  /** files that a filtered scan would read — lets tests assert pruning */
  def filesForScan(filter: Option[Column]): Seq[String] =
    metadata.currentSnapshot.toSeq.flatMap { s =>
      PruneEval.prunePlanned(
        planFiles(s).filter(_.file.content == DataContent.Data),
        filter, metadata, metadata.currentSchema)
        .map(_.file.filePath)
    }

  /** delete files a filtered scan would join — lets tests assert that
    * partition-scoped deletes prune away with their partition */
  def deleteFilesForScan(filter: Option[Column]): Seq[String] =
    metadata.currentSnapshot.toSeq.flatMap { s =>
      PruneEval.prunePlanned(
        planFiles(s).filter(_.file.content != DataContent.Data),
        filter, metadata, metadata.currentSchema)
        .map(_.file.filePath)
    }

  // ---------- write paths ----------

  def append(spark: SparkSession, df: DataFrame): GraftTable =
    append(spark, df, mergeSchema = false)

  /** `mergeSchema = true` (or the `write.merge-schema` table property)
    * evolves the table FIRST so a wider input is kept instead of
    * silently dropped: union-by-name new columns (top-level and nested
    * struct fields) are added as optional, and spec-legal type widenings
    * (int→long, float→double, decimal scale-preserving precision growth)
    * are applied — the same rules as Iceberg's mergeSchema write option.
    * Anything else (narrowing, incompatible types) still fails the
    * write. Evolution is metadata-only and commits with the data in the
    * usual two steps (schema commit retries independently). */
  def append(spark: SparkSession, df: DataFrame, mergeSchema: Boolean): GraftTable = {
    val t =
      if (mergeSchema || metadata.properties.get("write.merge-schema").contains("true"))
        mergeSchemaWith(df)
      else this
    val files = TableWrite.writeDataFiles(t, spark, df)
    t.commit(spark, "append", addedData = files, addedDeletes = Nil, replace = false)
  }

  /** union-by-name schema evolution toward `df`'s schema (see append) */
  private def mergeSchemaWith(df: DataFrame): GraftTable = {
    def iceTypeOf(dt: org.apache.spark.sql.types.DataType): IceType =
      SchemaConvert.fromSparkSchema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x", dt)))).fields.head.fieldType
    def widened(cur: IceType, in: IceType): Option[IceType] = (cur, in) match {
      case (IcePrim("int"), IcePrim("long")) => Some(IcePrim("long"))
      case (IcePrim("float"), IcePrim("double")) => Some(IcePrim("double"))
      case (IceDecimal(p1, s1), IceDecimal(p2, s2)) if s1 == s2 && p2 > p1 =>
        Some(IceDecimal(p2, s1))
      case _ => None
    }
    var t = this
    def walk(path: Seq[String], inType: org.apache.spark.sql.types.DataType): Unit = {
      t.findPathIn(path) match {
        case None =>
          val ice = iceTypeOf(inType)
          if (path.length == 1) t = t.addColumn(path.head, ice)
          else t = t.addColumnPath(path, ice)
        case Some(f) =>
          (f.fieldType, inType) match {
            case (_: IceStruct, st: org.apache.spark.sql.types.StructType) =>
              st.fields.foreach(sf => walk(path :+ sf.name, sf.dataType))
            case (curT, _) =>
              widened(curT, iceTypeOf(inType)).foreach { w =>
                t =
                  if (path.length == 1) t.updateColumnType(path.head, w)
                  else t.updateColumnTypePath(path, w)
              }
          }
      }
    }
    df.schema.fields.foreach(f => walk(Seq(f.name), f.dataType))
    t
  }

  /** path lookup in THIS handle's current schema (helper for merge) */
  private def findPathIn(path: Seq[String]): Option[IceField] = {
    def go(fs: List[IceField], p: Seq[String]): Option[IceField] = p match {
      case Seq(h) => fs.find(_.name == h)
      case h +: rest => fs.find(_.name == h).flatMap(_.fieldType match {
        case IceStruct(children) => go(children, rest)
        case _ => None
      })
      case _ => None
    }
    go(metadata.currentSchema.fields, path)
  }

  def overwrite(spark: SparkSession, df: DataFrame): GraftTable = {
    val files = TableWrite.writeDataFiles(this, spark, df)
    commit(spark, "overwrite", addedData = files, addedDeletes = Nil, replace = true)
  }

  /** TRUNCATE TABLE: one metadata-only `delete` snapshot dropping every
    * live file — no data scanned or rewritten at any table size. */
  def truncate(): GraftTable = {
    retryCommit(() => ()) {
      commitOnce("delete", Nil, Nil, replace = true, existing = Nil)
    }
    this
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
    * obtain them from `scan(keepFilePos = true)`'s _file/_pos columns.
    * On a partitioned table the delete files are written partition-scoped
    * (the spec partition tuple of the data file each position refers to,
    * per the reference's delete schema with partition,
    * icelake/src/io/file_writer/position_delete_writer.rs:90-114), so
    * scans join only same-partition deletes. */
  def positionDelete(spark: SparkSession, posDf: DataFrame): GraftTable = {
    val files = writePositionDeleteFiles(spark, posDf)
    if (files.isEmpty) return this
    commitRowDelta("delete", Nil, files, referencedBy(spark, files))
  }

  private[graft] def writePositionDeleteFiles(
      spark: SparkSession, posDf: DataFrame): List[IceDataFile] =
    if (dvEnabled) writeDeletionVectors(spark, posDf)
    else writeParquetPositionDeleteFiles(spark, posDf)

  private[graft] def writeParquetPositionDeleteFiles(
      spark: SparkSession, posDf: DataFrame): List[IceDataFile] = {
    val normalized = posDf
      .select(col("file_path").cast(StringType), col("pos").cast(LongType))
      .sortWithinPartitions(col("file_path"), col("pos"))
    val spec = metadata.defaultSpec
    if (spec.isUnpartitioned)
      TableWrite.writeDeleteFiles(
        this, spark, normalized, DataContent.PositionDeletes, Nil)
    else {
        // partition tuple per referenced data file comes from the plan
        // (driver-side, file-count sized); the delete rows themselves
        // stay distributed — a broadcast (file -> partition index) join
        // routes each position to its partition's delete file. Only
        // files on the DEFAULT spec get scoped tuples (the commit writes
        // the delete manifest with that spec); positions into old-spec
        // files fall through to global scope, which is always correct.
        val current = metadata.currentSnapshot.toList
          .flatMap(planFiles(_))
          .filter(p => p.file.content == DataContent.Data &&
            p.specId == metadata.defaultSpecId)
        val partitions: List[Seq[Option[Any]]] =
          current.map(_.file.partition).distinct
        val idxOf = partitions.zipWithIndex.toMap
        val pathIdx = current.map(p =>
          (GraftTable.normPathStr(p.file.filePath), idxOf(p.file.partition).toLong))
        val idxDf = kvDf(spark, pathIdx, "_dp_file", "_dp")
        val routed = normalized
          .join(broadcast(idxDf), normPath(col("file_path")) === col("_dp_file"), "left")
          .drop("_dp_file")
        TableWrite.writePartitionedDeleteFiles(this, spark, routed, partitions)
    }
  }

  /** Deletion-vector write mode: position deletes land as puffin DV
    * blobs — ONE vector per referenced data file — instead of parquet
    * delete files (Iceberg format-v3 semantics, property-gated here so a
    * v2 table can opt in). The scale win is structural: a CDC-heavy MoR
    * table accumulates thousands of small positional delete files between
    * compactions and every scan pays their open cost; with vectors each
    * data file carries exactly one compact bitmap, fetched positionally
    * by the task that reads that file. */
  def dvEnabled: Boolean =
    metadata.formatVersion >= 3 ||
      metadata.properties.get(GraftTable.DvEnabledProp).contains("true")

  /** Write position deletes as deletion vectors. Merge-on-write: every
    * live prior position delete of each referenced file (an older vector
    * or parquet delete rows) folds into the new vector, so the newest
    * vector for a file is always the COMPLETE delete set for that file —
    * readers serve one blob per file, never a stack. */
  private[graft] def writeDeletionVectors(
      spark: SparkSession, posDf: DataFrame): List[IceDataFile] = {
    val newPos = posDf.select(
      GraftTable.normPath(col("file_path").cast(StringType)).as("file_path"),
      col("pos").cast(LongType).as("pos"))
    val priorDeletes = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      .filter(_.file.content == DataContent.PositionDeletes)
    val merged =
      if (priorDeletes.isEmpty) newPos
      else newPos.unionByName(
        positionDeleteRowsDf(spark, priorDeletes)
          .join(newPos.select("file_path").distinct(), Seq("file_path"), "leftsemi"))
    buildDeletionVectors(spark, merged)
  }

  /** (file_path, pos) rows of a mixed set of position-delete entries —
    * parquet files read as parquet, vector entries decoded executor-side
    * (one task per blob; the driver never holds positions). For files
    * that have a vector, only the LATEST vector contributes (older ones
    * are superseded); parquet rows always contribute — under merge-on-
    * write any parquet delete at or below the vector's sequence is a
    * subset of it, so the union is exactly the read-side delete set. */
  private[graft] def positionDeleteRowsDf(
      spark: SparkSession, entries: Seq[PlannedFile]): DataFrame = {
    val (dvs, pq) = entries.partition(_.file.isDeletionVector)
    val pinned = GraftTable.pinnedSession(spark)
    var parts = List.empty[DataFrame]
    if (pq.nonEmpty)
      parts :+= pinned.read.parquet(pq.map(p => relocate(p.file.filePath)): _*)
        .select(GraftTable.normPath(col("file_path")).as("file_path"),
          col("pos").cast(LongType).as("pos"))
    val latest = dvs
      .groupBy(p => GraftTable.normPathStr(p.file.referencedDataFile.get))
      .map { case (f, xs) => (f, xs.maxBy(_.seq)) }.toList
    if (latest.nonEmpty) {
      val refs: Seq[(String, String, Long, Long)] = latest.map { case (f, p) =>
        (f, relocate(p.file.filePath), p.file.contentOffset.getOrElse(0L),
          p.file.contentSizeInBytes.getOrElse(p.file.fileSizeInBytes))
      }
      val serConf = new TableWrite.SerializableHadoopConf(conf)
      implicit val enc: org.apache.spark.sql.Encoder[(String, String, Long, Long)] =
        org.apache.spark.sql.Encoders.product[(String, String, Long, Long)]
      implicit val enc2: org.apache.spark.sql.Encoder[(String, Long)] =
        org.apache.spark.sql.Encoders.product[(String, Long)]
      parts :+= spark.createDataset(refs)
        .flatMap { case (f, path, off, len) =>
          Puffin.dvPositions(Puffin.readBlob(serConf.value, path, off, len))
            .iterator.map(p => (f, p))
        }.toDF("file_path", "pos")
    }
    if (parts.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("file_path", StringType), StructField("pos", LongType))))
    else parts.reduce(_.unionByName(_))
  }

  /** Distributed vector build: positions shuffle once by data file, each
    * task bitmaps its files and writes ONE puffin file holding a
    * `deletion-vector-v1` blob per file, and only blob-level metadata
    * (path, offsets, cardinality) returns to the driver. */
  private def buildDeletionVectors(
      spark: SparkSession, posDf: DataFrame): List[IceDataFile] = {
    val dvLoc = Locations.specFor(metadata, location, UUID.randomUUID().toString)
    val serConf = new TableWrite.SerializableHadoopConf(conf)
    implicit val enc: org.apache.spark.sql.Encoder[DvBlobRow] =
      org.apache.spark.sql.Encoders.product[DvBlobRow]
    val rows: Array[DvBlobRow] = posDf
      .select(GraftTable.normPath(col("file_path")).as("file_path"),
        col("pos").cast(LongType).as("pos"))
      .repartition(col("file_path"))
      .mapPartitions { it =>
        val byFile = scala.collection.mutable.LinkedHashMap
          .empty[String, org.roaringbitmap.longlong.Roaring64NavigableMap]
        it.foreach { r =>
          byFile.getOrElseUpdate(r.getString(0),
            new org.roaringbitmap.longlong.Roaring64NavigableMap()).addLong(r.getLong(1))
        }
        if (byFile.isEmpty) Iterator.empty
        else {
          val files = byFile.toSeq.sortBy(_._1)
          val path = dvLoc.path(s"${UUID.randomUUID()}-deletes.puffin")
          val blobs = files.map { case (f, bm) =>
            Puffin.BlobInput(Puffin.DeletionVectorV1, Nil,
              Map("referenced-data-file" -> f,
                "cardinality" -> bm.getLongCardinality.toString),
              Puffin.dvEncode(bm))
          }
          val (size, metas) = Puffin.write(serConf.value, path, blobs)
          files.zip(metas).iterator.map { case ((f, bm), m) =>
            DvBlobRow(path, size, f, m.offset, m.length, bm.getLongCardinality)
          }
        }
      }.collect()
    if (rows.isEmpty) return Nil
    // partition scoping mirrors the parquet path: the vector's manifest
    // entry carries the partition tuple of its referenced data file when
    // that file sits on the default spec (older-spec files stay global)
    val spec = metadata.defaultSpec
    val tupleOf: Map[String, Seq[Option[Any]]] =
      if (spec.isUnpartitioned) Map.empty
      else metadata.currentSnapshot.toList.flatMap(planFiles(_))
        .filter(p => p.file.content == DataContent.Data &&
          p.specId == metadata.defaultSpecId)
        .map(p => GraftTable.normPathStr(p.file.filePath) -> p.file.partition).toMap
    val emptyTuple: Seq[Option[Any]] = spec.fields.map(_ => None)
    rows.toList.map { r =>
      IceDataFile(
        content = DataContent.PositionDeletes,
        filePath = r.puffinPath,
        fileFormat = "puffin",
        partition = tupleOf.getOrElse(r.referencedFile, emptyTuple),
        recordCount = r.cardinality,
        fileSizeInBytes = r.puffinSize,
        referencedDataFile = Some(r.referencedFile),
        contentOffset = Some(r.offset),
        contentSizeInBytes = Some(r.length))
    }
  }

  /** Row-level DELETE by predicate: position deletes for every matching
    * row in one snapshot (SQL `DELETE FROM t WHERE ...`). Validated
    * against concurrent rewrites of the referenced files. */
  /** Row-level DELETE with a metadata fast path: files whose EVERY row
    * provably matches `cond` (strict bounds/partition evaluation —
    * [[PruneEval.strictMatch]]) are dropped from the snapshot without
    * being read; only partially-matching files get position deletes. A
    * partition-scoped DELETE (`WHERE day = ...`) on a 100 TB table is
    * then pure metadata — the scan-and-write cost is proportional to the
    * boundary files, not the deleted volume (Iceberg's
    * metadata-delete + StrictMetricsEvaluator behavior). */
  def deleteWhere(spark: SparkSession, cond: Column): GraftTable = {
    val snap = metadata.currentSnapshot.getOrElse(return this)
    val dataFiles = planFiles(snap).filter(_.file.content == DataContent.Data)
    val full = PruneEval.strictlyMatching(dataFiles, cond, metadata, metadata.currentSchema)
    if (full.isEmpty) {
      val matching = scan(spark, keepFilePos = true).filter(cond)
        .select(col("_file").as("file_path"), col("_pos").as("pos"))
      val deleteFiles = writePositionDeleteFiles(spark, matching)
      if (deleteFiles.isEmpty) return this
      return commitRowDelta("delete", Nil, deleteFiles, referencedBy(spark, deleteFiles))
    }
    strictSplitCommit(spark, cond, "delete", Nil, dataFiles, full)
  }

  /** shared tail of the metadata-accelerated row-filter commits (DELETE
    * WHERE / INSERT OVERWRITE WHERE): drop the strictly-matching files,
    * position-delete the boundary files, commit once as replace-style. */
  private def strictSplitCommit(
      spark: SparkSession,
      cond: Column,
      operation: String,
      addedData: List[IceDataFile],
      dataFiles: Seq[PlannedFile],
      full: Seq[PlannedFile]): GraftTable = {
    val fullSet = full.map(p => GraftTable.normPathStr(p.file.filePath)).toSet
    val partialPaths = dataFiles.map(p => GraftTable.normPathStr(p.file.filePath))
      .filterNot(fullSet).toSet
    val deleteFiles =
      if (partialPaths.isEmpty) Nil
      else {
        val matching = scan(spark, keepFilePos = true, onlyFiles = Some(partialPaths))
          .filter(cond)
          .select(col("_file").as("file_path"), col("_pos").as("pos"))
        writePositionDeleteFiles(spark, matching)
      }
    val referenced = fullSet ++
      (if (deleteFiles.isEmpty) Set.empty[String] else referencedBy(spark, deleteFiles))
    // survivors recomputed PER ATTEMPT (commitReplace contract); any
    // involved file rewritten concurrently aborts instead of silently
    // dropping the rewrite's output
    def survivors(): List[PlannedFile] = {
      val planned = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      val live = planned.filter(_.file.content == DataContent.Data)
        .map(p => GraftTable.normPathStr(p.file.filePath)).toSet
      val gone = referenced.diff(live)
      if (gone.nonEmpty)
        sys.error(s"$operation conflicts with a concurrent rewrite of " +
          s"${gone.size} data file(s) (e.g. ${gone.head}); re-run the statement")
      planned.filterNot(p =>
        p.file.content == DataContent.Data &&
          fullSet(GraftTable.normPathStr(p.file.filePath)))
    }
    Metrics.inc(Metrics.MetadataOnlyDeletedFiles, full.size.toLong)
    retryCommit(() => ()) {
      commitOnce(operation, addedData, deleteFiles, replace = true,
        existing = survivors())
    }
    this
  }

  /** Filtered overwrite (`INSERT OVERWRITE ... WHERE`-style semantics, the
    * DSv2 `SupportsOverwrite` contract): rows matching `cond` are replaced
    * by `df` in ONE snapshot — position deletes for the matching rows plus
    * the new data files. MoR-shaped, so only matching row positions are
    * written, not a copy of the table. */
  def overwriteWhere(spark: SparkSession, cond: Column, df: DataFrame): GraftTable =
    overwriteWhereFiles(spark, cond, TableWrite.writeDataFiles(this, spark, df))

  /** filtered overwrite for already-written data files (shared by the
    * table API and the native DSv2 write) */
  private[graft] def overwriteWhereFiles(
      spark: SparkSession, cond: Column, dataFiles: List[IceDataFile]): GraftTable = {
    // metadata acceleration (same strict split as DELETE WHERE): files
    // the predicate provably covers are replaced without being read — a
    // partition overwrite on 100 TB scans only boundary files
    val existing = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      .filter(_.file.content == DataContent.Data)
    val full = PruneEval.strictlyMatching(existing, cond, metadata, metadata.currentSchema)
    if (full.nonEmpty)
      return strictSplitCommit(spark, cond, "overwrite", dataFiles, existing, full)
    val matching = scan(spark, keepFilePos = true).filter(cond)
      .select(col("_file").as("file_path"), col("_pos").as("pos"))
    val deleteFiles = writePositionDeleteFiles(spark, matching)
    commitRowDelta("overwrite", dataFiles, deleteFiles, referencedBy(spark, deleteFiles))
  }

  /** Dynamic partition overwrite: partitions present in `df` are replaced
    * wholesale, others survive untouched. Metadata-only delete — existing
    * files in replaced partitions are dropped from the new snapshot's
    * manifests, no data rewritten. */
  def overwriteDynamic(spark: SparkSession, df: DataFrame): GraftTable = {
    if (metadata.defaultSpec.isUnpartitioned) return overwrite(spark, df)
    overwriteDynamicFiles(spark, TableWrite.writeDataFiles(this, spark, df))
  }

  /** dynamic-overwrite commit for already-written files (shared by the
    * table API and the native DSv2 write). Partition tuples are only
    * comparable within one spec, so files written under an OLDER spec
    * make the operation ill-defined (an old-spec file can hold rows of
    * both replaced and surviving partitions) — rejected rather than
    * risking silent data loss; compact first. */
  private[graft] def overwriteDynamicFiles(
      spark: SparkSession, dataFiles: List[IceDataFile]): GraftTable = {
    if (metadata.defaultSpec.isUnpartitioned)
      return commit(spark, "overwrite", dataFiles, Nil, replace = true)
    val newParts: Set[Seq[Option[Any]]] = dataFiles.map(_.partition).toSet
    // survivors recomputed PER ATTEMPT: a concurrent commit between
    // planning and commit must not have its files silently dropped
    def survivors(): List[PlannedFile] = {
      val planned = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      planned.filter(_.file.content == DataContent.Data).foreach { p =>
        require(p.specId == metadata.defaultSpecId,
          "dynamic overwrite after partition spec evolution needs compaction first " +
            s"(file ${p.file.filePath} uses spec ${p.specId}, default is ${metadata.defaultSpecId})")
      }
      planned.filter { p =>
        // drop data files of replaced partitions and delete files scoped
        // to them; keep everything else (incl. global-scope deletes)
        !(newParts.contains(p.file.partition) &&
          (p.file.content == DataContent.Data || p.file.partition.nonEmpty))
      }
    }
    commitReplace(spark, "overwrite", survivors _, dataFiles)
  }

  /** CDC upsert (the reference's EqualityDeltaWriter semantics,
    * icelake/src/io_v2/functional_writer/equality_delta_writer.rs:95-260,
    * re-expressed set-wise): one snapshot carrying new data files plus an
    * equality-delete file of the incoming keys. Equality deletes only hit
    * strictly-older sequence numbers, so the new rows survive their own
    * delete. Rows with op=DELETE contribute only the delete. */
  /** Empty `keyCols` defaults to the schema's declared identifier fields
    * (`identifier-field-ids` — see [[setIdentifierFields]]). */
  def upsert(
      spark: SparkSession,
      df: DataFrame,
      keyCols: Seq[String] = Nil,
      opCol: Option[String] = None,
      extraSummary: Map[String, String] = Map.empty,
      validate: () => Unit = () => ()): GraftTable = {
    val schema = metadata.currentSchema
    val keys0 =
      if (keyCols.nonEmpty) keyCols
      else {
        val idf = schema.identifierFieldNames
        require(idf.nonEmpty,
          "upsert needs key columns (none given and the schema declares no identifier fields)")
        idf
      }
    val ids = keys0.map(n => schema.findField(n).getOrElse(sys.error(s"no field $n")).id)
    // WITHIN-BATCH last-wins (the reference's EqualityDeltaWriter
    // semantics, icelake/src/io_v2/equality_delta_writer.rs — a later
    // same-key row position-deletes earlier ones in the same writer;
    // icelake/tests/delta_test_v2.rs:354-395 exercises it): only each
    // key's LAST op survives, and only if it is an insert. The equality
    // delete covers every batch key (removing prior-commit rows); batch
    // rows all land at the new sequence, so the within-batch winner is
    // selected here, before the write. Batch order = input row order
    // (monotonic id per partition, partitions in order) — CDC sources
    // with a meaningful op order should sort the input first. One keyed
    // window shuffle, inherent to upsert semantics.
    // pipelines that GUARANTEE unique keys per batch can skip the keyed
    // window with `write.upsert.dedup=false` (one shuffle saved; the
    // semantics are then the caller's responsibility — duplicate keys
    // would all land as rows, like Iceberg MERGE refusing dup sources)
    val dedup = !metadata.properties.get("write.upsert.dedup").contains("false")
    val lastOps =
      if (!dedup) df
      else {
        val ordered = df.withColumn("_graft_seq", monotonically_increasing_id())
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys0.map(col): _*).orderBy(col("_graft_seq").desc)
        ordered.withColumn("_graft_rn", row_number().over(w))
          .filter(col("_graft_rn") === 1).drop("_graft_seq", "_graft_rn")
      }
    val (inserts, allKeys) = opCol match {
      case Some(oc) =>
        (lastOps.filter(col(oc) =!= lit(2)).drop(oc), df.select(keys0.map(col): _*).distinct())
      case None => (lastOps, df.select(keys0.map(col): _*).distinct())
    }
    val deleteFiles = TableWrite.writeDeleteFiles(
      this, spark, allKeys, DataContent.EqualityDeletes, ids)
    val dataFiles = TableWrite.writeDataFiles(this, spark, inserts)
    commit(spark, "overwrite", addedData = dataFiles, addedDeletes = deleteFiles,
      replace = false, extraSummary = extraSummary, validate = validate)
  }

  // ---------- maintenance ----------

  /** Compaction (the reference's Spark `rewrite_data_files` integration,
    * icelake/tests/insert_compact_test.rs:198-219, done natively): read the
    * current snapshot (applying deletes), rewrite as fresh data files, and
    * commit a replace snapshot. Collapses small files and absorbs delete
    * files. */
  /** Full compaction: every live data file is read (deletes applied) and
    * rewritten. Commits operation `replace` — a content-preserving
    * rewrite, NOT an overwrite: changelog/incremental readers skip it.
    * Absorbed delete files are dropped (rewritten rows carry a fresh
    * higher sequence, so old equality deletes no longer apply and old
    * position deletes reference retired paths); a delete landing
    * concurrently aborts the commit via [[rewriteSurvivors]]. */
  /** `where` scopes the compaction (Iceberg's `rewrite_data_files(where)`):
    * only files that MAY hold matching rows are read and rewritten —
    * compacting one hot partition of a 100 TB table costs that partition,
    * not the table. File selection is may-match (content preserved
    * exactly; the filter never drops rows, it only picks files). */
  def rewriteDataFiles(
      spark: SparkSession,
      where: Option[Column] = None): GraftTable = {
    val snap = metadata.currentSnapshot.getOrElse(return this)
    // distributed planning above the manifest threshold; file-level
    // pruning for a scoped rewrite happens executor-side there
    val planned = planFilesPruned(spark, snap, where, metadata.currentSchema)
      .filter(_.file.content == DataContent.Data)
    if (planned.isEmpty) return this
    val oldPaths = planned.map(p => GraftTable.normPathStr(p.file.filePath)).toSet
    val scoped =
      if (where.isEmpty) scan(spark)
      else scan(spark, onlyFiles = Some(oldPaths))
    val rewritten = TableWrite.writeDataFiles(this, spark, withLineageCols(scoped))
    commitReplace(spark, "replace",
      () => rewriteSurvivors(oldPaths, snap.sequenceNumber, "rewriteDataFiles")()
        .filter(p => p.file.content == DataContent.Data ||
          // deletes scoped to untouched files stay; a full rewrite (no
          // where) absorbs every delete as before
          where.isDefined),
      rewritten)
  }

  /** v3 row lineage through rewrites: append `_row_id` /
    * `_last_updated_sequence_number` to a rewrite's scan so the writer
    * MATERIALIZES them under their reserved field ids — rewritten rows
    * keep their identity instead of nulling out (no-op below v3) */
  private def withLineageCols(df: DataFrame): DataFrame =
    if (metadata.formatVersion < 3) df
    else df
      .withColumn(GraftTable.RowIdCol, df.metadataColumn(GraftTable.RowIdCol))
      .withColumn(GraftTable.LastUpdatedSeqCol,
        df.metadataColumn(GraftTable.LastUpdatedSeqCol))

  /** Selective compaction for 100 TB tables: only files under
    * `smallFileThresholdBytes` are read (with deletes applied) and
    * rewritten; large well-sized files are carried forward untouched, so
    * compaction cost is proportional to the small-file tail, not the
    * table. Sequence-number semantics keep deletes correct: rewritten
    * rows get a fresh (higher) sequence, so existing equality deletes no
    * longer apply to them (they were applied during the rewrite read),
    * while surviving files keep their original sequences and delete
    * files. Position deletes referencing rewritten paths become inert. */
  /** Global sort rewrite (Iceberg's `rewrite_data_files` sort strategy):
    * range-partition the WHOLE table by the declared sort order and
    * rewrite, so file min/max bounds TILE the sort key across files — a
    * filter on the leading sort column then prunes to O(1) files, where
    * the write path's per-file local sort only tightens bounds within
    * whatever file a row landed in. One range shuffle (Spark samples
    * boundaries — the at-scale sort path); the write re-applies the
    * declared order within files and stamps the order id, so sorted-scan
    * reporting holds. On a partitioned table the writer's partition
    * clustering takes over file routing; the declared order still holds
    * within each file. Same concurrent-delete safety as compaction. */
  def rewriteSorted(
      spark: SparkSession,
      targetFileSizeBytes: Long = 128L * 1024 * 1024): GraftTable = {
    val order = metadata.sortOrders
      .find(o => o.orderId == metadata.defaultSortOrderId && o.fields.nonEmpty)
      .getOrElse(sys.error(
        "rewriteSorted requires a non-empty default sort order (ALTER TABLE ... WRITE ORDERED BY)"))
    val snap = metadata.currentSnapshot.getOrElse(return this)
    val planned = planFiles(snap).filter(_.file.content == DataContent.Data)
    if (planned.isEmpty) return this
    val totalBytes = planned.map(_.file.fileSizeInBytes).sum
    val targetFiles = math.max(1,
      (totalBytes / math.max(1L, targetFileSizeBytes)).toInt +
        (if (totalBytes % math.max(1L, targetFileSizeBytes) > 0) 1 else 0))
    val sortCols: Seq[Column] = order.fields.flatMap { sf =>
      metadata.currentSchema.fieldById(sf.sourceId).map { f =>
        val c = col(f.name)
        (sf.direction, sf.nullOrder) match {
          case ("desc", "nulls-last") => c.desc_nulls_last
          case ("desc", _) => c.desc_nulls_first
          case (_, "nulls-last") => c.asc_nulls_last
          case _ => c.asc_nulls_first
        }
      }
    }
    require(sortCols.nonEmpty, "no sort-order fields resolve in the current schema")
    val ranged = withLineageCols(scan(spark))
      .repartitionByRange(targetFiles, sortCols: _*)
    val rewritten = TableWrite.writeDataFiles(this, spark, ranged)
    val oldPaths = planned.map(p => GraftTable.normPathStr(p.file.filePath)).toSet
    commitReplace(spark, "replace",
      rewriteSurvivors(oldPaths, snap.sequenceNumber, "rewriteSorted"), rewritten)
  }

  /** One-call maintenance runbook (`CALL system.auto_maintain`) — the
    * composition a production scheduler runs per table instead of
    * hand-sequencing four procedures: bin-pack small data files (no-op
    * when the metadata-only plan says the table is healthy), compact
    * accumulated position-delete files, collapse an overgrown manifest
    * list, expire history (branch/tag retention honored), and reclaim
    * orphans past the same horizon (count-only — the orphan path list
    * never lands on the driver). Each step is itself oracle/spec-gated;
    * this only sequences them and reports what changed. */
  def autoMaintain(
      spark: SparkSession,
      smallFileThresholdBytes: Long,
      expireOlderThanMs: Long,
      retainLast: Int = 3,
      maxManifests: Int = 8): Map[String, Long] = {
    def live(content: Int): Long = metadata.currentSnapshot.toList
      .flatMap(planFiles(_)).count(_.file.content == content).toLong
    def manifestCount: Long = metadata.currentSnapshot
      .map(s => ManifestIO.readManifestList(conf, relocate(s.manifestList)).size.toLong)
      .getOrElse(0L)
    val dataBefore = live(DataContent.Data)
    val posBefore = live(DataContent.PositionDeletes)
    val manifestsBefore = manifestCount
    val snapsBefore = metadata.snapshots.size.toLong
    rewriteSmallFiles(spark, smallFileThresholdBytes)
    if (live(DataContent.PositionDeletes) >= 2)
      rewritePositionDeleteFiles(spark)
    if (manifestCount > maxManifests) rewriteManifests(spark)
    expireSnapshots(expireOlderThanMs, retainLast = retainLast)
    val orphans = removeOrphanFilesCount(expireOlderThanMs)
    Map(
      "data_files_before" -> dataBefore,
      "data_files_after" -> live(DataContent.Data),
      "pos_delete_files_before" -> posBefore,
      "pos_delete_files_after" -> live(DataContent.PositionDeletes),
      "manifests_before" -> manifestsBefore,
      "manifests_after" -> manifestCount,
      "snapshots_before" -> snapsBefore,
      "snapshots_after" -> metadata.snapshots.size.toLong,
      "orphans_removed" -> orphans)
  }

  def rewriteSmallFiles(
      spark: SparkSession,
      smallFileThresholdBytes: Long): GraftTable = {
    val snap = metadata.currentSnapshot.getOrElse(return this)
    val planned = planFiles(snap)
    val (small, big) = planned
      .filter(_.file.content == DataContent.Data)
      .partition(_.file.fileSizeInBytes < smallFileThresholdBytes)
    if (small.size < 2) return this
    val smallPaths = small.map(p => GraftTable.normPathStr(p.file.filePath)).toSet
    // bin-pack: the rewritten tail targets ceil(totalBytes / threshold)
    // files (coalesce — no shuffle; partitioned tables re-cluster inside
    // writeDataFiles anyway)
    val targetFiles = math.max(1,
      (small.map(_.file.fileSizeInBytes).sum / math.max(1L, smallFileThresholdBytes)).toInt)
    val rewritten = TableWrite.writeDataFiles(
      this, spark,
      withLineageCols(scan(spark, onlyFiles = Some(smallPaths))).coalesce(targetFiles))
    commitReplace(spark, "replace",
      rewriteSurvivors(smallPaths, snap.sequenceNumber, "rewriteSmallFiles"), rewritten)
  }

  /** Survivor set for a replace-style file rewrite, recomputed per commit
    * retry so concurrent appends ride through. A concurrent DELETE
    * committed after our read could target the rewritten rows, and a
    * concurrent overwrite may have dropped files being rewritten
    * (re-adding their rows would resurrect overwritten data) — both
    * abort; a rewrite is always safe to re-run. */
  private def rewriteSurvivors(
      oldPaths: Set[String], sinceSeq: Long, what: String): () => List[PlannedFile] =
    () => {
      val now = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      if (now.exists(p => p.file.content != DataContent.Data && p.seq > sinceSeq))
        sys.error(s"concurrent delete during $what; re-run")
      val liveData = now.filter(_.file.content == DataContent.Data)
        .map(p => GraftTable.normPathStr(p.file.filePath)).toSet
      val gone = oldPaths.diff(liveData)
      if (gone.nonEmpty)
        sys.error(s"concurrent overwrite dropped ${gone.size} file(s) during " +
          s"$what (e.g. ${gone.head}); re-run")
      now.filterNot(p => p.file.content == DataContent.Data &&
        oldPaths.contains(GraftTable.normPathStr(p.file.filePath)))
    }

  /** Per-column (min, max) for a z-order rewrite folded from manifest
    * `lower/upper_bounds` — None when any file lacks a bound for any
    * column, or when a column's type can't map onto the curve's double
    * scale without a data read. `timestamp` (NTZ) is excluded: Spark
    * scales it through a session-timezone cast, so manifest micros could
    * disagree with scan-time doubles under a non-UTC session. */
  private[graft] def zRangesFromManifests(
      planned: List[PlannedFile], cols: Seq[String]): Option[Seq[(Double, Double)]] = {
    val schema = metadata.currentSchema
    val out = cols.map { name =>
      val f = schema.findField(name).getOrElse(return None)
      val ok = f.fieldType match {
        case IcePrim("int") | IcePrim("long") | IcePrim("date") |
             IcePrim("float") | IcePrim("double") | IcePrim("timestamptz") => true
        case IceDecimal(_, _) => true
        case _ => false
      }
      if (!ok) return None
      def toD(v: Any): Double = v match {
        case n: java.lang.Number => n.doubleValue()
        case other => sys.error(s"non-numeric bound $other")
      }
      val los = planned.map(_.file.lowerBounds.get(f.id))
      val his = planned.map(_.file.upperBounds.get(f.id))
      if (los.exists(_.isEmpty) || his.exists(_.isEmpty)) return None
      (los.flatten.map(b => toD(SingleValue.decode(f.fieldType, b))).min,
        his.flatten.map(b => toD(SingleValue.decode(f.fieldType, b))).max)
    }
    Some(out)
  }

  /** Z-order rewrite: re-cluster the whole table along a Morton curve
    * over `cols` so file min/max bounds stay tight on EVERY listed
    * column — filters on any of them prune files, where a linear sort
    * only serves its leading column. One range-shuffle (Spark samples
    * the z-values for balanced boundaries — the at-scale sort path),
    * replacement files commit as one `replace` snapshot with the same
    * concurrent-delete safety as compaction. */
  def rewriteZOrder(
      spark: SparkSession,
      cols: Seq[String],
      targetFileSizeBytes: Long = 128L * 1024 * 1024): GraftTable =
    rewriteCurve(spark, cols, targetFileSizeBytes,
      graft.functions.ZOrder.withZColumn(_, _, _, _), "rewriteZOrder")

  /** Hilbert-curve rewrite — same contract as [[rewriteZOrder]], tighter
    * locality: every curve step is a unit step in one dimension (no
    * Morton quadrant jumps), so file bounds come out tighter on average
    * for the same file count. Prefer it when the filter columns are
    * queried with small ranges; Morton's cheaper bit-interleave only
    * wins when the curve value itself must be computed ultra-hot. */
  def rewriteHilbert(
      spark: SparkSession,
      cols: Seq[String],
      targetFileSizeBytes: Long = 128L * 1024 * 1024): GraftTable =
    rewriteCurve(spark, cols, targetFileSizeBytes,
      graft.functions.Hilbert.withHilbertColumn(_, _, _, _), "rewriteHilbert")

  private def rewriteCurve(
      spark: SparkSession,
      cols: Seq[String],
      targetFileSizeBytes: Long,
      withCurveColumn: (DataFrame, Seq[String], String, Option[Seq[(Double, Double)]]) => DataFrame,
      opName: String): GraftTable = {
    val snap = metadata.currentSnapshot.getOrElse(return this)
    val planned = planFiles(snap).filter(_.file.content == DataContent.Data)
    if (planned.isEmpty) return this
    val totalBytes = planned.map(_.file.fileSizeInBytes).sum
    val targetFiles = math.max(1, (totalBytes / math.max(1L, targetFileSizeBytes)).toInt +
      (if (totalBytes % math.max(1L, targetFileSizeBytes) > 0) 1 else 0))
    // range discovery is metadata-only when every file carries footer
    // bounds for every curve column (they do for graft-written tables
    // since TableWrite.statsOf harvests them) — the rewrite then reads
    // the data exactly once instead of a min/max pre-scan plus the
    // rewrite read
    val ranges = zRangesFromManifests(planned, cols)
    if (ranges.isEmpty) Metrics.inc(Metrics.ZOrderRangeScans)
    val zed = withCurveColumn(withLineageCols(scan(spark)), cols, "_gz", ranges)
      .repartitionByRange(targetFiles, col("_gz"))
      .sortWithinPartitions("_gz")
      .drop("_gz")
    val rewritten = TableWrite.writeDataFiles(this, spark, zed, applyDeclaredSort = false)
    val oldPaths = planned.map(p => GraftTable.normPathStr(p.file.filePath)).toSet
    commitReplace(spark, "replace",
      rewriteSurvivors(oldPaths, snap.sequenceNumber, opName), rewritten)
  }

  /** Manifest compaction (`rewrite_manifests`): collapse the snapshot's
    * manifest list into one manifest per (spec, content) without touching
    * data — planning cost at 10^4+ commits drops back to O(files). */
  def rewriteManifests(spark: SparkSession): GraftTable = {
    if (metadata.currentSnapshot.isEmpty) return this
    def all(): List[PlannedFile] =
      metadata.currentSnapshot.toList.flatMap(planFiles(_))
    commitReplace(spark, "replace", all _, Nil)
  }

  /** Register existing parquet files as table data WITHOUT rewriting or
    * moving them (Iceberg's `add_files`/migrate surface — at 100 TB the
    * only sane way to onboard a legacy dataset is in place). Footer stats
    * harvest distributed like a fresh write; the commit is a normal
    * append. Imported files carry no Iceberg field ids, so reads resolve
    * their columns BY NAME (`fieldId.read.ignoreMissing`) — a later
    * column RENAME will not re-map them (graft-written files, which
    * carry ids, are unaffected). Unpartitioned default spec only:
    * partition tuples of a foreign layout are not derivable safely.
    * `source` may be a file, directory, or glob. */
  def addFiles(spark: SparkSession, source: String): GraftTable = {
    require(metadata.defaultSpec.isUnpartitioned,
      "add_files requires an unpartitioned default partition spec")
    val p = new Path(source)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    require(matched.nonEmpty, s"no files match $source")
    val paths = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
            !s.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
      else Seq(st.getPath.toString)
    }.filter(_.endsWith(".parquet"))
    require(paths.nonEmpty, s"no parquet files match $source")
    // re-importing an already-referenced file would double its rows
    val already = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      .map(pf => GraftTable.normPathStr(pf.file.filePath)).toSet
    val dups = paths.filter(pp => already.contains(GraftTable.normPathStr(pp)))
    require(dups.isEmpty,
      s"${dups.size} file(s) already referenced by the table (e.g. ${dups.head})")
    // required table columns must exist in the imported files
    val fileSchema = GraftTable.pinnedSession(spark).read.parquet(paths: _*).schema
    metadata.currentSchema.fields.filter(_.required).foreach(f =>
      require(fileSchema.fieldNames.contains(f.name),
        s"required column ${f.name} missing from imported files"))
    // pin a name mapping at first import (field id -> the name imported
    // files use NOW) so later column renames don't orphan these files'
    // columns; never overwrite an existing mapping — files already
    // imported under it depend on its names
    if (!metadata.properties.contains(NameMapping.PropertyKey))
      setProperties(Map(NameMapping.PropertyKey ->
        NameMapping.serialize(NameMapping.fromSchema(metadata.currentSchema))))
    val files = TableWrite.importDataFiles(this, spark, paths)
    commit(spark, "append", files, Nil, replace = false,
      extraSummary = Map("graft.add-files-source" -> source))
  }

  /** Delete-file compaction (`rewrite_position_delete_files`): merge the
    * accumulated small position-delete files into one delete file per
    * partition (a few for an unpartitioned table) and drop positions
    * whose target data file a rewrite already retired — WITHOUT touching
    * data files. A CDC-heavy MoR table grows thousands of tiny delete
    * files between full compactions and every scan pays their per-file
    * open cost; this collapses that to one read per partition. Equality
    * deletes are left alone (their sequence-relative visibility cannot be
    * restamped safely — a data rewrite absorbs them instead); position
    * deletes ARE safe to restamp at the new commit's sequence because
    * they target (file, pos) pairs and a path matches exactly the file it
    * was written against. Commits a true `replace` — content-preserving,
    * so changelog/incremental reads skip it.
    * (Reference context: delete files are first-class in
    * icelake/src/types/in_memory.rs:1722-1848 but their compaction is
    * deferred to engines — here we ARE the engine.) */
  def rewritePositionDeleteFiles(
      spark: SparkSession, targetFileSizeBytes: Long = 64L * 1024 * 1024,
      toVectors: Option[Boolean] = None): GraftTable = {
    val snap = metadata.currentSnapshot.getOrElse(return this)
    val planned = planFiles(snap)
    val posFiles = planned.filter(_.file.content == DataContent.PositionDeletes)
    if (posFiles.isEmpty) return this
    val liveData = planned.filter(_.file.content == DataContent.Data)
      .map(p => GraftTable.normPathStr(p.file.filePath)).toSet
    // mixed-format read: parquet rows plus latest-vector blobs (an older
    // superseded vector contributes nothing and is dropped with the rest)
    val rows = positionDeleteRowsDf(spark, posFiles)
    // drop positions aimed at retired data files (already absorbed by a
    // data rewrite); the live-path set is file-count sized -> broadcast
    val liveDf = kvDf(spark, liveData.toSeq.map(p => (p, 0L)), "_lp", "_lignore")
    val kept = rows
      .join(broadcast(liveDf), normPath(col("file_path")) === col("_lp"), "leftsemi")
    // size the merge: one output file per target-size chunk of the old
    // delete bytes (the partitioned writer fans out per partition anyway)
    val chunks = math.max(1,
      (posFiles.map(_.file.fileSizeInBytes).sum / math.max(1L, targetFileSizeBytes)).toInt)
    val merged =
      if (toVectors.getOrElse(dvEnabled)) buildDeletionVectors(spark, kept)
      else writeParquetPositionDeleteFiles(spark, kept.repartition(chunks))
    val oldPaths = posFiles.map(p => GraftTable.normPathStr(p.file.filePath)).toSet
    retryCommit(() => ()) {
      // survivors re-planned inside the retry: data files and any delete
      // files committed since (or eq deletes) carry forward untouched
      val now = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      val survivors = now.filterNot(p =>
        oldPaths.contains(GraftTable.normPathStr(p.file.filePath)))
      commitOnce("replace", Nil, merged, replace = true, existing = survivors)
    }
    this
  }

  /** Convert live equality-delete files into position deletes (or
    * deletion vectors under `write.delete.vector-enabled` / v3): each eq
    * key set resolves ONCE against raw rows of the data files with lower
    * data sequence — the same one-pass seq-visibility join the changelog
    * uses — into exact (file, position) pairs, and one replace commit
    * swaps every eq-delete file for the positional form. Scan content is
    * unchanged, but every subsequent scan drops the read-time equality
    * join: CDC upserts pay the resolution cost once at maintenance time
    * instead of on EVERY scan — at 100 TB the eq-delete key broadcast +
    * per-row hash probe is the MoR read path's dominant overhead.
    * (Delete-file shapes: reference `icelake/src/types/in_memory.rs`
    * 1722-1848; conversion itself is engine territory — ours.) */
  def convertEqualityDeletes(spark: SparkSession): GraftTable = {
    val snap = metadata.currentSnapshot.getOrElse(return this)
    val planned = planFiles(snap)
    val eqFiles = planned.filter(_.file.content == DataContent.EqualityDeletes)
    if (eqFiles.isEmpty) return this
    val schema = metadata.currentSchema
    val sparkSchema = SchemaConvert.toSparkSchema(schema)
    val pinned = GraftTable.pinnedSession(spark)
    val dataFiles = planned.filter(_.file.content == DataContent.Data)
    val positions: Seq[DataFrame] = eqFiles.groupBy(_.file.equalityIds.sorted)
      .toSeq.flatMap { case (ids, group) =>
        val keyNames = ids.flatMap(id => schema.fieldById(id).map(_.name))
        val maxDseq = group.map(_.seq).max
        val older = dataFiles.filter(_.seq < maxDseq)
        if (older.isEmpty || keyNames.isEmpty) None
        else {
          val keys = group.groupBy(_.seq).toSeq.map { case (dseq, g) =>
            pinned.read.parquet(g.map(p => relocate(p.file.filePath)): _*)
              .select(keyNames.map(col): _*).distinct()
              .withColumn("_dseq", lit(dseq))
          }.reduce(_.unionByName(_))
          val seqMap = kvDf(spark,
            older.map(p => (GraftTable.normPathStr(p.file.filePath), p.seq)),
            "_sf", "_sseq")
          val data = readDataFiles(spark, older, sparkSchema, withMeta = true)
            .join(broadcast(seqMap), col("_cf") === col("_sf"))
          Some(data.join(keys,
              keyNames.map(n => data(n) === keys(n)).reduce(_ && _) &&
                data("_sseq") < keys("_dseq"),
              "leftsemi")
            .select(col("_cf").as("file_path"), col("_cp").as("pos")))
        }
      }
    // the new positional files land at the conversion commit's sequence —
    // higher than every data file they reference, so visibility holds;
    // duplicates against existing pos deletes are harmless (sets union at
    // read, and a later rewrite_position_delete_files collapses them)
    val newDeletes =
      if (positions.isEmpty) Nil
      else writePositionDeleteFiles(spark, positions.reduce(_.unionByName(_)))
    val toDrop = eqFiles.map(p => GraftTable.normPathStr(p.file.filePath)).toSet
    retryCommit(() => ()) {
      val now = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      val survivors = now.filterNot(p =>
        toDrop.contains(GraftTable.normPathStr(p.file.filePath)))
      commitOnce("replace", Nil, newDeletes, replace = true, existing = survivors)
    }
    this
  }

  /** Remove files under `location/data` and `location/metadata` that no
    * table metadata references and that are older than `olderThanMs`
    * (grace period: a concurrent write may have files on disk before its
    * commit lands). The referenced set spans every snapshot's manifest
    * ENTRIES regardless of status (a DELETED entry's file stays
    * protected while any retained manifest names it), every manifest and
    * manifest list, and the statistics files; `*.metadata.json[.gz]` and
    * `version-hint.text` are never candidates. `dryRun` returns the
    * candidates without deleting. Returns the paths (driver-resident —
    * fine for interactive use; the SQL procedure goes through
    * [[removeOrphanFilesCount]] which never materializes the list). */
  def removeOrphanFiles(olderThanMs: Long, dryRun: Boolean = false): Seq[String] =
    reclaimOrphans(olderThanMs, collectPaths = true, dryRun = dryRun)._2

  /** Count-only orphan reclamation: at 100 TB the orphan set can be
    * millions of paths — the procedure needs the count, not a
    * driver-resident path list. */
  def removeOrphanFilesCount(olderThanMs: Long): Long =
    reclaimOrphans(olderThanMs, collectPaths = false)._1

  /** Orphan reclamation core. With an active SparkSession the whole pass
    * is distributed: one listing task per immediate child of `data/`
    * (partition directories on a partitioned table), candidate∖referenced
    * as a Catalyst anti-join, and deletes issued from executor tasks with
    * one FileSystem handle per partition — the driver never walks the
    * tree or issues a delete. A serial fallback covers bare library use
    * with no session. */
  private def reclaimOrphans(
      olderThanMs: Long, collectPaths: Boolean,
      dryRun: Boolean = false): (Long, Seq[String]) = {
    // a stale in-memory handle must not decide what is "unreferenced":
    // another writer's committed files would look orphaned
    refresh()
    // an unreadable manifest means the reference set is UNKNOWN — abort
    // rather than deleting files that might be live. Every manifest
    // ENTRY's file is protected regardless of status, plus the manifests,
    // manifest lists and statistics files themselves (metadata/ is listed
    // too).
    val referenced: Set[String] =
      try {
        val b = Set.newBuilder[String]
        def ref0(p: String): Unit = b += GraftTable.normPathStr(relocate(p))
        metadata.statistics.foreach(st => ref0(st.statisticsPath))
        metadata.partitionStatistics.foreach(st => ref0(st.statisticsPath))
        metadata.snapshots.foreach { s =>
          ref0(s.manifestList)
          ManifestIO.readManifestList(conf, relocate(s.manifestList)).foreach { le =>
            ref0(le.manifestPath)
            // partition names irrelevant — only file paths are harvested
            ManifestIO.readManifest(conf, relocate(le.manifestPath), Nil)
              .foreach(e => ref0(e.dataFile.filePath))
          }
        }
        b.result()
      } catch { case _: Throwable => return (0L, Nil) }
    // sweep the configured data path too (write.data.path may place data
    // outside {location}/data); recursive listing below also walks the
    // object-storage hash directories
    val dataDir = new Path(Locations.dataPath(metadata, location))
    val defaultDataDir = new Path(s"$location/data")
    val metaDir = new Path(s"$location/metadata")
    val fs = dataDir.getFileSystem(conf)
    if (!fs.exists(dataDir) && !fs.exists(defaultDataDir) && !fs.exists(metaDir))
      return (0L, Nil)
    SparkSession.getActiveSession match {
      case Some(spark) =>
        import spark.implicits._
        val prefixes = Seq(dataDir, defaultDataDir, metaDir).distinct
          .filter(fs.exists)
          .flatMap(d => fs.listStatus(d).map(_.getPath.toString))
        if (prefixes.isEmpty) return (0L, Nil)
        val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
        val listParts = math.max(1, math.min(prefixes.size, 256))
        val candidates = spark.sparkContext
          .parallelize(prefixes, listParts)
          .flatMap { prefix =>
            val c = serConf.value
            val p = new Path(prefix)
            val pfs = p.getFileSystem(c)
            val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
            try {
              val it = pfs.listFiles(p, true)
              while (it.hasNext) {
                val f = it.next()
                if (f.isFile && f.getModificationTime < olderThanMs &&
                  !f.getPath.getName.startsWith(".") &&
                  !GraftTable.orphanProtected(f.getPath.getName))
                  out += ((GraftTable.normPathStr(f.getPath.toUri.getPath),
                    f.getPath.toString))
              }
            } catch { case _: java.io.FileNotFoundException => () } // raced away
            out
          }
          .toDF("path", "full")
        // referenced set is metadata-sized; as a LocalRelation Spark
        // broadcasts it when small and shuffle-joins when it is not —
        // either way no single-node Set lookup over the full listing
        val refDf = referenced.toSeq.toDF("path")
        val orphans = candidates.join(refDf, Seq("path"), "left_anti")
          .as[(String, String)]
        val deletedAcc = spark.sparkContext.longAccumulator("graft.maintenance.files_deleted")
        val execAcc = spark.sparkContext.longAccumulator("graft.maintenance.executor_deletes")
        val del = (it: Iterator[(String, String)]) => {
          val c = serConf.value
          var fsh: FileSystem = null
          val done = scala.collection.mutable.ArrayBuffer[String]()
          it.foreach { case (norm, full) =>
            val p = new Path(full)
            if (fsh == null) fsh = p.getFileSystem(c)
            val ok = try fsh.delete(p, false) catch { case _: Throwable => false }
            if (ok) {
              deletedAcc.add(1)
              if (org.apache.spark.TaskContext.get() != null) execAcc.add(1)
              done += norm
            }
          }
          done.iterator
        }
        val paths: Seq[String] =
          if (dryRun) orphans.collect().map(_._2).toSeq
          else if (collectPaths) orphans.mapPartitions(del).collect().toSeq
          else {
            orphans.foreachPartition((it: Iterator[(String, String)]) => { del(it); () })
            Nil
          }
        Metrics.inc(Metrics.MaintenanceFilesDeleted, deletedAcc.value)
        Metrics.inc(Metrics.MaintenanceExecutorDeletes, execAcc.value)
        (if (dryRun) paths.size.toLong else deletedAcc.value, paths)
      case None =>
        val deleted = scala.collection.mutable.ArrayBuffer[String]()
        Seq(dataDir, defaultDataDir, metaDir).distinct.filter(fs.exists).foreach { d =>
          val it = fs.listFiles(d, true)
          while (it.hasNext) {
            val f = it.next()
            val p = GraftTable.normPathStr(f.getPath.toUri.getPath)
            if (f.isFile && !referenced.contains(p) &&
              f.getModificationTime < olderThanMs &&
              !f.getPath.getName.startsWith(".") &&
              !GraftTable.orphanProtected(f.getPath.getName)) {
              if (dryRun) deleted += p
              else if (fs.delete(f.getPath, false)) deleted += p
            }
          }
        }
        if (!dryRun) Metrics.inc(Metrics.MaintenanceFilesDeleted, deleted.size.toLong)
        (deleted.size.toLong, deleted.toSeq)
    }
  }

  /** Delete `paths` from executor tasks (one FileSystem handle per
    * partition) when a SparkSession is active; serial driver loop only as
    * a no-session fallback. Reclaim sets at 100 TB are millions of files:
    * a serial loop is hours of driver wall-clock and one lost connection
    * from aborting mid-pass, while tasks retry per-partition. Best-effort
    * either way — a path that fails to delete is left for the next
    * orphan-file pass. */
  private[tables] def deletePathsDistributed(paths: Seq[String]): Long = {
    if (paths.isEmpty) return 0L
    SparkSession.getActiveSession match {
      case Some(spark) =>
        val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
        val parts = math.max(1, math.min(paths.size / 512 + 1, 256))
        val deletedAcc = spark.sparkContext.longAccumulator("graft.maintenance.files_deleted")
        val execAcc = spark.sparkContext.longAccumulator("graft.maintenance.executor_deletes")
        spark.sparkContext.parallelize(paths, parts).foreachPartition { it =>
          val c = serConf.value
          var fsh: FileSystem = null
          it.foreach { raw =>
            try {
              val p = new Path(raw)
              if (fsh == null) fsh = p.getFileSystem(c)
              if (fsh.delete(p, false)) {
                deletedAcc.add(1)
                if (org.apache.spark.TaskContext.get() != null) execAcc.add(1)
              }
            } catch { case _: Throwable => () }
          }
        }
        Metrics.inc(Metrics.MaintenanceFilesDeleted, deletedAcc.value)
        Metrics.inc(Metrics.MaintenanceExecutorDeletes, execAcc.value)
        deletedAcc.value
      case None =>
        var n = 0L
        paths.foreach { raw =>
          try {
            val p = new Path(raw)
            if (p.getFileSystem(conf).delete(p, false)) n += 1
          } catch { case _: Throwable => () }
        }
        Metrics.inc(Metrics.MaintenanceFilesDeleted, n)
        n
    }
  }

  /** Expire snapshots older than the timestamp (keeping the current one):
    * drops them from metadata and deletes orphaned manifest lists. Data
    * file deletion is left to a GC pass (kept conservative here).
    *
    * Ref safety (the reference's retention model,
    * icelake/src/types/in_memory.rs:2360-2410): every snapshot reachable
    * from a live branch/tag survives — the ref head itself, plus, for
    * branches, ancestors within `minSnapshotsToKeep`/`maxSnapshotAgeMs`.
    * Refs older than their `maxRefAgeMs` are dropped first. */
  /** Expire snapshots older than `olderThanMs` (current snapshot, ref
    * heads, and ref retention windows always survive). With
    * `deleteDataFiles` the call also deletes data/delete files and
    * manifests reachable ONLY from expired snapshots — the fused
    * "expire + reclaim" pass users expect from one call; without it the
    * files wait for [[removeOrphanFiles]]. Reference sets are computed
    * from metadata BEFORE anything is deleted, and an unreadable
    * surviving manifest aborts file deletion (an unknown live set must
    * never decide what dies) while metadata expiry still proceeds. */
  def expireSnapshots(
      olderThanMs: Long,
      deleteDataFiles: Boolean = false,
      retainLast: Int = 1): GraftTable = {
    require(retainLast >= 1, s"retain_last must be >= 1, got $retainLast")
    val base = metadata
    val now = System.currentTimeMillis()
    val byId = base.snapshots.map(s => s.snapshotId -> s).toMap
    // retire refs past their max age (age measured from their head
    // snapshot's commit time; "main" never retires)
    val liveRefs = base.refs.filter { case (name, r) =>
      name == "main" || r.maxRefAgeMs.forall { maxAge =>
        byId.get(r.snapshotId).forall(s => now - s.timestampMs <= maxAge)
      }
    }
    def ancestors(id: Long): List[IceSnapshot] =
      byId.get(id) match {
        case None => Nil
        case Some(s) => s :: s.parentSnapshotId.map(ancestors).getOrElse(Nil)
      }
    val refKeep: Set[Long] = liveRefs.values.flatMap { r =>
      if (r.refType == "tag") byId.get(r.snapshotId).map(_.snapshotId).toList
      else {
        val chain = ancestors(r.snapshotId)
        val minKeep = r.minSnapshotsToKeep.getOrElse(1)
        chain.zipWithIndex.collect {
          case (s, i)
              if i < minKeep ||
                r.maxSnapshotAgeMs.exists(maxAge => now - s.timestampMs <= maxAge) =>
            s.snapshotId
        }
      }
    }.toSet
    // retain_last: the N most recent ancestors of the current snapshot
    // stay regardless of age (Iceberg's expire_snapshots retain_last)
    val retained = base.currentSnapshotId.toList
      .flatMap(id => ancestors(id).take(retainLast)).map(_.snapshotId)
    val keepIds = base.currentSnapshotId.toSet ++ refKeep ++ retained ++
      base.snapshots.filter(_.timestampMs >= olderThanMs).map(_.snapshotId)
    val (kept, expired) = base.snapshots.partition(s => keepIds.contains(s.snapshotId))
    if (expired.isEmpty && liveRefs.size == base.refs.size) return this
    // streaming replay guards must survive expiry: carry the max batch-id
    // stamp per sink key from expired snapshots onto the newest kept one
    // (an expired stamp would make a restarted query re-commit its batch)
    val carried: Map[String, String] = expired
      .flatMap(_.summary).filter(_._1.startsWith("streaming-batch-id"))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2.toLong).max.toString }
    val keptWithStamps =
      if (carried.isEmpty || kept.isEmpty) kept
      else {
        val newest = kept.maxBy(_.sequenceNumber).snapshotId
        kept.map(s =>
          if (s.snapshotId == newest) s.copy(summary = carried ++ s.summary) else s)
      }
    // reference sets BEFORE any deletion: per-snapshot manifest paths and
    // content-file paths. Survivors' sets must be complete — any read
    // failure there disables file deletion entirely.
    case class Refs(manifests: Set[String], files: Set[String])
    def refsOf(snaps: Seq[IceSnapshot]): Refs = {
      val manifests = snaps.flatMap(s =>
        ManifestIO.readManifestList(conf, relocate(s.manifestList))
          .map(e => GraftTable.normPathStr(relocate(e.manifestPath)))).toSet
      val files = snaps.flatMap(s =>
        planFiles(s).map(p => GraftTable.normPathStr(p.file.filePath))).toSet
      Refs(manifests, files)
    }
    val reclaim: Option[(Set[String], Set[String])] =
      if (!deleteDataFiles) None
      else
        try {
          val live = refsOf(kept)
          // an unreadable EXPIRED manifest only shrinks what we reclaim
          val dead = try refsOf(expired) catch { case _: Throwable => Refs(Set.empty, Set.empty) }
          Some((dead.files.diff(live.files), dead.manifests.diff(live.manifests)))
        } catch { case _: Throwable => None }
    // statistics entries are snapshot-scoped: entries of expired
    // snapshots leave the metadata with the snapshots, and their
    // puffin/parquet files reclaim with the manifest lists (a kept
    // entry's path is never touched)
    val (keptStats, deadStats) =
      base.statistics.partition(s => keepIds.contains(s.snapshotId))
    val (keptPartStats, deadPartStats) =
      base.partitionStatistics.partition(s => keepIds.contains(s.snapshotId))
    val keptStatsPaths =
      (keptStats.map(_.statisticsPath) ++ keptPartStats.map(_.statisticsPath))
        .map(p => GraftTable.normPathStr(relocate(p))).toSet
    val deadStatsPaths =
      (deadStats.map(_.statisticsPath) ++ deadPartStats.map(_.statisticsPath))
        .map(p => relocate(p))
        .filterNot(p => keptStatsPaths.contains(GraftTable.normPathStr(p)))
    val newMeta = base.copy(
      snapshots = keptWithStamps,
      refs = liveRefs,
      statistics = keptStats,
      partitionStatistics = keptPartStats,
      snapshotLog = base.snapshotLog.filter(e => keepIds.contains(e.ref.toLong)),
      lastUpdatedMs = System.currentTimeMillis())
    commitMetaOnly(newMeta)
    // reclaim tail: sets are metadata-sized on the driver, but the
    // deletes themselves run in executor tasks (millions of files at
    // 100 TB — see deletePathsDistributed)
    val reclaimPaths = reclaim.toSeq.flatMap { case (files, manifests) =>
      files.toSeq ++ manifests.toSeq
    }
    deletePathsDistributed(
      reclaimPaths ++ expired.map(s => relocate(s.manifestList)) ++ deadStatsPaths)
    this
  }

  // ---------- schema evolution ----------

  /** Add a column with a fresh field id (snapshot-pinned schemas mean old
    * snapshots keep reading their original schema; old data files surface
    * the new column as `initialDefault`, or null when none is set). A
    * REQUIRED column on a non-empty table demands a default — otherwise
    * pre-existing rows would violate the constraint. */
  def addColumn(
      name: String,
      fieldType: IceType,
      doc: Option[String] = None,
      required: Boolean = false,
      default: Option[Any] = None): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    require(schema.findField(name).isEmpty, s"column $name already exists")
    require(!required || default.isDefined || base.currentSnapshotId.isEmpty,
      s"required column $name on a non-empty table needs a default")
    // the new field AND any ids inside its type (struct/list/map) get
    // fresh ids past lastColumnId — inner ids from a standalone
    // conversion would collide with live ones
    var next = base.lastColumnId
    def alloc(): Int = { next += 1; next }
    val newId = alloc()
    val newSchema = IceSchema(
      schema.schemaId + 1,
      schema.fields :+ IceField(newId, name, required,
        reassignIds(fieldType, alloc _), doc,
        initialDefault = default, writeDefault = default),
      schema.identifierFieldIds)
    commitSchema(newSchema, next)
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
      schema.fields.map(x => if (x.id == f.id) x.copy(name = to) else x),
      schema.identifierFieldIds)
    commitSchema(newSchema, base.lastColumnId)
  }

  /** Type widening per the Iceberg spec (`int -> long`, `float ->
    * double`, decimal precision growth at fixed scale): the field id is
    * stable, so pre-promotion files keep serving their values through
    * the widened type (Spark 4's parquet readers promote int32 -> int64
    * and float -> double in the vectorized path). Anything else is
    * refused — narrowing or cross-family changes would corrupt old
    * files silently. */
  def updateColumnType(name: String, to: IceType): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    val f = schema.findField(name).getOrElse(sys.error(s"no column $name"))
    val ok = (f.fieldType, to) match {
      case (a, b) if a == b => true
      case (IcePrim("int"), IcePrim("long")) => true
      case (IcePrim("float"), IcePrim("double")) => true
      case (IceDecimal(p1, s1), IceDecimal(p2, s2)) => s1 == s2 && p2 >= p1
      // v3: `unknown` promotes to any concrete type — the column never
      // reached a data file, so every pre-promotion row reads null
      // through the absent-column path (same machinery as add-column)
      case (IcePrim("unknown"), b) if b != IcePrim("unknown") =>
        metadata.formatVersion >= 3
      case _ => false
    }
    require(ok, s"illegal type promotion ${f.fieldType} -> $to for $name " +
      "(Iceberg spec allows int->long, float->double, decimal precision " +
      "growth, and unknown->any at format-version 3)")
    val newSchema = IceSchema(
      schema.schemaId + 1,
      schema.fields.map(x => if (x.id == f.id) x.copy(fieldType = to) else x),
      schema.identifierFieldIds)
    commitSchema(newSchema, base.lastColumnId)
  }

  /** required -> optional is always safe; optional -> required is only
    * sound on an empty table (existing rows may hold nulls). */
  def updateColumnNullability(name: String, nullable: Boolean): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    val f = schema.findField(name).getOrElse(sys.error(s"no column $name"))
    require(nullable || base.currentSnapshotId.isEmpty,
      s"cannot make $name required on a non-empty table")
    val newSchema = IceSchema(
      schema.schemaId + 1,
      schema.fields.map(x => if (x.id == f.id) x.copy(required = !nullable) else x),
      schema.identifierFieldIds)
    commitSchema(newSchema, base.lastColumnId)
  }

  def removeProperties(keys: Seq[String]): GraftTable = {
    val base = metadata
    commitMetaOnly(base.copy(
      properties = base.properties -- keys,
      lastUpdatedMs = System.currentTimeMillis()))
  }

  def dropColumn(name: String): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    val f = schema.findField(name).getOrElse(sys.error(s"no column $name"))
    require(!schema.identifierFieldIds.contains(f.id),
      s"cannot drop identifier field $name (unset identifier fields first)")
    val newSchema = IceSchema(
      schema.schemaId + 1, schema.fields.filterNot(_.name == name),
      schema.identifierFieldIds)
    commitSchema(newSchema, base.lastColumnId)
  }

  // ---------- nested (struct-path) schema evolution ----------

  /** fresh pre-order ids for a type being ADDED to a live schema — ids
    * from a standalone conversion start at 1 and would collide */
  private def reassignIds(t: IceType, next: () => Int): IceType = t match {
    case IceStruct(fs) => IceStruct(fs.map(f =>
      f.copy(id = next(), fieldType = reassignIds(f.fieldType, next))))
    case IceList(_, e, req) =>
      val id = next(); IceList(id, reassignIds(e, next), req)
    case IceMap(_, k, _, v, req) =>
      val kid = next(); val kk = reassignIds(k, next)
      val vid = next(); IceMap(kid, kk, vid, reassignIds(v, next), req)
    case prim => prim
  }

  /** apply `f` to the field at a struct-nested `path`; `f` returning None
    * drops it. Every intermediate segment must be a struct field — list
    * element / map value evolution is refused explicitly. */
  private def fieldsAt(
      fields: List[IceField], path: Seq[String], fullPath: String)(
      f: IceField => Option[IceField]): List[IceField] = path match {
    case Seq(last) =>
      require(fields.exists(_.name == last), s"no column $fullPath")
      fields.flatMap(x => if (x.name == last) f(x) else Some(x))
    case head +: rest =>
      require(fields.exists(_.name == head), s"no column $fullPath")
      fields.map { x =>
        if (x.name != head) x
        else x.fieldType match {
          case IceStruct(fs) =>
            x.copy(fieldType = IceStruct(fieldsAt(fs, rest, fullPath)(f)))
          case other => sys.error(
            s"$head is ${other.repr}, not a struct — cannot evolve $fullPath")
        }
      }
  }

  private def commitFields(newFields: List[IceField], lastColumnId: Int): GraftTable = {
    val schema = metadata.currentSchema
    commitSchema(
      IceSchema(schema.schemaId + 1, newFields, schema.identifierFieldIds),
      lastColumnId)
  }

  /** Add a field INSIDE a struct column (`path` = parent segments + new
    * name, e.g. Seq("address", "zip")): new ids allocated past
    * lastColumnId, so old files — which lack the field entirely — serve
    * null through field-id resolution, the same mechanism as top-level
    * adds. Required nested fields are only legal on an empty table
    * (nested defaults are not supported). */
  def addColumnPath(
      path: Seq[String], fieldType: IceType, required: Boolean = false): GraftTable = {
    require(path.length >= 2, "addColumnPath needs a parent struct path")
    val base = metadata
    require(!required || base.currentSnapshotId.isEmpty,
      s"cannot add required nested ${path.mkString(".")} to a non-empty table")
    var next = base.lastColumnId
    def alloc(): Int = { next += 1; next }
    val newField = {
      val id = alloc()
      IceField(id, path.last, required, reassignIds(fieldType, alloc _))
    }
    val full = path.mkString(".")
    val parent = path.init
    val withAdded = fieldsAt(base.currentSchema.fields, parent, full) { p =>
      p.fieldType match {
        case IceStruct(fs) =>
          require(!fs.exists(_.name == path.last), s"column $full already exists")
          Some(p.copy(fieldType = IceStruct(fs :+ newField)))
        case other => sys.error(
          s"${parent.mkString(".")} is ${other.repr}, not a struct")
      }
    }
    commitFields(withAdded, next)
  }

  /** rename a struct-nested field; the id is stable so old files keep
    * serving values through field-id resolution, like top-level renames */
  def renameColumnPath(path: Seq[String], to: String): GraftTable = {
    if (path.length == 1) return renameColumn(path.head, to)
    val base = metadata
    val updated = fieldsAt(base.currentSchema.fields, path, path.mkString("."))(
      f => Some(f.copy(name = to)))
    commitFields(updated, base.lastColumnId)
  }

  /** drop a struct-nested field (identifier fields refuse, as top-level) */
  def dropColumnPath(path: Seq[String]): GraftTable = {
    if (path.length == 1) return dropColumn(path.head)
    val base = metadata
    val schema = base.currentSchema
    val updated = fieldsAt(schema.fields, path, path.mkString(".")) { f =>
      require(!schema.identifierFieldIds.contains(f.id),
        s"cannot drop identifier field ${path.mkString(".")}")
      None
    }
    commitFields(updated, base.lastColumnId)
  }

  /** apply `f` to the CHILD LIST of the struct at `parentPath` (empty =
    * top level) — the list-level counterpart of [[fieldsAt]], for
    * reordering */
  private def childrenAt(
      fields: List[IceField], parentPath: Seq[String], full: String)(
      f: List[IceField] => List[IceField]): List[IceField] =
    if (parentPath.isEmpty) f(fields)
    else {
      require(fields.exists(_.name == parentPath.head), s"no column $full")
      fields.map { x =>
        if (x.name != parentPath.head) x
        else x.fieldType match {
          case IceStruct(fs) =>
            x.copy(fieldType = IceStruct(childrenAt(fs, parentPath.tail, full)(f)))
          case other => sys.error(
            s"${parentPath.head} is ${other.repr}, not a struct — cannot evolve $full")
        }
      }
    }

  /** reorder a (possibly nested) column: FIRST among its siblings, or
    * AFTER a named sibling — metadata-only (field ids are the identity;
    * order only affects SELECT * shape) */
  def moveColumnPath(path: Seq[String], after: Option[String]): GraftTable = {
    val base = metadata
    val full = path.mkString(".")
    val updated = childrenAt(base.currentSchema.fields, path.init, full) { fs =>
      val fld = fs.find(_.name == path.last).getOrElse(sys.error(s"no column $full"))
      val rest = fs.filterNot(_.name == path.last)
      after match {
        case None => fld :: rest
        case Some(a) =>
          val idx = rest.indexWhere(_.name == a)
          require(idx >= 0, s"no sibling column $a to move $full after")
          (rest.take(idx + 1) :+ fld) ++ rest.drop(idx + 1)
      }
    }
    commitFields(updated, base.lastColumnId)
  }

  /** update a column's doc/comment (nested paths included) */
  def setColumnDocPath(path: Seq[String], doc: Option[String]): GraftTable = {
    val base = metadata
    val updated = fieldsAt(base.currentSchema.fields, path, path.mkString("."))(
      f => Some(f.copy(doc = doc)))
    commitFields(updated, base.lastColumnId)
  }

  /** ALTER COLUMN ... SET/DROP DEFAULT: updates `write-default` only —
    * it fills FUTURE writes that omit the column; `initial-default`
    * (what old files serve) is fixed at add time, per the spec */
  def setColumnWriteDefaultPath(path: Seq[String], value: Option[Any]): GraftTable = {
    val base = metadata
    val updated = fieldsAt(base.currentSchema.fields, path, path.mkString("."))(
      f => Some(f.copy(writeDefault = value)))
    commitFields(updated, base.lastColumnId)
  }

  /** nested type widening — same spec-legal promotions as top-level */
  def updateColumnTypePath(path: Seq[String], to: IceType): GraftTable = {
    if (path.length == 1) return updateColumnType(path.head, to)
    val base = metadata
    val updated = fieldsAt(base.currentSchema.fields, path, path.mkString(".")) { f =>
      val ok = (f.fieldType, to) match {
        case (a, b) if a == b => true
        case (IcePrim("int"), IcePrim("long")) => true
        case (IcePrim("float"), IcePrim("double")) => true
        case (IceDecimal(p1, s1), IceDecimal(p2, s2)) => s1 == s2 && p2 >= p1
        case _ => false
      }
      require(ok, s"illegal type promotion ${f.fieldType} -> $to " +
        s"for ${path.mkString(".")}")
      Some(f.copy(fieldType = to))
    }
    commitFields(updated, base.lastColumnId)
  }

  def updateColumnNullabilityPath(path: Seq[String], nullable: Boolean): GraftTable = {
    if (path.length == 1) return updateColumnNullability(path.head, nullable)
    val base = metadata
    require(nullable || base.currentSnapshotId.isEmpty,
      s"cannot make ${path.mkString(".")} required on a non-empty table")
    val updated = fieldsAt(base.currentSchema.fields, path, path.mkString("."))(
      f => Some(f.copy(required = !nullable)))
    commitFields(updated, base.lastColumnId)
  }

  /** Declare the schema's row-identity key (Iceberg
    * `identifier-field-ids`): upserts and the CDC streaming sink default
    * their equality keys to it. Spec constraints enforced: fields must
    * exist, be primitive, and not float/double (NaN breaks equality). */
  def setIdentifierFields(names: Seq[String]): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    val ids = names.map { n =>
      val f = schema.findField(n).getOrElse(sys.error(s"no column $n"))
      f.fieldType match {
        case IcePrim("float") | IcePrim("double") =>
          sys.error(s"identifier field $n cannot be float/double")
        case IceStruct(_) | IceList(_, _, _) | IceMap(_, _, _, _, _) |
            IcePrim("variant") | IcePrim("unknown") =>
          sys.error(s"identifier field $n must be a primitive column")
        case _ => f.id
      }
    }
    commitSchema(
      IceSchema(schema.schemaId + 1, schema.fields, ids.toList),
      base.lastColumnId)
  }

  /** metadata-only commit: record the metadata file this commit REPLACES
    * in the metadata-log (same convention as snapshot commits — without
    * this, schema/ref/rollback/expire versions would be invisible to the
    * `metadata_log_entries` view and external log walkers). */
  private def commitMetaOnly(newMeta: TableMetadata): GraftTable = {
    val (logged, trimmed) = trimMetadataLog(
      newMeta.copy(metadataLog = metadata.metadataLog :+
        IceLogEntry(metadata.lastUpdatedMs,
          s"${StorageCatalog.metadataDir(location)}/" +
            StorageCatalog.metadataFileName(version, metadata.properties))))
    val newVersion = committer(logged, version)
    metadata = logged
    version = newVersion
    deleteTrimmedMetadata(trimmed)
    this
  }

  /** Iceberg metadata-log retention (`write.metadata.previous-versions-max`,
    * default 100): keep only the newest N log entries; with
    * `write.metadata.delete-after-commit.enabled=true` the dropped
    * entries' metadata FILES are deleted once the commit that trimmed
    * them succeeds. Without trimming a long-lived table (10^5+ commits at
    * 100 TB) grows an unbounded array inside EVERY metadata.json it ever
    * writes — the log itself becomes the metadata bloat. Returns the
    * trimmed metadata plus the file paths eligible for deletion. */
  private def trimMetadataLog(m: TableMetadata): (TableMetadata, Seq[String]) = {
    val max = m.properties.get(GraftTable.PreviousVersionsMaxProp)
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(100).max(1)
    if (m.metadataLog.size <= max) (m, Nil)
    else {
      val dropped = m.metadataLog.dropRight(max)
      val doomed =
        if (m.properties.get(GraftTable.DeleteAfterCommitProp).contains("true"))
          dropped.map(_.ref)
        else Nil
      (m.copy(metadataLog = m.metadataLog.takeRight(max)), doomed)
    }
  }

  /** best-effort removal of trimmed metadata files AFTER a successful
    * commit — a failed delete must never fail the commit (the log entry
    * is already gone; orphan cleanup will sweep stragglers) */
  private def deleteTrimmedMetadata(paths: Seq[String]): Unit = paths.foreach { p =>
    try {
      val fp = new Path(relocate(p))
      fp.getFileSystem(conf).delete(fp, false)
      ()
    } catch { case _: Exception => () }
  }

  private def commitSchema(newSchema: IceSchema, lastColumnId: Int): GraftTable = {
    val base = metadata
    require(base.formatVersion >= 3 || !newSchema.usesV3Types,
      "variant/timestamp_ns/unknown columns require format-version 3")
    newSchema.invalidUnknown.foreach(e => sys.error(e))
    val newMeta = base.copy(
      schemas = base.schemas :+ newSchema,
      currentSchemaId = newSchema.schemaId,
      lastColumnId = lastColumnId,
      lastUpdatedMs = System.currentTimeMillis())
    commitMetaOnly(newMeta)
  }

  /** Partition spec evolution: declare a NEW default spec (fresh spec id,
    * fresh partition field ids). Files written under older specs keep
    * their spec id in the manifests, and pruning interprets every file's
    * partition tuple against its own spec — old-spec files are never
    * mis-pruned, new writes cluster by the new spec. */
  def updatePartitionSpec(fields: List[IcePartitionField]): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    fields.foreach { pf =>
      val src = schema.fieldById(pf.sourceId)
      require(src.isDefined, s"partition source field ${pf.sourceId} not in schema")
      require(src.get.fieldType != IcePrim("unknown"),
        s"cannot partition by unknown-typed column ${src.get.name}")
    }
    val newSpecId = (0 :: base.partitionSpecs.map(_.specId)).max + 1
    val assigned = fields.zipWithIndex.map { case (pf, i) =>
      pf.copy(fieldId = base.lastPartitionId + 1 + i)
    }
    val newMeta = base.copy(
      partitionSpecs = base.partitionSpecs :+ IcePartitionSpec(newSpecId, assigned),
      defaultSpecId = newSpecId,
      lastPartitionId = base.lastPartitionId + assigned.size,
      lastUpdatedMs = System.currentTimeMillis())
    commitMetaOnly(newMeta)
  }

  /** Declare a table sort order (the reference's SortOrder metadata,
    * icelake/src/types/in_memory.rs:1060-1152): writes sort within files
    * by it and stamp the order id on their DataFiles. Each entry is
    * (column, direction asc|desc, nullOrder nulls-first|nulls-last). */
  def setSortOrder(fields: Seq[(String, String, String)]): GraftTable = {
    val base = metadata
    val schema = base.currentSchema
    val sortFields = fields.toList.map { case (name, dir, nulls) =>
      val f = schema.findField(name).getOrElse(sys.error(s"no column $name"))
      require(dir == "asc" || dir == "desc", s"direction must be asc|desc: $dir")
      require(nulls == "nulls-first" || nulls == "nulls-last", s"bad null order: $nulls")
      IceSortField(f.id, "identity", dir, nulls)
    }
    val newId = (0 :: base.sortOrders.map(_.orderId)).max + 1
    val newMeta = base.copy(
      sortOrders = base.sortOrders :+ IceSortOrder(newId, sortFields),
      defaultSortOrderId = newId,
      lastUpdatedMs = System.currentTimeMillis())
    commitMetaOnly(newMeta)
  }

  /** set/replace table properties (metadata-only commit) */
  def setProperties(props: Map[String, String]): GraftTable = {
    val base = metadata
    val newMeta = base.copy(
      properties = base.properties ++ props,
      lastUpdatedMs = System.currentTimeMillis())
    commitMetaOnly(newMeta)
  }

  // ---------- table statistics ----------

  /** Compute per-column NDV statistics for the CURRENT snapshot in ONE
    * distributed pass, write them as a Puffin statistics file under
    * `metadata/`, and register it in table metadata (`statistics`, the
    * Iceberg table-statistics shape). Planners consume the `ndv` BLOB
    * PROPERTY straight from table metadata — zero file I/O at plan time,
    * the same contract Iceberg's theta-sketch stats follow (and foreign
    * `apache-datasketches-theta-v1` entries are read the same way).
    *
    * `approximate = true` (the DEFAULT) estimates via HyperLogLog++ — one
    * pass with NO per-column expand, the 100 TB path; exact mode is
    * opt-in (oracle-checkable, but `count_distinct` over every column in
    * one aggregate triggers Catalyst's expand: rows × columns). */
  def computeTableStats(
      spark: SparkSession,
      columns: Seq[String] = Nil,
      approximate: Boolean = true): GraftTable = {
    import org.apache.spark.sql.functions.{approx_count_distinct, count_distinct}
    val snap = metadata.currentSnapshot.getOrElse(sys.error("no snapshot to analyze"))
    val schema = metadata.currentSchema
    val targets: Seq[IceField] =
      if (columns.nonEmpty)
        columns.map(c => schema.findField(c).getOrElse(sys.error(s"no column $c")))
      else schema.fields.filter(_.fieldType match {
        case IcePrim(_) | IceDecimal(_, _) | IceFixed(_) => true
        case _ => false
      })
    require(targets.nonEmpty, "no primitive columns to analyze")
    val aggs = targets.map { f =>
      (if (approximate) approx_count_distinct(col(f.name))
      else count_distinct(col(f.name))).as(s"ndv_${f.id}")
    }
    val row = scan(spark).agg(aggs.head, aggs.tail: _*).head()
    val blobs = targets.zipWithIndex.map { case (f, i) =>
      val ndv = row.getLong(i)
      Puffin.BlobInput(
        GraftTable.NdvBlobType, Seq(f.id),
        Map("ndv" -> ndv.toString) ++
          (if (approximate) Map("approximate" -> "true") else Map.empty),
        java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(ndv).array)
    }
    val path =
      s"$location/metadata/stats-${snap.snapshotId}-${java.util.UUID.randomUUID()}.puffin"
    val (len, metas) = Puffin.write(conf, path, blobs, snap.snapshotId, snap.sequenceNumber)
    val blobsEnd = metas.lastOption.map(m => m.offset + m.length).getOrElse(4L)
    val entry = IceStatisticsFile(
      snap.snapshotId, path, len, len - blobsEnd,
      metas.map(m => IceBlobMetadata(
        m.blobType, m.snapshotId, m.sequenceNumber, m.fields.toList, m.properties)).toList)
    val base = metadata
    commitMetaOnly(base.copy(
      statistics = base.statistics.filterNot(_.snapshotId == snap.snapshotId) :+ entry,
      lastUpdatedMs = System.currentTimeMillis()))
  }

  /** Write an Iceberg partition-statistics file for the CURRENT snapshot:
    * per-partition rollups (record/file counts, byte sizes, delete-file
    * tallies) folded from the MANIFESTS — metadata-only, no data scan —
    * written as one parquet file under `metadata/` and registered in the
    * `partition-statistics` table-metadata list. At 100 TB this makes
    * per-partition planning questions (how big is partition P, where is
    * the skew) an O(partitions) file read instead of a manifest walk per
    * query. Files from older partition specs fold into the unified tuple
    * (missing fields null), like the `partitions` metadata view. */
  def computePartitionStats(spark: SparkSession): GraftTable = {
    import graft.spark.GraftMetadataTables
    val snap = metadata.currentSnapshot.getOrElse(sys.error("no snapshot to analyze"))
    val spec = metadata.defaultSpec
    require(spec.fields.nonEmpty, "partition statistics need a partitioned table")
    val files = planFiles(snap)
    val defaults = spec.fields.map(_.name)
    val grouped = files.groupBy { pf =>
      val fileSpec = metadata.specById(pf.specId)
      val rts = GraftMetadataTables.resultTypesOf(metadata, fileSpec)
      val byName = fileSpec.fields.zip(rts).zip(pf.file.partition).map {
        case ((f, rt), v) => f.name -> GraftMetadataTables.partitionValue(v.orNull, rt)
      }.toMap
      defaults.map(n => byName.getOrElse(n, null))
    }
    val rows: Seq[org.apache.spark.sql.Row] = grouped.toSeq.map { case (tuple, fs) =>
      def of(content: Int) = fs.filter(_.file.content == content)
      val data = of(DataContent.Data)
      val pos = of(DataContent.PositionDeletes)
      val eq = of(DataContent.EqualityDeletes)
      org.apache.spark.sql.Row(
        org.apache.spark.sql.Row.fromSeq(tuple),
        fs.map(_.specId).max,
        data.map(_.file.recordCount).sum,
        data.size.toLong,
        data.map(_.file.fileSizeInBytes).sum,
        pos.map(_.file.recordCount).sum,
        pos.size.toLong,
        eq.map(_.file.recordCount).sum,
        eq.size.toLong)
    }
    val schema = StructType(Seq(
      StructField("partition", GraftMetadataTables.partitionStruct(metadata), nullable = false),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("data_record_count", LongType, nullable = false),
      StructField("data_file_count", LongType, nullable = false),
      StructField("total_data_file_size_in_bytes", LongType, nullable = false),
      StructField("position_delete_record_count", LongType, nullable = false),
      StructField("position_delete_file_count", LongType, nullable = false),
      StructField("equality_delete_record_count", LongType, nullable = false),
      StructField("equality_delete_file_count", LongType, nullable = false)))
    // one parquet file at a stable path: spark writes a directory, so
    // write to a temp dir and move the single part file into place
    val tmp = s"$location/metadata/_tmp-pstats-${UUID.randomUUID()}"
    spark.createDataFrame(rows.asJava, schema).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val tmpPath = new Path(tmp)
    val fs = tmpPath.getFileSystem(conf)
    val part = fs.listStatus(tmpPath)
      .find(st => st.getPath.getName.endsWith(".parquet"))
      .getOrElse(sys.error("partition-stats write produced no file"))
    val target = s"$location/metadata/partition-stats-${snap.snapshotId}-${UUID.randomUUID()}.parquet"
    fs.rename(part.getPath, new Path(target))
    fs.delete(tmpPath, true)
    val size = new Path(target).getFileSystem(conf).getFileStatus(new Path(target)).getLen
    val base = metadata
    commitMetaOnly(base.copy(
      partitionStatistics =
        base.partitionStatistics.filterNot(_.snapshotId == snap.snapshotId) :+
          IcePartitionStatisticsFile(snap.snapshotId, target, size),
      lastUpdatedMs = System.currentTimeMillis()))
  }

  /** NDV per field id from the newest registered statistics file at or
    * below the current snapshot — read from the blob-metadata `ndv`
    * property in TABLE METADATA (no puffin I/O at plan time). Accepts any
    * blob type carrying the property, so foreign theta-sketch stats
    * (`apache-datasketches-theta-v1`) serve planning too. */
  def ndvStats: Map[Int, Long] = {
    val seqOf = metadata.snapshots.map(s => s.snapshotId -> s.sequenceNumber).toMap
    val curSeq = metadata.currentSnapshot.map(_.sequenceNumber).getOrElse(Long.MaxValue)
    metadata.statistics
      .filter(st => seqOf.get(st.snapshotId).exists(_ <= curSeq))
      .sortBy(st => seqOf(st.snapshotId))
      .lastOption.toList
      .flatMap(_.blobMetadata)
      .flatMap(b => for {
        id <- b.fields.headOption
        ndv <- b.properties.get("ndv")
        v <- scala.util.Try(ndv.toLong).toOption
      } yield id -> v).toMap
  }

  // ---------- branches / tags ----------

  /** Write-audit-publish: append staged on a branch — main and the
    * current pointer are untouched until [[fastForward]] publishes it.
    * The branch forks from its head (or from current on first write). */
  def appendToBranch(spark: SparkSession, df: DataFrame, branch: String): GraftTable = {
    require(branch != "main", "use append() for main")
    val files = TableWrite.writeDataFiles(this, spark, df)
    retryCommit(() => ()) {
      commitOnce("append", files, Nil, replace = false, branch = Some(branch))
    }
    this
  }

  /** Publish: move `to` (and, for main, the current pointer) to the head
    * of `fromRef` — a metadata-only commit, the WAP publish step. */
  def fastForward(to: String, fromRef: String): GraftTable = {
    val src = metadata.refs.getOrElse(fromRef, sys.error(s"no ref $fromRef"))
    val base = metadata
    val now = System.currentTimeMillis()
    val newMeta = base.copy(
      refs = base.refs + (to -> IceSnapshotRef(src.snapshotId, "branch")),
      currentSnapshotId =
        if (to == "main") Some(src.snapshotId) else base.currentSnapshotId,
      snapshotLog =
        if (to == "main") base.snapshotLog :+ IceLogEntry(now, src.snapshotId.toString)
        else base.snapshotLog,
      lastUpdatedMs = now)
    commitMetaOnly(newMeta)
  }

  /** Cherry-pick ONE staged append onto the current main head (Iceberg's
    * `cherrypick_snapshot`): the WAP complement to [[fastForward]] when
    * only part of a branch should publish. Restricted to append commits —
    * a replace/overwrite/row-delta snapshot's effect depends on the file
    * set it was built against, so replaying it against a different head
    * silently changes its meaning; refuse instead. The pick is a normal
    * append commit of the source snapshot's added data files: metadata
    * only, no data movement, retried through the usual CAS loop. */
  def cherryPick(spark: SparkSession, snapshotId: Long): GraftTable = {
    val src = metadata.snapshotById(snapshotId)
      .getOrElse(sys.error(s"no snapshot $snapshotId"))
    require(!isReplaceStyle(src) &&
      src.summary.getOrElse("operation", "append") == "append" &&
      src.summary.get("added-delete-files").forall(_.toInt == 0),
      s"cherry-pick supports append snapshots only; $snapshotId is " +
        s"'${src.summary.getOrElse("operation", "?")}'")
    val added = planFiles(src)
      .filter(p => p.seq == src.sequenceNumber && p.file.content == DataContent.Data)
      .map(_.file)
    commit(spark, "append", added, Nil, replace = false,
      extraSummary = Map("graft.cherry-picked-snapshot-id" -> snapshotId.toString))
  }

  def createTag(
      name: String,
      snapshotId: Long,
      maxRefAgeMs: Option[Long] = None): GraftTable =
    commitRef(name, IceSnapshotRef(snapshotId, "tag", maxRefAgeMs = maxRefAgeMs))

  def createBranch(
      name: String,
      snapshotId: Long,
      maxRefAgeMs: Option[Long] = None,
      minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None): GraftTable =
    commitRef(name, IceSnapshotRef(snapshotId, "branch",
      minSnapshotsToKeep = minSnapshotsToKeep,
      maxSnapshotAgeMs = maxSnapshotAgeMs,
      maxRefAgeMs = maxRefAgeMs))

  /** drop a branch or tag ("main" is not droppable) */
  def dropRef(name: String): GraftTable = {
    require(name != "main", "cannot drop the main branch")
    require(metadata.refs.contains(name), s"no branch or tag $name")
    val base = metadata
    commitMetaOnly(base.copy(
      refs = base.refs - name,
      lastUpdatedMs = System.currentTimeMillis()))
  }

  private def commitRef(name: String, ref: IceSnapshotRef): GraftTable = {
    val base = metadata
    val newMeta = base.copy(
      refs = base.refs + (name -> ref),
      lastUpdatedMs = System.currentTimeMillis())
    commitMetaOnly(newMeta)
  }

  /** scan a named branch or tag */
  def scanRef(spark: SparkSession, refName: String): DataFrame = {
    val ref = metadata.refs.getOrElse(refName, sys.error(s"no ref $refName"))
    scan(spark, snapshotId = Some(ref.snapshotId))
  }

  /** Roll the table back to an earlier snapshot: a metadata-only commit
    * moving the current pointer (and `main`) to `snapshotId`. Later
    * snapshots stay in the log — roll-forward is another rollbackTo, and
    * `expireSnapshots` reclaims them once unreachable. */
  def rollbackTo(snapshotId: Long): GraftTable = {
    val base = metadata
    require(base.snapshotById(snapshotId).isDefined,
      s"snapshot $snapshotId not found in ${location}")
    val now = System.currentTimeMillis()
    val newMeta = base.copy(
      currentSnapshotId = Some(snapshotId),
      refs = base.refs + ("main" -> IceSnapshotRef(snapshotId, "branch")),
      snapshotLog = base.snapshotLog :+ IceLogEntry(now, snapshotId.toString),
      lastUpdatedMs = now)
    commitMetaOnly(newMeta)
  }

  // ---------- commit ----------

  /** Produce a snapshot from added files and commit metadata with an
    * optimistic check-and-retry loop (the loop the reference stubbed,
    * icelake/src/transaction.rs:29-31). */
  /** The optimistic conflict-retry loop every commit flavor shares:
    * `validate` runs against FRESH metadata before each attempt (the
    * place for preconditions like "my referenced files still exist" or
    * "my batch id is not committed yet"). */
  private def retryCommit(validate: () => Unit)(body: => Unit): Unit = {
    // retry budget and backoff are TABLE PROPERTIES (Iceberg's
    // commit.retry.* knobs): a busy streaming table can buy a bigger
    // budget, a fail-fast batch job can set num-retries=0 and surface
    // the conflict to its own scheduler. Defaults stay generous — N
    // contending writers can legitimately lose ~N commits in a row
    // each — because a conflict loss is not an error, just a lost race.
    def propLong(key: String, default: Long): Long =
      metadata.properties.get(key)
        .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
        .getOrElse(default)
    val maxRetries = propLong("commit.retry.num-retries", 50L)
    val minWaitMs = propLong("commit.retry.min-wait-ms", 5L)
    val maxWaitMs = propLong("commit.retry.max-wait-ms", 200L)
    val totalTimeoutMs = propLong("commit.retry.total-timeout-ms", 1800000L)
    val startNs = System.nanoTime()
    var attempt = 0
    var done = false
    while (!done) {
      validate()
      try {
        body
        done = true
      } catch {
        // jittered linear backoff keeps losers from hot-spinning
        // manifest rewrites against the same winner; the wall-clock
        // budget bounds total stall even when the retry count is large
        case _: CommitConflictException
            if attempt < maxRetries &&
              (System.nanoTime() - startNs) / 1000000L < totalTimeoutMs =>
          Metrics.inc(Metrics.CommitConflicts)
          attempt += 1
          Thread.sleep(
            math.min(maxWaitMs, minWaitMs * attempt) +
              java.util.concurrent.ThreadLocalRandom.current().nextLong(20L))
          refresh()
      }
    }
  }

  def commit(
      spark: SparkSession,
      operation: String,
      addedData: List[IceDataFile],
      addedDeletes: List[IceDataFile],
      replace: Boolean,
      extraSummary: Map[String, String] = Map.empty,
      validate: () => Unit = () => (),
      branch: Option[String] = None): GraftTable = {
    retryCommit(validate) {
      commitOnce(operation, addedData, addedDeletes, replace,
        extraSummary = extraSummary, branch = branch)
    }
    this
  }

  /** Commit carrying position deletes that reference specific data files:
    * every attempt validates those files are still live — a concurrent
    * compaction that rewrote them would otherwise resurrect the old rows
    * while any new rows also land (silent duplication). Used by SQL
    * UPDATE / MERGE / DELETE, filtered overwrite, and positionDelete. */
  def commitRowDelta(
      operation: String,
      addedData: List[IceDataFile],
      addedDeletes: List[IceDataFile],
      referencedDataFiles: Set[String]): GraftTable = {
    retryCommit(() => {
      val live = metadata.currentSnapshot.toList.flatMap(planFiles(_))
        .filter(_.file.content == DataContent.Data)
        .map(p => GraftTable.normPathStr(p.file.filePath)).toSet
      val gone = referencedDataFiles.diff(live)
      if (gone.nonEmpty)
        sys.error("row-level operation conflicts with a concurrent rewrite of " +
          s"${gone.size} data file(s) (e.g. ${gone.head}); re-run the statement")
    }) {
      commitOnce(operation, addedData, addedDeletes, replace = false)
    }
    this
  }

  /** Copy-on-write row-level commit: atomically swap the exact data files
    * the operation's scan read (`replaced`, normalized paths) for the
    * rewritten ones. Validated per attempt against FRESH metadata:
    *
    *  - every replaced file must still be live — a concurrent compaction
    *    or another COW writer that rewrote one means our surviving-row
    *    copy is stale (its rows may already differ);
    *  - no delete file committed after the scan (`seq > scanSeq`) may
    *    affect a replaced file: a newer position delete references rows
    *    we are about to resurrect in the rewritten copy, and a newer
    *    equality delete would stop applying to it entirely (the copy
    *    out-sequences the delete). Position deletes are checked by the
    *    paths they reference; equality deletes conflict conservatively
    *    (their key spans are not path-scoped).
    *
    * Survivors (everything NOT replaced, data and delete files alike) are
    * re-planned each attempt so concurrent appends are carried forward.
    * Commits as `overwrite` (a data change — changelog readers emit the
    * replaced files' rows as deletes and the new files' rows as inserts),
    * or `delete` when the rewrite produced no files at all. */
  def commitCopyOnWrite(
      spark: SparkSession,
      scanSeq: Long,
      replaced: Set[String],
      addedData: List[IceDataFile]): GraftTable = {
    retryCommit(() => {
      val planned = metadata.currentSnapshot.toList.flatMap(planFiles(_))
      val live = planned.filter(_.file.content == DataContent.Data)
        .map(p => GraftTable.normPathStr(p.file.filePath)).toSet
      val gone = replaced.diff(live)
      if (gone.nonEmpty)
        sys.error("copy-on-write operation conflicts with a concurrent rewrite " +
          s"of ${gone.size} data file(s) (e.g. ${gone.head}); re-run the statement")
      val newDeletes = planned.filter(p =>
        p.file.content != DataContent.Data && p.seq > scanSeq)
      val newEq = newDeletes.filter(_.file.content == DataContent.EqualityDeletes)
      val newPosRefs = referencedBy(
        spark, newDeletes.filter(_.file.content == DataContent.PositionDeletes).map(_.file))
      if (newEq.nonEmpty || newPosRefs.exists(replaced.contains))
        sys.error("copy-on-write operation conflicts with delete files " +
          "committed after its scan; re-run the statement")
    }) {
      val survivors = metadata.currentSnapshot.toList.flatMap(planFiles(_))
        .filterNot(p => p.file.content == DataContent.Data &&
          replaced.contains(GraftTable.normPathStr(p.file.filePath)))
      commitOnce(
        if (addedData.isEmpty) "delete" else "overwrite",
        addedData, Nil, replace = true, existing = survivors)
    }
    this
  }

  /** data-file paths a set of position-delete files refers to (one small
    * read of the freshly written delete files) */
  private[graft] def referencedBy(
      spark: SparkSession, deleteFiles: List[IceDataFile]): Set[String] = {
    val (dvs, pq) = deleteFiles.partition(_.isDeletionVector)
    val fromDv = dvs.map(d => GraftTable.normPathStr(d.referencedDataFile.get)).toSet
    val fromPq =
      if (pq.isEmpty) Set.empty[String]
      else spark.read.parquet(pq.map(_.filePath): _*)
        .select(normPath(col("file_path"))).distinct()
        .collect().map(_.getString(0)).toSet
    fromDv ++ fromPq
  }

  /** Replace-style commit that carries a surviving subset of the previous
    * snapshot's files forward as Existing entries (dynamic partition
    * overwrite): new manifests hold survivors with their original data
    * sequence numbers plus the added files. `survivors` is re-evaluated
    * on every attempt so a retry after a conflicting commit sees the
    * conflicting writer's files. */
  def commitReplace(
      spark: SparkSession,
      operation: String,
      survivors: () => List[PlannedFile],
      addedData: List[IceDataFile]): GraftTable = {
    retryCommit(() => ()) {
      commitOnce(operation, addedData, Nil, replace = true, existing = survivors())
    }
    this
  }

  /** Automatic manifest merging on commit — Iceberg's
    * `commit.manifest-merge.enabled` / `commit.manifest.min-count-to-merge`
    * / `commit.manifest.target-size-bytes` properties. Without it,
    * continuous ingest accretes one manifest per commit and planning cost
    * grows with COMMITS, not files; with it, once a (spec, content)
    * group accumulates `min-count-to-merge` manifests below the target
    * size they collapse into one. Entry semantics are preserved exactly:
    * statuses stay (Added flips to Existing — the adding snapshot is now
    * an earlier one), original snapshot ids stay, and inherited sequence
    * numbers are materialized as explicit values (the merged manifest's
    * own inherit position would lie). Older snapshots keep their own
    * manifest lists, so time travel and changelogs are untouched. */
  private def mergeSmallManifests(
      previous: List[IceManifestListEntry],
      snapshotId: Long,
      schema: IceSchema,
      mdir: String,
      fv: Int): List[IceManifestListEntry] = {
    val props = metadata.properties
    // enabled by default, matching Iceberg: with the stock
    // min-count-to-merge of 100 nothing changes until a table really
    // accretes that many small manifests
    val enabled = props.getOrElse("commit.manifest-merge.enabled", "true") == "true"
    if (!enabled || previous.isEmpty) return previous
    val minCount = props.getOrElse("commit.manifest.min-count-to-merge", "100").toInt
    val targetBytes =
      props.getOrElse("commit.manifest.target-size-bytes", (8L * 1024 * 1024).toString).toLong
    previous.groupBy(m => (m.partitionSpecId, m.content)).toList
      .sortBy(_._1) // deterministic list order across commits
      .flatMap { case ((specId, content), ms) =>
        val (small, big) = ms.partition(_.manifestLength < targetBytes)
        if (small.size < minCount) ms
        else {
          val spec = metadata.specById(specId)
          val entries = small.flatMap { mf =>
            ManifestIO.readManifest(conf, relocate(mf.manifestPath), spec.fields.map(_.name))
              .map { e =>
                val dseq = e.dataSequenceNumber.getOrElse(mf.sequenceNumber)
                val fseq = e.fileSequenceNumber.getOrElse(mf.sequenceNumber)
                val st =
                  if (e.status == ManifestStatus.Added) ManifestStatus.Existing
                  else e.status
                IceManifestEntry(st, e.snapshotId.orElse(Some(mf.addedSnapshotId)),
                  Some(dseq), Some(fseq),
                  e.dataFile.copy(filePath = relocate(e.dataFile.filePath)))
              }
          }
          Metrics.inc(Metrics.ManifestsMerged, small.size.toLong)
          // the merged output itself rolls at the target size: a merge
          // must never create one giant manifest, and at-target outputs
          // are excluded from FUTURE merges by the small-check above
          big ++ chunkByTarget(entries, targetBytes)(e =>
            estimatedEntryBytes(e.dataFile)).zipWithIndex.map { case (chunk, i) =>
            ManifestIO.writeManifest(
              conf, s"$mdir/${UUID.randomUUID()}-g$specId-$content-$i.avro",
              chunk, spec, schema, content = content,
              formatVersion = if (content == 0) fv else math.max(fv, 2))
          }
        }
      }
  }

  /** Rough serialized size of one manifest entry — path + encoded bounds
    * + the fixed Avro framing of counts/offsets. Used to roll manifest
    * files at `commit.manifest.target-size-bytes` WITHOUT serializing
    * twice; a 2x estimate error just means manifests land at half or
    * double the target, which only shifts the merge/split equilibrium. */
  private def estimatedEntryBytes(f: IceDataFile): Long =
    220L + f.filePath.length +
      f.lowerBounds.values.map(_.length + 12).sum.toLong +
      f.upperBounds.values.map(_.length + 12).sum.toLong +
      16L * (f.columnSizes.size + f.valueCounts.size +
        f.nullValueCounts.size + f.nanValueCounts.size) +
      8L * f.splitOffsets.size

  /** Greedy chunking of a commit's files so each manifest lands near the
    * target size — one commit adding 10^5 files must not produce one
    * giant manifest (it would serialize planning and defeat per-manifest
    * parallel reads). Everyday commits fit one chunk. */
  private def chunkByTarget[A](
      files: List[A], targetBytes: Long)(size: A => Long): List[List[A]] = {
    val out = scala.collection.mutable.ListBuffer.empty[List[A]]
    var cur = scala.collection.mutable.ListBuffer.empty[A]
    var bytes = 0L
    files.foreach { f =>
      val e = size(f)
      if (cur.nonEmpty && bytes + e > targetBytes) {
        out += cur.toList
        cur = scala.collection.mutable.ListBuffer.empty[A]
        bytes = 0L
      }
      cur += f
      bytes += e
    }
    if (cur.nonEmpty) out += cur.toList
    out.toList
  }

  private def manifestTargetBytes: Long =
    metadata.properties
      .getOrElse("commit.manifest.target-size-bytes", (8L * 1024 * 1024).toString).toLong

  private def commitOnce(
      operation: String,
      addedData: List[IceDataFile],
      addedDeletes: List[IceDataFile],
      replace: Boolean,
      existing: List[PlannedFile] = Nil,
      extraSummary: Map[String, String] = Map.empty,
      branch: Option[String] = None): Unit = {
    val base = metadata
    // branch writes stage on the branch head (WAP: write-audit-publish);
    // a branch with no ref yet forks from the current snapshot
    val headSnap: Option[IceSnapshot] = branch match {
      case Some(b) => base.refs.get(b).flatMap(r => base.snapshotById(r.snapshotId))
        .orElse(base.currentSnapshot)
      case None => base.currentSnapshot
    }
    val seq = base.lastSequenceNumber + 1
    val snapshotId = math.abs(UUID.randomUUID().getLeastSignificantBits)
    val now = System.currentTimeMillis()
    val schema = base.currentSchema
    val spec = base.defaultSpec
    val mdir = StorageCatalog.metadataDir(location)

    val fv = base.formatVersion
    // v3 row lineage: each added data file takes a first_row_id slice of
    // [nextRowId, nextRowId + addedRecords) in list order. Content-
    // preserving rewrites (compaction/z-order) get None instead — this
    // engine does not materialize `_row_id` into rewritten files, and the
    // spec's null means "ids unavailable", which readers serve as null
    // rather than lying with freshly minted ids for pre-existing rows.
    val lineage = fv >= 3
    val isRewriteCommit = replace && operation == "replace"
    val (assignedData, nextRowIdAfter): (List[IceDataFile], Long) =
      if (!lineage) (addedData, base.nextRowId)
      else if (isRewriteCommit)
        (addedData.map(_.copy(firstRowId = None)), base.nextRowId)
      else {
        var next = base.nextRowId
        val assigned = addedData.map { f =>
          val a = f.copy(firstRowId = Some(next))
          next += f.recordCount
          a
        }
        (assigned, next)
      }
    var listEntries = List.empty[IceManifestListEntry]
    if (assignedData.nonEmpty) {
      // rolled at commit.manifest.target-size-bytes: mega-commits split
      // across manifests (parallel planning), everyday commits fit one
      chunkByTarget(assignedData, manifestTargetBytes)(estimatedEntryBytes).zipWithIndex.foreach {
        case (chunk, i) =>
          val entries = chunk.map(f => IceManifestEntry(
            ManifestStatus.Added, Some(snapshotId), Some(seq), Some(seq), f))
          listEntries :+= ManifestIO.writeManifest(
            conf, s"$mdir/${UUID.randomUUID()}-m$i.avro", entries, spec, schema,
            content = 0, formatVersion = fv)
      }
    }
    if (addedDeletes.nonEmpty) {
      require(fv >= 2, "delete files require format version 2")
      chunkByTarget(addedDeletes, manifestTargetBytes)(estimatedEntryBytes).zipWithIndex.foreach {
        case (chunk, i) =>
          val entries = chunk.map(f => IceManifestEntry(
            ManifestStatus.Added, Some(snapshotId), Some(seq), Some(seq), f))
          listEntries :+= ManifestIO.writeManifest(
            conf, s"$mdir/${UUID.randomUUID()}-d$i.avro", entries, spec, schema, content = 1)
      }
    }
    // carried-forward survivors (dynamic overwrite): Existing entries with
    // their original data sequence numbers, grouped per (spec, content)
    existing.groupBy(p => (p.specId, p.file.content)).foreach {
      case ((specId, content), files) =>
        // rolled at the target size like added files: a full compaction
        // of a huge table must not carry its survivors in one giant
        // manifest. Data manifests follow the table's format version;
        // delete manifests only exist on v2+ tables.
        chunkByTarget(files.toList, manifestTargetBytes)(p =>
          estimatedEntryBytes(p.file)).zipWithIndex.foreach { case (chunk, i) =>
          val entries = chunk.map(p => IceManifestEntry(
            ManifestStatus.Existing, Some(snapshotId), Some(p.seq), Some(p.seq), p.file))
          listEntries :+= ManifestIO.writeManifest(
            conf, s"$mdir/${UUID.randomUUID()}-e$specId-$content-$i.avro", entries,
            metadata.specById(specId), schema,
            content = if (content == DataContent.Data) 0 else 1,
            formatVersion = if (content == DataContent.Data) fv else math.max(fv, 2))
        }
    }
    val previous: List[IceManifestListEntry] =
      if (replace) Nil
      else headSnap.toList.flatMap(s =>
        ManifestIO.readManifestList(conf, relocate(s.manifestList)))
    val allEntries = mergeSmallManifests(previous, snapshotId, schema, mdir, fv) ++
      listEntries

    val listPath = s"$mdir/snap-$snapshotId-$seq-${UUID.randomUUID()}.avro"
    ManifestIO.writeManifestList(
      conf, listPath, allEntries, snapshotId, headSnap.map(_.snapshotId), seq,
      formatVersion = fv)

    val prevSummary = headSnap.map(_.summary).getOrElse(Map.empty)
    def prevTotal(key: String): Long = prevSummary.get(key).map(_.toLong).getOrElse(0L)
    val addedRecords = addedData.map(_.recordCount).sum
    val addedSize = (addedData ++ addedDeletes).map(_.fileSizeInBytes).sum
    val exData = existing.filter(_.file.content == DataContent.Data)
    val exDeletes = existing.filterNot(_.file.content == DataContent.Data)
    val summary = Map(
      "operation" -> operation,
      // the replace flag is stamped on EVERY commit: operation names are
      // ambiguous (TRUNCATE commits 'delete' but replaces everything;
      // UPDATE/MERGE row-deltas commit 'overwrite' but replace nothing),
      // and changelog/incremental classification must be exact
      "graft.replace" -> replace.toString) ++ Map(
      "added-data-files" -> addedData.size.toString,
      "added-delete-files" -> addedDeletes.size.toString,
      "added-records" -> addedRecords.toString,
      "added-files-size" -> addedSize.toString,
      "total-records" ->
        (if (replace) addedRecords + exData.map(_.file.recordCount).sum
         else prevTotal("total-records") + addedRecords).toString,
      "total-files-size" ->
        (if (replace) addedSize + existing.map(_.file.fileSizeInBytes).sum
         else prevTotal("total-files-size") + addedSize).toString,
      "total-data-files" ->
        (if (replace) (addedData.size + exData.size).toLong
         else prevTotal("total-data-files") + addedData.size).toString,
      "total-delete-files" ->
        (if (replace) (addedDeletes.size + exDeletes.size).toLong
         else prevTotal("total-delete-files") + addedDeletes.size).toString) ++
      extraSummary

    val snapshot = IceSnapshot(
      snapshotId = snapshotId,
      parentSnapshotId = headSnap.map(_.snapshotId),
      sequenceNumber = seq,
      timestampMs = now,
      manifestList = listPath,
      summary = summary,
      schemaId = Some(schema.schemaId),
      firstRowId = if (lineage) Some(base.nextRowId) else None)

    val newMeta = base.copy(
      nextRowId = nextRowIdAfter,
      lastSequenceNumber = seq,
      lastUpdatedMs = now,
      // a branch commit moves ONLY its ref; main and the current pointer
      // stay where they are until a fastForward publishes the branch
      currentSnapshotId =
        if (branch.isEmpty) Some(snapshotId) else base.currentSnapshotId,
      snapshots = base.snapshots :+ snapshot,
      snapshotLog =
        if (branch.isEmpty) base.snapshotLog :+ IceLogEntry(now, snapshotId.toString)
        else base.snapshotLog,
      metadataLog = base.metadataLog :+
        IceLogEntry(base.lastUpdatedMs,
          s"$mdir/${StorageCatalog.metadataFileName(version, base.properties)}"),
      refs = base.refs + (branch.getOrElse("main") ->
        IceSnapshotRef(snapshotId, "branch")))

    val (trimmedMeta, trimmedFiles) = trimMetadataLog(newMeta)
    val newVersion = committer(trimmedMeta, version)
    metadata = trimmedMeta
    version = newVersion
    deleteTrimmedMetadata(trimmedFiles)
    Metrics.inc(Metrics.CommitsTotal)
    Metrics.inc(Metrics.DataFilesWritten, addedData.size.toLong)
    Metrics.inc(Metrics.DeleteFilesWritten, addedDeletes.size.toLong)
    Metrics.inc(Metrics.RecordsWritten, addedData.map(_.recordCount).sum)
    Metrics.inc(Metrics.BytesWritten, (addedData ++ addedDeletes).map(_.fileSizeInBytes).sum)
  }
}

/** executor→driver row of one written deletion-vector blob: where it
  * landed inside which puffin file, for which data file, how many
  * positions — metadata-sized, never the positions themselves */
private[graft] case class DvBlobRow(
    puffinPath: String,
    puffinSize: Long,
    referencedFile: String,
    offset: Long,
    length: Long,
    cardinality: Long)

object GraftTable {

  /** table property opting position deletes into puffin deletion vectors
    * (format-v3 semantics on an opt-in basis; `formatVersion >= 3` tables
    * vector automatically) */
  val DvEnabledProp = "write.delete.vector-enabled"

  /** Iceberg metadata-log retention properties */
  val PreviousVersionsMaxProp = "write.metadata.previous-versions-max"
  val DeleteAfterCommitProp = "write.metadata.delete-after-commit.enabled"

  /** statistics blob type written by [[GraftTable.computeTableStats]]:
    * body = the NDV as one little-endian i64, `ndv` property = the same
    * value in decimal (the property is what planners read) */
  val NdvBlobType = "graft-ndv-v1"

  /** reserved field ids of the format-v3 row-lineage columns when
    * MATERIALIZED into rewritten data files (spec: `_row_id` /
    * `_last_updated_sequence_number`) — readers prefer the in-file
    * column and fall back to first_row_id + position / the file's
    * data sequence */
  val RowIdFieldId = 2147483540
  val LastUpdatedSeqFieldId = 2147483539
  val RowIdCol = "_row_id"
  val LastUpdatedSeqCol = "_last_updated_sequence_number"

  /** serializable slice of schema info the executor-side stats harvest needs */
  case class FieldInfo(name: String, id: Int, typeRepr: String)

  /** driver-side manifest Avro reads fan out on this many threads */
  val ManifestReadParallelism = 8

  /** manifest count above which scan planning runs as a Spark job
    * ([[GraftTable.planFilesPruned]]) instead of on driver threads */
  val DistributedPlanThreshold = 64

  /** delete sides at or below this on-disk size broadcast; larger ones go
    * through AQE-planned shuffle joins (an unconditional broadcast of a
    * 30%-deleted 100 TB table would OOM driver and executors).
    * Tunable per session via `spark.graft.delete-broadcast-max-bytes`. */
  val DeleteBroadcastMaxBytes: Long = 64L * 1024 * 1024

  def deleteBroadcastMaxBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.delete-broadcast-max-bytes")
      .map(_.toLong).getOrElse(DeleteBroadcastMaxBytes)

  /** Executor-side equality-delete groups at or below this on-disk size
    * build an in-memory key map; larger groups build the exact disk-backed
    * [[graft.spark.DiskEqLookup]] (sorted-run spill + binary-search
    * probes) so executor memory stays bounded at ANY delete volume — the
    * scan itself never shuffles the data side the way an anti-join
    * fallback would. Tunable via `spark.graft.eq-delete-executor-max-bytes`. */
  val EqDeleteExecutorMaxBytes: Long = 256L * 1024 * 1024

  def eqDeleteExecutorMaxBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.eq-delete-executor-max-bytes")
      .map(_.toLong).getOrElse(EqDeleteExecutorMaxBytes)

  /** Our data files carry iceberg field ids; resolve parquet columns by id
    * so renamed columns keep reading pre-rename files. The conf is pinned
    * on a cached CLONE of the session (shared context, copied confs) —
    * mutating the shared session conf would change resolution for
    * unrelated non-graft parquet reads running concurrently, and a
    * per-read option cannot work because ParquetFileFormat re-reads these
    * keys from the session conf at execution time. */
  def pinnedSession(spark: SparkSession): SparkSession =
    org.apache.spark.sql.GraftBridge.pinnedSession(spark)

  /** canonical path form: Spark's `_metadata.file_path` yields `file:///x`
    * URIs while manifests store `/x` paths — normalize both for joins */
  def normPathStr(p: String): String =
    if (p.startsWith("file:")) "/" + p.stripPrefix("file:").dropWhile(_ == '/')
    else p

  def normPath(c: Column): Column =
    org.apache.spark.sql.functions.regexp_replace(c, "^file:/+", "/")

  /** names orphan reclamation must NEVER delete: the version files and
    * hint carry the table's recovery chain (protected even when a
    * metadata-log retention pass dropped them from the log) */
  def orphanProtected(name: String): Boolean =
    name.endsWith(".metadata.json") || name.endsWith(".metadata.json.gz") ||
      name == "version-hint.text"
}
