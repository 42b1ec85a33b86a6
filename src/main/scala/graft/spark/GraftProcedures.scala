package graft.spark

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.tables._

/** SQL stored procedures (`CALL graft.system.<name>(...)`) over the table
  * maintenance API — the operational surface a lakehouse needs at scale
  * (compaction, z-order, snapshot expiry, orphan GC, branch fast-forward)
  * without leaving SQL. Mirrors the procedure set the reference leaves to
  * engines (icelake has no procedure layer; its README defers maintenance
  * to the calling engine) using Spark 4's native `ProcedureCatalog`.
  *
  * Every procedure returns a small summary relation via [[LocalScan]];
  * the heavy lifting (rewrites, scans) runs distributed through the same
  * code paths as the API calls.
  */
private[spark] object GraftProcedures {

  /** one procedure: both the unbound and bound side (binding is identity —
    * parameters are typed up front and Spark coerces arguments) */
  final class GraftProcedure(
      procName: String,
      params: Seq[ProcedureParameter],
      output: StructType,
      run: (InternalRow, SparkSession) => Seq[Seq[Any]])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val resultRows = GraftMetadataTables.toInternal(output, run(input, SparkSession.active))
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = output
        override def rows(): Array[InternalRow] = resultRows
        override def description(): String = s"GraftProcedureResult($procName)"
      }
      util.List.of(scan).iterator()
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, dt) => StructField(n, dt, nullable = true) })

  /** `table` argument ('db.t' or 'catalog.db.t') → identifier in `cat` */
  private def identOf(tableArg: String, catalogName: String): Identifier = {
    val parts = tableArg.split("\\.").toSeq
    val p = if (parts.length > 2 && parts.head == catalogName) parts.tail else parts
    require(p.nonEmpty, s"empty table name '$tableArg'")
    Identifier.of(p.init.toArray, p.last)
  }

  private def liveDataFiles(t: GraftTable): Long =
    t.metadata.currentSnapshot.toList
      .flatMap(t.planFiles(_)).count(_.file.content == DataContent.Data).toLong

  /** procedures for one catalog instance; `load` resolves through the
    * catalog so REST mode and warehouse layout both work unchanged */
  def forCatalog(
      catalogName: String,
      load: Identifier => GraftTable,
      createFromMeta: (Identifier, String => TableMetadata) => GraftTable,
      register: (Identifier, String) => GraftTable): Map[String, UnboundProcedure] = {
    def table(input: InternalRow): GraftTable =
      load(identOf(input.getString(0), catalogName))

    val procs = Seq(
      new GraftProcedure(
        "rollback_to_snapshot",
        Seq(in("table", StringType), in("snapshot_id", LongType)),
        out("previous_snapshot_id" -> LongType, "current_snapshot_id" -> LongType),
        (input, _) => {
          val t = table(input)
          val prev = t.metadata.currentSnapshotId
          t.rollbackTo(input.getLong(1))
          Seq(Seq(prev.orNull, t.metadata.currentSnapshotId.get))
        }),
      new GraftProcedure(
        // Iceberg's set_current_snapshot: point main at ANY retained
        // snapshot (rollback_to_snapshot's forward/sideways sibling —
        // e.g. jump onto a cherry-picked or WAP-published lineage)
        "set_current_snapshot",
        Seq(in("table", StringType), in("snapshot_id", LongType)),
        out("previous_snapshot_id" -> LongType, "current_snapshot_id" -> LongType),
        (input, _) => {
          val t = table(input)
          val prev = t.metadata.currentSnapshotId
          t.rollbackTo(input.getLong(1))
          Seq(Seq(prev.orNull, t.metadata.currentSnapshotId.get))
        }),
      new GraftProcedure(
        // Iceberg's create_changelog_view: register the batch changelog
        // as a temp view (default name <table>_changes). Default range =
        // everything after the OLDEST retained snapshot; identifier
        // columns upgrade delete+insert pairs to update pre/postimages
        // (implies net-change collapsing, as in Iceberg's
        // compute_updates).
        "create_changelog_view",
        Seq(in("table", StringType),
          ProcedureParameter.in("changelog_view", StringType)
            .defaultValue("''").build(),
          ProcedureParameter.in("start_snapshot_id", LongType)
            .defaultValue("0").build(),
          ProcedureParameter.in("end_snapshot_id", LongType)
            .defaultValue("0").build(),
          ProcedureParameter.in("net_changes", BooleanType)
            .defaultValue("false").build(),
          ProcedureParameter.in("identifier_columns", StringType)
            .defaultValue("''").build()),
        out("changelog_view" -> StringType),
        (input, spark) => {
          val t = table(input)
          val oldest = t.metadata.snapshots.sortBy(_.sequenceNumber)
            .headOption.map(_.snapshotId)
            .getOrElse(sys.error(s"${input.getString(0)} has no snapshots"))
          val start =
            if (input.isNullAt(2) || input.getLong(2) == 0L) oldest
            else input.getLong(2)
          val end =
            if (input.isNullAt(3) || input.getLong(3) == 0L) None
            else Some(input.getLong(3))
          val keys =
            if (input.isNullAt(5)) Nil
            else input.getString(5).split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val net = (!input.isNullAt(4) && input.getBoolean(4)) || keys.nonEmpty
          val viewName = {
            val given = if (input.isNullAt(1)) "" else input.getString(1)
            if (given.nonEmpty) given
            else identOf(input.getString(0), catalogName).name() + "_changes"
          }
          // register on the USER's session: `spark` here can be the
          // cloned execution session whose temp-view registry is
          // discarded when the CALL finishes
          val owner = SparkSession.getDefaultSession.getOrElse(spark)
          // changes() plans under a pinned session CLONE — re-bind onto
          // the user's session or the temp view dies with the clone
          val df = t.changes(owner, start, end, net = net, netKeys = keys)
          org.apache.spark.sql.GraftBridge.onSession(owner, df)
            .createOrReplaceTempView(viewName)
          Seq(Seq(viewName))
        }),
      new GraftProcedure(
        "rollback_to_timestamp",
        // latest snapshot committed AT OR BEFORE the timestamp becomes
        // current (Iceberg's rollback_to_timestamp semantics)
        Seq(in("table", StringType), in("timestamp_ms", LongType)),
        out("previous_snapshot_id" -> LongType, "current_snapshot_id" -> LongType),
        (input, _) => {
          val t = table(input)
          val ts = input.getLong(1)
          val target = t.metadata.snapshots
            .filter(_.timestampMs <= ts)
            .sortBy(_.timestampMs).lastOption
            .getOrElse(sys.error(s"no snapshot at or before $ts"))
          val prev = t.metadata.currentSnapshotId
          t.rollbackTo(target.snapshotId)
          Seq(Seq(prev.orNull, t.metadata.currentSnapshotId.get))
        }),
      new GraftProcedure(
        "expire_snapshots",
        Seq(in("table", StringType), in("older_than_ms", LongType),
          ProcedureParameter.in("delete_data_files", BooleanType)
            .defaultValue("false").build(),
          ProcedureParameter.in("retain_last", IntegerType)
            .defaultValue("1").build()),
        out("expired_snapshots" -> LongType, "remaining_snapshots" -> LongType),
        (input, _) => {
          val t = table(input)
          val before = t.metadata.snapshots.size
          t.expireSnapshots(input.getLong(1),
            deleteDataFiles = !input.isNullAt(2) && input.getBoolean(2),
            retainLast = if (input.isNullAt(3)) 1 else input.getInt(3))
          val after = t.metadata.snapshots.size
          Seq(Seq((before - after).toLong, after.toLong))
        }),
      new GraftProcedure(
        "rewrite_data_files",
        // optional `where` scopes the compaction to files that may hold
        // matching rows (one hot partition, not the table)
        Seq(in("table", StringType), in("small_file_threshold_bytes", LongType),
          ProcedureParameter.in("where", StringType).defaultValue("''").build()),
        out("files_before" -> LongType, "files_after" -> LongType),
        (input, spark) => {
          val t = table(input)
          val before = liveDataFiles(t)
          val where = if (input.isNullAt(2)) "" else input.getString(2)
          if (where.trim.isEmpty) t.rewriteSmallFiles(spark, input.getLong(1))
          else t.rewriteDataFiles(spark,
            Some(org.apache.spark.sql.functions.expr(where)))
          Seq(Seq(before, liveDataFiles(t)))
        }),
      new GraftProcedure(
        "rewrite_zorder",
        // columns as a comma-separated list: 'c1,c2'
        Seq(in("table", StringType), in("columns", StringType),
          in("target_file_size_bytes", LongType)),
        out("files_before" -> LongType, "files_after" -> LongType),
        (input, spark) => {
          val t = table(input)
          val cols = input.getString(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val before = liveDataFiles(t)
          t.rewriteZOrder(spark, cols, input.getLong(2))
          Seq(Seq(before, liveDataFiles(t)))
        }),
      new GraftProcedure(
        "auto_maintain",
        // the one-call runbook: bin-pack small files, compact position
        // deletes, collapse manifests, expire history, reclaim orphans
        Seq(in("table", StringType),
          in("small_file_threshold_bytes", LongType),
          in("expire_older_than_ms", LongType),
          ProcedureParameter.in("retain_last", LongType).defaultValue("3").build()),
        out(
          "data_files_before" -> LongType, "data_files_after" -> LongType,
          "pos_delete_files_before" -> LongType,
          "pos_delete_files_after" -> LongType,
          "manifests_before" -> LongType, "manifests_after" -> LongType,
          "snapshots_before" -> LongType, "snapshots_after" -> LongType,
          "orphans_removed" -> LongType),
        (input, spark) => {
          val retain = if (input.isNullAt(3)) 3 else input.getLong(3).toInt
          val r = table(input).autoMaintain(
            spark, input.getLong(1), input.getLong(2), retainLast = retain)
          Seq(Seq(
            r("data_files_before"), r("data_files_after"),
            r("pos_delete_files_before"), r("pos_delete_files_after"),
            r("manifests_before"), r("manifests_after"),
            r("snapshots_before"), r("snapshots_after"),
            r("orphans_removed")))
        }),
      new GraftProcedure(
        "rewrite_sort",
        // global sort rewrite along the table's DECLARED write order —
        // file bounds tile the sort key across files
        Seq(in("table", StringType), in("target_file_size_bytes", LongType)),
        out("files_before" -> LongType, "files_after" -> LongType),
        (input, spark) => {
          val t = table(input)
          val before = liveDataFiles(t)
          t.rewriteSorted(spark, input.getLong(1))
          Seq(Seq(before, liveDataFiles(t)))
        }),
      new GraftProcedure(
        "rewrite_hilbert",
        // Hilbert-curve sibling of rewrite_zorder (tighter locality —
        // no Morton quadrant jumps); columns as 'c1,c2'
        Seq(in("table", StringType), in("columns", StringType),
          in("target_file_size_bytes", LongType)),
        out("files_before" -> LongType, "files_after" -> LongType),
        (input, spark) => {
          val t = table(input)
          val cols = input.getString(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val before = liveDataFiles(t)
          t.rewriteHilbert(spark, cols, input.getLong(2))
          Seq(Seq(before, liveDataFiles(t)))
        }),
      new GraftProcedure(
        "rewrite_position_delete_files",
        // to_vectors: merge into puffin deletion vectors (one per data
        // file) instead of parquet chunks; defaults to the table's own
        // write.delete.vector-enabled mode
        Seq(in("table", StringType),
          ProcedureParameter.in("to_vectors", BooleanType)
            .defaultValue("NULL").build()),
        out("delete_files_before" -> LongType, "delete_files_after" -> LongType),
        (input, spark) => {
          val t = table(input)
          def count(tt: GraftTable): Long = tt.metadata.currentSnapshot.toList
            .flatMap(s => tt.planFiles(s))
            .count(_.file.content == DataContent.PositionDeletes).toLong
          val before = count(t)
          val toVectors =
            if (input.isNullAt(1)) None else Some(input.getBoolean(1))
          t.rewritePositionDeleteFiles(spark, toVectors = toVectors)
          Seq(Seq(before, count(t)))
        }),
      new GraftProcedure(
        "convert_equality_deletes",
        // resolve equality deletes to positional form once, so scans stop
        // paying the read-time eq join
        Seq(in("table", StringType)),
        out("eq_files_before" -> LongType, "pos_files_after" -> LongType),
        (input, spark) => {
          val t = table(input)
          def count(tt: GraftTable, content: Int): Long =
            tt.metadata.currentSnapshot.toList
              .flatMap(s => tt.planFiles(s))
              .count(_.file.content == content).toLong
          val before = count(t, DataContent.EqualityDeletes)
          t.convertEqualityDeletes(spark)
          Seq(Seq(before, count(t, DataContent.PositionDeletes)))
        }),
      new GraftProcedure(
        "compute_table_stats",
        // columns: optional comma-separated list (default: all primitive
        // columns); approximate: HLL++ one-pass mode — DEFAULT true, the
        // 100 TB path (exact count_distinct expands rows × columns)
        Seq(in("table", StringType),
          ProcedureParameter.in("columns", StringType).defaultValue("NULL").build(),
          ProcedureParameter.in("approximate", BooleanType)
            .defaultValue("true").build()),
        out("statistics_path" -> StringType, "blob_count" -> LongType),
        (input, spark) => {
          val t = table(input)
          val cols =
            if (input.isNullAt(1)) Nil
            else input.getString(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val approx = input.isNullAt(2) || input.getBoolean(2)
          t.computeTableStats(spark, cols, approx)
          val st = t.metadata.statistics.last
          Seq(Seq(st.statisticsPath, st.blobMetadata.size.toLong))
        }),
      new GraftProcedure(
        "compute_partition_stats",
        Seq(in("table", StringType)),
        out("statistics_path" -> StringType, "partition_count" -> LongType),
        (input, spark) => {
          val t = table(input)
          t.computePartitionStats(spark)
          val st = t.metadata.partitionStatistics.last
          Seq(Seq(st.statisticsPath,
            spark.read.parquet(st.statisticsPath).count()))
        }),
      new GraftProcedure(
        "rewrite_manifests",
        Seq(in("table", StringType)),
        out("manifests_before" -> LongType, "manifests_after" -> LongType),
        (input, spark) => {
          val t = table(input)
          def count(tt: GraftTable): Long = tt.metadata.currentSnapshot.toList
            .flatMap(s => ManifestIO.readManifestList(
              tt.conf, tt.relocate(s.manifestList))).size.toLong
          val before = count(t)
          t.rewriteManifests(spark)
          Seq(Seq(before, count(t)))
        }),
      new GraftProcedure(
        "remove_orphan_files",
        Seq(in("table", StringType), in("older_than_ms", LongType),
          ProcedureParameter.in("dry_run", BooleanType)
            .defaultValue("false").build()),
        out("removed_files" -> LongType),
        (input, _) => {
          val dry = !input.isNullAt(2) && input.getBoolean(2)
          // count-only: never materializes the orphan path list on the driver
          val n =
            if (dry) table(input).removeOrphanFiles(input.getLong(1), dryRun = true).size.toLong
            else table(input).removeOrphanFilesCount(input.getLong(1))
          Seq(Seq(n))
        }),
      new GraftProcedure(
        "add_files",
        Seq(in("table", StringType), in("source", StringType)),
        out("added_files" -> LongType, "added_records" -> LongType),
        (input, spark) => {
          val t = table(input)
          t.addFiles(spark, input.getString(1))
          val snap = t.metadata.currentSnapshot.get
          Seq(Seq(
            snap.summary.get("added-data-files").map(_.toLong).getOrElse(0L),
            snap.summary.get("added-records").map(_.toLong).getOrElse(0L)))
        }),
      new GraftProcedure(
        // Iceberg's zero-copy table fork: a NEW independent table whose
        // first snapshot references the source's current data and delete
        // files in place (original sequence numbers preserved, so MoR
        // visibility is identical). Writes to the fork land in its own
        // location; the source is never touched. The carry commit is
        // replace-style, so changelog/incremental readers must start
        // AFTER it — same posture as Iceberg's snapshot procedure.
        "snapshot",
        Seq(in("source_table", StringType), in("table", StringType)),
        out("source_snapshot_id" -> LongType, "imported_data_files" -> LongType),
        (input, spark) => {
          val src = load(identOf(input.getString(0), catalogName))
          val srcSnap = src.metadata.currentSnapshot
          val dest = createFromMeta(
            identOf(input.getString(1), catalogName),
            loc => StorageCatalog.forkMetadata(src.metadata, loc))
          val carried = srcSnap match {
            case Some(s) =>
              val planned = src.planFiles(s)
              dest.commitReplace(spark, "snapshot", () => planned, Nil)
              planned.count(_.file.content == DataContent.Data).toLong
            case None => 0L
          }
          Seq(Seq(srcSnap.map(_.snapshotId).orNull, carried))
        }),
      new GraftProcedure(
        // attach an existing table's metadata file under a new catalog
        // identifier (REST mode only — a path catalog derives locations
        // from identifiers and has nothing to register into)
        "register_table",
        Seq(in("table", StringType), in("metadata_file", StringType)),
        out("current_snapshot_id" -> LongType, "total_records" -> LongType),
        (input, _) => {
          val t = register(identOf(input.getString(0), catalogName), input.getString(1))
          Seq(Seq(
            t.metadata.currentSnapshotId.orNull,
            t.metadata.currentSnapshot
              .flatMap(_.summary.get("total-records")).map(_.toLong).getOrElse(0L)))
        }),
      new GraftProcedure(
        "cherrypick_snapshot",
        Seq(in("table", StringType), in("snapshot_id", LongType)),
        out("source_snapshot_id" -> LongType, "current_snapshot_id" -> LongType),
        (input, spark) => {
          val t = table(input)
          val src = input.getLong(1)
          t.cherryPick(spark, src)
          Seq(Seq(src, t.metadata.currentSnapshotId.get))
        }),
      new GraftProcedure(
        "ancestors_of",
        // the snapshot lineage walk (current head by default): one row
        // per ancestor, newest first — metadata-only
        Seq(in("table", StringType),
          ProcedureParameter.in("snapshot_id", LongType)
            .defaultValue("NULL").build()),
        out("snapshot_id" -> LongType, "timestamp" -> LongType,
          "sequence_number" -> LongType, "operation" -> StringType),
        (input, _) => {
          val t = table(input)
          val startId =
            if (input.isNullAt(1)) t.metadata.currentSnapshotId
              .getOrElse(sys.error("table has no snapshots"))
            else input.getLong(1)
          val byId = t.metadata.snapshots.map(s => s.snapshotId -> s).toMap
          val chain = Iterator.iterate(byId.get(startId))(
              _.flatMap(_.parentSnapshotId).flatMap(byId.get))
            .takeWhile(_.isDefined).flatten.toSeq
          require(chain.nonEmpty, s"no snapshot $startId")
          chain.map(s => Seq(s.snapshotId, s.timestampMs, s.sequenceNumber,
            s.summary.getOrElse("operation", null)))
        }),
      new GraftProcedure(
        "fast_forward",
        Seq(in("table", StringType), in("branch", StringType), in("to", StringType)),
        out("branch" -> StringType, "current_snapshot_id" -> LongType),
        (input, _) => {
          val t = table(input)
          val branch = input.getString(1)
          t.fastForward(branch, input.getString(2))
          Seq(Seq(branch, t.metadata.refs(branch).snapshotId))
        }),
      new GraftProcedure(
        "create_tag",
        Seq(in("table", StringType), in("name", StringType), in("snapshot_id", LongType)),
        out("name" -> StringType, "snapshot_id" -> LongType),
        (input, _) => {
          val t = table(input)
          t.createTag(input.getString(1), input.getLong(2))
          Seq(Seq(input.getString(1), input.getLong(2)))
        }),
      new GraftProcedure(
        "create_branch",
        Seq(in("table", StringType), in("name", StringType), in("snapshot_id", LongType)),
        out("name" -> StringType, "snapshot_id" -> LongType),
        (input, _) => {
          val t = table(input)
          t.createBranch(input.getString(1), input.getLong(2))
          Seq(Seq(input.getString(1), input.getLong(2)))
        }),
    )
    procs.map(p => p.name() -> (p: UnboundProcedure)).toMap
  }
}
