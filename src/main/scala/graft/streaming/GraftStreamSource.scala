package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.tables.{GraftTable, IceSnapshot, SchemaConvert, StorageCatalog, TableWrite}

/** Streaming source AND sink over a graft table.
  *
  * Source: the streaming form of the reference's resumable scan offsets
  * (icelake/src/io/scan.rs:25-28,98-116) — the offset is the snapshot
  * sequence number, each micro-batch is the data files appended in
  * (startSeq, endSeq]. Append-only tables stream exactly-once through
  * checkpointed offsets.
  *
  *   spark.readStream.format("graft-stream")
  *     .option("location", "/path/to/table").load()
  *
  * With `.option("mode", "changelog")` each micro-batch is the CDC
  * changelog of its snapshot range instead of just appended rows: the
  * table schema plus `_change_type` ('insert' | 'delete'), deletes
  * carrying the full deleted-row content, rewrites contributing nothing
  * — the streaming form of `GraftTable.changes`.
  *
  * Sink: each micro-batch commits one snapshot — append by default, or a
  * keyed CDC upsert when `upsert-keys` is set (the reference's
  * EqualityDeltaWriter stack driven by Structured Streaming; an optional
  * `op-column` carries INSERT=1/DELETE=2):
  *
  *   df.writeStream.format("graft-stream")
  *     .option("location", "/path/to/table")
  *     .option("upsert-keys", "user_id")       // optional
  *     .option("op-column", "_op")             // optional
  *     .start()
  *
  * `.option("mode", "upsert")` without `upsert-keys` upserts by the
  * table's declared identifier fields (`identifier-field-ids`).
  */
class GraftStreamSourceProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("location", sys.error("option 'location' is required"))

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    // per-sink identity (derived from the checkpoint, which IS the
    // query's identity): two streaming queries into one table must not
    // share a batch-id key. Full SHA-1 of the identity string — a 32-bit
    // hash could collide two distinct checkpoints into silent batch skips.
    val identity = parameters.get("checkpointLocation")
      .orElse(parameters.get("queryName"))
      .getOrElse(sys.error(
        "graft-stream sink needs .option(\"checkpointLocation\", ...) or " +
          ".queryName(...) — the batch-id replay guard is keyed by it"))
    val sinkId = {
      val d = java.security.MessageDigest.getInstance("SHA-1")
        .digest(identity.getBytes("UTF-8"))
      d.take(8).map(b => f"$b%02x").mkString
    }
    // upsert-keys names the equality key; `.option("mode", "upsert")`
    // without keys defers to the table's declared identifier fields
    // (schema `identifier-field-ids` — GraftTable.upsert's default)
    val upsertKeys = parameters
      .get("upsert-keys").map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .orElse(
        if (parameters.get("mode").exists(_.trim.equalsIgnoreCase("upsert")))
          Some(Seq.empty[String])
        else None)
    // `.option("branch", "audit")` stages every micro-batch on a branch
    // (streaming write-audit-publish): main stays untouched until a
    // fastForward publishes. Upsert mode is refused — its equality
    // deletes resolve against main's head, not the branch lineage.
    val branch = parameters.get("branch").map(_.trim).filter(_.nonEmpty)
    require(branch.isEmpty || upsertKeys.isEmpty,
      "graft-stream: .option(\"branch\", ...) requires append mode " +
        "(upsert deltas cannot stage on a branch)")
    require(!branch.contains("main"), "stage on a non-main branch")
    new GraftStreamSink(
      location(parameters),
      upsertKeys,
      parameters.get("op-column"),
      sinkId,
      branch)
  }

  private def changelogMode(parameters: Map[String, String]): Boolean =
    parameters.get("mode").map(_.trim.toLowerCase) match {
      case Some("changelog") => true
      case Some("append") | None => false
      case Some(other) => sys.error(s"unknown graft-stream mode '$other' " +
        "(expected 'append' or 'changelog')")
    }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val t = StorageCatalog.loadTable(
      org.apache.spark.sql.GraftBridge.sessionHadoopConf(sqlContext.sparkSession),
      location(parameters))
    val base = SchemaConvert.toSparkSchema(t.metadata.currentSchema)
    ("graft-stream",
      if (changelogMode(parameters))
        base.add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
      else base)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new GraftStreamSource(sqlContext.sparkSession, location(parameters),
      parameters.get("max-seqs-per-trigger").map(_.toLong),
      changelog = changelogMode(parameters),
      ref = parameters.get("ref").map(_.trim).filter(_.nonEmpty))
}

case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** `maxSeqsPerTrigger` rate-limits each micro-batch to that many snapshot
  * increments (sequence numbers) — a query starting against a table with a
  * deep commit backlog drains it in bounded batches instead of one giant
  * first batch (the streaming analogue of maxFilesPerTrigger).
  *
  * Implements [[SupportsTriggerAvailableNow]] the way Spark's own
  * FileStreamSource does on a v1 `Source`: `Trigger.AvailableNow` latches
  * the table's current head sequence at query start and drains up to it
  * in rate-limited batches, then terminates — WITHOUT it, Spark falls
  * back to one single rate-limited batch and silently strands the rest
  * of the backlog. */
class GraftStreamSource(
    spark: SparkSession,
    location: String,
    maxSeqsPerTrigger: Option[Long] = None,
    changelog: Boolean = false,
    ref: Option[String] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit}

  // session-scoped (fs.* credentials set via spark.conf apply to stream
  // metadata reads, matching the scan/write paths)
  private val conf = org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)

  /** most recent load, reused by [[reportLatestOffset]] so progress
    * reporting doesn't re-read table metadata right after latestOffset
    * already did (2x metadata I/O per trigger on remote storage) */
  @volatile private var lastLoaded: GraftTable = _

  private def table = {
    val t = StorageCatalog.loadTable(conf, location)
    lastLoaded = t
    t
  }

  /** stream head: main's current snapshot, or — with `.option("ref",
    * ...)` — the named branch/tag's head (the WAP-audit consumer shape:
    * stream the audit branch while main stays quiet). A missing ref
    * means "nothing to stream yet", not an error: the branch may be
    * created after the query starts. */
  private def headSnapshot(t: GraftTable): Option[IceSnapshot] = ref match {
    case None => t.metadata.currentSnapshot
    case Some(r) =>
      t.metadata.refs.get(r).flatMap(x => t.metadata.snapshotById(x.snapshotId))
  }

  /** ancestry of the head — sequence numbers are table-global, so a
    * rate-limited END sequence can land on a snapshot of ANOTHER lineage
    * (main commits interleaving with the branch); batch selection must
    * resolve within the ref's own chain */
  private def lineageOf(t: GraftTable, head: IceSnapshot): List[IceSnapshot] = {
    val byId = t.metadata.snapshots.map(s => s.snapshotId -> s).toMap
    def walk(s: IceSnapshot): List[IceSnapshot] =
      s :: s.parentSnapshotId.flatMap(byId.get).map(walk).getOrElse(Nil)
    walk(head)
  }

  /** highest sequence already handed out, for rate limiting; recovered
    * batches re-delivered after restart only ever lower-bound this */
  @volatile private var lastSeenSeq = 0L

  /** AvailableNow: head sequence latched at query start; None = unbounded */
  @volatile private var latchedHeadSeq: Option[Long] = None

  override def schema: StructType = {
    val base = SchemaConvert.toSparkSchema(table.metadata.currentSchema)
    if (changelog)
      base.add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
    else base
  }

  private def nextOffset(rateLimit: Option[Long]): Option[Offset] = {
    val t = table
    headSnapshot(t).flatMap { s =>
      val head = latchedHeadSeq.map(math.min(_, s.sequenceNumber))
        .getOrElse(s.sequenceNumber)
      val end = rateLimit match {
        case Some(n) =>
          // skip straight to just below the earliest LIVE snapshot: after
          // snapshot expiry, counting up from 0 would burn one empty
          // micro-batch per expired sequence before reaching data
          if (lastSeenSeq == 0L && t.metadata.snapshots.nonEmpty)
            lastSeenSeq = math.max(0L, t.metadata.snapshots.map(_.sequenceNumber).min - 1)
          math.min(head, lastSeenSeq + n)
        case None => head
      }
      if (end <= 0) None else Some(SeqOffset(end))
    }
  }

  override def getOffset: Option[Offset] = nextOffset(maxSeqsPerTrigger)

  // ---- SupportsAdmissionControl / SupportsTriggerAvailableNow ----

  override def getDefaultReadLimit: ReadLimit =
    maxSeqsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(startOffset: V2Offset, limit: ReadLimit): V2Offset = {
    val rate = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        Some(r.maxRows())
      // Trigger.Once sends ReadAllAvailable and expects EVERYTHING in one
      // batch — re-applying the per-trigger cap here would strand the
      // backlog past one batch when the query then stops
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable => None
      case _ => maxSeqsPerTrigger
    }
    nextOffset(rate).orNull
  }

  override def reportLatestOffset(): V2Offset =
    headSnapshot(Option(lastLoaded).getOrElse(table))
      .map(s => SeqOffset(s.sequenceNumber)).orNull

  override def prepareForTriggerAvailableNow(): Unit = {
    // latch UNCONDITIONALLY: an empty-at-start table must latch 0 (process
    // nothing, terminate) — leaving None would track a live writer's head
    // and the AvailableNow query would never self-terminate
    latchedHeadSeq = Some(
      headSnapshot(table).map(_.sequenceNumber).getOrElse(0L))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val t = table
    val startSeq = start.map(_.json().toLong).getOrElse(0L)
    val endSeq = end.json().toLong
    if (endSeq > lastSeenSeq) lastSeenSeq = endSeq
    if (changelog) {
      // CDC micro-batch: the batch-range changelog (inserts + delete-row
      // content + overwrite drops, replace-aware) addressed by sequence —
      // each batch is exactly `changes()` over (startSeq, endSeq]
      val cdcSchema = schema
      val to = headSnapshot(t).toList.flatMap(lineageOf(t, _))
        .filter(_.sequenceNumber <= endSeq)
        .sortBy(_.sequenceNumber).lastOption
      val batch = to match {
        case Some(s) if s.sequenceNumber > startSeq =>
          t.changesRawBySeq(spark, startSeq, s)
        case _ =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cdcSchema)
      }
      return org.apache.spark.sql.GraftBridge.asStreamingDataFrame(batch)
    }
    val snap = {
      val lineage = headSnapshot(t).toList.flatMap(lineageOf(t, _))
      lineage.find(_.sequenceNumber == endSeq)
        .orElse(lineage.filter(_.sequenceNumber <= endSeq)
          .sortBy(_.sequenceNumber).lastOption)
        .orElse(headSnapshot(t))
    }
    val sparkSchema = SchemaConvert.toSparkSchema(t.metadata.currentSchema)
    val batch = snap match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
      case Some(s) =>
        // replace-aware: a compaction/z-order commit inside the batch
        // range re-files EXISTING rows — streaming them again would
        // duplicate the feed. incrementalAddedFiles skips rewrites and
        // finds absorbed appends through their own snapshots.
        val files = t.incrementalAddedFiles(startSeq, s)
          .filter(_.seq <= endSeq)
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
        else
          // format-routing read (parquet fast path; orc/avro tables
          // stream through the same per-format readers as batch scans)
          t.readDataFiles(spark, files, sparkSchema)
    }
    org.apache.spark.sql.GraftBridge.asStreamingDataFrame(batch)
  }

  override def stop(): Unit = ()
}

/** Micro-batch sink: one snapshot commit per batch. The batch id rides
  * the DATA commit's own snapshot summary (atomic — a crash between
  * write and stamp cannot leave unstamped data), keyed per sink so
  * concurrent queries into one table don't collide; a restarted query
  * re-delivering an already-committed batch is skipped. Exactly-once on
  * top of the checkpoint's at-least-once replay. */
class GraftStreamSink(
    location: String,
    upsertKeys: Option[Seq[String]],
    opColumn: Option[String],
    sinkId: String,
    branch: Option[String] = None)
    extends Sink {

  private def batchKey = s"streaming-batch-id-$sinkId"

  /** highest batch this sink committed, across ALL snapshots (later
    * commits by other writers must not mask the stamp; the un-keyed
    * legacy stamp is honored for tables written by older sinks) */
  private def committedBatch(t: graft.tables.GraftTable): Option[Long] =
    (t.metadata.snapshots.flatMap(_.summary.get(batchKey)) ++
      t.metadata.snapshots.flatMap(_.summary.get("streaming-batch-id")))
      .map(_.toLong).maxOption

  private class BatchAlreadyCommitted extends RuntimeException

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val t = StorageCatalog.loadTable(
      org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark), location)
    if (committedBatch(t).exists(_ >= batchId)) return // replayed batch
    // streaming DataFrames cannot be re-planned by batch writers: pin the
    // batch contents first (the micro-batch is bounded)
    val batch = org.apache.spark.sql.GraftBridge.asBatchDataFrame(data)
    val stamp = Map(batchKey -> batchId.toString)
    // the stamp re-check runs inside the commit retry loop against fresh
    // metadata: a zombie driver racing the same batch loses the CAS,
    // refreshes, sees the stamp, and backs off instead of double-committing
    val guard: () => Unit =
      () => if (committedBatch(t).exists(_ >= batchId)) throw new BatchAlreadyCommitted
    try {
      upsertKeys match {
        case Some(keys) =>
          t.upsert(spark, batch, keys, opColumn, extraSummary = stamp, validate = guard)
        case None =>
          val files = TableWrite.writeDataFiles(t, spark, batch)
          t.commit(spark, "append", files, Nil, replace = false,
            extraSummary = stamp, validate = guard, branch = branch)
      }
    } catch { case _: BatchAlreadyCommitted => }
    ()
  }
}
