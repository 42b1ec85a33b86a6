package graft.tables

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem ("storage") catalog: metadata discovery via version-hint.text
  * (or listing), optimistic commit via write-tmp-then-rename
  * (behavior mirrored from icelake/src/catalog/storage.rs:175-352, with the
  * check-and-retry loop the reference left unfinished). */
object StorageCatalog {

  private val VersionRe = """v(\d+)(?:\.gz)?\.metadata\.json""".r

  /** Metadata file name for a version under the table's compression codec
    * (`write.metadata.compression-codec`: none | gzip, Iceberg naming —
    * gzip versions are `vN.gz.metadata.json`). */
  def metadataFileName(version: Int, properties: Map[String, String]): String =
    if (gzipMetadata(properties)) s"v$version.gz.metadata.json"
    else s"v$version.metadata.json"

  def gzipMetadata(properties: Map[String, String]): Boolean =
    properties.get("write.metadata.compression-codec")
      .exists(_.trim.equalsIgnoreCase("gzip"))

  /** The committed metadata file for `version`, whichever codec wrote it
    * (plain probed first — the overwhelmingly common case). */
  def existingMetadataFile(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: Path,
      version: Int): Option[Path] = {
    val plain = new Path(dir, s"v$version.metadata.json")
    if (fs.exists(plain)) Some(plain)
    else {
      val gz = new Path(dir, s"v$version.gz.metadata.json")
      if (fs.exists(gz)) Some(gz) else None
    }
  }

  def metadataDir(location: String) = s"$location/metadata"

  private def fsOf(conf: Configuration, p: Path): FileSystem = {
    val fs = p.getFileSystem(conf)
    // fixture tables ship stale .crc sidecars; read content, not checksums
    fs.setVerifyChecksum(false)
    fs
  }

  /** Latest committed metadata file: version-hint first, then the highest
    * vN.metadata.json, then lexicographic max over *.metadata.json (the
    * Spark/HMS `00000-uuid` naming — the "no hint" discovery path of
    * icelake/src/catalog/storage.rs:275-310). Returns (path, version). */
  def latestMetadata(conf: Configuration, location: String): Option[(String, Int)] = {
    val dir = new Path(metadataDir(location))
    val fs = fsOf(conf, dir)
    val hint = new Path(dir, "version-hint.text")
    val hinted: Option[(String, Int)] =
      if (fs.exists(hint)) {
        try {
          val in = fs.open(hint)
          val hintV = try scala.io.Source.fromInputStream(in).mkString.trim.toInt
          finally in.close()
          // the hint is advisory and can LAG (its rewrite is best-effort
          // under concurrent commits): verify it, then walk forward to the
          // newest committed version — O(versions-ahead) exists() probes,
          // no directory listing in the common case
          if (existingMetadataFile(fs, dir, hintV).isEmpty) None
          else {
            var v = hintV
            while (existingMetadataFile(fs, dir, v + 1).isDefined) v += 1
            Some((existingMetadataFile(fs, dir, v).get.toUri.getPath, v))
          }
        } catch { case _: Throwable => None }
      } else None
    hinted.orElse {
      if (!fs.exists(dir)) None
      else {
        val metaFiles = fs.listStatus(dir).map(_.getPath.getName)
          .filter(n => n.endsWith(".metadata.json") && !n.startsWith("."))
        val versioned = metaFiles.flatMap {
          case n @ VersionRe(v) => Some((n, v.toInt))
          case _ => None
        }
        if (versioned.nonEmpty) {
          val (n, v) = versioned.maxBy(_._2)
          Some((new Path(dir, n).toUri.getPath, v))
        } else if (metaFiles.nonEmpty) {
          // lexicographic max; synthesize a version from the count
          val n = metaFiles.max
          Some((new Path(dir, n).toUri.getPath, metaFiles.length))
        } else None
      }
    }
  }

  def currentVersion(conf: Configuration, location: String): Int =
    latestMetadata(conf, location).map(_._2).getOrElse(0)

  def tableExists(conf: Configuration, location: String): Boolean =
    currentVersion(conf, location) > 0

  def loadTable(conf: Configuration, location: String): GraftTable = {
    val (path, v) = latestMetadata(conf, location)
      .getOrElse(throw new IllegalArgumentException(s"no table at $location"))
    val meta = MetadataJson.parse(ManifestIO.readBytes(conf, path))
    new GraftTable(location, meta, v, conf)
  }

  /** fresh-table metadata (shared by the storage and REST create paths) */
  def newTableMetadata(
      location: String,
      schema: IceSchema,
      spec: IcePartitionSpec,
      properties: Map[String, String] = Map.empty,
      formatVersion: Int = 2): TableMetadata = {
    // the Iceberg `format-version` table property wins over the default
    // (CREATE TABLE ... TBLPROPERTIES ('format-version'='3') opts into v3
    // row lineage / deletion vectors)
    val fv = properties.get("format-version").map(_.trim.toInt).getOrElse(formatVersion)
    require(fv >= 1 && fv <= 3, s"bad format version $fv")
    require(fv >= 3 || !schema.usesV3Types,
      "variant/timestamp_ns/unknown columns require format-version 3")
    schema.invalidUnknown.foreach(e => throw new IllegalArgumentException(e))
    // unknown columns hold no data: a spec or identity key sourcing one
    // would route/match on a column every write drops (the later append
    // fails confusingly; refuse at create instead)
    spec.fields.foreach { pf =>
      val src = schema.fieldById(pf.sourceId)
      require(src.isDefined, s"partition source field ${pf.sourceId} not in schema")
      require(src.get.fieldType != IcePrim("unknown"),
        s"cannot partition by unknown-typed column ${src.get.name}")
    }
    schema.identifierFieldIds.foreach { id =>
      require(schema.fieldById(id).exists(_.fieldType != IcePrim("unknown")),
        s"identifier field id $id must not be unknown-typed")
    }
    TableMetadata(
      formatVersion = fv,
      tableUuid = UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema.maxFieldId,
      schemas = List(schema),
      currentSchemaId = schema.schemaId,
      partitionSpecs = List(spec),
      defaultSpecId = spec.specId,
      lastPartitionId = (999 :: spec.fields.map(_.fieldId)).max,
      properties = properties,
      currentSnapshotId = None,
      snapshots = Nil,
      snapshotLog = Nil,
      metadataLog = Nil,
      sortOrders = List(IceSortOrder(0, Nil)),
      defaultSortOrderId = 0,
      refs = Map.empty)
  }

  /** Staged (atomic CTAS/RTAS) table: data, manifests, and snapshots are
    * written under the location as usual, but metadata versions stay
    * IN MEMORY — nothing discoverable lands until [[StagedHandle.publish]]
    * re-commits the final metadata through the normal atomic path. A
    * crash or abort before publish leaves no visible table (create) or
    * the old table untouched (replace); staged data files are orphans,
    * reclaimable by `remove_orphan_files`. */
  final class StagedHandle(
      val table: GraftTable,
      conf: Configuration,
      replace: Boolean,
      orReplace: Boolean) {
    def publish(): Unit = {
      val v = currentVersion(conf, table.location)
      if (!replace && !orReplace && v > 0)
        sys.error(s"table already exists at ${table.location}")
      if (replace && !orReplace && v == 0)
        sys.error(s"REPLACE TABLE: no table at ${table.location}")
      // staged commits bumped versions in memory only, so the accumulated
      // metadataLog names files that were never written — publish a clean
      // log (external metadata-log walkers must never hit missing files)
      commitMetadata(conf, table.location, expectedVersion = v,
        table.metadata.copy(metadataLog = Nil))
    }
    // Nothing committed; staged files are orphans, reclaimable by
    // removeOrphanFiles with an olderThan cutoff PREDATING the staged
    // write — its mtime filter is also what keeps a concurrent in-flight
    // staging's fresh files safe from a GC running with a sane cutoff.
    def abort(): Unit = ()
  }

  def stageTable(
      conf: Configuration,
      location: String,
      schema: IceSchema,
      spec: IcePartitionSpec,
      properties: Map[String, String] = Map.empty,
      replace: Boolean = false,
      orReplace: Boolean = false): StagedHandle = {
    val meta = newTableMetadata(location, schema, spec, properties)
    val t = new GraftTable(location, meta, 0, conf)
    // in-memory version counter; identity reload (no committed metadata
    // to re-read, and no concurrent writer can see a staged table)
    t.committer = (m, v) => v + 1
    t.reloader = () => t
    new StagedHandle(t, conf, replace, orReplace)
  }

  def createTable(
      conf: Configuration,
      location: String,
      schema: IceSchema,
      spec: IcePartitionSpec,
      properties: Map[String, String] = Map.empty,
      formatVersion: Int = 2): GraftTable = {
    require(!tableExists(conf, location), s"table already exists at $location")
    val meta = newTableMetadata(location, schema, spec, properties, formatVersion)
    val version = commitMetadata(conf, location, expectedVersion = 0, meta)
    new GraftTable(location, meta, version, conf)
  }

  /** Replace any existing table at the location (test convenience). */
  def createOrReplaceTable(
      conf: Configuration,
      location: String,
      schema: IceSchema,
      spec: IcePartitionSpec,
      properties: Map[String, String] = Map.empty,
      formatVersion: Int = 2): GraftTable = {
    val p = new Path(location)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true)
    createTable(conf, location, schema, spec, properties, formatVersion)
  }

  /** Metadata fork for the `snapshot` procedure (Iceberg's zero-copy test
    * table): same schemas, partition specs, and sort orders — field and
    * spec IDS ARE PRESERVED because carried manifest entries reference
    * them — but a fresh identity (uuid, empty history/refs/logs). The
    * source's `lastSequenceNumber` carries over so files kept with their
    * original data sequences stay BELOW every future commit of the fork:
    * a later DELETE on the fork must out-sequence the carried data or MoR
    * visibility silently drops it. */
  def forkMetadata(source: TableMetadata, destLocation: String): TableMetadata =
    source.copy(
      tableUuid = UUID.randomUUID().toString,
      location = destLocation,
      lastUpdatedMs = System.currentTimeMillis(),
      properties = source.properties + ("graft.snapshot-source" -> source.location),
      currentSnapshotId = None,
      snapshots = Nil,
      snapshotLog = Nil,
      metadataLog = Nil,
      refs = Map.empty)

  /** Create a table from fully-formed metadata (the snapshot/register
    * surface — normal creates go through [[createTable]]). */
  def createTableWithMetadata(
      conf: Configuration,
      location: String,
      meta: TableMetadata): GraftTable = {
    require(!tableExists(conf, location), s"table already exists at $location")
    val version = commitMetadata(conf, location, expectedVersion = 0, meta)
    new GraftTable(location, meta, version, conf)
  }

  /** Atomic single-version commit, scheme-aware:
    *
    *  - HDFS (and stores with HDFS rename semantics): write tmp, then
    *    rename — rename fails if the target exists, giving optimistic
    *    concurrency directly.
    *  - local fs: POSIX rename(2) silently OVERWRITES an existing target
    *    and `exists`-then-rename is a TOCTOU race, so the commit point is
    *    an atomic per-version lock file (`File.createNewFile`); the
    *    exists-check and rename run under the lock. A crashed committer's
    *    stale lock (>60s) is broken best-effort.
    *
    * Throws [[CommitConflictException]] when someone else won the version. */
  def commitMetadata(
      conf: Configuration,
      location: String,
      expectedVersion: Int,
      meta: TableMetadata): Int = {
    val dir = new Path(metadataDir(location))
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val next = expectedVersion + 1
    val gz = gzipMetadata(meta.properties)
    val target = new Path(dir, metadataFileName(next, meta.properties))
    val isLocal = fs.getUri.getScheme == "file"

    def writeAndRename(): Unit = {
      // a concurrent committer may be on the OTHER codec suffix — either
      // name claims the version
      if (existingMetadataFile(fs, dir, next).isDefined)
        throw new CommitConflictException(s"version $next already exists")
      val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}.metadata.json")
      val out = fs.create(tmp, false)
      val bytes = MetadataJson.serialize(meta)
      try out.write(if (gz) MetadataJson.gzip(bytes) else bytes)
      finally out.close()
      // HDFS: rename(src, dst) returns false if dst exists => lost the race
      if (!fs.rename(tmp, target)) {
        fs.delete(tmp, false)
        throw new CommitConflictException(s"concurrent commit to version $next")
      }
    }

    if (isLocal) {
      val lock = new java.io.File(
        new Path(dir, s".commit-v$next.lock").toUri.getPath)
      val myToken = UUID.randomUUID().toString
      def acquire(): Boolean =
        lock.createNewFile() && { // atomic on POSIX
          // identity-stamp the lock: before committing we re-read it, so
          // a racer that broke/clobbered our lock is detected instead of
          // two committers entering the critical section
          java.nio.file.Files.writeString(lock.toPath, myToken)
          true
        }
      var acquired = acquire()
      if (!acquired && System.currentTimeMillis() - lock.lastModified() > 60000L) {
        // break a crashed committer's stale lock via rename — atomic, so
        // only ONE racer wins the break (delete-then-create would let two
        // committers both acquire and race the rename overwrite again).
        // If the rename captured a FRESH lock (its holder re-created it
        // between our staleness check and the rename), we do NOT restore
        // it — the token re-check below makes its holder back off safely.
        val breaker = new java.io.File(lock.getPath + s".broken-${UUID.randomUUID()}")
        if (lock.renameTo(breaker)) {
          breaker.delete()
          acquired = acquire()
        }
      }
      if (!acquired)
        throw new CommitConflictException(s"concurrent commit in flight for version $next")
      try {
        // the lock must still be OURS at the commit point
        val held =
          try java.nio.file.Files.readString(lock.toPath) == myToken
          catch { case _: Throwable => false }
        if (!held)
          throw new CommitConflictException(s"commit lock for version $next was stolen")
        writeAndRename()
      } finally {
        // delete only our own lock
        try {
          if (java.nio.file.Files.readString(lock.toPath) == myToken) lock.delete()
        } catch { case _: Throwable => }
      }
    } else writeAndRename()

    // the hint is an advisory cache (latestMetadata verifies it and falls
    // back to listing): concurrent rewrites may collide on the checksum
    // sidecar — never fail a committed transaction over it
    try {
      val hint = new Path(dir, "version-hint.text")
      val hintOut = fs.create(hint, true)
      try hintOut.write(next.toString.getBytes("UTF-8"))
      finally hintOut.close()
    } catch { case _: Throwable => }
    next
  }
}

class CommitConflictException(msg: String) extends RuntimeException(msg)
