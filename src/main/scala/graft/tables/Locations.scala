package graft.tables

import java.nio.charset.StandardCharsets

import graft.functions.Murmur3

/** Iceberg LocationProvider semantics: `write.data.path` (data files may
  * live outside `{location}/data`, e.g. on a different bucket) and
  * `write.object-storage.enabled` (hash-prefixed file paths). At 100 TB on
  * an S3-like store every object under one `.../data/` prefix shares that
  * prefix's request-rate cap — a 1000-executor write or a full-table scan
  * throttles on the STORE, not the cluster. The object-storage layout
  * spreads files across 2^20 hash prefixes rendered as binary directories
  * (`0101/0110/1010/00011101/...`), the layout Java Iceberg ≥ 1.4 writes,
  * so request load distributes across the store's internal partitions.
  *
  * The reference hard-codes `{location}/data/{uuid}` naming
  * (icelake/src/io_v2/location_generator.rs) — this closes that gap.
  *
  * Granularity: the DSv2 write path mints per-FILE hash prefixes (each
  * file lands under its own prefix — full Iceberg semantics); the facade's
  * stock-Spark-writer paths (Spark names the files inside one output dir)
  * get a per-WRITE-BATCH prefix, which still spreads continuous ingest
  * across prefixes one commit at a time. Readers never care: manifests
  * record absolute paths.
  */
object Locations {

  /** base directory for NEW data files (reads go by manifest paths) */
  def dataPath(metadata: TableMetadata, location: String): String =
    metadata.properties.getOrElse("write.data.path", s"$location/data")
      .stripSuffix("/")

  def objectStorage(metadata: TableMetadata): Boolean =
    metadata.properties.get("write.object-storage.enabled")
      .exists(_.equalsIgnoreCase("true"))

  /** 20-bit murmur3 of the table-relative file name, rendered as
    * 4/4/4/8-bit binary directories */
  def hashDirs(rel: String): String = {
    val bits20 = Murmur3.hash(rel.getBytes(StandardCharsets.UTF_8), 0) & 0xFFFFF
    val s = ("0" * 20 + Integer.toBinaryString(bits20)).takeRight(20)
    s"${s.substring(0, 4)}/${s.substring(4, 8)}/${s.substring(8, 12)}/${s.substring(12, 20)}"
  }

  /** full location for one new data file; `rel` must be unique per file
    * (callers pass `writeId/fileName`) */
  def fileLocation(metadata: TableMetadata, location: String, rel: String): String =
    if (objectStorage(metadata)) s"${dataPath(metadata, location)}/${hashDirs(rel)}/$rel"
    else s"${dataPath(metadata, location)}/$rel"

  /** output dir for one write batch on the stock-Spark-writer paths */
  def writeDir(metadata: TableMetadata, location: String, writeId: String): String =
    if (objectStorage(metadata))
      s"${dataPath(metadata, location)}/${hashDirs(writeId)}/$writeId"
    else s"${dataPath(metadata, location)}/$writeId"

  /** prefixes that mark a file as table-internal (written by this engine,
    * Iceberg field ids stamped): the default data dir PLUS any configured
    * write.data.path — a data-path flip must not demote files written
    * under the old prefix to by-name resolution */
  def internalPrefixes(metadata: TableMetadata, location: String): Seq[String] =
    (Seq(s"${GraftTable.normPathStr(location)}/data") ++
      metadata.properties.get("write.data.path")
        .map(p => GraftTable.normPathStr(p.stripSuffix("/"))))
      .distinct.map(_ + "/")

  def isInternal(metadata: TableMetadata, location: String, path: String): Boolean = {
    val n = GraftTable.normPathStr(path)
    internalPrefixes(metadata, location).exists(n.startsWith)
  }

  /** resolve the serializable per-file minting spec for one write batch */
  def specFor(metadata: TableMetadata, location: String, writeId: String): LocationSpec =
    LocationSpec(dataPath(metadata, location), writeId, objectStorage(metadata))
}

/** Serializable per-file location minting, shipped to executor-side
  * writers: each file name hashes to its OWN object-store prefix. */
case class LocationSpec(dataPath: String, writeId: String, objectStore: Boolean) {
  def path(fileName: String): String = {
    val rel = s"$writeId/$fileName"
    if (objectStore) s"$dataPath/${Locations.hashDirs(rel)}/$rel"
    else s"$dataPath/$rel"
  }
}
