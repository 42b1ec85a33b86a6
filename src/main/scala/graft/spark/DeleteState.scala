package graft.spark

import java.util.{HashMap => JHashMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.types.DataType

import graft.tables.GraftTable

/** One delete file reference shipped to executors: path, size (for the
  * PartitionedFile length) and the file's data sequence number. */
case class DeleteFileRef(path: String, size: Long, seq: Long)

/** Plan-time spec of one equality-delete group for EXECUTOR-side loading:
  * which key columns (by inner-read ordinal + type), which delete files,
  * and a DRIVER-BUILT reader factory over the group's key schema (the
  * factory serializes into tasks exactly like a normal parquet scan's). */
case class EqLoadSpec(
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType],
    files: Array[DeleteFileRef],
    factory: PartitionReaderFactory)
    extends Serializable

/** Executor-side delete-state loading — the scale path of the native MoR
  * scan (SURVEY §2.6). The reference never built delete reads at all
  * (icelake/src/io/scan.rs note); this is how they stay bounded at 100 TB:
  *
  *  - POSITION deletes are read PER TASK through parquet-mr with a
  *    pushdown predicate `file_path == <the task's data file>` (every
  *    stored path form) — row-group stats on the sorted (file_path, pos)
  *    delete files skip everything else, so each task reads only its own
  *    slice no matter how large the total delete set is.
  *  - EQUALITY deletes are read ONCE PER EXECUTOR into a (key -> max
  *    delete sequence) map, cached by scan signature — tasks share the
  *    map instead of each re-reading the delete files (the per-task load
  *    Iceberg's Java reader does).
  *
  * Nothing here touches the driver: no collect, no task-closure payload
  * beyond file lists and reader factories. */
object DeleteState {

  /** the stored forms a data-file path may take inside position-delete
    * files (manifests store `/x`; `_metadata.file_path` yields
    * `file:///x`; hadoop Path.toString yields `file:/x`). New delete
    * files store the canonical form — the variants keep old files
    * readable. */
  private def pathForms(normPath: String): Seq[String] =
    Seq(normPath, s"file:$normPath", s"file://$normPath")

  /** read the position-delete candidates for one data file and return the
    * sorted positions deleted from it (delete seq >= the file's seq) */
  def positionsFor(
      dataPathNorm: String,
      dseq: Long,
      candidates: Array[DeleteFileRef],
      conf: Configuration): Array[Long] = {
    if (candidates.isEmpty) return Array.emptyLongArray
    // predicate covers every stored form; rows are still verified below,
    // so a false row-group keep only costs I/O, never correctness
    val pred = pathForms(dataPathNorm)
      .map(f => FilterApi.eq(FilterApi.binaryColumn("file_path"), Binary.fromString(f))
        : org.apache.parquet.filter2.predicate.FilterPredicate)
      .reduce(FilterApi.or)
    val buf = scala.collection.mutable.ArrayBuffer[Long]()
    candidates.foreach { ref =>
      if (ref.seq >= dseq) {
        val reader = ParquetReader
          .builder(new GroupReadSupport(), new HPath(ref.path))
          .withConf(conf)
          .withFilter(FilterCompat.get(pred))
          .build()
        try {
          var g = reader.read()
          while (g != null) {
            if (GraftTable.normPathStr(g.getString("file_path", 0)) == dataPathNorm)
              buf += g.getLong("pos", 0)
            g = reader.read()
          }
        } finally reader.close()
      }
    }
    buf.distinct.sorted.toArray
  }

  /** Row-position seed for a byte-range split of a data file: the number
    * of rows in the row groups BEFORE this range. Replicates parquet's
    * midpoint assignment (a row group belongs to the range holding
    * startingPos + compressedSize/2), so the seed plus sequential
    * counting over the range reproduces exact whole-file positions. */
  def posSeed(path: String, rangeStart: Long, conf: Configuration): Long = {
    if (rangeStart == 0L) return 0L
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new HPath(path), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      var seed = 0L
      reader.getFooter.getBlocks.forEach { b =>
        if (b.getStartingPos + b.getCompressedSize / 2 < rangeStart) seed += b.getRowCount
      }
      seed
    } finally reader.close()
  }

  /** JVM-global LRU of equality-delete maps keyed by scan signature: one
    * build per executor per scan, shared by its tasks. Bounded at a few
    * concurrent scans; an evicted entry just rebuilds on next access. */
  private val eqCache =
    new java.util.LinkedHashMap[String, Array[JHashMap[UnsafeRow, java.lang.Long]]](
      8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[JHashMap[UnsafeRow, java.lang.Long]]]): Boolean =
        size > 4
    }

  /** equality-delete key maps for the given groups, built once per
    * executor (then cache-shared across this scan's tasks) */
  def eqMaps(
      cacheKey: String,
      specs: Array[EqLoadSpec]): Array[JHashMap[UnsafeRow, java.lang.Long]] =
    eqCache.synchronized {
      val hit = eqCache.get(cacheKey)
      if (hit != null) hit
      else {
        val built = specs.map(loadEqGroup)
        eqCache.put(cacheKey, built)
        built
      }
    }

  private def loadEqGroup(spec: EqLoadSpec): JHashMap[UnsafeRow, java.lang.Long] = {
    val proj = UnsafeProjection.create(
      spec.keyTypes.zipWithIndex.map { case (t, i) => BoundReference(i, t, nullable = true) })
    val map = new JHashMap[UnsafeRow, java.lang.Long]()
    spec.files.foreach { ref =>
      val reader = spec.factory.createReader(
        org.apache.spark.sql.GraftBridge.wholeFilePartition(0, ref.path, ref.size))
      try {
        while (reader.next()) {
          val row: InternalRow = reader.get()
          val key = proj(row).copy()
          val prev = map.get(key)
          if (prev == null || prev < ref.seq) map.put(key, ref.seq)
        }
      } finally reader.close()
    }
    map
  }
}
