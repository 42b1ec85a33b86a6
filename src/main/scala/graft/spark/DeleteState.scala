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
  * PartitionedFile length) and the file's data sequence number. A
  * deletion-vector reference additionally pinpoints the blob's byte
  * extent inside the puffin file (`blobOffset >= 0`): the task reading a
  * data file fetches exactly its own vector, never the delete stack. */
case class DeleteFileRef(
    path: String, size: Long, seq: Long,
    blobOffset: Long = -1L, blobLength: Long = -1L,
    fmt: String = "parquet") {
  def isVector: Boolean = blobOffset >= 0L
}

/** Plan-time spec of one equality-delete group for EXECUTOR-side loading:
  * which key columns (by inner-read ordinal + type), which delete files,
  * and DRIVER-BUILT reader factories over the group's key schema (the
  * factories serialize into tasks exactly like a normal parquet scan's).
  * Foreign-FORMAT delete files (ORC/Avro, spec-legal for other engines)
  * route through their own factories so jumbo foreign delete sets load
  * executor-side like parquet ones instead of stalling plan time. */
case class EqLoadSpec(
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType],
    files: Array[DeleteFileRef],
    factory: PartitionReaderFactory,
    orcFactory: PartitionReaderFactory = null,
    avroFactory: PartitionReaderFactory = null)
    extends Serializable {
  def factoryFor(ref: DeleteFileRef): PartitionReaderFactory = ref.fmt match {
    case "orc" => orcFactory
    case "avro" => avroFactory
    case _ => factory
  }
}

/** key -> max delete sequence lookup, memory- or disk-backed.
  * Serializable: plan-time in-memory lookups ride the task closure. */
trait EqLookup extends Serializable {
  def get(key: UnsafeRow): java.lang.Long
  def close(): Unit = ()
}

/** heap-map lookup for small groups (one probe = one hash lookup) */
final class InMemoryEqLookup(map: JHashMap[UnsafeRow, java.lang.Long]) extends EqLookup {
  override def get(key: UnsafeRow): java.lang.Long = map.get(key)
}

/** Exact disk-backed lookup for JUMBO equality-delete groups — bounds
  * executor memory at any delete volume WITHOUT shuffling the data side
  * (a sort-merge anti-join fallback would shuffle the whole scanned
  * table; this streams it).
  *
  * SSTable shape: delete keys (canonical UnsafeRow bytes) spill to sorted
  * runs of at most `chunkBytes`, runs k-way merge into one sorted record
  * file (`[len][keyBytes][maxSeq]`) plus a fixed-width offset index, and
  * probes binary-search the index with positional channel reads (thread
  * safe, OS-page-cache friendly: the hot upper levels of the index stay
  * cached). Memory: one run buffer while building, O(1) while probing. */
final class DiskEqLookup private (
    dataFile: java.io.File,
    offsetsFile: java.io.File,
    n: Long,
    // bounded in-memory sparse index: every stride-th merged record's
    // (key, seq, record index). Probes binary-search it first — an exact
    // hit answers with ZERO disk reads (always the case while the set
    // fits the cap), otherwise the disk search narrows to one stride.
    sparseKeys: Array[Array[Byte]],
    sparseSeqs: Array[Long],
    sparseIdx: Array[Long]) extends EqLookup {

  // FileChannels are InterruptibleChannels: a task kill (speculation,
  // job cancel with interruptOnCancel) mid-read closes the channel for
  // EVERY thread. Channels are therefore replaceable — a probe that
  // finds its channel closed reopens it instead of poisoning the
  // JVM-global cache entry for all subsequent tasks.
  private def open(f: java.io.File) = java.nio.channels.FileChannel.open(
    f.toPath, java.nio.file.StandardOpenOption.READ)
  @volatile private var dataCh = open(dataFile)
  @volatile private var offCh = open(offsetsFile)
  @volatile private var closed = false

  private def reopen(): Unit = synchronized {
    if (closed) throw new IllegalStateException(s"closed: $dataFile")
    if (!dataCh.isOpen) dataCh = open(dataFile)
    if (!offCh.isOpen) offCh = open(offsetsFile)
  }

  private def readAt(data: Boolean, pos: Long, len: Int): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.allocate(len)
    var p = pos
    while (bb.hasRemaining) {
      val r =
        try (if (data) dataCh else offCh).read(bb, p)
        catch {
          case e: java.nio.channels.ClosedByInterruptException =>
            // THIS task is being killed — let it die (retrying would
            // re-close the channel forever)
            throw e
          case _: java.nio.channels.ClosedChannelException =>
            // an interrupted SIBLING task closed the shared channel —
            // reopen and retry
            reopen()
            0
        }
      if (r < 0) throw new java.io.EOFException(s"$dataFile at $p")
      p += r
    }
    bb.flip(); bb
  }

  override def get(key: UnsafeRow): java.lang.Long = {
    val kb = key.getBytes
    // memory tier: rightmost sparse entry <= kb
    var slo = 0
    var shi = sparseKeys.length - 1
    var floor = -1
    while (slo <= shi) {
      val mid = (slo + shi) >>> 1
      val c = java.util.Arrays.compareUnsigned(kb, sparseKeys(mid))
      if (c == 0) return sparseSeqs(mid)
      else if (c < 0) shi = mid - 1
      else { floor = mid; slo = mid + 1 }
    }
    // below the smallest key -> absent (record 0 is always sampled)
    if (floor < 0) return null
    // disk tier, narrowed to (floor entry, next entry)
    var lo = sparseIdx(floor) + 1
    var hi = if (floor + 1 < sparseIdx.length) sparseIdx(floor + 1) - 1 else n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val off = readAt(data = false, mid * 8, 8).getLong
      val len = readAt(data = true, off, 4).getInt
      val rec = readAt(data = true, off + 4, len + 8)
      val rb = new Array[Byte](len)
      rec.get(rb)
      val c = java.util.Arrays.compareUnsigned(kb, rb)
      if (c == 0) return rec.getLong
      else if (c < 0) hi = mid - 1
      else lo = mid + 1
    }
    null
  }

  override def close(): Unit = synchronized {
    closed = true
    dataCh.close(); offCh.close()
    dataFile.delete(); offsetsFile.delete()
  }
}

object DiskEqLookup {

  private def writeRec(out: java.io.DataOutputStream, key: Array[Byte], seq: Long): Unit = {
    out.writeInt(key.length); out.write(key); out.writeLong(seq)
  }

  private final class RunReader(f: java.io.File) {
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 16))
    var key: Array[Byte] = _
    var seq: Long = _
    advance()
    def advance(): Boolean = {
      try {
        val len = in.readInt()
        key = new Array[Byte](len); in.readFully(key); seq = in.readLong()
        true
      } catch {
        case _: java.io.EOFException => key = null; in.close(); f.delete(); false
      }
    }
  }

  /** default sparse-index BYTE budget (key bytes + fixed per-entry
    * overhead) — a fixed heap bound regardless of delete volume or key
    * width */
  val DefaultSparseBytes: Long = 32L * 1024 * 1024

  /** accounted per sparse entry on top of its key bytes (array header,
    * two longs, slot) */
  private val SparseEntryOverhead = 48L

  /** build from a stream of (canonical key bytes, delete sequence);
    * `chunkBytes` is the run-buffer size (callers floor it — tests pass
    * tiny values to force the multi-run merge path, and a tiny
    * `sparseBytes` to force probes onto the disk tier) */
  def build(
      records: Iterator[(Array[Byte], Long)],
      chunkBytes: Long,
      sparseBytes: Long = DefaultSparseBytes): DiskEqLookup = {
    val chunkLimit = math.max(chunkBytes, 1L)
    val runs = scala.collection.mutable.ArrayBuffer[java.io.File]()
    val buf = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]()
    var bufBytes = 0L
    def spill(): Unit = if (buf.nonEmpty) {
      val f = java.io.File.createTempFile("graft-eq-run", ".bin")
      f.deleteOnExit()
      val sorted = buf.sortWith((a, b) => java.util.Arrays.compareUnsigned(a._1, b._1) < 0)
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16))
      sorted.foreach { case (k, s) => writeRec(out, k, s) }
      out.close()
      runs += f
      buf.clear(); bufBytes = 0L
    }
    records.foreach { case (k, s) =>
      buf += ((k, s)); bufBytes += k.length + 12
      if (bufBytes >= chunkLimit) spill()
    }
    spill()
    // k-way merge, deduping equal keys to their max sequence
    val dataFile = java.io.File.createTempFile("graft-eq-sst", ".bin")
    val offsetsFile = java.io.File.createTempFile("graft-eq-idx", ".bin")
    dataFile.deleteOnExit(); offsetsFile.deleteOnExit()
    val dataOut = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(dataFile), 1 << 16))
    val offOut = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(offsetsFile), 1 << 16))
    val heap = new java.util.PriorityQueue[RunReader](
      math.max(1, runs.size),
      (a: RunReader, b: RunReader) => java.util.Arrays.compareUnsigned(a.key, b.key))
    runs.foreach { f => val r = new RunReader(f); if (r.key != null) heap.add(r) }
    var n = 0L
    var written = 0L
    // adaptive-stride sampling: every stride-th record enters the sparse
    // index; hitting the BYTE budget halves the index in place and
    // doubles the stride, so heap stays under the budget (not an entry
    // count — wide string keys budget the same as narrow longs) no
    // matter how many records merge out. Primitive-array storage: no
    // boxing, doubling growth, in-place downsample.
    val budget = math.max(sparseBytes, 1L)
    var stride = 1L
    var sLen = 0
    var sBytes = 0L
    var sKeys = new Array[Array[Byte]](1024)
    var sSeqs = new Array[Long](1024)
    var sIdx = new Array[Long](1024)
    def downsample(): Unit = {
      var i = 0
      var w = 0
      var bytes = 0L
      while (i < sLen) {
        sKeys(w) = sKeys(i); sSeqs(w) = sSeqs(i); sIdx(w) = sIdx(i)
        bytes += sKeys(w).length + SparseEntryOverhead
        w += 1; i += 2
      }
      java.util.Arrays.fill(sKeys.asInstanceOf[Array[AnyRef]], w, sLen, null)
      sLen = w
      sBytes = bytes
      stride *= 2
    }
    def sample(key: Array[Byte], seq: Long, idx: Long): Unit = {
      if (sLen == sKeys.length) {
        sKeys = java.util.Arrays.copyOf(sKeys, sLen * 2)
        sSeqs = java.util.Arrays.copyOf(sSeqs, sLen * 2)
        sIdx = java.util.Arrays.copyOf(sIdx, sLen * 2)
      }
      sKeys(sLen) = key; sSeqs(sLen) = seq; sIdx(sLen) = idx
      sLen += 1
      sBytes += key.length + SparseEntryOverhead
      // keep at least two entries so halving always terminates
      if (sBytes > budget && sLen > 2) downsample()
    }
    while (!heap.isEmpty) {
      val top = heap.poll()
      val key = top.key
      var seq = top.seq
      if (top.advance()) heap.add(top)
      // drain every run positioned at the same key
      while (!heap.isEmpty && java.util.Arrays.compareUnsigned(heap.peek().key, key) == 0) {
        val dup = heap.poll()
        if (dup.seq > seq) seq = dup.seq
        if (dup.advance()) heap.add(dup)
      }
      offOut.writeLong(written)
      writeRec(dataOut, key, seq)
      if (n % stride == 0L) sample(key, seq, n)
      written += 4L + key.length + 8
      n += 1
    }
    dataOut.close(); offOut.close()
    new DiskEqLookup(
      dataFile, offsetsFile, n,
      java.util.Arrays.copyOf(sKeys, sLen),
      java.util.Arrays.copyOf(sSeqs, sLen),
      java.util.Arrays.copyOf(sIdx, sLen))
  }
}

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
      conf: Configuration,
      orcFactory: PartitionReaderFactory = null,
      avroFactory: PartitionReaderFactory = null): Array[Long] = {
    if (candidates.isEmpty) return Array.emptyLongArray
    // predicate covers every stored form; rows are still verified below,
    // so a false row-group keep only costs I/O, never correctness
    val pred = pathForms(dataPathNorm)
      .map(f => FilterApi.eq(FilterApi.binaryColumn("file_path"), Binary.fromString(f))
        : org.apache.parquet.filter2.predicate.FilterPredicate)
      .reduce(FilterApi.or)
    val buf = scala.collection.mutable.ArrayBuffer[Long]()
    candidates.foreach { ref =>
      if (ref.seq >= dseq && ref.isVector) {
        // positional blob fetch: I/O is the vector's own bytes, nothing else
        buf ++= graft.tables.Puffin.dvPositions(
          graft.tables.Puffin.readBlob(conf, ref.path, ref.blobOffset, ref.blobLength))
      } else if (ref.seq >= dseq && ref.fmt != "parquet") {
        // foreign-format (ORC/Avro) delete file: no parquet-mr pushdown,
        // but the read still happens EXECUTOR-side through a driver-built
        // row factory — whole-file scan of (file_path, pos), filtered here
        // (foreign deletes are an interop tail; per-task full reads beat
        // stalling the driver on a jumbo foreign set)
        val f = if (ref.fmt == "orc") orcFactory else avroFactory
        require(f != null, s"no reader factory for foreign delete format ${ref.fmt}")
        val reader = f.createReader(
          org.apache.spark.sql.GraftBridge.wholeFilePartition(0, ref.path, ref.size))
        try {
          while (reader.next()) {
            val r = reader.get()
            if (GraftTable.normPathStr(r.getUTF8String(0).toString) == dataPathNorm)
              buf += r.getLong(1)
          }
        } finally reader.close()
      } else if (ref.seq >= dseq) {
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
  def posSeed(path: String, rangeStart: Long, conf: Configuration): Long =
    if (rangeStart == 0L) 0L else seedsForRanges(path, Array(rangeStart), conf)(0)

  /** seeds for MANY ranges of one file with a single footer read — the
    * plan-time path, so range tasks skip the footer entirely */
  def seedsForRanges(path: String, rangeStarts: Array[Long], conf: Configuration): Array[Long] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new HPath(path), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = scala.jdk.CollectionConverters.ListHasAsScala(
        reader.getFooter.getBlocks).asScala
      rangeStarts.map { start =>
        if (start == 0L) 0L
        else blocks.iterator
          .filter(b => b.getStartingPos + b.getCompressedSize / 2 < start)
          .map(_.getRowCount).sum
      }
    } finally reader.close()
  }

  /** Lazy per-scan holder with task leases. The global cache lock covers
    * only map lookup/insert; the (possibly long) delete-file read runs
    * under the HOLDER's lock, so concurrent unrelated scans never
    * serialize behind one scan's build. Eviction RETIRES the holder;
    * the actual close (channel teardown + temp-file delete) happens only
    * once the last leased task completes — never under a live probe. */
  private final class LazyLookups(specs: Array[EqLoadSpec], maxBytes: Long) {
    private var lookups: Array[EqLookup] = _
    private var leases = 0
    private var retired = false

    def acquire(): Array[EqLookup] = {
      val v = synchronized {
        if (lookups == null) lookups = specs.map(loadEqGroup(_, maxBytes))
        leases += 1
        lookups
      }
      // release when the task ends (probes outlive createReader). A
      // non-task caller (driver/test) holds its lease forever — the
      // entry then never closes under it; temp files fall back to
      // deleteOnExit. Correctness over eager cleanup on that rare path.
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => release())
      v
    }

    def release(): Unit = synchronized {
      leases -= 1
      if (retired && leases <= 0 && lookups != null) {
        lookups.foreach(_.close()); lookups = null
      }
    }

    def retire(): Unit = synchronized {
      retired = true
      if (leases <= 0 && lookups != null) {
        lookups.foreach(_.close()); lookups = null
      }
    }
  }

  /** JVM-global LRU of equality-delete lookups keyed by scan signature:
    * one build per executor per scan, shared by its tasks. Bounded at a
    * few concurrent scans; an evicted entry just rebuilds on next access
    * (disk-backed entries delete their temp files once their last task
    * finishes). */
  private val eqCache =
    new java.util.LinkedHashMap[String, LazyLookups](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, LazyLookups]): Boolean = {
        val evict = size > 4
        if (evict) e.getValue.retire()
        evict
      }
    }

  /** equality-delete lookups for the given groups, built once per
    * executor (then cache-shared across this scan's tasks). Groups whose
    * on-disk delete bytes exceed `maxBytes` build the disk-backed
    * [[DiskEqLookup]] instead of a heap map, so executor memory stays
    * bounded at any delete volume. */
  def eqLookups(
      cacheKey: String,
      specs: Array[EqLoadSpec],
      maxBytes: Long): Array[EqLookup] = {
    val holder = eqCache.synchronized {
      val hit = eqCache.get(cacheKey)
      if (hit != null) hit
      else {
        val h = new LazyLookups(specs, maxBytes)
        eqCache.put(cacheKey, h)
        h
      }
    }
    holder.acquire()
  }

  private def loadEqGroup(spec: EqLoadSpec, maxBytes: Long): EqLookup = {
    val proj = UnsafeProjection.create(
      spec.keyTypes.zipWithIndex.map { case (t, i) => BoundReference(i, t, nullable = true) })
    def rows: Iterator[(UnsafeRow, Long)] = spec.files.iterator.flatMap { ref =>
      val reader = spec.factoryFor(ref).createReader(
        org.apache.spark.sql.GraftBridge.wholeFilePartition(0, ref.path, ref.size))
      // hasNext must be idempotent (iterator contract): buffer the
      // lookahead instead of advancing the reader on every call
      new Iterator[(UnsafeRow, Long)] {
        private var open = true
        private var pending = false
        override def hasNext: Boolean = pending || (open && {
          pending = reader.next()
          if (!pending) { reader.close(); open = false }
          pending
        })
        override def next(): (UnsafeRow, Long) = {
          if (!hasNext) throw new NoSuchElementException
          pending = false
          val row: InternalRow = reader.get()
          (proj(row), ref.seq)
        }
      }
    }
    val diskMode = spec.files.map(_.size).sum > maxBytes
    if (diskMode) {
      // canonical UnsafeRow bytes sort/compare exactly like row equality.
      // getBytes may return the projection's LIVE reused buffer — snapshot
      // it, records outlive the current row.
      DiskEqLookup.build(rows.map { case (r, s) =>
        val b = r.getBytes
        (java.util.Arrays.copyOf(b, b.length), s)
      }, math.max(maxBytes, 1L << 20)) // floor: 1 MiB run buffer
    } else {
      val map = new JHashMap[UnsafeRow, java.lang.Long]()
      rows.foreach { case (r, s) =>
        val key = r.copy()
        val prev = map.get(key)
        if (prev == null || prev < s) map.put(key, s)
      }
      new InMemoryEqLookup(map)
    }
  }
}
