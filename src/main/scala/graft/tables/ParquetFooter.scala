package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.Util
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.{FileMetaData, ParquetMetadata}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Footer restamping for v3 nanosecond timestamps.
  *
  * Spark has no nanosecond timestamp type, so `timestamp_ns` /
  * `timestamptz_ns` columns ride the write path as plain LongType and the
  * parquet files come out annotation-free (`int64`). In-engine reads are
  * lossless anyway (field-id resolution knows the Iceberg type), but a
  * CROSS-ENGINE reader sees a bare long. This utility rewrites just the
  * FOOTER after the write, attaching `TIMESTAMP(NANOS, adjusted)` to the
  * ns columns — the physical type (int64, signed order) is unchanged, so
  * row groups, page offsets, statistics and column-chunk metadata stay
  * byte-identical; only the tail of the file is replaced.
  *
  * I/O cost: the data pages are never read or copied on local/posix-like
  * filesystems (in-place tail swap via setLength); filesystems without
  * random writes fall back to a stream copy + atomic rename (one extra
  * file pass, ns tables only — acceptable for an interop nicety, and
  * object-store writers would land the annotation at upload time anyway).
  *
  * Reference context: v3 nanosecond timestamps are first-class types in
  * the table spec (SURVEY §2.22); the reference engine predates v3 and
  * has no ns write path at all. */
object ParquetFooter {

  private val Magic = "PAR1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** attach TIMESTAMP(NANOS) annotations to the named int64 columns;
    * `nsFields` maps column name -> isAdjustedToUTC (timestamptz_ns). */
  def stampNanos(
      conf: Configuration,
      path: String,
      nsFields: Map[String, Boolean]): Unit = {
    if (nsFields.isEmpty) return
    val hp = new Path(path)
    val fs = hp.getFileSystem(conf)
    val fileLen = fs.getFileStatus(hp).getLen

    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(hp, conf))
    val footer: ParquetMetadata =
      try reader.getFooter
      finally reader.close()
    val schema = footer.getFileMetaData.getSchema
    val stamped = restamp(schema, nsFields)
    if (stamped.equals(schema)) return // already annotated

    val newFooter = new ParquetMetadata(
      new FileMetaData(
        stamped,
        footer.getFileMetaData.getKeyValueMetaData,
        footer.getFileMetaData.getCreatedBy),
      footer.getBlocks)
    val thrift = new ParquetMetadataConverter()
      .toParquetMetadata(org.apache.parquet.hadoop.ParquetFileWriter.CURRENT_VERSION, newFooter)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      Util.writeFileMetaData(thrift, bos)
      bos.toByteArray
    }

    // locate the old footer: ... [footer bytes] [len LE 4B] [PAR1] —
    // verify the trailing magic and that the length lands inside the
    // file BEFORE rewriting anything (a bogus tail must fail loudly,
    // not seed a corrupting in-place write)
    val oldLen = {
      val in = fs.open(hp)
      try {
        in.seek(fileLen - 8)
        val b = new Array[Byte](8)
        in.readFully(b)
        require(b(4) == Magic(0) && b(5) == Magic(1) &&
          b(6) == Magic(2) && b(7) == Magic(3),
          s"$path does not end in PAR1 — refusing to stamp")
        ((b(0) & 0xff)) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
      } finally in.close()
    }
    val footerStart = fileLen - 8 - oldLen
    require(oldLen > 0 && footerStart >= Magic.length,
      s"corrupt parquet footer length $oldLen in $path — refusing to stamp")
    val lenLe = Array[Byte](
      (bytes.length & 0xff).toByte, ((bytes.length >> 8) & 0xff).toByte,
      ((bytes.length >> 16) & 0xff).toByte, ((bytes.length >> 24) & 0xff).toByte)

    val local = Option(hp.toUri.getScheme).forall(s => s == "file" || s.isEmpty)
    if (local) {
      // crash-atomic tail swap: copy the data region + new tail to a
      // sibling temp file, then ATOMIC_MOVE over the original — a kill
      // mid-stamp leaves the original file intact (the old in-place
      // RandomAccessFile write could truncate/corrupt it). Costs one
      // sequential re-copy of a file we just wrote (page cache warm).
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val src = Paths.get(hp.toUri.getPath)
      val tmp = src.resolveSibling(s".${hp.getName}.nsstamp.tmp")
      val inCh = java.nio.channels.FileChannel.open(src)
      val outCh = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        var pos = 0L
        while (pos < footerStart)
          pos += inCh.transferTo(pos, footerStart - pos, outCh)
        outCh.write(java.nio.ByteBuffer.wrap(bytes))
        outCh.write(java.nio.ByteBuffer.wrap(lenLe))
        outCh.write(java.nio.ByteBuffer.wrap(Magic))
      } finally { inCh.close(); outCh.close() }
      Files.move(tmp, src,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    } else {
      // generic filesystems: stream-copy the data region, new tail, rename
      val tmp = new Path(hp.getParent, s".${hp.getName}.nsstamp.tmp")
      val in = fs.open(hp)
      val out = fs.create(tmp, true)
      try {
        val buf = new Array[Byte](1 << 20)
        var remaining = footerStart
        while (remaining > 0) {
          val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          require(n > 0, s"unexpected EOF copying $path")
          out.write(buf, 0, n)
          remaining -= n
        }
        out.write(bytes); out.write(lenLe); out.write(Magic)
      } finally { in.close(); out.close() }
      // overwrite-rename where the filesystem supports it (no window in
      // which the data file does not exist); fall back to delete+rename —
      // safe here because stamping happens pre-commit, so a lost file
      // fails the (retryable) write job rather than the table
      try {
        org.apache.hadoop.fs.FileContext.getFileContext(hp.toUri, conf)
          .rename(tmp, hp, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: UnsupportedOperationException =>
          fs.delete(hp, false)
          require(fs.rename(tmp, hp), s"rename $tmp -> $hp failed")
      }
    }
  }

  /** rebuild the message type with ns annotations on matching int64
    * leaves (top level and nested groups; names are dot-joined) */
  private def restamp(schema: MessageType, nsFields: Map[String, Boolean]): MessageType = {
    def walk(t: Type, prefix: String): Type = t match {
      case p: PrimitiveType
          if p.getPrimitiveTypeName == PrimitiveTypeName.INT64 &&
            nsFields.contains(prefix + p.getName) =>
        val b = org.apache.parquet.schema.Types
          .primitive(PrimitiveTypeName.INT64, p.getRepetition)
          .as(LogicalTypeAnnotation.timestampType(
            nsFields(prefix + p.getName), LogicalTypeAnnotation.TimeUnit.NANOS))
        (if (p.getId != null) b.id(p.getId.intValue()) else b).named(p.getName)
      case g: GroupType if !g.isInstanceOf[MessageType] =>
        val kids = g.getFields.asScala.map(walk(_, s"$prefix${g.getName}.")).asJava
        g.withNewFields(kids)
      case other => other
    }
    new MessageType(
      schema.getName,
      schema.getFields.asScala.map(walk(_, "")).asJava)
  }
}
