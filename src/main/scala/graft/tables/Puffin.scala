package graft.tables

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Puffin file format (the Iceberg "Puffin" spec: a container of typed
  * binary blobs with a JSON footer) plus the `deletion-vector-v1` blob
  * codec of Iceberg format v3 — position deletes as compressed bitmaps,
  * one blob per referenced data file.
  *
  * Layout written here, per the public spec:
  * {{{
  *   Magic  Blob1 ... BlobN  Magic FooterPayload(JSON) PayloadSize(i32 LE) Flags(4B) Magic
  * }}}
  * The footer payload is uncompressed UTF-8 JSON (flags = 0):
  * `{"blobs": [{"type", "fields", "snapshot-id", "sequence-number",
  * "offset", "length", "properties"}...], "properties": {...}}`.
  *
  * A `deletion-vector-v1` blob body is
  * `len(i32 BE) | magic D1 D3 39 64 | portable 64-bit roaring bitmap |
  * crc32(magic+bitmap) (i32 BE)` with blob properties
  * `referenced-data-file` and `cardinality`. The bitmap serialization is
  * the cross-implementation "portable" format
  * (`Roaring64NavigableMap.serializePortable`).
  *
  * (Reference context: the reference engine predates Iceberg v3 and keeps
  * position deletes as parquet files only — e.g. its delete-file writers in
  * icelake/src/io/file_writer/position_delete_writer.rs; deletion vectors
  * are this engine's scale path for MoR-heavy tables: one compact blob per
  * data file instead of an accumulation of small delete files.) */
object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte) // "PFA1"
  private val DvMagic: Array[Byte] =
    Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)
  val DeletionVectorV1 = "deletion-vector-v1"
  val ThetaSketchV1 = "apache-datasketches-theta-v1"

  /** footer metadata of one blob (offset/length point into the file) */
  case class BlobMeta(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String])

  /** one blob to write: (type, schema field ids, properties, body bytes) */
  case class BlobInput(
      blobType: String,
      fields: Seq[Int],
      properties: Map[String, String],
      body: Array[Byte])

  /** Write a puffin file; returns (total file length, per-blob footer
    * metadata with resolved offsets, in input order). `snapshotId` and
    * `sequenceNumber` stamp every blob's footer entry; the AUTHORITATIVE
    * sequence of a deletion vector is its manifest entry's (the footer
    * copy is informational, like Iceberg's own writers emit). */
  def write(
      conf: Configuration,
      path: String,
      blobs: Seq[BlobInput],
      snapshotId: Long = -1L,
      sequenceNumber: Long = -1L,
      fileProperties: Map[String, String] = Map.empty): (Long, Seq[BlobMeta]) = {
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val metas = blobs.map { b =>
      val off = out.size().toLong
      out.write(b.body)
      BlobMeta(b.blobType, b.fields, snapshotId, sequenceNumber,
        off, b.body.length.toLong, b.properties)
    }
    out.write(Magic)
    val payload = footerJson(metas, fileProperties)
    out.write(payload)
    val trailer = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    trailer.putInt(payload.length)
    trailer.putInt(0) // flags: footer payload not compressed
    out.write(trailer.array())
    out.write(Magic)
    val bytes = out.toByteArray
    ManifestIO.writeBytes(conf, path, bytes)
    (bytes.length.toLong, metas)
  }

  private def footerJson(metas: Seq[BlobMeta], props: Map[String, String]): Array[Byte] = {
    val json: JObject =
      ("blobs" -> metas.map { m =>
        (("type" -> m.blobType): JObject) ~
          ("fields" -> m.fields) ~
          ("snapshot-id" -> m.snapshotId) ~
          ("sequence-number" -> m.sequenceNumber) ~
          ("offset" -> m.offset) ~
          ("length" -> m.length) ~
          ("properties" -> m.properties)
      }) ~ ("properties" -> props)
    JsonMethods.compact(JsonMethods.render(json)).getBytes(StandardCharsets.UTF_8)
  }

  /** Read the footer: (blob metadata in file order, file properties). */
  def readFooter(conf: Configuration, path: String): (Seq[BlobMeta], Map[String, String]) = {
    val bytes = ManifestIO.readBytes(conf, path)
    require(bytes.length >= 20, s"not a puffin file (too short): $path")
    def magicAt(off: Int): Boolean =
      bytes(off) == Magic(0) && bytes(off + 1) == Magic(1) &&
        bytes(off + 2) == Magic(2) && bytes(off + 3) == Magic(3)
    require(magicAt(0) && magicAt(bytes.length - 4), s"bad puffin magic: $path")
    val bb = ByteBuffer.wrap(bytes, bytes.length - 12, 8).order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = bb.getInt
    val flags = bb.getInt
    require((flags & 1) == 0, s"compressed puffin footer unsupported: $path")
    val payloadStart = bytes.length - 12 - payloadSize
    require(payloadStart >= 8 && magicAt(payloadStart - 4),
      s"corrupt puffin footer framing: $path")
    val json = JsonMethods.parse(
      new String(bytes, payloadStart, payloadSize, StandardCharsets.UTF_8))
    val blobs = (json \ "blobs").children.map { b =>
      BlobMeta(
        blobType = (b \ "type").extractOpt[String](DefaultFormats, manifest[String])
          .getOrElse(sys.error("blob without type")),
        fields = (b \ "fields").children.collect { case JInt(i) => i.toInt },
        snapshotId = longOf(b \ "snapshot-id"),
        sequenceNumber = longOf(b \ "sequence-number"),
        offset = longOf(b \ "offset"),
        length = longOf(b \ "length"),
        properties = (b \ "properties") match {
          case JObject(kv) => kv.collect { case (k, JString(v)) => k -> v }.toMap
          case _ => Map.empty
        })
    }
    val props = (json \ "properties") match {
      case JObject(kv) => kv.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    (blobs, props)
  }

  private def longOf(v: JValue): Long = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case _ => -1L
  }

  /** Positional read of one blob's body — the per-task path: a scan task
    * reading data file F fetches exactly F's deletion vector
    * (content_offset/content_size from the manifest entry), never the
    * whole puffin file. */
  def readBlob(conf: Configuration, path: String, offset: Long, length: Long): Array[Byte] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](length.toInt)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  // ---------- deletion-vector-v1 codec ----------

  /** serialize a position bitmap into a `deletion-vector-v1` blob body */
  def dvEncode(bitmap: Roaring64NavigableMap): Array[Byte] = {
    bitmap.runOptimize()
    val body = new ByteArrayOutputStream()
    val dos = new DataOutputStream(body)
    bitmap.serializePortable(dos)
    dos.flush()
    val vec = body.toByteArray
    val crc = new CRC32()
    crc.update(DvMagic)
    crc.update(vec)
    val out = ByteBuffer.allocate(4 + 4 + vec.length + 4).order(ByteOrder.BIG_ENDIAN)
    out.putInt(4 + vec.length)
    out.put(DvMagic)
    out.put(vec)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** decode + verify a `deletion-vector-v1` blob body */
  def dvDecode(blob: Array[Byte]): Roaring64NavigableMap = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val len = bb.getInt
    require(len == blob.length - 8,
      s"deletion vector length mismatch: header $len vs body ${blob.length - 8}")
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(java.util.Arrays.equals(magic, DvMagic), "bad deletion-vector magic")
    val vec = new Array[Byte](len - 4)
    bb.get(vec)
    val stored = bb.getInt
    val crc = new CRC32()
    crc.update(DvMagic)
    crc.update(vec)
    require(crc.getValue.toInt == stored, "deletion vector CRC mismatch")
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(new DataInputStream(new java.io.ByteArrayInputStream(vec)))
    bm
  }

  /** positions of a DV blob as a sorted array (bounded by the blob's
    * cardinality — callers on row-scale paths stream via [[dvDecode]]'s
    * iterator instead when they can) */
  def dvPositions(blob: Array[Byte]): Array[Long] = {
    val bm = dvDecode(blob)
    val out = new Array[Long](bm.getLongCardinality.toInt)
    val it = bm.getLongIterator
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}
