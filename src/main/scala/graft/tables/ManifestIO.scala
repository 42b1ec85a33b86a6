package graft.tables

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Avro I/O for manifest files and manifest lists (Iceberg spec; shapes
  * mirrored from icelake/src/types/on_disk/manifest_file.rs and
  * manifest_list.rs, re-expressed over the Java Avro library that ships
  * with Spark).
  *
  * Reading uses the writer schema embedded in each Avro file and resolves
  * fields by name (v1/v2 tolerant); writing emits our v2 schema. */
object ManifestIO {

  // ---------- avro schema construction ----------

  private def nullable(s: Schema): Schema =
    Schema.createUnion(List(Schema.create(Schema.Type.NULL), s).asJava)

  private def field(name: String, id: Int, s: Schema, opt: Boolean): Schema.Field = {
    val f =
      if (opt) new Schema.Field(name, nullable(s), null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(name, s, null, null.asInstanceOf[AnyRef])
    f.addProp("field-id", id: Integer)
    f
  }

  private def longMapSchema(name: String, keyId: Int, valueId: Int): Schema = {
    val kv = Schema.createRecord(s"k${keyId}_v$valueId", null, null, false)
    kv.setFields(List(
      field("key", keyId, Schema.create(Schema.Type.INT), opt = false),
      field("value", valueId, Schema.create(Schema.Type.LONG), opt = false)).asJava)
    Schema.createArray(kv)
  }

  private def bytesMapSchema(keyId: Int, valueId: Int): Schema = {
    val kv = Schema.createRecord(s"k${keyId}_v$valueId", null, null, false)
    kv.setFields(List(
      field("key", keyId, Schema.create(Schema.Type.INT), opt = false),
      field("value", valueId, Schema.create(Schema.Type.BYTES), opt = false)).asJava)
    Schema.createArray(kv)
  }

  /** avro type for a partition value of the given iceberg type */
  private def partitionAvroType(t: IceType): Schema = t match {
    case IcePrim("int") | IcePrim("date") => Schema.create(Schema.Type.INT)
    case IcePrim("long") | IcePrim("time") | IcePrim("timestamp") | IcePrim("timestamptz") |
          IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") =>
      Schema.create(Schema.Type.LONG)
    case IcePrim("float") => Schema.create(Schema.Type.FLOAT)
    case IcePrim("double") => Schema.create(Schema.Type.DOUBLE)
    case IcePrim("boolean") => Schema.create(Schema.Type.BOOLEAN)
    case IcePrim("string") => Schema.create(Schema.Type.STRING)
    // decimal partition values (identity/truncate on a decimal source):
    // the Iceberg spec's Avro mapping is fixed[minBytesFor(P)] with the
    // decimal logical type (NOT bytes — Java Iceberg manifest readers
    // project the spec schema and would reject a bytes-typed field);
    // unscaled value big-endian, sign-extended to the fixed size
    case IceDecimal(p, s) =>
      org.apache.avro.LogicalTypes.decimal(p, s).addToSchema(
        Schema.createFixed(s"decimal_${p}_$s", null, null, decimalFixedBytes(p)))
    case _ => Schema.create(Schema.Type.BYTES)
  }

  /** minimum two's-complement byte size holding any unscaled value of the
    * given precision (the spec's `minBytesFor`): bits = bitLength(10^P - 1) + 1 */
  private[tables] def decimalFixedBytes(precision: Int): Int = {
    val bits = java.math.BigInteger.TEN.pow(precision)
      .subtract(java.math.BigInteger.ONE).bitLength + 1
    (bits + 7) / 8
  }

  /** sign-extend a minimal two's-complement big-endian array to `size` */
  private[tables] def signExtend(bytes: Array[Byte], size: Int): Array[Byte] = {
    if (bytes.length >= size) bytes
    else {
      val out = new Array[Byte](size)
      val sign: Byte = if (bytes.nonEmpty && bytes(0) < 0) -1 else 0
      java.util.Arrays.fill(out, 0, size - bytes.length, sign)
      System.arraycopy(bytes, 0, out, size - bytes.length, bytes.length)
      out
    }
  }

  /** r102: the partition tuple struct for a given spec+schema */
  private def partitionStructSchema(spec: IcePartitionSpec, schema: IceSchema): Schema = {
    val rec = Schema.createRecord("r102", null, null, false)
    rec.setFields(spec.fields.map { pf =>
      val src = schema.fieldById(pf.sourceId)
        .getOrElse(sys.error(s"partition source ${pf.sourceId} not in schema"))
      val resultType = SchemaConvert.transformResultType(pf.transform, src.fieldType)
      field(pf.name, pf.fieldId, partitionAvroType(resultType), opt = true)
    }.asJava)
    rec
  }

  /** data_file record schema; format version 1 has no `content` or
    * `equality_ids` and requires `block_size_in_bytes` (spec evolution
    * rules — v2 removed/added exactly these) */
  private def dataFileSchema(
      spec: IcePartitionSpec, schema: IceSchema, formatVersion: Int = 2,
      withDv: Boolean = false): Schema = {
    val rec = Schema.createRecord("r2", null, null, false)
    val v2Head =
      if (formatVersion >= 2)
        List(field("content", 134, Schema.create(Schema.Type.INT), opt = false))
      else Nil
    // deletion-vector fields (format-v3 field ids) — only emitted into
    // manifests that actually carry a DV entry, so plain tables' on-disk
    // manifests are byte-identical to before
    val dvFields =
      if (withDv)
        List(
          field("referenced_data_file", 143, Schema.create(Schema.Type.STRING), opt = true),
          field("content_offset", 144, Schema.create(Schema.Type.LONG), opt = true),
          field("content_size_in_bytes", 145, Schema.create(Schema.Type.LONG), opt = true))
      else Nil
    val v1Block =
      if (formatVersion == 1)
        List(field("block_size_in_bytes", 105, Schema.create(Schema.Type.LONG), opt = false))
      else Nil
    val v2Tail =
      if (formatVersion >= 2)
        List(field("equality_ids", 135,
          Schema.createArray(Schema.create(Schema.Type.INT)), opt = true))
      else Nil
    rec.setFields((v2Head ++ List(
      field("file_path", 100, Schema.create(Schema.Type.STRING), opt = false),
      field("file_format", 101, Schema.create(Schema.Type.STRING), opt = false),
      field("partition", 102, partitionStructSchema(spec, schema), opt = false),
      field("record_count", 103, Schema.create(Schema.Type.LONG), opt = false),
      field("file_size_in_bytes", 104, Schema.create(Schema.Type.LONG), opt = false)) ++
      v1Block ++ List(
      field("column_sizes", 108, longMapSchema("column_sizes", 117, 118), opt = true),
      field("value_counts", 109, longMapSchema("value_counts", 119, 120), opt = true),
      field("null_value_counts", 110, longMapSchema("null_value_counts", 121, 122), opt = true),
      field("nan_value_counts", 137, longMapSchema("nan_value_counts", 138, 139), opt = true),
      field("distinct_counts", 111, longMapSchema("distinct_counts", 123, 124), opt = true),
      field("lower_bounds", 125, bytesMapSchema(126, 127), opt = true),
      field("upper_bounds", 128, bytesMapSchema(129, 130), opt = true),
      field("split_offsets", 132,
        Schema.createArray(Schema.create(Schema.Type.LONG)), opt = true)) ++
      v2Tail ++ List(
      field("sort_order_id", 140, Schema.create(Schema.Type.INT), opt = true)) ++
      (if (formatVersion >= 3)
        // v3 row lineage: base row id of this file (spec field 142);
        // null = ids unavailable (e.g. an unmaterialized rewrite)
        List(field("first_row_id", 142, Schema.create(Schema.Type.LONG), opt = true))
      else Nil) ++
      dvFields).asJava)
    rec
  }

  /** manifest_entry schema; v1 has no inherited sequence numbers */
  private def manifestEntrySchema(
      spec: IcePartitionSpec, schema: IceSchema, formatVersion: Int = 2,
      withDv: Boolean = false): Schema = {
    val rec = Schema.createRecord("manifest_entry", null, null, false)
    val seqFields =
      if (formatVersion >= 2)
        List(
          field("sequence_number", 3, Schema.create(Schema.Type.LONG), opt = true),
          field("file_sequence_number", 4, Schema.create(Schema.Type.LONG), opt = true))
      else Nil
    rec.setFields((List(
      field("status", 0, Schema.create(Schema.Type.INT), opt = false),
      field("snapshot_id", 1, Schema.create(Schema.Type.LONG), opt = true)) ++
      seqFields :+
      field("data_file", 2, dataFileSchema(spec, schema, formatVersion, withDv), opt = false)).asJava)
    rec
  }

  private val fieldSummarySchema: Schema = {
    val rec = Schema.createRecord("r508", null, null, false)
    rec.setFields(List(
      field("contains_null", 509, Schema.create(Schema.Type.BOOLEAN), opt = false),
      field("lower_bound", 510, Schema.create(Schema.Type.BYTES), opt = true),
      field("upper_bound", 511, Schema.create(Schema.Type.BYTES), opt = true)).asJava)
    rec
  }

  /** v1 manifest lists name the count fields `*_data_files_count` (same
    * field ids); v2 renamed them to `*_files_count` — write each version's
    * own names so external readers of either version see the counts
    * (reference schema: icelake manifest_list.rs). */
  private[tables] def countFieldName(base: String, formatVersion: Int): String =
    if (formatVersion >= 2) s"${base}_files_count" else s"${base}_data_files_count"

  private def manifestListSchema(formatVersion: Int = 2): Schema = {
    val rec = Schema.createRecord("manifest_file", null, null, false)
    val v2Fields =
      if (formatVersion >= 2)
        List(
          field("content", 517, Schema.create(Schema.Type.INT), opt = false),
          field("sequence_number", 515, Schema.create(Schema.Type.LONG), opt = false),
          field("min_sequence_number", 516, Schema.create(Schema.Type.LONG), opt = false))
      else Nil
    rec.setFields((List(
      field("manifest_path", 500, Schema.create(Schema.Type.STRING), opt = false),
      field("manifest_length", 501, Schema.create(Schema.Type.LONG), opt = false),
      field("partition_spec_id", 502, Schema.create(Schema.Type.INT), opt = false)) ++
      v2Fields ++ List(
      field("added_snapshot_id", 503, Schema.create(Schema.Type.LONG), opt = false),
      field(countFieldName("added", formatVersion), 504,
        Schema.create(Schema.Type.INT), opt = false),
      field(countFieldName("existing", formatVersion), 505,
        Schema.create(Schema.Type.INT), opt = false),
      field(countFieldName("deleted", formatVersion), 506,
        Schema.create(Schema.Type.INT), opt = false),
      field("added_rows_count", 512, Schema.create(Schema.Type.LONG), opt = false),
      field("existing_rows_count", 513, Schema.create(Schema.Type.LONG), opt = false),
      field("deleted_rows_count", 514, Schema.create(Schema.Type.LONG), opt = false),
      field("partitions", 507, Schema.createArray(fieldSummarySchema), opt = true))).asJava)
    rec
  }

  // ---------- generic record helpers (read side) ----------

  private def hasField(r: GenericRecord, name: String): Boolean =
    r.getSchema.getField(name) != null

  private def getOpt(r: GenericRecord, name: String): Option[AnyRef] =
    if (!hasField(r, name)) None else Option(r.get(name))

  private def str(r: GenericRecord, name: String): Option[String] =
    getOpt(r, name).map(_.toString)

  private def lng(r: GenericRecord, name: String): Option[Long] =
    getOpt(r, name).map(_.asInstanceOf[Number].longValue)

  private def intOf(r: GenericRecord, name: String): Option[Int] =
    getOpt(r, name).map(_.asInstanceOf[Number].intValue)

  private def longMap(r: GenericRecord, name: String): Map[Int, Long] =
    if (!hasField(r, name)) Map.empty
    else Option(r.get(name)).map {
      case arr: java.util.Collection[_] =>
        arr.asScala.map { e =>
          val kv = e.asInstanceOf[GenericRecord]
          kv.get("key").asInstanceOf[Number].intValue ->
            kv.get("value").asInstanceOf[Number].longValue
        }.toMap
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) =>
          k.toString.toInt -> v.asInstanceOf[Number].longValue }.toMap
      case _ => Map.empty[Int, Long]
    }.getOrElse(Map.empty)

  private def bytesOf(v: Any): Array[Byte] = v match {
    case bb: ByteBuffer =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case arr: Array[Byte] => arr
    case other => other.toString.getBytes("UTF-8")
  }

  private def bytesMap(r: GenericRecord, name: String): Map[Int, Array[Byte]] =
    if (!hasField(r, name)) Map.empty
    else Option(r.get(name)).map {
      case arr: java.util.Collection[_] =>
        arr.asScala.map { e =>
          val kv = e.asInstanceOf[GenericRecord]
          kv.get("key").asInstanceOf[Number].intValue -> bytesOf(kv.get("value"))
        }.toMap
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => k.toString.toInt -> bytesOf(v) }.toMap
      case _ => Map.empty[Int, Array[Byte]]
    }.getOrElse(Map.empty)

  // ---------- public API ----------

  def readBytes(conf: Configuration, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.setVerifyChecksum(false) // fixture tables ship stale .crc sidecars
    val in = fs.open(p)
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def writeBytes(conf: Configuration, path: String, bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(bytes)
    finally out.close()
  }

  private def readAvro(bytes: Array[Byte]): (List[GenericRecord], Map[String, String]) = {
    val reader = new GenericDatumReader[GenericRecord]()
    val stream = new DataFileStream[GenericRecord](
      new java.io.ByteArrayInputStream(bytes), reader)
    try {
      val meta = stream.getMetaKeys.asScala
        .filterNot(_.startsWith("avro."))
        .map(k => k -> new String(stream.getMeta(k), "UTF-8")).toMap
      (stream.iterator().asScala.toList, meta)
    } finally stream.close()
  }

  /** Read a manifest list Avro into entries (v1 and v2 field names). */
  /** Parsed-manifest cache. Manifest and manifest-list files are
    * IMMUTABLE (UUID names, written once, never rewritten in place), so
    * their parsed form caches safely per JVM — repeated planning against
    * a warm snapshot skips the FS read and Avro decode entirely. At
    * 100 TB this is the difference between O(manifests) I/O per QUERY
    * and per PROCESS: a dashboard hammering one table plans from memory.
    * LRU-bounded by file count; executors benefit too (the distributed
    * `files`/`entries` metadata scans reuse hot manifests across tasks).
    * A cached manifest can outlive its file (snapshot expiry deletes
    * manifests) until evicted — a time-travel read of a just-expired
    * snapshot may succeed from cache where a cold process fails; it can
    * never serve wrong content. */
  private val CacheMaxFiles = 256
  private val parseCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, AnyRef](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, AnyRef]): Boolean = size() > CacheMaxFiles
    })

  private def cachedParse[T <: AnyRef](key: String)(load: => T): T = {
    val hit = parseCache.get(key)
    if (hit != null) {
      Metrics.inc(Metrics.ManifestCacheHits)
      hit.asInstanceOf[T]
    } else {
      Metrics.inc(Metrics.ManifestCacheMisses)
      val v = load
      parseCache.put(key, v)
      v
    }
  }

  /** test/ops hook: drop every cached parse */
  def invalidateCache(): Unit = parseCache.clear()

  def readManifestList(conf: Configuration, path: String): List[IceManifestListEntry] =
    cachedParse(s"L|$path")(readManifestListUncached(conf, path))

  private def readManifestListUncached(
      conf: Configuration, path: String): List[IceManifestListEntry] = {
    val (records, _) = readAvro(readBytes(conf, path))
    records.map { r =>
      IceManifestListEntry(
        manifestPath = str(r, "manifest_path").get,
        manifestLength = lng(r, "manifest_length").getOrElse(0L),
        partitionSpecId = intOf(r, "partition_spec_id").getOrElse(0),
        content = if (hasField(r, "content")) intOf(r, "content").getOrElse(0) else 0,
        sequenceNumber =
          if (hasField(r, "sequence_number")) lng(r, "sequence_number").getOrElse(0L) else 0L,
        minSequenceNumber =
          if (hasField(r, "min_sequence_number")) lng(r, "min_sequence_number").getOrElse(0L) else 0L,
        addedSnapshotId = lng(r, "added_snapshot_id").getOrElse(-1L),
        addedFilesCount = intOf(r, "added_files_count")
          .orElse(intOf(r, "added_data_files_count")).getOrElse(0),
        existingFilesCount = intOf(r, "existing_files_count")
          .orElse(intOf(r, "existing_data_files_count")).getOrElse(0),
        deletedFilesCount = intOf(r, "deleted_files_count")
          .orElse(intOf(r, "deleted_data_files_count")).getOrElse(0),
        addedRowsCount = lng(r, "added_rows_count").getOrElse(0L),
        existingRowsCount = lng(r, "existing_rows_count").getOrElse(0L),
        deletedRowsCount = lng(r, "deleted_rows_count").getOrElse(0L),
        partitions = getOpt(r, "partitions").map {
          case arr: java.util.Collection[_] =>
            arr.asScala.toSeq.map { e =>
              val fr = e.asInstanceOf[GenericRecord]
              IceFieldSummary(
                containsNull = Option(fr.get("contains_null"))
                  .exists(_.asInstanceOf[Boolean]),
                lowerBound = Option(fr.get("lower_bound")).map(bytesOf),
                upperBound = Option(fr.get("upper_bound")).map(bytesOf))
            }
          case _ => Nil
        }.getOrElse(Nil))
    }
  }

  /** Read a manifest Avro file into entries. Partition values come back as
    * Seq aligned with the spec fields recorded in the file metadata (or the
    * provided spec when absent). */
  def readManifest(
      conf: Configuration,
      path: String,
      specFieldNames: List[String]): List[IceManifestEntry] =
    // the spec names ride the key: they only matter for files whose avro
    // metadata lacks a recorded partition-spec, but a collision there
    // would silently misalign partition tuples
    cachedParse(s"M|${specFieldNames.mkString(",")}|$path")(
      readManifestUncached(conf, path, specFieldNames))

  private def readManifestUncached(
      conf: Configuration,
      path: String,
      specFieldNames: List[String]): List[IceManifestEntry] = {
    val (records, fileMeta) = readAvro(readBytes(conf, path))
    // partition field names: prefer the spec recorded in the avro user metadata
    val names: List[String] = fileMeta.get("partition-spec").flatMap { json =>
      try {
        val j = org.json4s.jackson.JsonMethods.parse(json)
        val fields = j \ "fields" match {
          case org.json4s.JArray(items) => items
          case _ => j.children
        }
        Some(fields.flatMap(f => (f \ "name") match {
          case org.json4s.JString(s) => Some(s)
          case _ => None
        }))
      } catch { case _: Throwable => None }
    }.getOrElse(specFieldNames)

    records.map { r =>
      val df = r.get("data_file").asInstanceOf[GenericRecord]
      val partRec = Option(df.get("partition")).map(_.asInstanceOf[GenericRecord])
      val partition: Seq[Option[Any]] = partRec match {
        case Some(pr) =>
          names.map { n =>
            val fld = pr.getSchema.getField(n)
            if (fld == null) None
            else {
              // unwrap [null, T] unions, then honor the decimal logical
              // type: partition decimals round-trip as BigDecimal values,
              // not opaque bytes (pruning and tuple equality need values)
              val fs = fld.schema()
              val inner =
                if (fs.getType == Schema.Type.UNION)
                  fs.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(fs)
                else fs
              val dec = inner.getLogicalType match {
                case d: org.apache.avro.LogicalTypes.Decimal => Some(d.getScale)
                case _ => None
              }
              Option(pr.get(n)).map {
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: ByteBuffer if dec.isDefined =>
                  new java.math.BigDecimal(
                    new java.math.BigInteger(bytesOf(bb)), dec.get)
                case bb: ByteBuffer => bytesOf(bb)
                case f: org.apache.avro.generic.GenericFixed if dec.isDefined =>
                  new java.math.BigDecimal(
                    new java.math.BigInteger(f.bytes()), dec.get)
                case other => other
              }
            }
          }
        case None => names.map(_ => None)
      }
      val formatRaw = str(df, "file_format").getOrElse("PARQUET")
      IceManifestEntry(
        status = intOf(r, "status").getOrElse(ManifestStatus.Added),
        snapshotId = lng(r, "snapshot_id"),
        dataSequenceNumber =
          if (hasField(r, "sequence_number")) lng(r, "sequence_number") else None,
        fileSequenceNumber =
          if (hasField(r, "file_sequence_number")) lng(r, "file_sequence_number") else None,
        dataFile = IceDataFile(
          content = if (hasField(df, "content")) intOf(df, "content").getOrElse(0) else 0,
          filePath = str(df, "file_path").get,
          fileFormat = formatRaw.toLowerCase,
          partition = partition,
          recordCount = lng(df, "record_count").getOrElse(0L),
          fileSizeInBytes = lng(df, "file_size_in_bytes").getOrElse(0L),
          columnSizes = longMap(df, "column_sizes"),
          valueCounts = longMap(df, "value_counts"),
          nullValueCounts = longMap(df, "null_value_counts"),
          nanValueCounts = longMap(df, "nan_value_counts"),
          distinctCounts = longMap(df, "distinct_counts"),
          lowerBounds = bytesMap(df, "lower_bounds"),
          upperBounds = bytesMap(df, "upper_bounds"),
          splitOffsets = Option(if (hasField(df, "split_offsets")) df.get("split_offsets") else null)
            .map(_.asInstanceOf[java.util.Collection[_]].asScala.toSeq
              .map(_.asInstanceOf[Number].longValue)).getOrElse(Nil),
          equalityIds = Option(if (hasField(df, "equality_ids")) df.get("equality_ids") else null)
            .map(_.asInstanceOf[java.util.Collection[_]].asScala.toSeq
              .map(_.asInstanceOf[Number].intValue)).getOrElse(Nil),
          sortOrderId = if (hasField(df, "sort_order_id")) intOf(df, "sort_order_id") else None,
          referencedDataFile =
            if (hasField(df, "referenced_data_file")) str(df, "referenced_data_file") else None,
          contentOffset =
            if (hasField(df, "content_offset")) lng(df, "content_offset") else None,
          contentSizeInBytes =
            if (hasField(df, "content_size_in_bytes")) lng(df, "content_size_in_bytes") else None,
          firstRowId =
            if (hasField(df, "first_row_id")) lng(df, "first_row_id") else None))
    }
  }

  // ---------- write side ----------

  private def longMapRecord(s: Schema, m: Map[Int, Long]): AnyRef = {
    val elemSchema = s.getElementType
    val arr = new GenericData.Array[GenericRecord](m.size, s)
    m.toList.sortBy(_._1).foreach { case (k, v) =>
      val rec = new GenericData.Record(elemSchema)
      rec.put("key", k: Integer)
      rec.put("value", v: java.lang.Long)
      arr.add(rec)
    }
    arr
  }

  private def bytesMapRecord(s: Schema, m: Map[Int, Array[Byte]]): AnyRef = {
    val elemSchema = s.getElementType
    val arr = new GenericData.Array[GenericRecord](m.size, s)
    m.toList.sortBy(_._1).foreach { case (k, v) =>
      val rec = new GenericData.Record(elemSchema)
      rec.put("key", k: Integer)
      rec.put("value", ByteBuffer.wrap(v))
      arr.add(rec)
    }
    arr
  }

  private def unwrapNullable(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Write a manifest Avro file; returns (fileLength, entry counts). */
  def writeManifest(
      conf: Configuration,
      path: String,
      entries: List[IceManifestEntry],
      spec: IcePartitionSpec,
      schema: IceSchema,
      content: Int,
      formatVersion: Int = 2): IceManifestListEntry = {
    val withDv = entries.exists(_.dataFile.referencedDataFile.isDefined)
    val entrySchema = manifestEntrySchema(spec, schema, formatVersion, withDv)
    val out = new ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    writer.setMeta("format-version", formatVersion.toString)
    writer.setMeta("content", if (content == 0) "data" else "deletes")
    writer.setMeta("schema",
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(MetadataJson.schemaToJson(schema))))
    writer.setMeta("partition-spec", {
      import org.json4s.JsonDSL._
      org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
        org.json4s.JArray(spec.fields.map { f =>
          (("source-id" -> f.sourceId): org.json4s.JObject) ~
            ("field-id" -> f.fieldId) ~ ("transform" -> f.transform) ~ ("name" -> f.name)
        })))
    })
    writer.setMeta("partition-spec-id", spec.specId.toString)
    writer.create(entrySchema, out)

    val dfSchema = unwrapNullable(entrySchema.getField("data_file").schema())
    val partSchema = unwrapNullable(dfSchema.getField("partition").schema())

    entries.foreach { e =>
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", e.status: Integer)
      e.snapshotId.foreach(v => rec.put("snapshot_id", v: java.lang.Long))
      if (formatVersion >= 2) {
        e.dataSequenceNumber.foreach(v => rec.put("sequence_number", v: java.lang.Long))
        e.fileSequenceNumber.foreach(v => rec.put("file_sequence_number", v: java.lang.Long))
      }
      val df = new GenericData.Record(dfSchema)
      val d = e.dataFile
      if (formatVersion >= 2) df.put("content", d.content: Integer)
      else df.put("block_size_in_bytes", 67108864L: java.lang.Long)
      df.put("file_path", d.filePath)
      df.put("file_format", d.fileFormat.toUpperCase)
      val part = new GenericData.Record(partSchema)
      spec.fields.zip(d.partition).foreach { case (pf, v) =>
        // decimals land in the spec-mandated fixed[n] slot, unscaled
        // big-endian sign-extended to the fixed size
        def decimalFixed(bd: java.math.BigDecimal): AnyRef = {
          val fs = unwrapNullable(partSchema.getField(pf.name).schema())
          val raw = bd.unscaledValue.toByteArray
          if (fs.getType == Schema.Type.FIXED)
            new GenericData.Fixed(fs, signExtend(raw, fs.getFixedSize))
          else ByteBuffer.wrap(raw)
        }
        part.put(pf.name, v.orNull match {
          case b: Array[Byte] => ByteBuffer.wrap(b)
          case bd: java.math.BigDecimal => decimalFixed(bd)
          case sd: org.apache.spark.sql.types.Decimal =>
            decimalFixed(sd.toJavaBigDecimal)
          case other => other
        })
      }
      df.put("partition", part)
      df.put("record_count", d.recordCount: java.lang.Long)
      df.put("file_size_in_bytes", d.fileSizeInBytes: java.lang.Long)
      if (d.columnSizes.nonEmpty)
        df.put("column_sizes", longMapRecord(
          unwrapNullable(dfSchema.getField("column_sizes").schema()), d.columnSizes))
      if (d.valueCounts.nonEmpty)
        df.put("value_counts", longMapRecord(
          unwrapNullable(dfSchema.getField("value_counts").schema()), d.valueCounts))
      if (d.nullValueCounts.nonEmpty)
        df.put("null_value_counts", longMapRecord(
          unwrapNullable(dfSchema.getField("null_value_counts").schema()), d.nullValueCounts))
      if (d.nanValueCounts.nonEmpty)
        df.put("nan_value_counts", longMapRecord(
          unwrapNullable(dfSchema.getField("nan_value_counts").schema()), d.nanValueCounts))
      if (d.distinctCounts.nonEmpty)
        df.put("distinct_counts", longMapRecord(
          unwrapNullable(dfSchema.getField("distinct_counts").schema()), d.distinctCounts))
      if (d.lowerBounds.nonEmpty)
        df.put("lower_bounds", bytesMapRecord(
          unwrapNullable(dfSchema.getField("lower_bounds").schema()), d.lowerBounds))
      if (d.upperBounds.nonEmpty)
        df.put("upper_bounds", bytesMapRecord(
          unwrapNullable(dfSchema.getField("upper_bounds").schema()), d.upperBounds))
      if (d.splitOffsets.nonEmpty)
        df.put("split_offsets", d.splitOffsets.map(java.lang.Long.valueOf).asJava)
      if (formatVersion >= 2 && d.equalityIds.nonEmpty)
        df.put("equality_ids", d.equalityIds.map(Integer.valueOf).asJava)
      d.sortOrderId.foreach(v => df.put("sort_order_id", v: Integer))
      if (formatVersion >= 3)
        d.firstRowId.foreach(v => df.put("first_row_id", v: java.lang.Long))
      if (withDv) {
        d.referencedDataFile.foreach(v => df.put("referenced_data_file", v))
        d.contentOffset.foreach(v => df.put("content_offset", v: java.lang.Long))
        d.contentSizeInBytes.foreach(v => df.put("content_size_in_bytes", v: java.lang.Long))
      }
      rec.put("data_file", df)
      writer.append(rec)
    }
    writer.close()
    val bytes = out.toByteArray
    writeBytes(conf, path, bytes)

    val added = entries.filter(_.status == ManifestStatus.Added)
    val existing = entries.filter(_.status == ManifestStatus.Existing)
    val deleted = entries.filter(_.status == ManifestStatus.Deleted)
    val seqs = entries.flatMap(_.dataSequenceNumber)
    // per-partition-field min/max summaries for manifest-level pruning
    val summaries: Seq[IceFieldSummary] = spec.fields.zipWithIndex.map { case (pf, idx) =>
      val src = schema.fieldById(pf.sourceId)
      val resultType = src.map(f => SchemaConvert.transformResultType(pf.transform, f.fieldType))
      val values = entries.map(_.dataFile.partition.lift(idx).flatten)
      val present = values.flatten
      def enc(v: Any): Option[Array[Byte]] =
        resultType.flatMap(t => try Some(SingleValue.encode(t, v)) catch {
          case _: Throwable => None })
      val ordered = present.sortWith((a, b) => PruneEval.compareValues(a, b) < 0)
      IceFieldSummary(
        containsNull = values.exists(_.isEmpty),
        lowerBound = ordered.headOption.flatMap(enc),
        upperBound = ordered.lastOption.flatMap(enc))
    }
    IceManifestListEntry(
      manifestPath = path,
      manifestLength = bytes.length.toLong,
      partitionSpecId = spec.specId,
      content = content,
      sequenceNumber = if (seqs.nonEmpty) seqs.max else 0L,
      minSequenceNumber = if (seqs.nonEmpty) seqs.min else 0L,
      addedSnapshotId = entries.flatMap(_.snapshotId).headOption.getOrElse(-1L),
      addedFilesCount = added.size,
      existingFilesCount = existing.size,
      deletedFilesCount = deleted.size,
      addedRowsCount = added.map(_.dataFile.recordCount).sum,
      existingRowsCount = existing.map(_.dataFile.recordCount).sum,
      deletedRowsCount = deleted.map(_.dataFile.recordCount).sum,
      partitions = summaries)
  }

  def writeManifestList(
      conf: Configuration,
      path: String,
      entries: List[IceManifestListEntry],
      snapshotId: Long,
      parentSnapshotId: Option[Long],
      sequenceNumber: Long,
      formatVersion: Int = 2): Unit = {
    val listSchema = manifestListSchema(formatVersion)
    val out = new ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    writer.setMeta("snapshot-id", snapshotId.toString)
    writer.setMeta("sequence-number", sequenceNumber.toString)
    parentSnapshotId.foreach(p => writer.setMeta("parent-snapshot-id", p.toString))
    writer.setMeta("format-version", formatVersion.toString)
    writer.create(listSchema, out)
    entries.foreach { e =>
      val rec = new GenericData.Record(listSchema)
      rec.put("manifest_path", e.manifestPath)
      rec.put("manifest_length", e.manifestLength: java.lang.Long)
      rec.put("partition_spec_id", e.partitionSpecId: Integer)
      if (formatVersion >= 2) {
        rec.put("content", e.content: Integer)
        rec.put("sequence_number", e.sequenceNumber: java.lang.Long)
        rec.put("min_sequence_number", e.minSequenceNumber: java.lang.Long)
      }
      rec.put("added_snapshot_id", e.addedSnapshotId: java.lang.Long)
      rec.put(countFieldName("added", formatVersion), e.addedFilesCount: Integer)
      rec.put(countFieldName("existing", formatVersion), e.existingFilesCount: Integer)
      rec.put(countFieldName("deleted", formatVersion), e.deletedFilesCount: Integer)
      rec.put("added_rows_count", e.addedRowsCount: java.lang.Long)
      rec.put("existing_rows_count", e.existingRowsCount: java.lang.Long)
      rec.put("deleted_rows_count", e.deletedRowsCount: java.lang.Long)
      if (e.partitions.nonEmpty) {
        val arrSchema = unwrapNullable(listSchema.getField("partitions").schema())
        val arr = new GenericData.Array[GenericRecord](e.partitions.size, arrSchema)
        e.partitions.foreach { fsum =>
          val fr = new GenericData.Record(arrSchema.getElementType)
          fr.put("contains_null", fsum.containsNull: java.lang.Boolean)
          fsum.lowerBound.foreach(b => fr.put("lower_bound", ByteBuffer.wrap(b)))
          fsum.upperBound.foreach(b => fr.put("upper_bound", ByteBuffer.wrap(b)))
          arr.add(fr)
        }
        rec.put("partitions", arr)
      }
      writer.append(rec)
    }
    writer.close()
    writeBytes(conf, path, out.toByteArray)
  }
}
