package graft.tables

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON codec for `vN.metadata.json` (Iceberg table-metadata spec; format
  * shapes mirrored from the reference's on-disk model,
  * icelake/src/types/on_disk/table_metadata.rs). Reads v1 and v2, writes v2. */
object MetadataJson {

  // ---------- types ----------

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r

  def parseType(v: JValue): IceType = v match {
    case JString(DecimalRe(p, s)) => IceDecimal(p.toInt, s.toInt)
    case JString(FixedRe(l)) => IceFixed(l.toInt)
    case JString(s) => IcePrim(s)
    case obj: JObject =>
      (obj \ "type") match {
        case JString("struct") =>
          IceStruct((obj \ "fields").children.map(parseField))
        case JString("list") =>
          IceList(
            intOf(obj \ "element-id"),
            parseType(obj \ "element"),
            boolOf(obj \ "element-required", default = true))
        case JString("map") =>
          IceMap(
            intOf(obj \ "key-id"),
            parseType(obj \ "key"),
            intOf(obj \ "value-id"),
            parseType(obj \ "value"),
            boolOf(obj \ "value-required", default = true))
        case other => sys.error(s"unknown complex type: $other")
      }
    case other => sys.error(s"unknown type json: $other")
  }

  def typeToJson(t: IceType): JValue = t match {
    case IcePrim(n) => JString(n)
    case d: IceDecimal => JString(d.repr)
    case f: IceFixed => JString(f.repr)
    case IceStruct(fields) =>
      JObject("type" -> JString("struct"), "fields" -> JArray(fields.map(fieldToJson)))
    case IceList(eid, e, req) =>
      JObject(
        "type" -> JString("list"),
        "element-id" -> JInt(eid),
        "element" -> typeToJson(e),
        "element-required" -> JBool(req))
    case IceMap(kid, k, vid, vv, req) =>
      JObject(
        "type" -> JString("map"),
        "key-id" -> JInt(kid),
        "key" -> typeToJson(k),
        "value-id" -> JInt(vid),
        "value" -> typeToJson(vv),
        "value-required" -> JBool(req))
  }

  /** default values (initial-default / write-default) carried as plain
    * JSON scalars, decoded per the field's own type */
  private def parseDefault(v: JValue): Option[Any] = v match {
    case JInt(i) => Some(i.toLong)
    case JLong(l) => Some(l)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case JString(s) => Some(s)
    case JBool(b) => Some(b)
    case _ => None
  }

  private def defaultToJson(v: Any): JValue = v match {
    case i: Int => JLong(i.toLong)
    case l: Long => JLong(l)
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case other => JString(other.toString)
  }

  private def parseField(v: JValue): IceField =
    IceField(
      id = intOf(v \ "id"),
      name = strOf(v \ "name"),
      required = boolOf(v \ "required", default = false),
      fieldType = parseType(v \ "type"),
      doc = (v \ "doc").toOption.collect { case JString(s) => s },
      initialDefault = (v \ "initial-default").toOption.flatMap(parseDefault),
      writeDefault = (v \ "write-default").toOption.flatMap(parseDefault))

  private def fieldToJson(f: IceField): JValue =
    JObject(
      List(
        "id" -> JInt(f.id),
        "name" -> JString(f.name),
        "required" -> JBool(f.required),
        "type" -> typeToJson(f.fieldType)) ++
        f.doc.map(d => "doc" -> JString(d): (String, JValue)).toList ++
        f.initialDefault.map(d => "initial-default" -> defaultToJson(d)).toList ++
        f.writeDefault.map(d => "write-default" -> defaultToJson(d)).toList)

  def parseSchema(v: JValue): IceSchema =
    IceSchema(
      schemaId = intOf(v \ "schema-id", default = Some(0)),
      fields = (v \ "fields").children.map(parseField),
      identifierFieldIds = (v \ "identifier-field-ids").toOption
        .map(_.children.map(intOf(_))).getOrElse(Nil))

  def schemaToJson(s: IceSchema): JValue =
    JObject(
      List[(String, JValue)](
        "type" -> JString("struct"),
        "schema-id" -> JInt(s.schemaId),
        "fields" -> JArray(s.fields.map(fieldToJson))) ++
      (if (s.identifierFieldIds.nonEmpty)
        List("identifier-field-ids" ->
          (JArray(s.identifierFieldIds.map(JInt(_))): JValue))
      else Nil))

  // ---------- helpers ----------

  private def intOf(v: JValue, default: Option[Int] = None): Int = v match {
    case JInt(i) => i.toInt
    case JLong(l) => l.toInt
    case _ => default.getOrElse(sys.error(s"expected int, got $v"))
  }
  private def longOf(v: JValue, default: Option[Long] = None): Long = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case _ => default.getOrElse(sys.error(s"expected long, got $v"))
  }
  private def strOf(v: JValue): String = v match {
    case JString(s) => s
    case _ => sys.error(s"expected string, got $v")
  }
  private def boolOf(v: JValue, default: Boolean): Boolean = v match {
    case JBool(b) => b
    case _ => default
  }
  private def optLong(v: JValue): Option[Long] = v match {
    case JInt(i) => Some(i.toLong)
    case JLong(l) => Some(l)
    case _ => None
  }
  private def strMap(v: JValue): Map[String, String] = v match {
    case JObject(fields) =>
      fields.collect { case (k, JString(s)) => k -> s }.toMap
    case _ => Map.empty
  }

  // ---------- table metadata ----------

  /** Transparent gunzip: `write.metadata.compression-codec=gzip` tables
    * name their files `vN.gz.metadata.json`, but sniffing the gzip magic
    * makes every reader agnostic to naming (mis-suffixed files still
    * load, matching Iceberg's TableMetadataParser tolerance). */
  private def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes

  /** Gzip bytes for a `.gz.metadata.json` target. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    try out.write(bytes) finally out.close()
    bos.toByteArray
  }

  def parse(jsonBytes: Array[Byte]): TableMetadata = {
    val j = JsonMethods.parse(new String(gunzipIfNeeded(jsonBytes), "UTF-8"))
    val formatVersion = intOf(j \ "format-version")

    val schemas: List[IceSchema] = (j \ "schemas") match {
      case JArray(items) => items.map(parseSchema)
      case _ => // v1 single "schema"
        (j \ "schema").toOption.map(s => List(parseSchema(s))).getOrElse(Nil)
    }
    val currentSchemaId = intOf(j \ "current-schema-id",
      default = Some(schemas.headOption.map(_.schemaId).getOrElse(0)))

    val specs: List[IcePartitionSpec] = (j \ "partition-specs") match {
      case JArray(items) =>
        items.map { sp =>
          IcePartitionSpec(
            intOf(sp \ "spec-id", default = Some(0)),
            (sp \ "fields").children.map(parsePartitionField))
        }
      case _ => // v1 "partition-spec" (flat field list, spec id 0)
        (j \ "partition-spec").toOption.map { sp =>
          List(IcePartitionSpec(0, sp.children.map(parsePartitionField)))
        }.getOrElse(List(IcePartitionSpec(0, Nil)))
    }

    val snapshots = (j \ "snapshots").children.map { s =>
      IceSnapshot(
        snapshotId = longOf(s \ "snapshot-id"),
        parentSnapshotId = optLong(s \ "parent-snapshot-id"),
        sequenceNumber = longOf(s \ "sequence-number", default = Some(0L)),
        timestampMs = longOf(s \ "timestamp-ms"),
        manifestList = strOf(s \ "manifest-list"),
        summary = strMap(s \ "summary"),
        schemaId = (s \ "schema-id").toOption.flatMap(v => optLong(v)).map(_.toInt),
        firstRowId = optLong(s \ "first-row-id"))
    }

    val sortOrders = (j \ "sort-orders").children.map { so =>
      IceSortOrder(
        intOf(so \ "order-id", default = Some(0)),
        (so \ "fields").children.map { f =>
          IceSortField(
            intOf(f \ "source-id", default = Some(0)),
            (f \ "transform").toOption.collect { case JString(s) => s }.getOrElse("identity"),
            (f \ "direction").toOption.collect { case JString(s) => s }.getOrElse("asc"),
            (f \ "null-order").toOption.collect { case JString(s) => s }.getOrElse("nulls-first"))
        })
    }

    val refs = (j \ "refs") match {
      case JObject(fields) =>
        fields.collect { case (name, r: JObject) =>
          name -> IceSnapshotRef(
            longOf(r \ "snapshot-id"),
            (r \ "type").toOption.collect { case JString(s) => s }.getOrElse("branch"),
            (r \ "min-snapshots-to-keep").toOption.collect { case JInt(i) => i.toInt },
            (r \ "max-snapshot-age-ms").toOption.collect {
              case JInt(i) => i.toLong
              case JLong(l) => l },
            (r \ "max-ref-age-ms").toOption.collect {
              case JInt(i) => i.toLong
              case JLong(l) => l })
        }.toMap
      case _ => Map.empty[String, IceSnapshotRef]
    }

    val statistics: List[IceStatisticsFile] = (j \ "statistics") match {
      case JArray(items) => items.map { st =>
        IceStatisticsFile(
          snapshotId = longOf(st \ "snapshot-id"),
          statisticsPath = strOf(st \ "statistics-path"),
          fileSizeInBytes = longOf(st \ "file-size-in-bytes", default = Some(0L)),
          fileFooterSizeInBytes =
            longOf(st \ "file-footer-size-in-bytes", default = Some(0L)),
          blobMetadata = (st \ "blob-metadata").children.map { b =>
            IceBlobMetadata(
              blobType = strOf(b \ "type"),
              snapshotId = longOf(b \ "snapshot-id", default = Some(-1L)),
              sequenceNumber = longOf(b \ "sequence-number", default = Some(-1L)),
              fields = (b \ "fields").children.collect {
                case JInt(i) => i.toInt
                case JLong(l) => l.toInt },
              properties = strMap(b \ "properties"))
          })
      }
      case _ => Nil
    }

    def log(key: String, refKey: String): List[IceLogEntry] =
      (j \ key).children.map(e => IceLogEntry(longOf(e \ "timestamp-ms"),
        (e \ refKey).toOption.collect {
          case JString(s) => s
          case JInt(i) => i.toString
          case JLong(l) => l.toString
        }.getOrElse("")))

    TableMetadata(
      formatVersion = formatVersion,
      tableUuid = strOf(j \ "table-uuid"),
      location = strOf(j \ "location"),
      lastSequenceNumber = longOf(j \ "last-sequence-number", default = Some(0L)),
      lastUpdatedMs = longOf(j \ "last-updated-ms"),
      lastColumnId = intOf(j \ "last-column-id"),
      schemas = schemas,
      currentSchemaId = currentSchemaId,
      partitionSpecs = specs,
      defaultSpecId = intOf(j \ "default-spec-id", default = Some(0)),
      lastPartitionId = intOf(j \ "last-partition-id", default = Some(999)),
      properties = strMap(j \ "properties"),
      currentSnapshotId = optLong(j \ "current-snapshot-id").filter(_ != -1L),
      snapshots = snapshots,
      snapshotLog = log("snapshot-log", "snapshot-id"),
      metadataLog = log("metadata-log", "metadata-file"),
      sortOrders = if (sortOrders.isEmpty) List(IceSortOrder(0, Nil)) else sortOrders,
      defaultSortOrderId = intOf(j \ "default-sort-order-id", default = Some(0)),
      refs = refs,
      statistics = statistics,
      partitionStatistics = (j \ "partition-statistics") match {
        case JArray(items) => items.map { st =>
          IcePartitionStatisticsFile(
            snapshotId = longOf(st \ "snapshot-id"),
            statisticsPath = strOf(st \ "statistics-path"),
            fileSizeInBytes = longOf(st \ "file-size-in-bytes", default = Some(0L)))
        }
        case _ => Nil
      },
      nextRowId = longOf(j \ "next-row-id", default = Some(0L)))
  }

  private def parsePartitionField(v: JValue): IcePartitionField =
    IcePartitionField(
      sourceId = intOf(v \ "source-id"),
      fieldId = intOf(v \ "field-id", default = Some(1000)),
      transform = strOf(v \ "transform"),
      name = strOf(v \ "name"))

  def serialize(m: TableMetadata): Array[Byte] = {
    val j = JObject(
      "format-version" -> JInt(m.formatVersion),
      "table-uuid" -> JString(m.tableUuid),
      "location" -> JString(m.location),
      "next-row-id" -> JLong(m.nextRowId),
      "last-sequence-number" -> JLong(m.lastSequenceNumber),
      "last-updated-ms" -> JLong(m.lastUpdatedMs),
      "last-column-id" -> JInt(m.lastColumnId),
      "current-schema-id" -> JInt(m.currentSchemaId),
      "schemas" -> JArray(m.schemas.map(schemaToJson)),
      "default-spec-id" -> JInt(m.defaultSpecId),
      "partition-specs" -> JArray(m.partitionSpecs.map(sp => JObject(
        "spec-id" -> JInt(sp.specId),
        "fields" -> JArray(sp.fields.map(f => JObject(
          "source-id" -> JInt(f.sourceId),
          "field-id" -> JInt(f.fieldId),
          "transform" -> JString(f.transform),
          "name" -> JString(f.name))))))),
      "last-partition-id" -> JInt(m.lastPartitionId),
      "default-sort-order-id" -> JInt(m.defaultSortOrderId),
      "sort-orders" -> JArray(m.sortOrders.map(so => JObject(
        "order-id" -> JInt(so.orderId),
        "fields" -> JArray(so.fields.map(f => JObject(
          "source-id" -> JInt(f.sourceId),
          "transform" -> JString(f.transform),
          "direction" -> JString(f.direction),
          "null-order" -> JString(f.nullOrder))))))),
      "properties" -> JObject(m.properties.toList.sortBy(_._1).map { case (k, v) =>
        k -> (JString(v): JValue) }),
      "current-snapshot-id" -> m.currentSnapshotId.map(JLong(_): JValue).getOrElse(JLong(-1L)),
      "refs" -> JObject(m.refs.toList.map { case (n, r) =>
        n -> (JObject(List(
          "snapshot-id" -> (JLong(r.snapshotId): JValue),
          "type" -> (JString(r.refType): JValue)) ++
          r.minSnapshotsToKeep.map(v => "min-snapshots-to-keep" -> (JInt(v): JValue)) ++
          r.maxSnapshotAgeMs.map(v => "max-snapshot-age-ms" -> (JLong(v): JValue)) ++
          r.maxRefAgeMs.map(v => "max-ref-age-ms" -> (JLong(v): JValue))): JValue) }),
      "snapshots" -> JArray(m.snapshots.map(s => JObject(
        List(
          "snapshot-id" -> (JLong(s.snapshotId): JValue),
          "sequence-number" -> (JLong(s.sequenceNumber): JValue),
          "timestamp-ms" -> (JLong(s.timestampMs): JValue),
          "manifest-list" -> (JString(s.manifestList): JValue),
          "summary" -> (JObject(s.summary.toList.sortBy(_._1).map { case (k, v) =>
            k -> (JString(v): JValue) }): JValue)) ++
          s.parentSnapshotId.map(p => "parent-snapshot-id" -> (JLong(p): JValue)).toList ++
          s.schemaId.map(id => "schema-id" -> (JInt(id): JValue)).toList ++
          s.firstRowId.map(r => "first-row-id" -> (JLong(r): JValue)).toList))),
      "snapshot-log" -> JArray(m.snapshotLog.map(e => JObject(
        "timestamp-ms" -> JLong(e.timestampMs),
        "snapshot-id" -> JLong(e.ref.toLong)))),
      "metadata-log" -> JArray(m.metadataLog.map(e => JObject(
        "timestamp-ms" -> JLong(e.timestampMs),
        "metadata-file" -> JString(e.ref)))))
    val statsJson: JValue = JArray(m.statistics.map(st => JObject(
      "snapshot-id" -> JLong(st.snapshotId),
      "statistics-path" -> JString(st.statisticsPath),
      "file-size-in-bytes" -> JLong(st.fileSizeInBytes),
      "file-footer-size-in-bytes" -> JLong(st.fileFooterSizeInBytes),
      "blob-metadata" -> JArray(st.blobMetadata.map(b => JObject(
        "type" -> JString(b.blobType),
        "snapshot-id" -> JLong(b.snapshotId),
        "sequence-number" -> JLong(b.sequenceNumber),
        "fields" -> JArray(b.fields.map(JInt(_): JValue)),
        "properties" -> JObject(b.properties.toList.sortBy(_._1).map {
          case (k, v) => k -> (JString(v): JValue) })))))))
    val partStatsJson: JValue = JArray(m.partitionStatistics.map(st => JObject(
      "snapshot-id" -> JLong(st.snapshotId),
      "statistics-path" -> JString(st.statisticsPath),
      "file-size-in-bytes" -> JLong(st.fileSizeInBytes))))
    val withStats =
      (if (m.statistics.isEmpty) j else JObject(j.obj :+ ("statistics" -> statsJson))) match {
        case jj if m.partitionStatistics.isEmpty => jj
        case jj => JObject(jj.obj :+ ("partition-statistics" -> partStatsJson))
      }
    JsonMethods.pretty(JsonMethods.render(withStats)).getBytes("UTF-8")
  }
}
