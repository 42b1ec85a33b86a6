package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.{ColumnStatistics, OrcFile}

import graft.tables.GraftTable.FieldInfo

/** ORC data files (the third Iceberg data-file format; parquet and avro
  * are the other two). Writes go through orc-core directly with
  * `iceberg.id` / `iceberg.required` type attributes stamped per the
  * Iceberg spec's ORC appendix ([[RowWriter]] — row conversion reuses
  * Spark's own `OrcSerializer`, so the data layout is byte-identical to
  * Spark's writer; only the footer gains the attributes). Reads resolve
  * columns BY ID when the attributes are present (see
  * `graft.spark.GraftOrcIdFactory`), falling back to names for legacy /
  * imported files — which makes column renames metadata-only for ORC
  * exactly as for parquet and avro. This object also harvests the
  * manifest statistics from the ORC file tail — record count, per-column
  * sizes/null counts, min/max bounds, stripe offsets — the same role
  * [[TableWrite.statsOf]] plays for parquet footers.
  *
  * Timestamp and date bounds are deliberately NOT harvested (ORC's
  * timestamp statistics carry writer-zone semantics; a wrong bound could
  * prune a matching file, while a missing bound is always safe). */
object OrcDataIO {

  val IdAttr = "iceberg.id"
  val RequiredAttr = "iceberg.required"

  /** ORC TypeDescription for the fields, Spark-compatible layout (built
    * by Spark's own mapping) with Iceberg id/required attributes stamped
    * on every nested type */
  def typeDescription(
      fields: Seq[IceField],
      sparkSchema: org.apache.spark.sql.types.StructType): org.apache.orc.TypeDescription = {
    val td = org.apache.spark.sql.execution.datasources.orc.OrcUtils
      .orcTypeDescription(sparkSchema)
    stamp(td, IceStruct(fields.toList))
    td
  }

  private def stamp(td: org.apache.orc.TypeDescription, t: IceType): Unit = t match {
    case IceStruct(fs) =>
      fs.zip(td.getChildren.asScala).foreach { case (f, c) =>
        c.setAttribute(IdAttr, f.id.toString)
        c.setAttribute(RequiredAttr, f.required.toString)
        stamp(c, f.fieldType)
      }
    case IceList(eid, e, eReq) =>
      val c = td.getChildren.get(0)
      c.setAttribute(IdAttr, eid.toString)
      c.setAttribute(RequiredAttr, eReq.toString)
      stamp(c, e)
    case IceMap(kid, k, vid, v, vReq) =>
      val kc = td.getChildren.get(0)
      kc.setAttribute(IdAttr, kid.toString)
      kc.setAttribute(RequiredAttr, "true")
      stamp(kc, k)
      val vc = td.getChildren.get(1)
      vc.setAttribute(IdAttr, vid.toString)
      vc.setAttribute(RequiredAttr, vReq.toString)
      stamp(vc, v)
    case _ =>
  }

  def compressionKind(name: String): org.apache.orc.CompressionKind = {
    import org.apache.orc.CompressionKind
    name.toLowerCase match {
      case "none" | "uncompressed" => CompressionKind.NONE
      case "zlib" => CompressionKind.ZLIB
      case "zstd" => CompressionKind.ZSTD
      case "lzo" => CompressionKind.LZO
      case "lz4" => CompressionKind.LZ4
      case _ => CompressionKind.SNAPPY
    }
  }

  /** can every field write through [[RowWriter]]? (variant has no ORC
    * mapping here — such tables keep the legacy Spark-sink path) */
  def canWrite(fields: Seq[IceField]): Boolean = {
    def ok(t: IceType): Boolean = t match {
      case IcePrim("variant") => false
      case IceStruct(fs) => fs.forall(f => ok(f.fieldType))
      case IceList(_, e, _) => ok(e)
      case IceMap(_, k, _, v, _) => ok(k) && ok(v)
      case _ => true
    }
    fields.forall(f => ok(f.fieldType))
  }

  /** One ORC data file, id-stamped, inline NaN counting; manifest stats
    * harvested from the file tail on close. Row conversion is Spark's
    * OrcSerializer over the DATA prefix of the row — trailing partition
    * columns (fanout writes) are never read. */
  class RowWriter(
      conf: Configuration,
      val path: String,
      fields: Seq[IceField],
      sparkSchema: org.apache.spark.sql.types.StructType,
      compression: String,
      metrics: MetricsConfig = MetricsConfig.default) extends TableWrite.RowFileWriter {
    private val dataSchema = org.apache.spark.sql.types.StructType(
      sparkSchema.fields.take(fields.size))
    private val writer = OrcFile.createWriter(
      new Path(path),
      OrcFile.writerOptions(conf)
        .setSchema(typeDescription(fields, dataSchema))
        .compress(compressionKind(compression)))
    private val rec =
      new org.apache.orc.mapreduce.OrcMapreduceRecordWriter[org.apache.orc.mapred.OrcStruct](writer)
    private val ser =
      new org.apache.spark.sql.execution.datasources.orc.OrcSerializer(dataSchema)
    private val floatOrds = fields.indices.filter(i =>
      fields(i).fieldType == IcePrim("float")).toArray
    private val doubleOrds = fields.indices.filter(i =>
      fields(i).fieldType == IcePrim("double")).toArray
    private val nans = scala.collection.mutable.Map[Int, Long]()
    var records = 0L

    def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      var i = 0
      while (i < floatOrds.length) {
        val o = floatOrds(i)
        if (!row.isNullAt(o) && row.getFloat(o).isNaN)
          nans(o) = nans.getOrElse(o, 0L) + 1
        i += 1
      }
      i = 0
      while (i < doubleOrds.length) {
        val o = doubleOrds(i)
        if (!row.isNullAt(o) && row.getDouble(o).isNaN)
          nans(o) = nans.getOrElse(o, 0L) + 1
        i += 1
      }
      rec.write(org.apache.hadoop.io.NullWritable.get(), ser.serialize(row))
      records += 1
    }

    def close(): TableWrite.FileStats = {
      rec.close(null)
      val infos = fields.map(f => FieldInfo(f.name, f.id, f.fieldType.repr))
      val nanCounts = (floatOrds ++ doubleOrds).collect {
        case o if metrics.keepCounts(fields(o).id) =>
          fields(o).id -> nans.getOrElse(o, 0L) }.toMap
      statsOf(path, infos, conf, metrics).copy(nanCounts = nanCounts)
    }

    def abort(): Unit = {
      try rec.close(null) catch { case _: Throwable => }
      try {
        val p = new Path(path)
        p.getFileSystem(conf).delete(p, false)
      } catch { case _: Throwable => }
    }
  }

  def statsOf(
      pathStr: String,
      infos: Seq[FieldInfo],
      conf: Configuration,
      metrics: MetricsConfig = MetricsConfig.default): TableWrite.FileStats = {
    val path = new Path(pathStr)
    val reader = OrcFile.createReader(path, OrcFile.readerOptions(conf))
    try {
      val rows = reader.getNumberOfRows
      val fileSize = path.getFileSystem(conf).getFileStatus(path).getLen
      val schema = reader.getSchema
      val names = schema.getFieldNames.asScala
      val children = schema.getChildren.asScala
      val allStats = reader.getStatistics
      val byName = infos.map(i => i.name -> i).toMap

      val colSizes = scala.collection.mutable.Map[Int, Long]()
      val valCounts = scala.collection.mutable.Map[Int, Long]()
      val nullCounts = scala.collection.mutable.Map[Int, Long]()
      val lower = scala.collection.mutable.Map[Int, Array[Byte]]()
      val upper = scala.collection.mutable.Map[Int, Array[Byte]]()

      names.zip(children).foreach { case (name, child) =>
        byName.get(name).foreach { info =>
          val id = info.id
          val cs: ColumnStatistics = allStats(child.getId)
          val bytes = cs.getBytesOnDisk
          if (bytes > 0) colSizes(id) = bytes
          if (metrics.keepCounts(id)) {
            valCounts(id) = rows
            nullCounts(id) = rows - cs.getNumberOfValues
            metrics.boundsTrunc(id).foreach { trunc =>
              boundsOf(cs, info.typeRepr).foreach { case (mn, mx) =>
                val t = MetadataJson.parseType(org.json4s.JString(info.typeRepr))
                TableWrite.encodeBoundValue(t, mn, isUpper = false, trunc).foreach(lower(id) = _)
                TableWrite.encodeBoundValue(t, mx, isUpper = true, trunc).foreach(upper(id) = _)
              }
            }
          }
        }
      }
      TableWrite.FileStats(
        GraftTable.normPathStr(pathStr), rows, fileSize,
        colSizes.toMap, valCounts.toMap, nullCounts.toMap,
        lower.toMap, upper.toMap,
        reader.getStripes.asScala.map(_.getOffset).toSeq)
    } finally reader.close()
  }

  /** (min, max) in the boxed forms [[TableWrite.encodeBoundValue]]
    * expects; None for types whose ORC statistics we do not trust into
    * pruning bounds (timestamps, dates) — missing bounds never mis-prune */
  private def boundsOf(cs: ColumnStatistics, typeRepr: String): Option[(Any, Any)] = {
    import org.apache.orc.{DoubleColumnStatistics, IntegerColumnStatistics, StringColumnStatistics}
    (cs, typeRepr) match {
      case (s: IntegerColumnStatistics, "int") if s.getNumberOfValues > 0 =>
        Some((s.getMinimum.toInt, s.getMaximum.toInt))
      case (s: IntegerColumnStatistics, "long") if s.getNumberOfValues > 0 =>
        Some((s.getMinimum, s.getMaximum))
      case (s: DoubleColumnStatistics, "float") if s.getNumberOfValues > 0 =>
        if (s.getMinimum.isNaN || s.getMaximum.isNaN) None
        else Some((s.getMinimum.toFloat, s.getMaximum.toFloat))
      case (s: DoubleColumnStatistics, "double") if s.getNumberOfValues > 0 =>
        if (s.getMinimum.isNaN || s.getMaximum.isNaN) None
        else Some((s.getMinimum, s.getMaximum))
      case (s: StringColumnStatistics, "string")
          if s.getNumberOfValues > 0 && s.getMinimum != null && s.getMaximum != null =>
        Some((s.getMinimum, s.getMaximum))
      case _ => None
    }
  }
}
