package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.{ColumnStatistics, OrcFile}

import graft.tables.GraftTable.FieldInfo

/** ORC data files (the third Iceberg data-file format; parquet and avro
  * are the other two). Writes ride Spark's native `OrcOutputWriter` /
  * `DataFrameWriter.orc` (vectorized, codegen-friendly); this object
  * harvests the manifest statistics from the ORC file tail — record
  * count, per-column sizes/null counts, min/max bounds, stripe offsets —
  * the same role [[TableWrite.statsOf]] plays for parquet footers.
  *
  * ORC files resolve columns by NAME on read (Spark's ORC reader has no
  * field-id resolution, and Spark's writer cannot stamp Iceberg ids into
  * ORC attributes), so a column rename after ORC files were written will
  * read those files' column as null — documented format limitation;
  * parquet and avro files stay rename-safe via field ids. Timestamp and
  * date bounds are deliberately NOT harvested (ORC's timestamp statistics
  * carry writer-zone semantics; a wrong bound could prune a matching
  * file, while a missing bound is always safe). */
object OrcDataIO {

  def statsOf(pathStr: String, infos: Seq[FieldInfo], conf: Configuration): TableWrite.FileStats = {
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
          valCounts(id) = rows
          nullCounts(id) = rows - cs.getNumberOfValues
          val bytes = cs.getBytesOnDisk
          if (bytes > 0) colSizes(id) = bytes
          boundsOf(cs, info.typeRepr).foreach { case (mn, mx) =>
            val t = MetadataJson.parseType(org.json4s.JString(info.typeRepr))
            TableWrite.encodeBoundValue(t, mn, isUpper = false).foreach(lower(id) = _)
            TableWrite.encodeBoundValue(t, mx, isUpper = true).foreach(upper(id) = _)
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
