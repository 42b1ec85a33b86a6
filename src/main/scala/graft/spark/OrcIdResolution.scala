package graft.spark

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.spark.sql.GraftOrcFactoryBuilder
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.tables.{OrcDataIO, SchemaConvert}

/** ORC field-id column resolution (the Iceberg spec's ORC appendix:
  * `iceberg.id` type attributes). Spark's ORC reader resolves columns by
  * NAME only, so a renamed column would read as null from older files;
  * this factory opens each file's footer EXECUTOR-SIDE (the task reads
  * the file anyway — one extra tail read), maps field ids to the file's
  * own column names, and instantiates the stock per-file reader over the
  * name-rewritten schemas. Rows stay positional, so consumers see the
  * scan's requested schema regardless of the per-file names.
  *
  * Files with no id attributes (legacy graft writes, imports) resolve by
  * name exactly as before. A field id absent from an attributed file
  * reads as null via a sentinel name the file cannot contain. Pushed
  * filters reference CURRENT names; they are dropped for files where any
  * column resolved to a different name (a swapped rename could otherwise
  * skip stripes wrongly) — correctness-neutral, Spark re-applies filters
  * above the scan. */
case class GraftOrcIdFactory(
    builder: GraftOrcFactoryBuilder,
    filters: Array[Filter])
    extends PartitionReaderFactory {

  @transient private lazy val probe = builder.build(filters)

  /** id -> file column name from the footer attributes; None when the
    * file carries no attributes (legacy name resolution applies) */
  private def idMap(fileTd: TypeDescription): Option[Map[Int, String]] = {
    val entries = fileTd.getFieldNames.asScala.zip(fileTd.getChildren.asScala).flatMap {
      case (name, child) =>
        Option(child.getAttributeValue(OrcDataIO.IdAttr)).map(_.toInt -> name)
    }
    if (entries.isEmpty) None else Some(entries.toMap)
  }

  private def resolveSchema(schema: StructType, ids: Map[Int, String]): StructType =
    StructType(schema.fields.map { f =>
      val id =
        if (f.metadata.contains(SchemaConvert.FieldIdKey))
          Some(f.metadata.getLong(SchemaConvert.FieldIdKey).toInt)
        else None
      val newName = id match {
        case Some(i) => ids.getOrElse(i, s"_graft_absent_$i")
        case None => f.name
      }
      val md = new MetadataBuilder().withMetadata(f.metadata)
        .remove(SchemaConvert.FieldIdKey).build()
      StructField(newName, f.dataType, f.nullable, md)
    })

  /** the per-file reader factory (stock factory over resolved schemas) */
  private def factoryFor(file: PartitionedFile): PartitionReaderFactory = {
    val (dataSchema, readSchema) = builder.schemas
    val path = new Path(file.toPath.toUri)
    val reader = OrcFile.createReader(
      path, OrcFile.readerOptions(builder.hadoopConf))
    val ids =
      try idMap(reader.getSchema)
      finally reader.close()
    ids match {
      case None => builder.build(filters) // legacy: name resolution
      case Some(m) =>
        val rData = resolveSchema(dataSchema, m)
        val rRead = resolveSchema(readSchema, m)
        // renames invalidate name-addressed stripe filters
        val keepFilters = rRead.fieldNames.sameElements(readSchema.fieldNames)
        builder.buildResolved(rData, rRead, if (keepFilters) filters else Array.empty)
    }
  }

  private def files(p: InputPartition): Array[PartitionedFile] =
    p.asInstanceOf[FilePartition].files

  private def single(f: PartitionedFile): FilePartition = FilePartition(0, Array(f))

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ChainedReader[InternalRow](files(p), f => factoryFor(f).createReader(single(f)))

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    new ChainedReader[ColumnarBatch](files(p), f => factoryFor(f).createColumnarReader(single(f)))

  override def supportColumnarReads(p: InputPartition): Boolean =
    probe.supportColumnarReads(p)
}

/** sequential chain of per-file readers (order preserved — MoR row
  * positions stay per-file-monotonic exactly as with one reader) */
private[spark] class ChainedReader[T](
    files: Array[PartitionedFile],
    mk: PartitionedFile => PartitionReader[T]) extends PartitionReader[T] {
  private var i = 0
  private var current: PartitionReader[T] = _

  override def next(): Boolean = {
    while (true) {
      if (current == null) {
        if (i >= files.length) return false
        current = mk(files(i))
        i += 1
      }
      if (current.next()) return true
      current.close()
      current = null
    }
    false
  }
  override def get(): T = current.get()
  override def close(): Unit = if (current != null) { current.close(); current = null }
}
