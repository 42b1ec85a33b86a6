package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.StructType

import graft.tables.{AvroDataIO, TableWrite}

/** Per-file data-format routing for the native scans. Iceberg data files
  * may be parquet, orc or avro (manifest `file_format`); a single
  * snapshot can mix them (e.g. `write.format.default` flipped between
  * appends), so routing is per InputPartition: files pack into
  * format-homogeneous partitions wrapped in [[GraftFormatPartition]], and
  * [[FormatRouteFactory]] dispatches each to its reader factory. */
class GraftFormatPartition(val inner: InputPartition, val format: String)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Routes [[GraftFormatPartition]]s to their format factory,
  * [[GraftExternalPartition]]s to the name-resolving parquet factory,
  * everything else to the id-resolving parquet factory. Columnar support
  * is a SCAN-GLOBAL constant (`allColumnar`, computed by the scan over
  * its full partition list) because Spark refuses mixed row/columnar
  * partition sets. */
case class FormatRouteFactory(
    parquet: PartitionReaderFactory,
    parquetExt: PartitionReaderFactory,
    orc: PartitionReaderFactory,
    avro: PartitionReaderFactory,
    allColumnar: Boolean)
    extends PartitionReaderFactory {

  private def route(p: InputPartition): (PartitionReaderFactory, InputPartition) = p match {
    case f: GraftFormatPartition if f.format == "orc" => (orc, f.inner)
    case f: GraftFormatPartition if f.format == "avro" => (avro, f.inner)
    case e: GraftExternalPartition => (parquetExt, e.inner)
    case other => (parquet, other)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (f, ip) = route(p)
    f.createReader(ip)
  }
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val (f, ip) = route(p)
    f.createColumnarReader(ip)
  }
  override def supportColumnarReads(p: InputPartition): Boolean = allColumnar
}

/** Row reader factory over Avro data files: each FilePartition slice reads
  * through [[AvroDataIO.rows]] (field-id column resolution, sync-marker
  * byte-range splits — a jumbo avro file fans out over tasks exactly like
  * parquet row groups). */
case class GraftAvroReaderFactory(
    readSchema: StructType,
    serConf: TableWrite.SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files = p.asInstanceOf[FilePartition].files
    new PartitionReader[InternalRow] {
      private var i = 0
      private var it: Iterator[InternalRow] with AutoCloseable = _
      private var current: InternalRow = _

      private def advance(): Boolean = {
        while (true) {
          if (it == null) {
            if (i >= files.length) return false
            val f = files(i)
            i += 1
            it = AvroDataIO.rows(
              serConf.value, f.toPath.toUri.getPath, readSchema, f.start, f.length)
          }
          if (it.hasNext) { current = it.next(); return true }
          it.close(); it = null
        }
        false
      }

      override def next(): Boolean = advance()
      override def get(): InternalRow = current
      override def close(): Unit = if (it != null) { it.close(); it = null }
    }
  }
}
