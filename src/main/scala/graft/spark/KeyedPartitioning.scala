package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.unsafe.types.UTF8String

import graft.tables._

/** Storage-partitioned-join support: graft scans report their Iceberg
  * partition transforms as a DSv2 `KeyGroupedPartitioning` and attach each
  * file's partition tuple to its `InputPartition`, so a join between two
  * graft tables partitioned the same way runs WITHOUT any shuffle — Spark
  * groups the input partitions by key and zips matching keys across the
  * two sides (`spark.sql.sources.v2.bucketing.enabled`).
  *
  * At 100 TB this erases the single most expensive stage of a fact-fact
  * join: neither side is re-hashed or spilled; each task reads two
  * co-located partition groups. The reference has no equivalent (its scan
  * is single-node, icelake/src/io/scan.rs); this is the Spark-native
  * expression of its partition-spec metadata (icelake/src/types/
  * in_memory.rs partition specs). */
object KeyedPartitioning {

  /** the table's default-spec transforms as DSv2 expressions (shared by
    * Table.partitioning and scan outputPartitioning — Spark matches the
    * two sides' transforms structurally, bucket via the FunctionCatalog) */
  def v2Transforms(table: GraftTable): Array[Transform] =
    table.metadata.defaultSpec.fields.map { pf =>
      val src = table.metadata.currentSchema.fieldById(pf.sourceId)
        .map(_.name).getOrElse(pf.name)
      pf.transform match {
        case "identity" => Expressions.identity(src)
        case "year" => Expressions.years(src)
        case "month" => Expressions.months(src)
        case "day" => Expressions.days(src)
        case "hour" => Expressions.hours(src)
        case t if t.startsWith("bucket") =>
          Expressions.bucket(t.stripPrefix("bucket[").stripSuffix("]").toInt, src)
        case t if t.startsWith("truncate") =>
          Expressions.apply("truncate",
            Expressions.literal(t.stripPrefix("truncate[").stripSuffix("]").toInt),
            Expressions.column(src))
        case _ => Expressions.identity(src)
      }
    }.toArray

  /** a manifest partition value (plain JVM object from Avro) as the
    * catalyst value Spark's key comparison expects */
  def toCatalystValue(v: Any): Any = v match {
    case null => null
    case s: String => UTF8String.fromString(s)
    case bd: java.math.BigDecimal => org.apache.spark.sql.types.Decimal(bd)
    case bd: scala.math.BigDecimal => org.apache.spark.sql.types.Decimal(bd)
    case other => other
  }

  /** catalyst partition-key row for one file's partition tuple */
  def keyRow(partition: Seq[Option[Any]]): InternalRow =
    new GenericInternalRow(partition.map(o => toCatalystValue(o.orNull)).toArray)
}

/** InputPartition wrapper carrying the file group's partition key for
  * Spark's key-grouped planning; the inner partition does the reading. */
class GraftKeyedPartition(
    val inner: InputPartition,
    key: InternalRow)
    extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** InputPartition wrapper marking a file group registered via add_files:
  * its files carry no Iceberg field ids, so the routing factory reads it
  * with an id-stripped (name-resolving) schema. */
class GraftExternalPartition(val inner: InputPartition) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** routes [[GraftExternalPartition]]s to the name-resolving factory and
  * everything else to the id-resolving one */
case class ExternalRouteFactory(
    internal: PartitionReaderFactory,
    external: PartitionReaderFactory)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case e: GraftExternalPartition => external.createReader(e.inner)
    case other => internal.createReader(other)
  }
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = p match {
    case e: GraftExternalPartition => external.createColumnarReader(e.inner)
    case other => internal.createColumnarReader(other)
  }
  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case e: GraftExternalPartition => external.supportColumnarReads(e.inner)
    case other => internal.supportColumnarReads(other)
  }
}

/** unwraps [[GraftKeyedPartition]] before delegating to the real parquet
  * reader factory (which pattern-matches on FilePartition) */
case class KeyUnwrapFactory(inner: PartitionReaderFactory) extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: GraftKeyedPartition => k.inner
    case other => other
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}
