package graft.spark

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StructType}

import graft.tables._

/** DSv2 custom metrics (the truthful per-query replacement for the
  * reference's prometheus decorator layers, icelake/src/metrics.rs):
  * surfaced in the Spark UI / listener bus per scan or write. Spark
  * re-instantiates CustomMetric classes reflectively, so each needs a
  * concrete no-arg class. */
abstract class GraftSumMetric(metricName: String, desc: String)
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = metricName
  override def description(): String = desc
}

class DataFilesMetric extends GraftSumMetric("graftDataFiles", "data files scanned")
class PosDeleteFilesMetric
    extends GraftSumMetric("graftPosDeleteFiles", "position delete files applied")
class EqDeleteFilesMetric
    extends GraftSumMetric("graftEqDeleteFiles", "equality delete files applied")
class RowsDeletedMetric
    extends GraftSumMetric("graftRowsDeleted", "rows removed by MoR deletes")
class RowsWrittenMetric extends GraftSumMetric("graftRowsWritten", "rows written")

case class GraftTaskMetric(metricName: String, v: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = v
}

/** Native DSv2 scan of a merge-on-read snapshot — the path the reference
  * documents but never built (icelake/src/io/scan.rs applies no deletes).
  *
  * Chosen when the snapshot's delete files are small (bounded by
  * [[GraftTable.DeleteBroadcastMaxBytes]]): delete state is resolved at
  * plan time into per-data-file position arrays plus equality-key hash
  * maps, shipped with the task binary, and applied inside the partition
  * reader. SQL reads of MoR tables therefore stay ONE scan node —
  * vectorized parquet + row-level delete filtering — instead of dropping
  * to the V1 bridge's RDD round-trip. Large delete sets (rare) fall back
  * to the facade's AQE-planned anti-join plan.
  *
  * Row positions are counted sequentially per file; partitions are always
  * whole single files and no filters are pushed into the inner parquet
  * reader (Spark re-applies every filter above the scan, so correctness
  * is unaffected and positions stay exact).
  */
class GraftMorScan(
    table: GraftTable,
    iceSchema: IceSchema,
    dataFiles: Seq[PlannedFile],
    posDeletes: Seq[PlannedFile],
    eqDeletes: Seq[PlannedFile],
    dataSchema: StructType,
    requiredSchema: StructType,
    pushedFilters: Array[Filter] = Array.empty)
    extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema

  override def toBatch: Batch = this

  /** equality-key columns that must ride the inner read beyond the
    * required columns (projected away after delete filtering) */
  private val eqKeyFields: Seq[IceField] = eqDeletes
    .flatMap(_.file.equalityIds).distinct
    .flatMap(id => iceSchema.fieldById(id))
    .filterNot(f => requiredSchema.fieldNames.contains(f.name))

  private val innerSchema: StructType =
    StructType(requiredSchema.fields ++ eqKeyFields.map(SchemaConvert.toSparkField))

  /** file -> (position, delete sequence) pairs resolved at plan time: a
    * position delete applies to a data file when its sequence is >= the
    * file's */
  private lazy val posByFile: Map[String, Array[(Long, Long)]] = {
    if (posDeletes.isEmpty) Map.empty
    else {
      val spark = SparkSession.active
      val seqOf = posDeletes
        .map(p => (GraftTable.normPathStr(p.file.filePath), p.seq)).toMap
      val df = spark.read.parquet(posDeletes.map(_.file.filePath): _*)
        .select(col("file_path"), col("pos"),
          GraftTable.normPath(col("_metadata.file_path")).as("_src"))
      val rows = org.apache.spark.sql.GraftBridge.collectInternal(df)
      rows.toSeq
        .map(r => (GraftTable.normPathStr(r.getUTF8String(0).toString),
          r.getLong(1), seqOf.getOrElse(r.getUTF8String(2).toString, Long.MaxValue)))
        .groupBy(_._1)
        .map { case (f, xs) => f -> xs.map(x => (x._2, x._3)).toArray }
    }
  }

  /** per equality-id group: key types and (key -> max delete sequence) */
  private lazy val eqGroups: Seq[(Seq[String], Array[DataType], JHashMap[UnsafeRow, java.lang.Long])] =
    eqDeletes.groupBy(_.file.equalityIds).toSeq.flatMap { case (eqIds, files) =>
      val keyFields = eqIds.flatMap(id => iceSchema.fieldById(id))
      if (keyFields.isEmpty) None
      else {
        val spark = SparkSession.active
        // resolve delete columns by FIELD ID (same contract as the facade
        // scan): a rename after the delete was written must still hit the
        // original parquet column
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        val keyNames = keyFields.map(_.name)
        val readSchema = StructType(keyFields.map(SchemaConvert.toSparkField))
        val seqOf = files.map(p => (GraftTable.normPathStr(p.file.filePath), p.seq)).toMap
        val df = spark.read.schema(readSchema).parquet(files.map(_.file.filePath): _*)
          .select(keyNames.map(col) :+
            GraftTable.normPath(col("_metadata.file_path")).as("_src"): _*)
        val rows = org.apache.spark.sql.GraftBridge.collectInternal(df)
        val types = keyFields.map(f => SchemaConvert.toSparkType(f.fieldType)).toArray
        val proj = UnsafeProjection.create(
          types.zipWithIndex.map { case (t, i) => BoundReference(i, t, nullable = true) })
        val map = new JHashMap[UnsafeRow, java.lang.Long]()
        rows.foreach { r =>
          val eseq = seqOf.getOrElse(r.getUTF8String(types.length).toString, Long.MinValue)
          val key = proj(r).copy()
          val prev = map.get(key)
          if (prev == null || prev < eseq) map.put(key, eseq)
        }
        Some((keyNames, types, map))
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val pb = posByFile
    dataFiles.zipWithIndex.map { case (p, i) =>
      val norm = GraftTable.normPathStr(p.file.filePath)
      val positions: Array[Long] = pb.get(norm) match {
        case Some(pairs) =>
          pairs.collect { case (pos, pseq) if p.seq <= pseq => pos }.distinct.sorted
        case None => Array.empty[Long]
      }
      GraftMorInputPartition(
        org.apache.spark.sql.GraftBridge.wholeFilePartition(i, p.file.filePath, p.file.fileSizeInBytes),
        p.seq, positions): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // two inner factories: filters may push into parquet (row-group/page
    // skipping) ONLY for files without position deletes — sequential
    // position counting is invalid once row groups can be skipped
    val innerNoPush = org.apache.spark.sql.GraftBridge.parquetReaderFactory(
      SparkSession.active, dataSchema, innerSchema, Array.empty[Filter])
    val innerPush =
      if (pushedFilters.isEmpty) innerNoPush
      else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
        SparkSession.active, dataSchema, innerSchema, pushedFilters)
    val nameToOrdinal = innerSchema.fieldNames.zipWithIndex.toMap
    val groups = eqGroups.map { case (keyNames, types, map) =>
      EqGroupState(keyNames.map(nameToOrdinal).toArray, types, map)
    }.toArray
    val outOrdinals = requiredSchema.fieldNames.map(nameToOrdinal)
    val outTypes = requiredSchema.fields.map(_.dataType)
    new GraftMorReaderFactory(innerPush, innerNoPush, groups, outOrdinals, outTypes)
  }

  override def description(): String =
    s"GraftMorScan(${table.location}, ${dataFiles.size} data files, " +
      s"${posDeletes.size} pos-delete files, ${eqDeletes.size} eq-delete files)"

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(
      new DataFilesMetric, new PosDeleteFilesMetric,
      new EqDeleteFilesMetric, new RowsDeletedMetric)

  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      GraftTaskMetric("graftDataFiles", dataFiles.size.toLong),
      GraftTaskMetric("graftPosDeleteFiles", posDeletes.size.toLong),
      GraftTaskMetric("graftEqDeleteFiles", eqDeletes.size.toLong))
}

/** whole-file partition + its data sequence + the positions deleted in it */
case class GraftMorInputPartition(
    filePartition: InputPartition,
    dseq: Long,
    positions: Array[Long])
    extends InputPartition

case class EqGroupState(
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType],
    keys: JHashMap[UnsafeRow, java.lang.Long])

class GraftMorReaderFactory(
    innerPush: PartitionReaderFactory,
    innerNoPush: PartitionReaderFactory,
    eqGroups: Array[EqGroupState],
    outOrdinals: Array[Int],
    outTypes: Array[DataType])
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val mor = partition.asInstanceOf[GraftMorInputPartition]
    val reader =
      (if (mor.positions.isEmpty) innerPush else innerNoPush)
        .createReader(mor.filePartition)
    new PartitionReader[InternalRow] {
      private val outProj = UnsafeProjection.create(
        outOrdinals.zip(outTypes).map { case (ord, t) =>
          BoundReference(ord, t, nullable = true) })
      private val keyProjs = eqGroups.map { g =>
        UnsafeProjection.create(g.keyOrdinals.zip(g.keyTypes).map {
          case (ord, t) => BoundReference(ord, t, nullable = true) })
      }
      private var pos = -1L
      private var current: InternalRow = _
      private var rowsDeleted = 0L

      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(GraftTaskMetric("graftRowsDeleted", rowsDeleted))

      private def deleted(row: InternalRow): Boolean = {
        if (mor.positions.length > 0 &&
          java.util.Arrays.binarySearch(mor.positions, pos) >= 0) return true
        var i = 0
        while (i < eqGroups.length) {
          val eseq = eqGroups(i).keys.get(keyProjs(i)(row))
          if (eseq != null && eseq > mor.dseq) return true
          i += 1
        }
        false
      }

      override def next(): Boolean = {
        while (reader.next()) {
          pos += 1
          val row = reader.get()
          if (!deleted(row)) {
            current = outProj(row)
            return true
          } else rowsDeleted += 1
        }
        false
      }

      override def get(): InternalRow = current

      override def close(): Unit = reader.close()
    }
  }
}
