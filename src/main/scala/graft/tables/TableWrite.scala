package graft.tables

import java.net.URLDecoder
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.transforms
import graft.tables.GraftTable.FieldInfo

/** Write path: cluster by the partition-transform columns, write parquet
  * through Spark's vectorized writer, then harvest per-file stats
  * (record counts, sizes, null counts, real min/max bounds — closing the
  * reference's bounds gap, icelake/src/types/in_memory.rs:1711-1712) with a
  * distributed job over the footers. Only the tiny DataFile descriptors
  * come back to the driver. */
object TableWrite {

  /** per-file stats harvested from a parquet footer (executor side) */
  case class FileStats(
      path: String,
      recordCount: Long,
      fileSize: Long,
      columnSizes: Map[Int, Long],
      valueCounts: Map[Int, Long],
      nullCounts: Map[Int, Long],
      lowerBounds: Map[Int, Array[Byte]],
      upperBounds: Map[Int, Array[Byte]],
      splitOffsets: Seq[Long],
      // float/double NaN counts when the writer could observe them
      // (Avro inline stats); strict metadata deletes on float/double
      // REQUIRE a recorded zero here — parquet/ORC footers don't expose
      // NaN counts, so those formats need the extended-stats pass
      nanCounts: Map[Int, Long] = Map.empty)

  /** one open data file in a distributed fanout write (avro/orc): rolls
    * by record count, returns its manifest stats on close */
  trait RowFileWriter {
    def path: String
    def records: Long
    def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit
    def close(): FileStats
    def abort(): Unit
  }

  private def parseTypeRepr(repr: String): IceType =
    MetadataJson.parseType(org.json4s.JString(repr))

  /** Hadoop Configuration is not Serializable; wrap it so the driver's
    * REAL conf (credentials, endpoints, custom schemes) reaches the
    * executor-side footer reads instead of a blank default. */
  class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** executor-side footer read using the driver's shipped Configuration;
    * `metrics` governs which counts/bounds each column keeps (the
    * `write.metadata.metrics.*` table properties) */
  def statsOf(
      pathStr: String,
      infos: Seq[FieldInfo],
      conf: Configuration,
      metrics: MetricsConfig = MetricsConfig.default): FileStats = {
    val inputFile = HadoopInputFile.fromPath(new Path(pathStr), conf)
    val reader = ParquetFileReader.open(inputFile)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toList
      val byName = infos.map(i => i.name -> i).toMap

      var recordCount = 0L
      val colSizes = scala.collection.mutable.Map[Int, Long]()
      val valCounts = scala.collection.mutable.Map[Int, Long]()
      val nullCounts = scala.collection.mutable.Map[Int, Long]()
      val mins = scala.collection.mutable.Map[Int, Any]()
      val maxs = scala.collection.mutable.Map[Int, Any]()
      val offsets = scala.collection.mutable.ArrayBuffer[Long]()

      blocks.foreach { b =>
        recordCount += b.getRowCount
        offsets += b.getStartingPos
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          byName.get(name).foreach { info =>
            val id = info.id
            colSizes(id) = colSizes.getOrElse(id, 0L) + c.getTotalSize
            if (metrics.keepCounts(id)) {
              valCounts(id) = valCounts.getOrElse(id, 0L) + c.getValueCount
              val st = c.getStatistics
              if (st != null && !st.isEmpty) {
                if (st.isNumNullsSet)
                  nullCounts(id) = nullCounts.getOrElse(id, 0L) + st.getNumNulls
                if (st.hasNonNullValue && metrics.boundsTrunc(id).isDefined) {
                  val (mn, mx) = statValues(st, info.typeRepr)
                  (mn, mx) match {
                    case (Some(a), Some(z)) =>
                      mins(id) = mins.get(id).map(m => minOf(m, a)).getOrElse(a)
                      maxs(id) = maxs.get(id).map(m => maxOf(m, z)).getOrElse(z)
                    case _ =>
                  }
                }
              }
            }
          }
        }
      }

      val lower = mins.toMap.flatMap { case (id, v) =>
        encodeBound(infos, id, v, isUpper = false,
          metrics.boundsTrunc(id).flatten).map(id -> _) }
      val upper = maxs.toMap.flatMap { case (id, v) =>
        encodeBound(infos, id, v, isUpper = true,
          metrics.boundsTrunc(id).flatten).map(id -> _) }

      FileStats(pathStr, recordCount, inputFile.getLength,
        colSizes.toMap, valCounts.toMap, nullCounts.toMap,
        lower, upper, offsets.toSeq.sorted)
    } finally reader.close()
  }

  private def statValues(
      st: org.apache.parquet.column.statistics.Statistics[_],
      typeRepr: String): (Option[Any], Option[Any]) = {
    import org.apache.parquet.column.statistics._
    (st, typeRepr) match {
      case (s: IntStatistics, "int" | "date") => (Some(s.getMin), Some(s.getMax))
      case (s: LongStatistics, "long" | "timestamp" | "timestamptz" | "time" |
          "timestamp_ns" | "timestamptz_ns") =>
        (Some(s.getMin), Some(s.getMax))
      // spec: float/double bounds must not be NaN — a NaN-tainted stat
      // would wrongly prune (NaN compares greater than everything in
      // parquet's ordering but matches nothing)
      case (s: FloatStatistics, "float") =>
        if (s.getMin.isNaN || s.getMax.isNaN) (None, None)
        else (Some(s.getMin), Some(s.getMax))
      case (s: DoubleStatistics, "double") =>
        if (s.getMin.isNaN || s.getMax.isNaN) (None, None)
        else (Some(s.getMin), Some(s.getMax))
      case (s: BinaryStatistics, "string" | "uuid") =>
        (Some(s.genericGetMin.toStringUsingUTF8), Some(s.genericGetMax.toStringUsingUTF8))
      // decimals: Spark writes int32 (p<=9), int64 (p<=18) or fixed
      // big-endian unscaled bytes — rescale to the declared scale so the
      // bound rides manifests as an exact BigDecimal
      case (s: IntStatistics, DecimalRepr(scale)) =>
        (Some(java.math.BigDecimal.valueOf(s.getMin.toLong, scale)),
          Some(java.math.BigDecimal.valueOf(s.getMax.toLong, scale)))
      case (s: LongStatistics, DecimalRepr(scale)) =>
        (Some(java.math.BigDecimal.valueOf(s.getMin, scale)),
          Some(java.math.BigDecimal.valueOf(s.getMax, scale)))
      case (s: BinaryStatistics, DecimalRepr(scale)) =>
        def bd(b: Array[Byte]) =
          new java.math.BigDecimal(new java.math.BigInteger(b), scale)
        (Some(bd(s.genericGetMin.getBytes)), Some(bd(s.genericGetMax.getBytes)))
      case _ => (None, None)
    }
  }

  /** extracts the scale from an `IceDecimal.repr` ("decimal(P, S)") */
  private object DecimalRepr {
    private val P = """decimal\(\s*\d+\s*,\s*(\d+)\s*\)""".r
    def unapply(repr: String): Option[Int] = repr match {
      case P(s) => Some(s.toInt)
      case _ => None
    }
  }

  private def minOf(a: Any, b: Any): Any = if (cmpAny(a, b) <= 0) a else b
  private def maxOf(a: Any, b: Any): Any = if (cmpAny(a, b) >= 0) a else b
  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case _ => 0
  }

  /** string bounds are truncated to 16 CODE POINTS (surrogate-pair aware,
    * mirroring Iceberg's UnicodeUtil); a truncated upper bound rounds up
    * by bumping the last code point — skipped (None) when the bump would
    * land in the surrogate range, where an unpaired char would UTF-8
    * encode as '?' and produce an upper bound SMALLER than the real max,
    * wrongly pruning files. */
  private def encodeBound(
      infos: Seq[FieldInfo],
      id: Int,
      v: Any,
      isUpper: Boolean,
      trunc: Option[Int]): Option[Array[Byte]] = {
    val info = infos.find(_.id == id).getOrElse(return None)
    encodeBoundValue(parseTypeRepr(info.typeRepr), v, isUpper, trunc)
  }

  /** value-level bound encoding (shared with the avro write path, which
    * accumulates bounds inline instead of harvesting footers).
    * `trunc` = Some(n): string bounds cut at n code points, binary bounds
    * at n bytes; None: full bounds (`write.metadata.metrics.* = full`). */
  private[tables] def encodeBoundValue(
      t: IceType,
      v: Any,
      isUpper: Boolean,
      trunc: Option[Int] = Some(16)): Option[Array[Byte]] = {
    v match {
      case s: String if t == IcePrim("string") &&
          trunc.exists(n => s.codePointCount(0, s.length) > n) =>
        val n = trunc.get
        val cut = s.offsetByCodePoints(0, n)
        val prefix = s.substring(0, cut)
        if (!isUpper) Some(SingleValue.encode(t, prefix))
        else {
          // bump the LAST code point; walk back over unbumpable ones
          var i = n
          var res: Option[String] = None
          while (i > 0 && res.isEmpty) {
            val start = s.offsetByCodePoints(0, i - 1)
            val cp = s.codePointAt(start)
            val bumped = cp + 1
            val valid = bumped <= Character.MAX_CODE_POINT &&
              !(bumped >= Character.MIN_SURROGATE.toInt &&
                bumped <= Character.MAX_SURROGATE.toInt)
            if (valid)
              res = Some(s.substring(0, start) + new String(Character.toChars(bumped)))
            else i -= 1
          }
          res.map(b => SingleValue.encode(t, b))
        }
      case b: Array[Byte] if (t == IcePrim("binary") || t.isInstanceOf[IceFixed]) &&
          trunc.exists(b.length > _) =>
        val n = trunc.get
        if (!isUpper) Some(b.take(n))
        else {
          // round the prefix UP: bump the last byte < 0xFF, dropping the
          // unbumpable 0xFF tail; an all-0xFF prefix has no sound upper
          var i = n - 1
          while (i >= 0 && (b(i) & 0xFF) == 0xFF) i -= 1
          if (i < 0) None
          else {
            val out = b.slice(0, i + 1)
            out(i) = ((out(i) & 0xFF) + 1).toByte
            Some(out)
          }
        }
      case other => Some(SingleValue.encode(t, other))
    }
  }

  // ---------- partition handling ----------

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  private def isNsTimestamp(t: IceType): Boolean =
    t == IcePrim("timestamp_ns") || t == IcePrim("timestamptz_ns")

  def transformColumn(
      transform: String,
      source: Column,
      srcType: IceType = IcePrim("unknown")): Column = transform match {
    case "identity" => source
    case "void" =>
      // a TYPED null: Spark refuses VOID-typed partition columns, and the
      // manifest partition schema types the field by its source anyway
      lit(null).cast(
        try SchemaConvert.toSparkType(srcType)
        catch { case _: Throwable => org.apache.spark.sql.types.StringType })
    // v3 ns timestamps ride LongType — the timestamp-column helpers
    // below would misread the carrier; use the exact long-floorDiv forms
    case "year" if isNsTimestamp(srcType) => transforms.yearsNsT(source)
    case "month" if isNsTimestamp(srcType) => transforms.monthsNsT(source)
    case "day" if isNsTimestamp(srcType) => transforms.daysNsT(source)
    case "hour" if isNsTimestamp(srcType) => transforms.hoursNsT(source)
    case "year" => transforms.yearsT(source)
    case "month" => transforms.monthsT(source)
    case "day" => transforms.daysT(source)
    case "hour" => transforms.hoursT(source)
    // uuid rides as a canonical string but hashes as 16 big-endian bytes
    case BucketRe(n) if srcType == IcePrim("uuid") => transforms.bucketUuid(n.toInt, source)
    case BucketRe(n) => transforms.bucket(n.toInt, source)
    case TruncRe(w) => transforms.truncate(w.toInt, source)
    case other => sys.error(s"unknown transform: $other")
  }

  /** parse a hive-style partition dir value back to a typed value */
  def parsePartitionValue(resultType: IceType, raw: String): Option[Any] = {
    if (raw == "__HIVE_DEFAULT_PARTITION__") return None
    val decoded = URLDecoder.decode(raw, "UTF-8")
    resultType match {
      case IcePrim("int") => Some(decoded.toInt)
      case IcePrim("long") => Some(decoded.toLong)
      case IcePrim("string") => Some(decoded)
      case IcePrim("date") => Some(java.time.LocalDate.parse(decoded).toEpochDay.toInt)
      case IcePrim("boolean") => Some(decoded.toBoolean)
      case IcePrim("float") => Some(decoded.toFloat)
      case IcePrim("double") => Some(decoded.toDouble)
      case _ => Some(decoded)
    }
  }

  // ---------- write entry points ----------

  private def prepared(
      df: DataFrame, schema: IceSchema, extra: Seq[IceField] = Nil): DataFrame = {
    val cols = (schema.visibleFields ++ extra).map { f =>
      val md = new MetadataBuilder().putLong(SchemaConvert.FieldIdKey, f.id.toLong).build()
      // a write may omit a column that carries a write-default
      val src =
        if (df.columns.contains(f.name)) col(f.name)
        else f.writeDefault.map(lit(_)).getOrElse(col(f.name))
      src.cast(SchemaConvert.toSparkType(f.fieldType)).as(f.name, md)
    }
    df.select(cols: _*)
  }

  /** Row-lineage columns MATERIALIZED into rewritten files (format v3):
    * when the input carries `_row_id` / `_last_updated_sequence_number`
    * (a rewrite scanned them as metadata columns), they are written as
    * real columns under their reserved field ids so the rewritten rows
    * KEEP their lineage — readers prefer the in-file column over the
    * first_row_id-plus-position fallback. */
  private def lineageFieldsOf(df: DataFrame): List[IceField] =
    List(
      (GraftTable.RowIdCol, GraftTable.RowIdFieldId),
      (GraftTable.LastUpdatedSeqCol, GraftTable.LastUpdatedSeqFieldId))
      .collect { case (n, id) if df.columns.contains(n) =>
        IceField(id, n, required = false, IcePrim("long")) }

  /** Execute parquet writes under the pinned clone session, which has
    * field-id stamping and micros timestamps set (INT96 has no usable
    * footer stats) — the caller's session conf stays untouched. */
  private def pinnedWrite(df: DataFrame, spark: SparkSession): DataFrame =
    org.apache.spark.sql.GraftBridge.rebind(df, GraftTable.pinnedSession(spark))

  private def listParquet(conf: Configuration, dir: String): Seq[String] =
    listDataFiles(conf, dir, ".parquet")

  private def listDataFiles(conf: Configuration, dir: String, ext: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (name.endsWith(ext) && !name.startsWith(".") && !name.startsWith("_"))
        out += f.getPath.toUri.getPath
    }
    out.toSeq
  }

  /** data-file format of new writes (`write.format.default`, the Iceberg
    * property) — parquet (default, vectorized end-to-end), orc (Spark's
    * native ORC writer/reader, name-resolved columns) or avro
    * ([[AvroDataIO]], field-id-resolved rows) */
  def dataFormat(metadata: TableMetadata): String =
    metadata.properties.getOrElse("write.format.default", "parquet").toLowerCase match {
      case f @ ("parquet" | "orc" | "avro") => f
      case other => sys.error(s"unsupported write.format.default: $other")
    }

  /** write clustering (`write.distribution-mode`): hash | range | none */
  def distributionMode(props: Map[String, String]): String =
    props.getOrElse("write.distribution-mode", "hash").toLowerCase match {
      case m @ ("hash" | "range" | "none") => m
      case other => sys.error(s"unsupported write.distribution-mode: $other")
    }

  /** distributed footer harvest; returns stats per file path. The
    * driver's Hadoop conf ships with the job (broadcast-equivalent), so
    * stores needing credentials/endpoints work on executors. */
  /** files-per-write below which footer stats are read on a driver thread
    * pool instead of a Spark job — a job's fixed scheduling cost dwarfs a
    * handful of footer reads; large writes stay fully distributed */
  private val DriverHarvestMax = 64

  /** Register pre-existing parquet files as table data (the
    * add_files/migrate surface): footer stats harvested exactly like
    * fresh writes (by NAME — imported files carry no Iceberg field ids),
    * no data rewritten or moved. */
  def importDataFiles(
      table: GraftTable, spark: SparkSession, paths: Seq[String]): List[IceDataFile] = {
    val schema = table.metadata.currentSchema
    val infos = schema.fields.map(f => FieldInfo(f.name, f.id, f.fieldType.repr))
    val metricsCfg = MetricsConfig.fromProperties(table.metadata.properties, schema)
    harvest(spark, paths, infos, metricsCfg).filter(_.recordCount > 0)
      .map(statsToDataFile(_, Nil, DataContent.Data, Nil)).toList
  }

  def harvest(
      spark: SparkSession,
      paths: Seq[String],
      infos: Seq[FieldInfo],
      metrics: MetricsConfig = MetricsConfig.default): Seq[FileStats] =
    if (paths.isEmpty) Nil
    else {
      // session-scoped conf, not the raw SparkContext one: per-session
      // hadoop/FS options (credentials set via spark.conf) must ride along
      val conf = org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)
      if (paths.size <= DriverHarvestMax) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(paths.size, 16))
        try paths
          .map(p => pool.submit(new java.util.concurrent.Callable[FileStats] {
            override def call(): FileStats = statsOf(p, infos, conf, metrics)
          }))
          .map(_.get())
        finally pool.shutdown()
      } else {
        val par = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
        val bc = spark.sparkContext.broadcast(new SerializableHadoopConf(conf))
        spark.sparkContext.parallelize(paths, par)
          .map(p => statsOf(p, infos, bc.value.value, metrics)).collect().toSeq
      }
    }

  /** Optional second stats pass (table property `write.stats.extended`):
    * approximate distinct counts (HLL) per column and NaN counts for
    * float/double, per file — the `distinct_count`/`nan_value_counts`
    * slots the reference reads from parquet metadata but parquet-mr does
    * not surface (icelake/src/types/in_memory.rs:1658-1665). One extra
    * scan of the freshly written files; off by default. */
  def extendedStats(
      spark: SparkSession,
      paths: Seq[String],
      infos: Seq[FieldInfo]): Map[String, (Map[Int, Long], Map[Int, Long])] = {
    if (paths.isEmpty) return Map.empty
    val df = spark.read.parquet(paths: _*)
    val present = infos.filter(i => df.columns.contains(i.name))
    if (present.isEmpty) return Map.empty
    val aggs = present.flatMap { i =>
      Seq(approx_count_distinct(col(i.name)).as(s"ndv_${i.id}")) ++
        (if (i.typeRepr == "float" || i.typeRepr == "double")
          Seq(sum(when(isnan(col(i.name)), 1L).otherwise(0L)).as(s"nan_${i.id}"))
        else Nil)
    }
    df.groupBy(col("_metadata.file_path").as("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val ndv = present.map(i => i.id -> r.getAs[Long](s"ndv_${i.id}")).toMap
        val nan = present
          .filter(i => i.typeRepr == "float" || i.typeRepr == "double")
          .map(i => i.id -> Option(r.getAs[Any](s"nan_${i.id}"))
            .map(_.asInstanceOf[Long]).getOrElse(0L)).toMap
        GraftTable.normPathStr(r.getString(0)) -> (ndv, nan)
      }.toMap
  }

  /** records-per-file cap for the byte target: bytes/row observed from
    * the table's own committed totals when available (self-calibrating
    * size-based rolling), 64 B/row first-write fallback */
  def maxRecordsPerFile(metadata: TableMetadata): Option[Long] = {
    val props = metadata.properties
    props.get("write.max-records-per-file").map(_.toLong)
      .orElse(props.get("write.target-file-size-bytes").map { bytes =>
        val observed = for {
          snap <- metadata.currentSnapshot
          sz <- snap.summary.get("total-files-size").map(_.toLong)
          rec <- snap.summary.get("total-records").map(_.toLong)
          if rec > 0 && sz > 0
        } yield math.max(1L, sz / rec)
        math.max(1000L, bytes.toLong / observed.getOrElse(64L))
      })
  }

  /** `applyDeclaredSort = false` keeps the CALLER's within-partition row
    * layout: a z-order rewrite has already clustered rows by the
    * interleaved key, and re-sorting by the table's declared order here
    * would silently undo it (the files would also get the declared order
    * id stamped, making the layout loss invisible). Those files carry NO
    * sort-order id — sorted-scan reporting correctly turns off. */
  def writeDataFiles(
      table: GraftTable,
      spark: SparkSession,
      df: DataFrame,
      applyDeclaredSort: Boolean = true): List[IceDataFile] = {
    val schema = table.metadata.currentSchema
    val spec = table.metadata.defaultSpec
    val lineageFields = lineageFieldsOf(df)
    val base = prepared(df, schema, lineageFields)
    val writeId = UUID.randomUUID().toString
    val outDir = Locations.writeDir(table.metadata, table.location, writeId)

    val infos = (schema.fields ++ lineageFields)
      .map(f => FieldInfo(f.name, f.id, f.fieldType.repr))

    // rolling-writer controls (the reference's RollingWriter semantics,
    // icelake/src/io_v2/file_writer/base_file_writer.rs:77-82, expressed as
    // writer options): a record cap per file, derived from the target file
    // size when only that is set
    val props = table.metadata.properties
    val maxRecords: Option[Long] = maxRecordsPerFile(table.metadata)
    // declarative sort order applied within output files: the table's
    // DEFAULT SortOrder metadata wins (direction + null order honored and
    // the order id stamped on each DataFile); the write.sort-order
    // property is the untyped fallback (no declared id to stamp)
    val declaredOrder =
      if (!applyDeclaredSort) None
      else table.metadata.sortOrders
        .find(o => o.orderId == table.metadata.defaultSortOrderId && o.fields.nonEmpty)
    val sortExprs: Seq[Column] = declaredOrder match {
      case Some(o) =>
        o.fields.flatMap { sf =>
          schema.fieldById(sf.sourceId).map { f =>
            val c = col(f.name)
            (sf.direction, sf.nullOrder) match {
              case ("desc", "nulls-last") => c.desc_nulls_last
              case ("desc", _) => c.desc_nulls_first
              case (_, "nulls-last") => c.asc_nulls_last
              case _ => c.asc_nulls_first
            }
          }
        }
      case None if applyDeclaredSort =>
        props.get("write.sort-order").toSeq
          .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)).map(col)
      case None => Nil
    }
    val stampOrderId: Option[Int] = declaredOrder.map(_.orderId)

    def configured(df: DataFrame): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
      val sorted =
        if (sortExprs.nonEmpty) df.sortWithinPartitions(sortExprs: _*) else df
      var w = pinnedWrite(sorted, spark).write.mode("errorifexists")
      maxRecords.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
      // parquet writer knobs (the reference's ParquetWriterConfig,
      // icelake/src/config.rs:59-71, as table properties)
      props.get("write.parquet.compression-codec")
        .foreach(c => w = w.option("compression", c))
      props.get("write.parquet.row-group-size-bytes")
        .foreach(n => w = w.option("parquet.block.size", n))
      props.get("write.parquet.page-size-bytes")
        .foreach(n => w = w.option("parquet.page.size", n))
      props.get("write.parquet.bloom-filter-enabled.columns")
        .foreach { cols =>
          cols.split(',').map(_.trim).filter(_.nonEmpty).foreach { c =>
            w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
          }
        }
      w
    }

    val wantExtended = props.get("write.stats.extended").contains("true")
    def extOf(paths: Seq[String]): Map[String, (Map[Int, Long], Map[Int, Long])] =
      if (wantExtended) extendedStats(spark, paths, infos) else Map.empty
    def enrich(f: IceDataFile, ext: Map[String, (Map[Int, Long], Map[Int, Long])]): IceDataFile =
      ext.get(GraftTable.normPathStr(f.filePath)) match {
        case Some((ndv, nan)) => f.copy(distinctCounts = ndv, nanValueCounts = nan)
        case None => f
      }

    // metrics modes resolved once on the driver; internal lineage fields
    // keep the engine default (they are not user schema columns)
    val metricsCfg = MetricsConfig.fromProperties(props, schema)

    val fmt = dataFormat(table.metadata)
    if (fmt == "avro")
      // no Spark writer for avro data files — a dedicated distributed
      // write that accumulates the manifest stats inline
      return writeFanoutDataFiles(
        table, spark, base, schema, spec, sortExprs, maxRecords, stampOrderId,
        "avro", lineageFields, metricsCfg)
    if (fmt == "orc" && OrcDataIO.canWrite(schema.fields ++ lineageFields))
      // orc goes through orc-core so every file carries iceberg.id
      // attributes (rename-safe id resolution on read); data layout is
      // Spark's own (OrcSerializer)
      return writeFanoutDataFiles(
        table, spark, base, schema, spec, sortExprs, maxRecords, stampOrderId,
        "orc", lineageFields, metricsCfg)

    /** format hooks shared by the unpartitioned/partitioned flows */
    def sink(df: DataFrame, parts: Seq[String] = Nil): Unit = {
      var w = configured(df)
      if (fmt == "orc")
        props.get("write.orc.compression-codec").foreach(c => w = w.option("compression", c))
      if (parts.nonEmpty) w = w.partitionBy(parts: _*)
      if (fmt == "orc") w.orc(outDir) else w.parquet(outDir)
    }
    // v3 ns timestamps: restamp the parquet footers with TIMESTAMP(NANOS)
    // so cross-engine readers see the real type, not a bare int64 (the
    // Spark writer has no ns type — the columns ride LongType carriers)
    // ns columns nested inside structs stamp too: names dot-join down the
    // struct path, matching ParquetFooter.restamp's prefix convention
    // (list/map-nested ns carriers stay bare int64 — no dot-path analog)
    def collectNs(fields: Seq[IceField], prefix: String): Seq[(String, Boolean)] =
      fields.flatMap { f =>
        f.fieldType match {
          case IcePrim("timestamp_ns") => Seq((prefix + f.name) -> false)
          case IcePrim("timestamptz_ns") => Seq((prefix + f.name) -> true)
          case IceStruct(nested) => collectNs(nested, s"$prefix${f.name}.")
          case _ => Nil
        }
      }
    val nsFields: Map[String, Boolean] =
      collectNs(schema.fields ++ lineageFields, "").toMap
    def listOut(): Seq[String] = {
      val paths = listDataFiles(table.conf, outDir, s".$fmt")
      if (fmt == "parquet" && nsFields.nonEmpty)
        paths.foreach(p => ParquetFooter.stampNanos(table.conf, p, nsFields))
      paths
    }
    def statsHarvest(paths: Seq[String]): Seq[FileStats] = fmt match {
      case "orc" =>
        val conf = org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)
        paths.map(p => OrcDataIO.statsOf(p, infos, conf, metricsCfg))
      case _ => harvest(spark, paths, infos, metricsCfg)
    }

    if (spec.isUnpartitioned) {
      sink(base)
      val paths = listOut()
      val ext = extOf(paths)
      statsHarvest(paths)
        .map(statsToDataFile(_, Nil, DataContent.Data, Nil, stampOrderId, fmt))
        .map(enrich(_, ext)).toList
    } else {
      val pcols = spec.fields.map(pf => s"_p_${pf.name}")
      val srcByid = spec.fields.map(pf =>
        schema.fieldById(pf.sourceId).getOrElse(sys.error(s"no field ${pf.sourceId}")))
      val withParts = spec.fields.zip(srcByid).foldLeft(base) { case (d, (pf, src)) =>
        d.withColumn(s"_p_${pf.name}",
          transformColumn(pf.transform, col(src.name), src.fieldType))
      }
      // Cluster rows by partition value before the fanout write — the
      // Iceberg `write.distribution-mode` property:
      //   hash (default) — ONE shuffle hash-clusters each partition
      //     tuple into one task: fewest output files, the right default;
      //   range — range-partition by the transforms (plus the table sort
      //     order): keeps a global order across files, the choice when a
      //     downstream read wants clustered+ordered data, and splits
      //     SKEWED partitions across tasks instead of bottlenecking one;
      //   none — no shuffle: each input task fans out to its local
      //     partition values (more small files, zero shuffle cost — for
      //     inputs already clustered upstream).
      val clustered = distributionMode(props) match {
        case "none" => withParts
        case "range" =>
          withParts.repartitionByRange((pcols.map(col) ++ sortExprs): _*)
        case _ => withParts.repartition(pcols.map(col): _*)
      }
      sink(clustered, pcols)
      val paths = listOut()
      val resultTypes = spec.fields.zip(srcByid).map { case (pf, src) =>
        SchemaConvert.transformResultType(pf.transform, src.fieldType) }
      val ext = extOf(paths)
      val stats = statsHarvest(paths)
      stats.map { st =>
        // partition values ride in the directory names under outDir
        val rel = st.path.stripPrefix(outDir).stripPrefix("/")
        val dirs = rel.split('/').dropRight(1)
        val values: Seq[Option[Any]] = spec.fields.zip(resultTypes).map { case (pf, rt) =>
          dirs.find(_.startsWith(s"_p_${pf.name}="))
            .flatMap(d => parsePartitionValue(rt, d.substring(d.indexOf('=') + 1)))
        }
        enrich(statsToDataFile(st, values, DataContent.Data, Nil, stampOrderId, fmt), ext)
      }.toList
    }
  }

  /** Distributed row-fanout data write (avro + orc): partition-transform
    * columns are computed in Catalyst (same clustering shuffle as the
    * parquet path), then each task runs a fanout [[RowFileWriter]] per
    * partition tuple with record-count rolling; the manifest stats come
    * back accumulated inline (avro) or harvested from the file tail on
    * close (orc). Only the tiny per-file descriptors return to the
    * driver. */
  private def writeFanoutDataFiles(
      table: GraftTable,
      spark: SparkSession,
      base: DataFrame,
      schema: IceSchema,
      spec: IcePartitionSpec,
      sortExprs: Seq[Column],
      maxRecords: Option[Long],
      stampOrderId: Option[Int],
      fmt: String,
      lineageFields: List[IceField] = Nil,
      metricsCfg: MetricsConfig = MetricsConfig.default): List[IceDataFile] = {
    val writeId = UUID.randomUUID().toString
    // per-FILE location minting: each file can land under its own
    // object-store hash prefix (full Iceberg object-storage semantics on
    // this executor-side writer path)
    val locSpec = Locations.specFor(table.metadata, table.location, writeId)
    val fields = schema.visibleFields ++ lineageFields
    val nData = fields.size
    val codec = table.metadata.properties.getOrElse(
      if (fmt == "orc") "write.orc.compression-codec" else "write.avro.compression-codec",
      "snappy")
    val sparkDataSchema = org.apache.spark.sql.types.StructType(
      fields.map(f => org.apache.spark.sql.types.StructField(
        f.name, SchemaConvert.toSparkType(f.fieldType), !f.required)))
    val roll = maxRecords.getOrElse(Long.MaxValue)
    val serConf = new SerializableHadoopConf(
      org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))

    val srcByid = spec.fields.map(pf =>
      schema.fieldById(pf.sourceId).getOrElse(sys.error(s"no field ${pf.sourceId}")))
    val withParts = spec.fields.zip(srcByid).foldLeft(base) { case (d, (pf, src)) =>
      d.withColumn(s"_p_${pf.name}",
        transformColumn(pf.transform, col(src.name), src.fieldType))
    }
    val clustered =
      if (spec.isUnpartitioned) base
      else distributionMode(table.metadata.properties) match {
        case "none" => withParts
        case "range" => withParts.repartitionByRange(
          (spec.fields.map(pf => col(s"_p_${pf.name}")) ++ sortExprs): _*)
        case _ => withParts.repartition(spec.fields.map(pf => col(s"_p_${pf.name}")): _*)
      }
    val sorted =
      if (sortExprs.nonEmpty) clustered.sortWithinPartitions(sortExprs: _*) else clustered
    val resultTypes = spec.fields.zip(srcByid).map { case (pf, src) =>
      SchemaConvert.transformResultType(pf.transform, src.fieldType) }
    val partSparkTypes = resultTypes.map(SchemaConvert.toSparkType).toArray
    val dataOrdinals = Array.tabulate(nData)(identity)

    val collected = org.apache.spark.sql.GraftBridge.internalRdd(sorted)
      .mapPartitionsWithIndex { (pid, rows) =>
        val conf = serConf.value
        val attempt = Option(org.apache.spark.TaskContext.get)
          .map(_.taskAttemptId).getOrElse(0L)
        val open = scala.collection.mutable.HashMap
          .empty[Seq[Option[Any]], RowFileWriter]
        val done = scala.collection.mutable.ListBuffer
          .empty[(FileStats, Seq[Option[Any]])]
        var fileCount = 0
        def newWriter(): RowFileWriter = {
          val path = locSpec.path(f"part-$pid%05d-$attempt-$fileCount%05d.$fmt")
          fileCount += 1
          if (fmt == "orc")
            new OrcDataIO.RowWriter(conf, path, fields, sparkDataSchema, codec, metricsCfg)
          else
            new AvroDataIO.RowWriter(conf, path, fields, dataOrdinals, codec, metricsCfg)
        }
        // manifest-boxed partition value (matches TransformEval.box)
        def boxed(v: Any): Any = v match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
          case other => other
        }
        try {
          rows.foreach { row =>
            val partition: Seq[Option[Any]] = spec.fields.indices.map { i =>
              val ord = nData + i
              if (row.isNullAt(ord)) None
              else Some(boxed(row.get(ord, partSparkTypes(i))))
            }
            var w = open.getOrElseUpdate(partition, newWriter())
            if (w.records >= roll) {
              done += ((w.close(), partition))
              w = newWriter()
              open(partition) = w
            }
            w.write(row)
          }
          open.foreach { case (partition, w) =>
            val st = w.close()
            if (st.recordCount > 0) done += ((st, partition))
            else try {
              val p = new Path(st.path)
              p.getFileSystem(conf).delete(p, false)
            } catch { case _: Throwable => }
          }
          done.iterator.map { case (st, partition) =>
            statsToDataFile(st, partition, DataContent.Data, Nil, stampOrderId, fmt)
          }
        } catch {
          case e: Throwable =>
            open.values.foreach(_.abort())
            throw e
        }
      }.collect().toList
    collected
  }

  /** write position/equality delete files. Field ids are stamped into the
    * parquet (reserved 2147483546/2147483545 for position-delete columns,
    * the data schema's ids for equality keys) so readers can resolve
    * delete columns by id across renames. */
  def writeDeleteFiles(
      table: GraftTable,
      spark: SparkSession,
      df: DataFrame,
      content: Int,
      equalityIds: Seq[Int],
      partition: Seq[Option[Any]] = Nil): List[IceDataFile] = {
    val writeId = UUID.randomUUID().toString
    val outDir = Locations.writeDir(table.metadata, table.location, writeId)
    val infos: Seq[FieldInfo] =
      if (content == DataContent.PositionDeletes)
        Seq(FieldInfo("file_path", 2147483546, "string"), FieldInfo("pos", 2147483545, "long"))
      else {
        val schema = table.metadata.currentSchema
        equalityIds.flatMap(id => schema.fieldById(id)
          .map(f => FieldInfo(f.name, f.id, f.fieldType.repr)))
      }
    val stamped = df.select(infos.map { i =>
      val md = new MetadataBuilder().putLong(SchemaConvert.FieldIdKey, i.id.toLong).build()
      // store the canonical path form in position deletes: readers push
      // `file_path == <data file>` down to row groups, and a single form
      // keeps that predicate (and the manifest bounds) exact
      val src =
        if (content == DataContent.PositionDeletes && i.name == "file_path")
          GraftTable.normPath(col(i.name))
        else col(i.name)
      src.as(i.name, md)
    }: _*)
    pinnedWrite(stamped, spark).write.mode("errorifexists").parquet(outDir)
    val paths = listParquet(table.conf, outDir)
    harvest(spark, paths, infos)
      .filter(_.recordCount > 0)
      .map(statsToDataFile(_, partition, content, equalityIds)).toList
  }

  /** write position-delete files partition-scoped: `routed` carries
    * (file_path, pos, _dp) where _dp indexes `partitions`; rows fan out
    * into one hive-style dir per partition so each delete file is stamped
    * with the partition tuple of the data rows it deletes. */
  def writePartitionedDeleteFiles(
      table: GraftTable,
      spark: SparkSession,
      routed: DataFrame,
      partitions: List[Seq[Option[Any]]]): List[IceDataFile] = {
    val writeId = UUID.randomUUID().toString
    val outDir = Locations.writeDir(table.metadata, table.location, writeId)
    val infos = Seq(
      FieldInfo("file_path", 2147483546, "string"), FieldInfo("pos", 2147483545, "long"))
    val md = (i: FieldInfo) =>
      new MetadataBuilder().putLong(SchemaConvert.FieldIdKey, i.id.toLong).build()
    pinnedWrite(
      routed
        .select(
          GraftTable.normPath(col("file_path")).as("file_path", md(infos(0))),
          col("pos").as("pos", md(infos(1))),
          col("_dp"))
        .repartition(col("_dp"))
        .sortWithinPartitions(col("file_path"), col("pos")),
      spark)
      .write.mode("errorifexists").partitionBy("_dp").parquet(outDir)
    val paths = listParquet(table.conf, outDir)
    harvest(spark, paths, infos).filter(_.recordCount > 0).map { st =>
      val rel = st.path.stripPrefix(outDir).stripPrefix("/")
      val partition = rel.split('/').dropRight(1)
        .find(_.startsWith("_dp="))
        .map(_.stripPrefix("_dp="))
        .filter(_ != "__HIVE_DEFAULT_PARTITION__")
        .map(idx => partitions(idx.toInt))
        .getOrElse(Nil)
      statsToDataFile(st, partition, DataContent.PositionDeletes, Nil)
    }.toList
  }

  private def statsToDataFile(
      st: FileStats,
      partition: Seq[Option[Any]],
      content: Int,
      equalityIds: Seq[Int],
      sortOrderId: Option[Int] = None,
      fileFormat: String = "parquet"): IceDataFile =
    IceDataFile(
      content = content,
      filePath = st.path,
      fileFormat = fileFormat,
      partition = partition,
      recordCount = st.recordCount,
      fileSizeInBytes = st.fileSize,
      columnSizes = st.columnSizes,
      valueCounts = st.valueCounts,
      nullValueCounts = st.nullCounts,
      nanValueCounts = st.nanCounts,
      lowerBounds = st.lowerBounds,
      upperBounds = st.upperBounds,
      splitOffsets = st.splitOffsets,
      equalityIds = equalityIds,
      sortOrderId = sortOrderId)
}
