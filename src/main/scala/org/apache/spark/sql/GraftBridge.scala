package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters of
  * Spark 4's classic module, so graft code can expose custom Catalyst
  * expressions as user-facing `Column`s. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column into a concrete catalyst expression tree
    * (UnresolvedAttribute / Literal / And / comparison nodes) — the lazy
    * ColumnNodeExpression wrapper hides the tree from pattern matching. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Re-tag a batch DataFrame as a streaming one — required for V1
    * streaming Source.getBatch results (MicroBatchExecution asserts
    * isStreaming). */
  def asStreamingDataFrame(df: DataFrame): DataFrame = {
    val classicSpark = df.sparkSession.asInstanceOf[classic.SparkSession]
    classicSpark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Re-bind a DataFrame's logical plan onto `owner` — a DataFrame built
    * inside a pinned session clone registers temp views in the CLONE's
    * registry, which is discarded with it; re-binding makes
    * session-scoped registrations land in the user's session. Resolved
    * file relations inside the plan keep their original session (and so
    * their pinned read confs). */
  def onSession(owner: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(
      owner.asInstanceOf[classic.SparkSession], df.queryExecution.logical)

  /** The inverse, for V1 streaming Sink.addBatch inputs: the micro-batch
    * is bounded, but its DataFrame is streaming-tagged and refuses batch
    * writers — re-wrap the executed plan as a batch DataFrame. */
  def asBatchDataFrame(df: DataFrame): DataFrame = {
    val classicSpark = df.sparkSession.asInstanceOf[classic.SparkSession]
    classicSpark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Clone of `spark` — shared context and catalog, copied confs — with
    * graft's parquet invariants pinned: field-id column resolution on
    * read (renamed columns keep reading pre-rename files), field-id
    * stamping + micros timestamps on write. Facade reads/writes run
    * under the clone so the USER'S session conf is never mutated; a
    * DataFrameReader option cannot do this because ParquetFileFormat
    * re-reads these keys from the session conf at execution time.
    *
    * One clone is cached per origin session (each clone registers an
    * ExecutionListenerBus on the shared listener bus — cloning per scan
    * would leak listeners); confs are re-synced from the origin on every
    * access so later user conf changes still apply. */
  def pinnedSession(spark: SparkSession): SparkSession = pinnedCache.synchronized {
    import org.apache.spark.sql.internal.SQLConf
    val origin = spark.asInstanceOf[classic.SparkSession]
    val clone = pinnedCache.get(origin) match {
      case null =>
        val c = origin.cloneSession()
        pinnedCache.put(origin, c)
        c
      case c => c
    }
    val originAll = origin.conf.getAll
    val pinnedKeys = Set(
      SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      "spark.sql.parquet.fieldId.read.ignoreMissing",
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key)
    // keys the user has since UNSET on the origin must not linger in the
    // clone (stale values would silently keep applying to graft reads)
    clone.conf.getAll.keys.foreach { k =>
      if (!originAll.contains(k) && !pinnedKeys.contains(k)) clone.conf.unset(k)
    }
    originAll.foreach { case (k, v) =>
      if (!clone.conf.getOption(k).contains(v)) clone.conf.set(k, v)
    }
    clone.conf.set(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key, "true")
    clone.conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
    // imported files (add_files) carry no Iceberg field ids: fall back to
    // name resolution for them instead of refusing the whole read
    clone.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
    clone.conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    clone
  }

  /** a connector literal (LiteralValue is private[sql]); value must be
    * in catalyst form (UTF8String for strings, micros for timestamps) */
  def v2Literal(
      value: Any,
      dataType: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[_] =
    org.apache.spark.sql.connector.expressions.LiteralValue(value, dataType)

  /** V2 runtime-filter predicates as V1 source filters (PredicateUtils
    * is private[sql]) */
  def predicatesToV1(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicates)

  /** session-scoped hadoop conf (includes per-session options set via
    * `spark.conf` — e.g. FS credentials — which the raw SparkContext
    * hadoopConfiguration lacks) */
  def sessionHadoopConf(spark: SparkSession): org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.newHadoopConfWithOptions(Map.empty)

  private val pinnedCache =
    new java.util.WeakHashMap[classic.SparkSession, classic.SparkSession]()

  /** DataFrame over a DSv2 Table via DataSourceV2Relation — the facade
    * scan rides the native scan planning (one code path for SQL and
    * DataFrame reads). */
  def v2ScanDataFrame(
      spark: SparkSession,
      table: org.apache.spark.sql.connector.catalog.Table,
      options: Map[String, String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    val rel = DataSourceV2Relation.create(
      table, None, None,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(options.asJava))
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], rel)
  }

  /** Rebind a DataFrame's logical plan to another session over the same
    * context, so executing it — e.g. a write — picks up that session's
    * conf instead of the plan's original session. */
  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    classic.Dataset.ofRows(
      to.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical)

  // ---- native DSv2 read path: internal file-source machinery ----

  /** Pack (path, fileSize) pairs into FilePartitions of ~maxBytes each.
    * Files LARGER than maxBytes are split into byte ranges first (the
    * parquet reader assigns each row group to the range holding its
    * midpoint), so one skewed jumbo file fans out over many tasks
    * instead of becoming a straggler. */
  def filePartitions(
      files: Seq[(String, Long)],
      maxBytes: Long): Seq[org.apache.spark.sql.connector.read.InputPartition] = {
    import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
    import org.apache.spark.sql.catalyst.InternalRow
    val slices = files.flatMap { case (path, size) =>
      byteRanges(size, maxBytes).map { case (start, len) => (path, size, start, len) }
    }
    val partitions = scala.collection.mutable.ArrayBuffer[FilePartition]()
    var current = scala.collection.mutable.ArrayBuffer[PartitionedFile]()
    var currentBytes = 0L
    def flush(): Unit = if (current.nonEmpty) {
      partitions += FilePartition(partitions.size, current.toArray)
      current = scala.collection.mutable.ArrayBuffer[PartitionedFile]()
      currentBytes = 0L
    }
    slices.sortBy(-_._4).foreach { case (path, size, start, len) =>
      if (currentBytes + len > maxBytes) flush()
      current += PartitionedFile(
        InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(path),
        start, len, Array.empty, 0L, size)
      currentBytes += len
    }
    flush()
    partitions.toSeq
  }

  /** tile [0, size) into ranges of at most maxBytes */
  def byteRanges(size: Long, maxBytes: Long): Seq[(Long, Long)] =
    if (size <= maxBytes || maxBytes <= 0) Seq((0L, size))
    else (0L until size by maxBytes).map(s => (s, math.min(maxBytes, size - s)))

  /** one whole-file FilePartition per data file — MoR readers count row
    * positions sequentially, which is only valid over full files */
  def wholeFilePartition(
      index: Int, path: String, size: Long): org.apache.spark.sql.connector.read.InputPartition =
    rangeFilePartition(index, path, 0L, size, size)

  /** a byte-range FilePartition over one file: the parquet reader serves
    * the row groups whose midpoint falls inside [start, start+len) */
  def rangeFilePartition(
      index: Int, path: String, start: Long, len: Long, fileSize: Long)
      : org.apache.spark.sql.connector.read.InputPartition = {
    import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
    import org.apache.spark.sql.catalyst.InternalRow
    FilePartition(index, Array(PartitionedFile(
      InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(path),
      start, len, Array.empty, 0L, fileSize)))
  }

  /** collect a DataFrame as catalyst InternalRows (UnsafeRow copies) —
    * lets delete state keep catalyst-typed values (UTF8String, micros)
    * that compare bit-for-bit against reader output */
  def collectInternal(df: DataFrame): Array[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan.executeCollect()

  /** connector SortOrder with explicit null ordering (LogicalExpressions
    * is private[sql]) */
  def sortOrder(
      column: String,
      descending: Boolean,
      nullsLast: Boolean): org.apache.spark.sql.connector.expressions.SortOrder = {
    import org.apache.spark.sql.connector.expressions._
    LogicalExpressions.sort(
      Expressions.column(column),
      if (descending) SortDirection.DESCENDING else SortDirection.ASCENDING,
      if (nullsLast) NullOrdering.NULLS_LAST else NullOrdering.NULLS_FIRST)
  }

  /** ascending connector SortOrder over an arbitrary expression (e.g. a
    * partition transform) — the range write-distribution mode */
  def sortOrderFor(
      expr: org.apache.spark.sql.connector.expressions.Expression)
      : org.apache.spark.sql.connector.expressions.SortOrder = {
    import org.apache.spark.sql.connector.expressions._
    LogicalExpressions.sort(expr, SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)
  }

  // ---- native DSv2 write path: executor-side parquet row writer ----

  /** Hadoop conf pre-configured for Spark's InternalRow parquet
    * WriteSupport over `schema` — delegates to ParquetFileFormat's own
    * prepareWrite so every session key the write support expects is set,
    * then pins the graft invariants (field ids, micros timestamps) —
    * build once on the driver, ship serialized. */
  def parquetWriterConf(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      compression: String,
      hadoopSettings: Map[String, String] = Map.empty): org.apache.hadoop.conf.Configuration = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      classicSpark.sessionState.newHadoopConf())
    new ParquetFileFormat().prepareWrite(
      classicSpark, job, Map("compression" -> compression), schema)
    val conf = job.getConfiguration
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
    hadoopSettings.foreach { case (k, v) => conf.set(k, v) }
    ParquetWriteSupport.setSchema(schema, conf)
    conf
  }

  /** open one parquet file for InternalRows at `path` (executor side) */
  def openRowWriter(
      conf: org.apache.hadoop.conf.Configuration,
      path: String,
      partitionId: Int,
      taskId: Long): org.apache.spark.sql.execution.datasources.OutputWriter = {
    import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
    import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft", 0), TaskType.MAP, partitionId), taskId.toInt)
    val ctx = new TaskAttemptContextImpl(conf, attempt)
    new org.apache.spark.sql.execution.datasources.parquet.ParquetOutputWriter(path, ctx)
  }

  /** executed-plan RDD of catalyst rows (rows are reused buffers — consume
    * or copy within the partition) */
  def internalRdd(df: DataFrame): org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  // ---- ORC data files: Spark's native reader/writer behind the same
  // builder shape as parquet ----

  /** Spark's ORC reader factory (vectorized) over a fixed schema —
    * resolves columns by NAME (ORC carries no Iceberg field ids) */
  def orcFactoryBuilder(
      spark: SparkSession,
      dataSchemaRaw: org.apache.spark.sql.types.StructType,
      readSchemaRaw: org.apache.spark.sql.types.StructType): GraftOrcFactoryBuilder = {
    import org.apache.spark.util.SerializableConfiguration
    val dataSchema = dataSchemaRaw.asNullable
    val readSchema = readSchemaRaw.asNullable
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val sqlConf = classicSpark.sessionState.conf
    val hadoopConf = classicSpark.sessionState.newHadoopConfWithOptions(Map.empty)
    val broadcastConf = classicSpark.sparkContext.broadcast(
      new SerializableConfiguration(hadoopConf))
    // the explicit conf entries, NOT the live SQLConf: a deserialized
    // SQLConf has a null ConfigReader, so factories built EXECUTOR-side
    // (per-file ORC field-id resolution) would NPE on any default read —
    // each side rebuilds a live SQLConf from these entries instead
    GraftOrcFactoryBuilder(sqlConf.getAllConfs, broadcastConf, dataSchema, readSchema)
  }

  /** ORC OutputWriterFactory via OrcFileFormat.prepareWrite (sets the
    * schema/compression conf keys the writer expects); the returned conf
    * ships to executors for [[newFormatWriter]] */
  def orcWriterFactory(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      options: Map[String, String]): (org.apache.spark.sql.execution.datasources.OutputWriterFactory, org.apache.hadoop.conf.Configuration) = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      classicSpark.sessionState.newHadoopConf())
    val factory = new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat()
      .prepareWrite(classicSpark, job, options, schema)
    (factory, job.getConfiguration)
  }

  /** open one file through a V1 OutputWriterFactory (executor side) */
  def newFormatWriter(
      factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
      conf: org.apache.hadoop.conf.Configuration,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      partitionId: Int,
      taskId: Long): org.apache.spark.sql.execution.datasources.OutputWriter = {
    import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
    import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft", 0), TaskType.MAP, partitionId), taskId.toInt)
    factory.newInstance(path, schema, new TaskAttemptContextImpl(conf, attempt))
  }

  /** Spark's vectorized parquet reader factory over a fixed schema */
  def parquetReaderFactory(
      spark: SparkSession,
      dataSchema: org.apache.spark.sql.types.StructType,
      readSchema: org.apache.spark.sql.types.StructType,
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    parquetFactoryBuilder(spark, dataSchema, readSchema).build(filters)

  /** Serializable builder for parquet reader factories over a fixed read
    * schema: the expensive parts (hadoop conf broadcast) happen ONCE on
    * the driver; executors can then construct per-task FILTERED readers —
    * e.g. a position-delete read pushed down to one data file's path —
    * without a factory per task shipping from the driver. */
  def parquetFactoryBuilder(
      spark: SparkSession,
      dataSchemaRaw: org.apache.spark.sql.types.StructType,
      readSchemaRaw: org.apache.spark.sql.types.StructType): GraftParquetFactoryBuilder = {
    import org.apache.spark.util.SerializableConfiguration
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    // file reads are always nullable (as V1 HadoopFsRelation forces): a
    // REQUIRED field can be absent from files that predate it — the
    // vectorized reader throws on missing required columns, while the MoR
    // projection above the read restores defaults / non-null semantics
    val dataSchema = dataSchemaRaw.asNullable
    val readSchema = readSchemaRaw.asNullable
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val sqlConf = classicSpark.sessionState.conf
    val hadoopConf = classicSpark.sessionState.newHadoopConfWithOptions(Map.empty)
    // mirror ParquetScan.createReaderFactory's reader configuration
    hadoopConf.set(
      org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hadoopConf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, readSchema.json)
    hadoopConf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, readSchema.json)
    hadoopConf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    hadoopConf.setBoolean(
      SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key, sqlConf.nestedSchemaPruningEnabled)
    hadoopConf.setBoolean(SQLConf.CASE_SENSITIVE.key, sqlConf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(readSchema, hadoopConf)
    hadoopConf.setBoolean(
      SQLConf.PARQUET_BINARY_AS_STRING.key, sqlConf.isParquetBinaryAsString)
    hadoopConf.setBoolean(
      SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, sqlConf.isParquetINT96AsTimestamp)
    // always resolve by field id — graft files carry ids, and id-based
    // resolution is what keeps renamed columns readable; files imported
    // via add_files have no ids and fall back to name resolution
    hadoopConf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key, true)
    hadoopConf.setBoolean("spark.sql.parquet.fieldId.read.ignoreMissing", true)
    hadoopConf.setBoolean(
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    hadoopConf.setBoolean(
      SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, sqlConf.legacyParquetNanosAsLong)
    val broadcastConf = classicSpark.sparkContext.broadcast(
      new SerializableConfiguration(hadoopConf))
    GraftParquetFactoryBuilder(sqlConf, broadcastConf, dataSchema, readSchema)
  }
}

/** See [[GraftBridge.orcFactoryBuilder]]. */
case class GraftOrcFactoryBuilder private[sql] (
    private val sqlConfEntries: Map[String, String],
    private val bcConf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
    private val dataSchema: org.apache.spark.sql.types.StructType,
    private val readSchema: org.apache.spark.sql.types.StructType)
    extends Serializable {

  /** live SQLConf rebuilt from the captured entries — usable on both the
    * driver and executors (a serialized session SQLConf is not) */
  @transient private lazy val sqlConf: org.apache.spark.sql.internal.SQLConf = {
    val c = new org.apache.spark.sql.internal.SQLConf()
    sqlConfEntries.foreach { case (k, v) => c.setConfString(k, v) }
    c
  }

  def build(filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.orc.OrcOptions
    import org.apache.spark.sql.execution.datasources.v2.orc.OrcPartitionReaderFactory
    OrcPartitionReaderFactory(
      sqlConf,
      bcConf,
      dataSchema,
      readSchema,
      new org.apache.spark.sql.types.StructType(),
      filters,
      None,
      new OrcOptions(
        org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(Map.empty[String, String]),
        sqlConf),
      org.apache.spark.memory.MemoryMode.ON_HEAP)
  }

  /** per-file variant: same conf, substituted schemas (ORC field-id
    * resolution rewrites the schemas into the file's own column names) */
  def buildResolved(
      data: org.apache.spark.sql.types.StructType,
      read: org.apache.spark.sql.types.StructType,
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    copy(dataSchema = data.asNullable, readSchema = read.asNullable).build(filters)

  /** the broadcast hadoop conf (executor-side footer reads) */
  def hadoopConf: org.apache.hadoop.conf.Configuration = bcConf.value.value

  def schemas: (org.apache.spark.sql.types.StructType, org.apache.spark.sql.types.StructType) =
    (dataSchema, readSchema)
}

/** See [[GraftBridge.parquetFactoryBuilder]]. Lives in this package so it
  * can hold the `private[sql]` factory pieces; only `build` is public. */
case class GraftParquetFactoryBuilder private[sql] (
    private val sqlConf: org.apache.spark.sql.internal.SQLConf,
    private val bcConf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
    private val dataSchema: org.apache.spark.sql.types.StructType,
    private val readSchema: org.apache.spark.sql.types.StructType)
    extends Serializable {

  /** construct a reader factory (driver or executor side) */
  def build(filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
    import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
    ParquetPartitionReaderFactory(
      sqlConf,
      bcConf,
      dataSchema,
      readSchema,
      new org.apache.spark.sql.types.StructType(),
      filters,
      None,
      new ParquetOptions(
        org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(Map.empty[String, String]),
        sqlConf))
  }
}
