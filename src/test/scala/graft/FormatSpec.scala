package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Data-file format coverage: Iceberg data files may be parquet, ORC or
  * Avro (`write.format.default`). Round-trips, stats harvest, MoR
  * deletes, schema evolution (field-id resolution for avro), partitioned
  * writes, byte-range splits, and mixed-format snapshots. */
class FormatSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val sfDir = "/root/testdata/sf0.001"

  private def freshTable(name: String, fmt: String,
      src: org.apache.spark.sql.DataFrame,
      spec: IceSchema => IcePartitionSpec = _ => IcePartitionSpec(0, Nil)): GraftTable = {
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    StorageCatalog.createOrReplaceTable(conf, tmpLocation(name), schema, spec(schema))
      .setProperties(Map("write.format.default" -> fmt))
  }

  test("orc round-trip: append orders, scan back, stats harvested") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val t = freshTable("orc-rt", "orc", src).append(spark, src)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.nonEmpty && files.forall(_.file.fileFormat === "orc"))
    val f = files.head.file
    assert(f.recordCount > 0 && f.valueCounts.nonEmpty && f.nullValueCounts.nonEmpty)
    // int/long/string/double bounds harvested from the ORC tail
    assert(f.lowerBounds.nonEmpty && f.upperBounds.nonEmpty)
    val back = t.scan(spark)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("orc bounds prune files") {
    val src = spark.range(0, 1000).selectExpr("id AS k", "cast(id as string) AS v")
    val t0 = freshTable("orc-prune", "orc", src)
    // two appends -> two files with disjoint k ranges
    val t1 = t0.append(spark, src.filter(col("k") < 500).coalesce(1))
    val t = t1.append(spark, src.filter(col("k") >= 500).coalesce(1))
    val planned = t.planFiles(t.metadata.currentSnapshot.get)
    assert(planned.size === 2)
    val pruned = PruneEval.prunePlanned(
      planned, Some(col("k") === 7L), t.metadata, t.metadata.currentSchema)
    assert(pruned.size === 1)
  }

  test("avro round-trip: append orders, scan back, inline stats") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val t = freshTable("avro-rt", "avro", src).append(spark, src)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.nonEmpty && files.forall(_.file.fileFormat === "avro"))
    val f = files.head.file
    assert(f.recordCount > 0 && f.valueCounts.nonEmpty)
    assert(f.lowerBounds.nonEmpty && f.upperBounds.nonEmpty)
    // bounds carry real values (o_orderkey long)
    val keyField = t.metadata.currentSchema.findField("o_orderkey").get
    val lo = SingleValue.decode(keyField.fieldType, f.lowerBounds(keyField.id))
    val hi = SingleValue.decode(keyField.fieldType, f.upperBounds(keyField.id))
    assert(lo.asInstanceOf[Long] <= hi.asInstanceOf[Long])
    val back = t.scan(spark)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("avro nested types round-trip (array, map, struct, decimal, date, ts)") {
    val src = spark.sql(
      """SELECT id,
        |  array(id, id + 1) AS arr,
        |  map(concat('k', id), cast(id AS double)) AS m,
        |  named_struct('a', id, 'b', concat('s', id)) AS st,
        |  cast(id AS decimal(12, 2)) / 100 AS dec,
        |  date_add(date'2024-01-01', cast(id AS int)) AS d,
        |  timestamp_micros(1700000000000000 + id * 1000000) AS ts
        |FROM range(0, 100)""".stripMargin)
    val t = freshTable("avro-nested", "avro", src).append(spark, src)
    val back = t.scan(spark)
    assert(back.count() === 100)
    // map columns refuse set operations — compare as sorted entries
    def comparable(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("m", array_sort(map_entries(col("m"))))
    assert(comparable(back).exceptAll(comparable(src)).isEmpty &&
      comparable(src).exceptAll(comparable(back)).isEmpty)
  }

  test("orc rename keeps old files readable (iceberg.id attribute resolution)") {
    val src = spark.range(0, 50).selectExpr("id AS k", "concat('v', id) AS v")
    val t0 = freshTable("orc-rename", "orc", src).append(spark, src)
    // files carry the spec's ORC attributes
    val f = t0.planFiles(t0.metadata.currentSnapshot.get).head.file
    val reader = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(f.filePath),
      org.apache.orc.OrcFile.readerOptions(conf))
    try {
      val td = reader.getSchema
      assert(td.getChildren.get(0).getAttributeValue("iceberg.id") === "1")
      assert(td.getChildren.get(1).getAttributeValue("iceberg.id") === "2")
    } finally reader.close()
    // rename AFTER the write: id resolution keeps the column readable
    val t = t0.renameColumn("v", "label")
    val back = t.scan(spark)
    assert(back.columns.toSeq === Seq("k", "label"))
    assert(back.filter(col("label") === "v7").count() === 1)
    assert(back.filter(col("label").isNull).count() === 0)
    // a column added after the write reads null from the old files
    val t2 = t.addColumn("extra", IcePrim("string"))
    val back2 = t2.scan(spark)
    assert(back2.count() === 50 && back2.filter(col("extra").isNull).count() === 50)
  }

  test("legacy orc files without id attributes still resolve by name") {
    val src = spark.range(0, 30).selectExpr("id AS k", "concat('v', id) AS v")
    val t = freshTable("orc-legacy", "orc", src).append(spark, src)
    // fabricate a legacy file: Spark's own ORC writer (no attributes)
    val tmp = tmpLocation("orc-legacy-ext")
    spark.range(100, 120).selectExpr("id AS k", "concat('v', id) AS v")
      .coalesce(1).write.orc(tmp)
    val raw = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".orc")).head
    val legacyPath = s"${t.location}/data/legacy-0.orc"
    Files.createDirectories(java.nio.file.Paths.get(s"${t.location}/data"))
    Files.copy(raw.toPath, java.nio.file.Paths.get(legacyPath))
    val infos = t.metadata.currentSchema.fields.map(fl =>
      GraftTable.FieldInfo(fl.name, fl.id, fl.fieldType.repr))
    val st = OrcDataIO.statsOf(legacyPath, infos, conf)
    t.commit(spark, "append", List(IceDataFile(
      content = 0, filePath = legacyPath, fileFormat = "orc", partition = Nil,
      recordCount = st.recordCount, fileSizeInBytes = st.fileSize)), Nil, replace = false)
    val t2 = StorageCatalog.loadTable(conf, t.location)
    val back = t2.scan(spark)
    assert(back.count() === 50)
    // both the attributed and the legacy file's rows resolve
    assert(back.filter(col("v") === "v7").count() === 1)
    assert(back.filter(col("v") === "v107").count() === 1)
    assert(back.filter(col("v").isNull).count() === 0)
  }

  test("avro rename keeps old files readable (field-id resolution)") {
    val src = spark.range(0, 50).selectExpr("id AS k", "concat('v', id) AS v")
    val t0 = freshTable("avro-rename", "avro", src).append(spark, src)
    val t = t0.renameColumn("v", "label")
    val back = t.scan(spark)
    assert(back.columns.toSeq === Seq("k", "label"))
    assert(back.filter(col("label") === "v7").count() === 1)
  }

  test("MoR position deletes on avro data files") {
    val src = spark.range(0, 200).selectExpr("id AS k", "concat('v', id) AS v")
    val t0 = freshTable("avro-mor", "avro", src).append(spark, src)
    val t = t0.deleteWhere(spark, col("k") % 10 === 0)
    val back = t.scan(spark)
    assert(back.count() === 180)
    assert(back.filter(col("k") % 10 === 0).count() === 0)
    // and the deleted-row content still surfaces through the changelog
    val snap0 = t.metadata.snapshots.minBy(_.sequenceNumber).snapshotId
    val changes = t.changes(spark, snap0)
    assert(changes.filter(col("_change_type") === "delete").count() === 20)
  }

  test("MoR position deletes on orc data files") {
    val src = spark.range(0, 200).selectExpr("id AS k", "concat('v', id) AS v")
    val t0 = freshTable("orc-mor", "orc", src).append(spark, src)
    val t = t0.deleteWhere(spark, col("k") < 50)
    val back = t.scan(spark)
    assert(back.count() === 150)
    assert(back.agg(min(col("k"))).head.getLong(0) === 50L)
  }

  test("partitioned avro write: partition tuples + pruning") {
    val src = spark.range(0, 300)
      .selectExpr("id AS k", "cast(id % 3 AS int) AS bucket3", "concat('v', id) AS v")
    val t = freshTable("avro-part", "avro", src,
      s => IcePartitionSpec(0, List(IcePartitionField(
        s.findField("bucket3").get.id, 1000, "identity", "bucket3"))))
      .append(spark, src)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.map(_.file.partition).distinct.size === 3)
    assert(files.forall(_.file.partition.head.isDefined))
    val pruned = PruneEval.prunePlanned(
      files, Some(col("bucket3") === 1), t.metadata, t.metadata.currentSchema)
    assert(pruned.forall(_.file.partition.head.contains(1)))
    assert(pruned.size < files.size)
    val back = t.scan(spark, filter = Some(col("bucket3") === 1))
    assert(back.count() === 100)
  }

  test("avro byte-range splits read every row exactly once") {
    val src = spark.range(0, 20000)
      .selectExpr("id AS k", "repeat('x', 200) AS pad")
      .coalesce(1)
    val t = freshTable("avro-split", "avro", src).append(spark, src)
    val f = t.planFiles(t.metadata.currentSnapshot.get).head.file
    assert(f.fileSizeInBytes > 256 * 1024) // big enough to split
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (128 * 1024).toString)
      val back = t.scan(spark)
      assert(back.count() === 20000)
      assert(back.agg(sum(col("k"))).head.getLong(0) === 20000L * 19999 / 2)
      assert(back.rdd.getNumPartitions > 1) // the file actually split
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("mixed-format snapshot: parquet + orc + avro files in one scan") {
    val src = spark.range(0, 90).selectExpr("id AS k", "concat('v', id) AS v")
    val t0 = freshTable("mixed", "parquet", src)
    val t1 = t0.append(spark, src.filter(col("k") < 30))
    val t2 = t1.setProperties(Map("write.format.default" -> "orc"))
      .append(spark, src.filter(col("k") >= 30 && col("k") < 60))
    val t = t2.setProperties(Map("write.format.default" -> "avro"))
      .append(spark, src.filter(col("k") >= 60))
    val formats = t.planFiles(t.metadata.currentSnapshot.get).map(_.file.fileFormat).toSet
    assert(formats === Set("parquet", "orc", "avro"))
    val back = t.scan(spark)
    assert(back.count() === 90)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("deletion vectors apply to avro data files") {
    val src = spark.range(0, 200).selectExpr("id AS k", "concat('v', id) AS v")
    val t0 = freshTable("avro-dv", "avro", src)
      .setProperties(Map(GraftTable.DvEnabledProp -> "true"))
    val t1 = t0.append(spark, src)
    val t = t1.deleteWhere(spark, col("k") % 4 === 0)
    val dvs = t.planFiles(t.metadata.currentSnapshot.get)
      .filter(_.file.isDeletionVector)
    assert(dvs.nonEmpty) // the delete landed as a puffin vector
    val back = t.scan(spark)
    assert(back.count() === 150)
    assert(back.filter(col("k") % 4 === 0).count() === 0)
  }

  test("orc/avro compression codec properties apply") {
    // highly repetitive payload: any real codec shrinks it dramatically
    val src = spark.range(0, 5000)
      .selectExpr("id AS k", "repeat('abcdef', 50) AS pad").coalesce(1)
    def sizeOf(fmt: String, props: Map[String, String]): Long = {
      val t = freshTable(s"codec-$fmt-${props.hashCode}", fmt, src)
        .setProperties(props)
      t.append(spark, src)
      t.planFiles(t.metadata.currentSnapshot.get).map(_.file.fileSizeInBytes).sum
    }
    val avroRaw = sizeOf("avro", Map("write.avro.compression-codec" -> "uncompressed"))
    val avroZstd = sizeOf("avro", Map("write.avro.compression-codec" -> "zstd"))
    assert(avroZstd < avroRaw / 2)
    val orcNone = sizeOf("orc", Map("write.orc.compression-codec" -> "none"))
    val orcZstd = sizeOf("orc", Map("write.orc.compression-codec" -> "zstd"))
    assert(orcZstd < orcNone)
  }

  test("streaming source feeds from avro tables") {
    val src = spark.range(0, 30).selectExpr("id AS k", "concat('v', id) AS v")
    val t0 = freshTable("avro-stream", "avro", src)
    val t1 = t0.append(spark, src.filter(col("k") < 15))
    t1.append(spark, src.filter(col("k") >= 15))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-stream")
      .option("location", t1.location)
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += b.count() }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(seen.sum === 30L)
  }

  test("SparkEntry format queries match their oracle predicates") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val orc = SparkEntry.queries("ice_orc_table")(spark, dir)
    val orcExp = orders.filter(expr("pmod(o_orderkey, 4) <> 1"))
    assert(orc.count() === orcExp.count())
    assert(orc.exceptAll(orcExp).isEmpty && orcExp.exceptAll(orc).isEmpty)
    val avro = SparkEntry.queries("ice_avro_table")(spark, dir)
    val avroExp = orders.filter(expr("pmod(o_orderkey, 6) <> 2"))
    assert(avro.count() === avroExp.count())
    assert(avro.exceptAll(avroExp).isEmpty && avroExp.exceptAll(avro).isEmpty)
  }

  test("SQL: CREATE TABLE with write.format.default=orc, INSERT, SELECT") {
    val wh = tmpLocation("fmt-sql-wh")
    spark.conf.set("spark.sql.catalog.fmtcat", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fmtcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS fmtcat.db")
      spark.sql(
        """CREATE TABLE fmtcat.db.t_orc (k BIGINT, v STRING)
          |TBLPROPERTIES ('write.format.default' = 'orc')""".stripMargin)
      spark.sql("INSERT INTO fmtcat.db.t_orc SELECT id, concat('v', id) FROM range(0, 100)")
      val t = StorageCatalog.loadTable(conf, s"$wh/db/t_orc")
      assert(t.planFiles(t.metadata.currentSnapshot.get)
        .forall(_.file.fileFormat === "orc"))
      assert(spark.sql("SELECT count(*) FROM fmtcat.db.t_orc").head.getLong(0) === 100)
      assert(spark.sql("SELECT sum(k) FROM fmtcat.db.t_orc WHERE k < 10").head.getLong(0) === 45)
      spark.sql(
        """CREATE TABLE fmtcat.db.t_avro (k BIGINT, v STRING)
          |TBLPROPERTIES ('write.format.default' = 'avro')""".stripMargin)
      spark.sql("INSERT INTO fmtcat.db.t_avro SELECT id, concat('v', id) FROM range(0, 100)")
      val ta = StorageCatalog.loadTable(conf, s"$wh/db/t_avro")
      assert(ta.planFiles(ta.metadata.currentSnapshot.get)
        .forall(_.file.fileFormat === "avro"))
      assert(spark.sql("SELECT sum(k) FROM fmtcat.db.t_avro").head.getLong(0) === 4950)
    } finally {
      spark.sql("DROP TABLE IF EXISTS fmtcat.db.t_orc")
      spark.sql("DROP TABLE IF EXISTS fmtcat.db.t_avro")
      spark.conf.unset("spark.sql.catalog.fmtcat")
      spark.conf.unset("spark.sql.catalog.fmtcat.warehouse")
    }
  }

  test("foreign avro delete files: position and equality deletes apply on read") {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import spark.implicits._
    // parquet-data table written by this engine; delete files arrive in
    // AVRO as a foreign engine would write them (spec: delete files may
    // use any data-file format) — they must apply on read
    val src = (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
    // one ordered data file so position p holds key p
    val t = freshTable("foreign-del", "parquet", src).append(spark, src.coalesce(1))
    val dataPath = t.planFiles(t.metadata.currentSnapshot.get).head.file.filePath

    def writeAvro(path: String, fields: Seq[IceField],
        rows: Seq[Map[String, AnyRef]]): Long = {
      val sch = AvroDataIO.avroSchema(fields, "foreign_delete")
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, new java.io.File(path))
      rows.foreach { m =>
        val r = new GenericData.Record(sch)
        m.foreach { case (k, v) => r.put(k, v) }
        w.append(r)
      }
      w.close()
      new java.io.File(path).length()
    }

    // avro POSITION deletes for rows 0..9 of the data file
    val posPath = s"${t.location}/data/foreign-pos.avro"
    val posLen = writeAvro(posPath, Seq(
      IceField(2147483546, "file_path", required = true, IcePrim("string")),
      IceField(2147483545, "pos", required = true, IcePrim("long"))),
      (0L until 10L).map(p => Map[String, AnyRef](
        "file_path" -> dataPath, "pos" -> java.lang.Long.valueOf(p))))
    t.commit(spark, "overwrite", Nil, List(IceDataFile(
      content = 1, filePath = posPath, fileFormat = "avro",
      partition = Seq.empty, recordCount = 10, fileSizeInBytes = posLen)),
      replace = false)
    assert(t.scan(spark).count() === 90L)
    assert(t.scan(spark).agg(min(col("k"))).head().getLong(0) === 10L)

    // avro EQUALITY deletes for k in {10, 11} (field id 1)
    val eqPath = s"${t.location}/data/foreign-eq.avro"
    val eqLen = writeAvro(eqPath,
      Seq(IceField(1, "k", required = true, IcePrim("long"))),
      Seq(10L, 11L).map(k => Map[String, AnyRef]("k" -> java.lang.Long.valueOf(k))))
    t.commit(spark, "overwrite", Nil, List(IceDataFile(
      content = 2, filePath = eqPath, fileFormat = "avro",
      partition = Seq.empty, recordCount = 2, fileSizeInBytes = eqLen,
      equalityIds = Seq(1))),
      replace = false)
    assert(t.scan(spark).count() === 88L)
    assert(t.scan(spark).agg(min(col("k"))).head().getLong(0) === 12L)

    // ORC position deletes (name-resolved, as a foreign writer without
    // field-id attributes would produce): delete positions 12..13
    val orcDir = Files.createTempDirectory("graft-orcdel").toString
    Seq((dataPath, 12L), (dataPath, 13L)).toDF("file_path", "pos")
      .coalesce(1).write.mode("overwrite").orc(orcDir)
    val orcFile = new java.io.File(orcDir).listFiles()
      .find(f => f.getName.endsWith(".orc")).get
    t.commit(spark, "overwrite", Nil, List(IceDataFile(
      content = 1, filePath = orcFile.getAbsolutePath, fileFormat = "orc",
      partition = Seq.empty, recordCount = 2, fileSizeInBytes = orcFile.length())),
      replace = false)
    assert(t.scan(spark).count() === 86L)
    assert(t.scan(spark).agg(min(col("k"))).head().getLong(0) === 14L)

    // jumbo tier: zeroed thresholds force EXECUTOR-side resolution of the
    // foreign avro/orc position deletes (driver-built row factories) and
    // the avro equality deletes (including the disk-backed lookup path) —
    // a foreign CDC writer accumulating GBs of deletes must not stall
    // plan time on the driver
    spark.conf.set("spark.graft.delete-broadcast-max-bytes", "0")
    spark.conf.set("spark.graft.eq-delete-executor-max-bytes", "0")
    try {
      assert(t.scan(spark).count() === 86L)
      assert(t.scan(spark).agg(min(col("k"))).head().getLong(0) === 14L)
    } finally {
      spark.conf.unset("spark.graft.delete-broadcast-max-bytes")
      spark.conf.unset("spark.graft.eq-delete-executor-max-bytes")
    }
  }
}
