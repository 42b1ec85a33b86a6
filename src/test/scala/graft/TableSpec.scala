package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Table-layer tests: fixture loading (the reference's committed Iceberg
  * tables), write/read round-trips, partition pruning, MoR deletes,
  * upsert, and time travel. */
class TableSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("load the reference fixture table (simple_table)") {
    val t = StorageCatalog.loadTable(conf, "/root/reference/testdata/simple_table")
    assert(t.version === 2)
    assert(t.metadata.formatVersion === 1)
    assert(t.metadata.currentSchema.fields.map(_.name) === List("id", "data"))
    val snap = t.metadata.currentSnapshot.get
    assert(snap.summary("total-records") === "3")
    val files = t.planFiles(snap)
    assert(files.size === 3)
    assert(files.forall(_.file.filePath.startsWith("/root/reference/testdata/simple_table/data/")))
    val rows = t.scan(spark).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
  }

  test("load the no-hint fixture table (metadata discovery by listing)") {
    val t = StorageCatalog.loadTable(conf, "/root/reference/testdata/no_hint_table")
    assert(t.version >= 1)
    assert(t.metadata.currentSchema.fields.nonEmpty)
  }

  test("load the reference fixture table (partition_table): v1 identity partitioning") {
    import org.apache.spark.sql.functions.col
    val t = StorageCatalog.loadTable(conf, "/root/reference/testdata/partition_table")
    assert(t.metadata.formatVersion === 1)
    val spec = t.metadata.defaultSpec
    assert(spec.fields.map(f => (f.name, f.transform)) === List(("category", "identity")))
    val rows = t.scan(spark).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      === Seq((1L, "a", "x")))
    // the file entry carries the identity partition tuple from the
    // fixture's own manifests; pruning honors it in both directions
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.map(_.file.partition) === List(List(Some("x"))))
    assert(PruneEval.prunePlanned(files, Some(col("category") === "y"),
      t.metadata, t.metadata.currentSchema).isEmpty)
    assert(PruneEval.prunePlanned(files, Some(col("category") === "x"),
      t.metadata, t.metadata.currentSchema).size === 1)
    assert(t.scan(spark, filter = Some(col("category") === "x")).count() === 1)
  }

  test("unpartitioned round-trip: append customer, scan back") {
    val src = spark.read.parquet(s"$sfDir/customer.parquet")
    val loc = tmpLocation("rt")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    val back = t.scan(spark)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // stats: bounds harvested
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.nonEmpty)
    val f = files.head.file
    assert(f.recordCount > 0)
    assert(f.lowerBounds.nonEmpty && f.upperBounds.nonEmpty)
  }

  test("gzip metadata: vN.gz.metadata.json round-trips, codec flips mid-table") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("gzmeta")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil),
      Map("write.metadata.compression-codec" -> "gzip"))
    t.append(spark, src)
    val mdir = new java.io.File(s"$loc/metadata")
    assert(mdir.listFiles().exists(_.getName == "v1.gz.metadata.json"))
    assert(mdir.listFiles().exists(_.getName == "v2.gz.metadata.json"))
    assert(!mdir.listFiles().exists(_.getName == "v2.metadata.json"))
    // discovery + parse work through the hint walk and the gzip sniff
    val back = StorageCatalog.loadTable(conf, loc)
    assert(back.version === 2)
    assert(back.scan(spark).count() === src.count())
    // the metadata log records the real (gz) name of the previous file
    assert(back.metadata.metadataLog.last.ref.endsWith("v1.gz.metadata.json"))
    // flip the codec off: the UNSET commit and everything after are plain
    back.removeProperties(Seq("write.metadata.compression-codec"))
    back.append(spark, src)
    assert(mdir.listFiles().exists(_.getName == "v3.metadata.json"))
    assert(mdir.listFiles().exists(_.getName == "v4.metadata.json"))
    val plain = StorageCatalog.loadTable(conf, loc)
    assert(plain.version === 4)
    assert(plain.scan(spark).count() === 2 * src.count())
    // no-hint discovery also resolves mixed-codec histories
    new java.io.File(s"$loc/metadata/version-hint.text").delete()
    assert(StorageCatalog.loadTable(conf, loc).version === 4)
  }

  test("metadata-only delete: strict files drop unread, boundary files get positions") {
    import org.apache.spark.sql.functions.{col, lit}
    val src = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    val loc = tmpLocation("metadel")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    // two files with disjoint id ranges via separate appends
    t.append(spark, src.filter(col("id") <= 100).coalesce(1))
    t.append(spark, src.filter(col("id") > 100).coalesce(1))
    val before = Metrics.get(Metrics.MetadataOnlyDeletedFiles)
    // id <= 150: file1 strictly matches (bounds 1..100), file2 partially
    t.deleteWhere(spark, col("id") <= lit(150L))
    assert(Metrics.get(Metrics.MetadataOnlyDeletedFiles) === before + 1)
    val planned = t.planFiles(t.metadata.currentSnapshot.get)
    assert(planned.count(_.file.content == DataContent.Data) === 1)
    assert(planned.exists(_.file.content != DataContent.Data)) // positions for file2
    val back = t.scan(spark).collect().map(_.getLong(0)).sorted
    assert(back.toSeq === (151L to 200L))
    // changelog still emits every deleted row exactly once
    val changes = t.changes(spark,
      t.metadata.snapshots.minBy(_.sequenceNumber).snapshotId)
    val deleted = changes.filter(col("_change_type") === "delete")
      .collect().map(_.getLong(0)).sorted
    assert(deleted.toSeq === (1L to 150L))
    // strict path respects nulls: no file drops when the column may be null
    val srcN = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("id", "v")
    val locN = tmpLocation("metadeln")
    val tN = StorageCatalog.createOrReplaceTable(
      conf, locN, SchemaConvert.fromSparkSchema(srcN.schema), IcePartitionSpec(0, Nil))
    tN.append(spark, srcN.coalesce(1))
    val b2 = Metrics.get(Metrics.MetadataOnlyDeletedFiles)
    tN.deleteWhere(spark, col("id") <= lit(100L)) // null row must survive
    assert(Metrics.get(Metrics.MetadataOnlyDeletedFiles) === b2)
    assert(tN.scan(spark).count() === 1)
  }

  test("overwrite WHERE takes the metadata path for fully-covered files") {
    import org.apache.spark.sql.functions.{col, lit}
    val src = (1L to 100L).map(i => (i, "old")).toDF("id", "v")
    val loc = tmpLocation("metaow")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter(col("id") <= 50).coalesce(1))
    t.append(spark, src.filter(col("id") > 50).coalesce(1))
    val before = Metrics.get(Metrics.MetadataOnlyDeletedFiles)
    // replace ids 1..50 (exactly file1) with fresh rows: file1 drops
    // unread, no position deletes exist afterwards
    val repl = (1L to 50L).map(i => (i, "new")).toDF("id", "v")
    t.overwriteWhere(spark, col("id") <= lit(50L), repl)
    assert(Metrics.get(Metrics.MetadataOnlyDeletedFiles) === before + 1)
    assert(!t.planFiles(t.metadata.currentSnapshot.get)
      .exists(_.file.content != DataContent.Data))
    val back = t.scan(spark).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.length === 100)
    assert(back.filter(_._1 <= 50).forall(_._2 == "new"))
    assert(back.filter(_._1 > 50).forall(_._2 == "old"))
  }

  test("scoped compaction rewrites only files the predicate may touch") {
    import org.apache.spark.sql.functions.col
    val src = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("id", "p")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val spec = IcePartitionSpec(0, List(IcePartitionField(
      schema.findField("p").get.id, 1000, "identity", "p_part")))
    val loc = tmpLocation("scopedrw")
    val t = StorageCatalog.createOrReplaceTable(conf, loc, schema, spec)
    (1L to 4L).foreach(i => t.append(spark, src.filter(col("id") === i)))
    def pathsOf(part: String): Set[String] = t.planFiles(t.metadata.currentSnapshot.get)
      .filter(_.file.partition.headOption.flatten.contains(part))
      .map(_.file.filePath).toSet
    val aBefore = pathsOf("a")
    val bBefore = pathsOf("b")
    assert(aBefore.size === 2 && bBefore.size === 2)
    t.rewriteDataFiles(spark, Some(col("p") === "a"))
    assert(pathsOf("b") === bBefore, "untouched partition must keep its files")
    assert(pathsOf("a").intersect(aBefore).isEmpty, "scoped partition rewritten")
    assert(pathsOf("a").size === 1)
    assert(t.scan(spark).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === src.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("partitioned append with month transform + partition pruning") {
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val shipdateId = schema.findField("l_shipdate").get.id
    val spec = IcePartitionSpec(0,
      List(IcePartitionField(shipdateId, 1000, "month", "shipmonth")))
    val loc = tmpLocation("part")
    val t = StorageCatalog.createOrReplaceTable(conf, loc, schema, spec)
    t.append(spark, src)

    val back = t.scan(spark)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty)

    // partition values recorded per file
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.forall(_.file.partition.size == 1))
    assert(files.flatMap(_.file.partition.head).toSet.size > 10)

    // pruning: a 3-month window must touch far fewer files than all
    val flt = col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
      col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00"))
    val prunedFiles = t.filesForScan(Some(flt))
    assert(prunedFiles.size < files.size / 4,
      s"pruning ineffective: ${prunedFiles.size} of ${files.size}")
    val got = t.scan(spark, filter = Some(flt))
    val exp = src.filter(flt)
    assert(got.count() === exp.count())
    assert(got.exceptAll(exp).isEmpty)
  }

  test("equality delete hides matching rows from older snapshots") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("eqdel")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    val toDelete = src.filter($"o_orderstatus" === "F").select($"o_orderkey")
    t.equalityDelete(spark, toDelete, Seq("o_orderkey"))
    val back = t.scan(spark)
    val exp = src.filter($"o_orderstatus" =!= "F")
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
  }

  test("position delete removes exact rows") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("posdel")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    // positions of rows with orderkey % 10 == 0, via the scan's _file/_pos
    val withPos = t.scan(spark, keepFilePos = true)
    val pos = withPos.filter(pmod($"o_orderkey", lit(10)) === 0)
      .select($"_file".as("file_path"), $"_pos".as("pos"))
    t.positionDelete(spark, pos)
    val back = t.scan(spark)
    val exp = src.filter(pmod($"o_orderkey", lit(10)) =!= 0)
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
  }

  test("upsert: last-write-wins by key, including deletes") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("upsert")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    // CDC batch: bump totalprice for keys %7==0 (op=1 upsert),
    // delete keys %13==0 (op=2)
    val upserts = src
      .filter(pmod($"o_orderkey", lit(7)) === 0 && pmod($"o_orderkey", lit(13)) =!= 0)
      .withColumn("o_totalprice", $"o_totalprice" + 1.0)
      .withColumn("_op", lit(1))
    val deletes = src.filter(pmod($"o_orderkey", lit(13)) === 0)
      .withColumn("_op", lit(2))
    t.upsert(spark, upserts.unionByName(deletes), Seq("o_orderkey"), opCol = Some("_op"))

    val back = t.scan(spark)
    val exp = src
      .withColumn("o_totalprice",
        when(pmod($"o_orderkey", lit(7)) === 0 && pmod($"o_orderkey", lit(13)) =!= 0,
          $"o_totalprice" + 1.0).otherwise($"o_totalprice"))
      .filter(pmod($"o_orderkey", lit(13)) =!= 0)
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
  }

  test("time travel reads older snapshots; snapshot log grows") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("tt")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    val first = src.filter($"r_regionkey" < 3)
    val second = src.filter($"r_regionkey" >= 3)
    t.append(spark, first)
    val snap1 = t.metadata.currentSnapshotId.get
    t.append(spark, second)
    assert(t.metadata.snapshots.size === 2)
    assert(t.scan(spark).count() === src.count())
    val old = t.scan(spark, snapshotId = Some(snap1))
    assert(old.count() === first.count())
    assert(old.exceptAll(first).isEmpty)
    // reload from disk: metadata json round-trip
    val t2 = StorageCatalog.loadTable(conf, loc)
    assert(t2.metadata.snapshots.size === 2)
    assert(t2.scan(spark, snapshotId = Some(snap1)).count() === first.count())
  }

  test("overwrite replaces table contents") {
    val src = spark.read.parquet(s"$sfDir/nation.parquet")
    val loc = tmpLocation("ow")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    val half = src.filter($"n_nationkey" < 10)
    t.overwrite(spark, half)
    val back = t.scan(spark)
    assert(back.count() === half.count())
    assert(back.exceptAll(half).isEmpty)
  }

  test("manifest avro round-trip preserves stats and partition values") {
    val schema = IceSchema(0, List(
      IceField(1, "id", required = true, IcePrim("long")),
      IceField(2, "cat", required = false, IcePrim("string"))))
    val spec = IcePartitionSpec(0, List(IcePartitionField(2, 1000, "identity", "cat")))
    val df = IceDataFile(
      content = 0, filePath = "/tmp/x.parquet", fileFormat = "parquet",
      partition = Seq(Some("a")), recordCount = 42L, fileSizeInBytes = 1234L,
      columnSizes = Map(1 -> 100L), valueCounts = Map(1 -> 42L),
      nullValueCounts = Map(2 -> 1L),
      lowerBounds = Map(1 -> SingleValue.encode(IcePrim("long"), 7L)),
      upperBounds = Map(1 -> SingleValue.encode(IcePrim("long"), 99L)),
      splitOffsets = Seq(4L), equalityIds = Nil, sortOrderId = Some(0))
    val entry = IceManifestEntry(ManifestStatus.Added, Some(10L), Some(3L), Some(3L), df)
    val dir = tmpLocation("avro")
    new java.io.File(dir).mkdirs()
    val path = s"$dir/m0.avro"
    val listEntry = ManifestIO.writeManifest(conf, path, List(entry), spec, schema, 0)
    assert(listEntry.addedFilesCount === 1)
    assert(listEntry.addedRowsCount === 42L)
    val back = ManifestIO.readManifest(conf, path, spec.fields.map(_.name))
    assert(back.size === 1)
    val b = back.head
    assert(b.dataFile.filePath === "/tmp/x.parquet")
    assert(b.dataFile.partition === Seq(Some("a")))
    assert(b.dataFile.recordCount === 42L)
    assert(SingleValue.decode(IcePrim("long"), b.dataFile.lowerBounds(1)) === 7L)
    assert(SingleValue.decode(IcePrim("long"), b.dataFile.upperBounds(1)) === 99L)
    assert(b.dataSequenceNumber === Some(3L))

    val listPath = s"$dir/snap.avro"
    ManifestIO.writeManifestList(conf, listPath, List(listEntry), 10L, None, 3L)
    val entries = ManifestIO.readManifestList(conf, listPath)
    assert(entries.size === 1)
    assert(entries.head.manifestPath === path)
    assert(entries.head.sequenceNumber === 3L)
  }

  test("append mergeSchema: wider input evolves the table instead of dropping") {
    val loc = tmpLocation("mergeschema")
    val base = spark.range(0, 10).selectExpr(
      "cast(id as int) AS k", "concat('v', id) AS v")
    val t0 = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(base.schema), IcePartitionSpec(0, Nil))
    t0.append(spark, base)
    // wider input: k widened int->long, new column w
    val wide = spark.range(10, 20).selectExpr(
      "id AS k", "concat('v', id) AS v", "id * 2 AS w")
    // without mergeSchema the new column is dropped (documented behavior)
    t0.append(spark, wide)
    assert(!t0.metadata.currentSchema.fields.exists(_.name == "w"))
    // with mergeSchema the table evolves first
    t0.append(spark, wide, mergeSchema = true)
    val sch = t0.metadata.currentSchema
    assert(sch.findField("k").get.fieldType === IcePrim("long"))
    assert(sch.findField("w").get.fieldType === IcePrim("long"))
    assert(!sch.findField("w").get.required)
    val back = t0.scan(spark)
    assert(back.count() === 30)
    // pre-evolution rows read w as null; merged rows carry values
    assert(back.filter(col("w").isNull).count() === 20)
    assert(back.filter(col("w") === 30L).count() === 1)
    // an int input into the now-long column upcasts; NEVER narrows back
    val n2 = spark.range(30, 31).selectExpr(
      "cast(id as int) AS k", "concat('v', id) AS v", "id * 2 AS w")
    t0.append(spark, n2, mergeSchema = true) // int input into long column: fine, upcast
    assert(t0.metadata.currentSchema.findField("k").get.fieldType === IcePrim("long"))
  }

  test("decimal partition values write as spec fixed[n], round-trip exact") {
    // the Iceberg spec's Avro mapping for decimals is fixed[minBytesFor(P)]
    // with the decimal logical type — Java Iceberg manifest readers
    // project that schema and reject a bytes-typed field
    val schema = IceSchema(0, List(
      IceField(1, "id", required = true, IcePrim("long")),
      IceField(2, "d", required = false, IceDecimal(9, 2))))
    val spec = IcePartitionSpec(0, List(IcePartitionField(2, 1000, "identity", "d_p")))
    val pv = new java.math.BigDecimal("-123.45")
    val df = IceDataFile(
      content = 0, filePath = "/tmp/d.parquet", fileFormat = "parquet",
      partition = Seq(Some(pv)), recordCount = 1L, fileSizeInBytes = 10L)
    val entry = IceManifestEntry(ManifestStatus.Added, Some(1L), Some(1L), Some(1L), df)
    val dir = tmpLocation("decfixed")
    new java.io.File(dir).mkdirs()
    val path = s"$dir/m0.avro"
    ManifestIO.writeManifest(conf, path, List(entry), spec, schema, 0)
    // raw Avro: the partition field's schema must be FIXED (not BYTES),
    // sized for precision 9 (4 bytes), carrying the decimal logical type
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      new java.io.File(path),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      val partField = reader.getSchema.getField("data_file").schema()
        .getField("partition").schema().getField("d_p").schema()
      val inner = partField.getTypes.asScala.find(
        _.getType != org.apache.avro.Schema.Type.NULL).get
      assert(inner.getType === org.apache.avro.Schema.Type.FIXED)
      assert(inner.getFixedSize === 4)
      val lt = inner.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
      assert(lt.getPrecision === 9 && lt.getScale === 2)
    } finally reader.close()
    // sign extension must round-trip the negative value exactly
    val back = ManifestIO.readManifest(conf, path, spec.fields.map(_.name))
    assert(back.head.dataFile.partition === Seq(Some(new java.math.BigDecimal("-123.45"))))
  }

  test("manifest-level pruning skips whole manifests via field summaries") {
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val spec = IcePartitionSpec(0, List(IcePartitionField(
      schema.findField("l_shipdate").get.id, 1000, "month", "shipmonth")))
    val loc = tmpLocation("mfprune")
    val t = StorageCatalog.createOrReplaceTable(conf, loc, schema, spec)
    // one manifest per year: disjoint summary ranges
    Seq("1996", "1997", "1998").foreach { y =>
      t.append(spark, src.filter(year($"l_shipdate") === y.toInt))
    }
    val snap = t.metadata.currentSnapshot.get
    val all = t.planFiles(snap)
    val flt = $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1997-02-01 00:00:00")) &&
      $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1997-05-01 00:00:00"))
    val pruned = t.planFiles(snap, Some(flt))
    // only the 1997 manifest's files survive manifest-level pruning
    assert(pruned.size < all.size / 2,
      s"manifest pruning ineffective: ${pruned.size} of ${all.size}")
    // correctness through the full scan
    val got = t.scan(spark, filter = Some(flt))
    val exp = src.filter(flt)
    assert(got.count() === exp.count())
    assert(got.exceptAll(exp).isEmpty)
  }

  test("extended stats: distinct + nan counts recorded; NaN never taints float bounds") {
    val src = Seq(
      (1L, 1.5f, "a"), (2L, Float.NaN, "b"), (3L, 2.5f, "c"), (4L, 2.5f, "d"))
      .toDF("k", "score", "tag")
    val loc = tmpLocation("extstats")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil),
      properties = Map("write.stats.extended" -> "true"))
    t.append(spark, src.coalesce(1))
    val f = t.planFiles(t.metadata.currentSnapshot.get).head.file
    val scoreId = t.metadata.currentSchema.findField("score").get.id
    val kId = t.metadata.currentSchema.findField("k").get.id
    // nan counted; distincts approximately right (exact at this size)
    assert(f.nanValueCounts(scoreId) === 1L)
    assert(f.distinctCounts(kId) === 4L)
    // float bounds are either absent or NaN-free (spec: bounds must not be NaN)
    f.lowerBounds.get(scoreId).foreach { b =>
      assert(!SingleValue.decode(IcePrim("float"), b).asInstanceOf[Float].isNaN)
    }
    f.upperBounds.get(scoreId).foreach { b =>
      assert(!SingleValue.decode(IcePrim("float"), b).asInstanceOf[Float].isNaN)
    }
    // manifest avro round-trips the new maps
    val reloaded = StorageCatalog.loadTable(conf, loc)
      .planFiles(reloadSnapshot(loc)).head.file
    assert(reloaded.nanValueCounts(scoreId) === 1L)
    assert(reloaded.distinctCounts(kId) === 4L)
  }

  private def reloadSnapshot(loc: String): IceSnapshot =
    StorageCatalog.loadTable(conf, loc).metadata.currentSnapshot.get

  test("concurrent commits: exactly one writer wins each version") {
    val src = Seq((1L, "a")).toDF("k", "v")
    val loc = tmpLocation("race")
    StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    // 8 threads race commits, many from the same base version; the atomic
    // commit point must serialize them into distinct versions with no
    // lost updates (setProperties has no retry loop — each thread retries)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val workers = (1 to 8).map { i =>
      new Thread(() => {
        var done = false
        var attempts = 0
        while (!done && attempts < 200) {
          try {
            val t = StorageCatalog.loadTable(conf, loc)
            t.setProperties(Map(s"prop-$i" -> i.toString))
            done = true
          } catch {
            case _: CommitConflictException => attempts += 1
            case e: Throwable =>
              errors.add(s"thread $i: ${e.getClass.getSimpleName}: ${e.getMessage}")
              attempts += 1
          }
        }
        if (done) results.add(s"prop-$i")
        ()
      })
    }
    workers.foreach(_.start())
    workers.foreach(_.join(60000))
    assert(errors.isEmpty, s"unexpected errors: ${errors.toArray.mkString("; ")}")
    assert(results.size === 8)
    val fin = StorageCatalog.loadTable(conf, loc)
    // every commit survived — no silent overwrite lost a version
    (1 to 8).foreach(i => assert(fin.metadata.properties.contains(s"prop-$i")))
    assert(fin.version === 9) // create + 8 commits
  }

  test("planning over 100+ manifests: parallel reads, one planFiles per scan") {
    val src = Seq((1L, "x")).toDF("k", "v")
    val loc = tmpLocation("manyman")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    // each append adds one manifest to the list; 100+ appends => 100+
    // manifests in the final snapshot
    (1 to 110).foreach(i => t.append(spark, Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val t0 = System.nanoTime()
    val planned = t.planFiles(t.metadata.currentSnapshot.get)
    val planSec = (System.nanoTime() - t0) / 1e9
    assert(planned.size === 110)
    assert(planSec < 30.0) // thread-pooled reads; serial would risk minutes
    Metrics.reset()
    t.scan(spark).count()
    assert(Metrics.get(Metrics.PlanFilesCalls) === 1L)
  }

  test("changelog reads the data side ONCE across many equality-delete commits") {
    val loc = tmpLocation("cdcchange")
    val src = (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    val fromId = t.metadata.currentSnapshot.get.snapshotId
    // five separate equality-delete commits on the same key column — the
    // CDC shape that amplified reads when each delete-sequence group
    // re-scanned the older data files
    (1L to 5L).foreach { k =>
      t.equalityDelete(spark, Seq(Tuple1(k)).toDF("k"), Seq("k"))
    }
    val dataFiles = t.planFiles(t.metadata.currentSnapshot.get)
      .count(_.file.content == DataContent.Data)
    Metrics.reset()
    val out = t.changes(spark, fromId).collect()
    // the single-pass plan opens each older data file once, not once per
    // delete-sequence group
    assert(Metrics.get(Metrics.ChangelogDataFilesRead) === dataFiles.toLong,
      s"expected $dataFiles data-file reads, got ${Metrics.get(Metrics.ChangelogDataFilesRead)}")
    assert(out.forall(_.getString(2) === "delete"))
    assert(out.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // an idempotent re-delete of an already-deleted key emits no duplicate
    t.equalityDelete(spark, Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    val out2 = t.changes(spark, fromId).collect()
    assert(out2.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("changelog/incremental across a TRUNCATE: wiped rows emit as deletes") {
    val loc = tmpLocation("truncrange")
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    val fromId = t.metadata.currentSnapshot.get.snapshotId
    t.append(spark, Seq((3L, "c")).toDF("k", "v"))
    // TRUNCATE commits operation 'delete' but replaces the live file set —
    // every row live at its parent emits a delete, and in-range inserts
    // survive (the old seq-filter approach lost both)
    t.truncate()
    t.append(spark, Seq((4L, "d")).toDF("k", "v"))
    val out = t.changes(spark, fromId)
      .select("k", "_change_type").as[(Long, String)].collect().sorted
    assert(out.toSeq === Seq((1L, "delete"), (2L, "delete"), (3L, "delete"),
      (3L, "insert"), (4L, "insert")))
    assert(t.scanIncremental(spark, fromId).select("k").as[Long].collect().sorted
      .toSeq === Seq(3L, 4L))
  }

  test("changelog/incremental across a compaction: rewritten rows do not re-emit") {
    val loc = tmpLocation("compactrange")
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    val fromId = t.metadata.currentSnapshot.get.snapshotId
    t.append(spark, Seq((3L, "c")).toDF("k", "v"))
    t.rewriteDataFiles(spark)
    t.append(spark, Seq((4L, "d")).toDF("k", "v"))
    // only the genuine appends emit; the compaction's re-filed rows don't
    assert(t.scanIncremental(spark, fromId).select("k").as[Long].collect().sorted
      .toSeq === Seq(3L, 4L))
    val out = t.changes(spark, fromId)
      .select("k", "_change_type").as[(Long, String)].collect().sorted
    assert(out.toSeq === Seq((3L, "insert"), (4L, "insert")))
    // an equality delete AFTER the compaction resolves against the
    // rewritten files and still emits the deleted row's content
    t.equalityDelete(spark, Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    val out2 = t.changes(spark, fromId)
      .select("k", "_change_type").as[(Long, String)].collect().sorted
    assert(out2.toSeq === Seq((2L, "delete"), (3L, "insert"), (4L, "insert")))
  }

  test("changelog surfaces delete files of a markerless foreign 'overwrite' row-delta") {
    val loc = tmpLocation("foreigndelta")
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    val fromId = t.metadata.currentSnapshot.get.snapshotId
    // a MoR row-delta (pos deletes + new data in one 'overwrite' commit),
    // then strip every graft.replace marker — what a table written by a
    // foreign Iceberg engine (or a pre-marker graft) looks like
    t.overwriteWhere(spark, col("k") === 2L, Seq((2L, "b2")).toDF("k", "v"))
    t.metadata = t.metadata.copy(snapshots = t.metadata.snapshots.map(s =>
      s.copy(summary = s.summary - "graft.replace")))
    val out = t.changes(spark, fromId)
      .select("k", "v", "_change_type").as[(Long, String, String)].collect().sorted
    // the replace-classified commit's ADDED delete files must surface the
    // old row as a delete (the old behavior silently dropped it)
    assert(out.toSeq === Seq((2L, "b", "delete"), (2L, "b2", "insert")))
  }
}
